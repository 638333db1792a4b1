package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.operators.PageProcessing
import graft.operators.PageProcessing._

/** Golden tests ported from /root/reference/test/process_pages_test.py and
  * data_cleaners_test.py. The parade fixtures pin the full ordered
  * extraction semantics (offsets, heuristic mentions, entity order). */
class PageProcessingSpec extends AnyFunSuite {

  private val noRedirects: String => Option[String] = _ => None

  private def contextsOf(p: ProcessedPage): Vector[(String, Vector[Mention])] =
    p.entities.map(e => e -> p.mentions.filter(_.entity == e).toVector).toVector

  test("golden: parade_page.json -> parade_page_contexts.json (process_pages_test.py:49-60)") {
    val page = Fixtures.parsePage("parade_page.json")
    val golden = Fixtures.parseContexts("parade_page_contexts.json")
    val processed = PageProcessing.processPage(noRedirects, page)
    assert(processed.documentInfo.title == page.title)
    assert(processed.documentInfo.text == page.plaintext)
    assert(processed.documentInfo.categories == page.categories.get)
    assert(contextsOf(processed) == golden)
  }

  test("golden: parade with redirects reshapes contexts (process_pages_test.py:102-114)") {
    val page = Fixtures.parsePage("parade_page.json")
    val golden = Fixtures.parseContexts("parade_page_contexts.json")
    val redirects: String => Option[String] =
      t => if (t == "Fort de Goede Hoop") Some("Kaapstad") else None
    val processed = PageProcessing.processPage(redirects, page)
    // golden reshaped exactly like the reference test: the Fort mention
    // moves into Kaapstad at position 1, entity/preredirect updated by the
    // redirect resolution (entity renamed, preredirect stays the raw target)
    val fort = golden.find(_._1 == "Fort de Goede Hoop").get._2.head
      .copy(entity = "Kaapstad")
    val reshaped = golden.flatMap {
      case ("Fort de Goede Hoop", _) => None
      case ("Kaapstad", ms) => Some("Kaapstad" -> (ms.take(1) ++ Vector(fort) ++ ms.drop(1)))
      case other => Some(other)
    }
    assert(contextsOf(processed) == reshaped)
  }

  test("implicit links: absent anchor text falls back to target (process_pages_test.py:62-77)") {
    val page = Page(
      title = "My page", pageID = Some("0"), categories = Some(Nil),
      isDisambiguation = Some(false), plaintext = "some text",
      sections = Seq(Section(None, None,
        Some(Seq(Sentence("some text", Some(Seq(Link(Some("some"), None)))))), None)))
    val processed = PageProcessing.processPage(noRedirects, page)
    assert(contextsOf(processed) == Vector(
      "My page" -> Vector.empty,
      "Some" -> Vector(Mention("Some", "some", Some("some text"), 0, "My page", "Some"))))
  }

  test("overlap suppression keeps first-kept mentions (process_pages_test.py:79-100)") {
    val page = Page(
      title = "Other", pageID = Some("0"), categories = Some(Nil),
      isDisambiguation = Some(false),
      plaintext = "some Other text and my stuff",
      sections = Seq(Section(None, None, Some(Seq(Sentence(
        "some Other text and my stuff",
        Some(Seq(
          Link(Some("Other"), Some("some Other text")),
          Link(Some("My page"), Some("my"))))))), None)))
    val processed = PageProcessing.processPage(noRedirects, page)
    assert(contextsOf(processed) == Vector(
      "Other" -> Vector(Mention("Other", "some Other text",
        Some("some Other text and my stuff"), 0, "Other", "Other")),
      "My page" -> Vector(Mention("My page", "my",
        Some("some Other text and my stuff"), 20, "Other", "My page"))))
  }

  test("mention overlap predicate incl. containment (process_pages_test.py:20-47)") {
    val a = Mention("Other", "some other text", None, 0, "Other", "Other")
    val b = Mention("My page", "my", None, 20, "My page", "My page")
    val inside = Mention("Other", "other", None, 5, "Other", "Other")
    assert(mentionOverlaps(Seq(a, b), inside))
    assert(mentionOverlaps(Seq(inside, b), a)) // containment
    val mandelaFull = Mention("Nelson Mandela", "Nelson Mandela", None, 999, "Parade", "Nelson Mandela")
    val mandelaSub = Mention("Nelson Mandela", "Mandela", None, 1006, "Parade", "Nelson Mandela")
    assert(mentionOverlaps(Seq(mandelaFull), mandelaSub))
  }

  test("clean sentence drops links invalidated by cleaning (data_cleaners_test.py:12-18)") {
    val s = Sentence(
      "Die Parade tussen Plein-, Buitenkant-, Darling- en Kasteelstraat in ( ; Kaapstad) word as markplein, parkeerterrein en vir massabyeenkomste gebruik.",
      Some(Seq(Link(Some("Kaapstad"), Some("Kaapstad")))))
    val cleaned = cleanSentence(s)
    assert(cleaned.text ==
      "Die Parade tussen Plein-, Buitenkant-, Darling- en Kasteelstraat in  word as markplein, parkeerterrein en vir massabyeenkomste gebruik.")
    assert(cleaned.links.get.isEmpty)
  }

  test("clean sentence whitespace handling (data_cleaners_test.py:26-48)") {
    val text = "Die Parade tussen Plein-, Buitenkant-, Darling- en Kasteelstraat in Kaapstad word as markplein, parkeerterrein en vir massabyeenkomste gebruik."
    val ws = cleanSentence(Sentence(text, Some(Seq(Link(Some(" Kaapstad"), Some("Kaapstad"))))))
    assert(ws.links.get == Seq(Link(Some("Kaapstad"), Some("Kaapstad"))))
    val both = cleanSentence(Sentence(text, Some(Seq(Link(Some(" Kaapstad"), Some(" Kaapstad"))))))
    assert(both.links.get == Seq(Link(Some("Kaapstad"), Some("Kaapstad"))))
    val blank = cleanSentence(Sentence(text, Some(Seq(Link(Some(" Kaapstad"), Some(" "))))))
    assert(blank.links.get.isEmpty)
    val implicitLink = cleanSentence(Sentence("some text", Some(Seq(Link(Some("some"), None)))))
    assert(implicitLink.links.get == Seq(Link(Some("some"), None)))
    val noop = cleanSentence(Sentence(text, Some(Seq(Link(Some("Kaapstad"), Some("Kaapstad"))))))
    assert(noop.text == text && noop.links.get.size == 1)
  }

  test("sentence to link contexts with redirect (process_pages_test.py:7-18)") {
    val page = Page("My page", Some("0"), Some(Nil), Some(false), "some text",
      Seq(Section(None, None,
        Some(Seq(Sentence("some text", Some(Seq(Link(Some("some text"), None)))))), None)))
    val redirects: String => Option[String] =
      t => if (t == "some text") Some("Some Words") else None
    val contexts = getLinkContexts(redirects, page)
    assert(contexts.toVector == Vector(
      "Some Words" -> Vector(Mention("Some Words", "some text",
        Some("some text"), 0, "My page", "Some text"))))
  }

  test("invalid pages are rejected (process_pages.py:9-17)") {
    val valid = Fixtures.parsePage("parade_page.json")
    assert(isValidPage(valid))
    assert(!isValidPage(valid.copy(plaintext = "  hi  ")))
    assert(!isValidPage(valid.copy(title = "Foo.jpg")))
    assert(!isValidPage(valid.copy(title = "Foo (disambiguation)")))
  }
}
