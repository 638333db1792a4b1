package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Iobes
import graft.operators.Iobes.MentionSpan

/** IOBES goldens ported from /root/reference/test/iobes_test.py, including
  * the full parade token-level golden (test/fixtures/parade_iobes.py). */
class IobesSpec extends AnyFunSuite {

  /** Minimal parser for the Python nested-list-of-strings literal in
    * parade_iobes.py (quotes: ' or ", backslash escapes). */
  private def parsePyNestedLists(s: String): Any = {
    var i = s.indexOf('[')
    def skipWs(): Unit = {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == ',')) i += 1
    }
    def parseValue(): Any = {
      skipWs()
      s.charAt(i) match {
        case '[' =>
          i += 1
          val items = Vector.newBuilder[Any]
          skipWs()
          while (s.charAt(i) != ']') {
            items += parseValue()
            skipWs()
          }
          i += 1
          items.result()
        case q @ ('\'' | '"') =>
          i += 1
          val sb = new StringBuilder
          while (s.charAt(i) != q) {
            if (s.charAt(i) == '\\') {
              i += 1
              sb += (s.charAt(i) match {
                case 'n' => '\n'; case 't' => '\t'; case other => other
              })
            } else sb += s.charAt(i)
            i += 1
          }
          i += 1
          sb.toString
        case other => sys.error(s"unexpected char '$other' at $i")
      }
    }
    parseValue()
  }

  private lazy val paradeIobesGolden: Vector[Vector[Vector[String]]] = {
    val in = getClass.getResourceAsStream("/fixtures/parade_iobes.py")
    val text = Source.fromInputStream(in, "UTF-8").mkString
    parsePyNestedLists(text)
      .asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Vector[Any]]
        .map(_.asInstanceOf[Vector[Any]].map(_.asInstanceOf[String])))
  }

  test("simple overlapping-matches page (iobes_test.py:13-23)") {
    val content = "some other text and my stuff"
    val mentions = Seq(MentionSpan("some other text", 0), MentionSpan("my", 20))
    val titles = Seq("Other", "My page")
    val result = Iobes.pageIobes(content, mentions, titles)
    assert(result == Vector(Vector(
      Vector("some", "Other", "B"),
      Vector("other", "Other", "I"),
      Vector("text", "Other", "E"),
      Vector("and", "O"),
      Vector("my", "My%20page", "S"),
      Vector("stuff", "O"))))
  }

  test("full parade golden (iobes_test.py:25-38)") {
    val db = Fixtures.readTree("parade_page_db.json")
    val content = db.get("content").asText
    val contexts = Fixtures.parseContexts("parade_page_contexts.json")
    // reference construction: flatten (entity, mention) in key order,
    // filter out-of-bounds, stable-sort by offset
    val pairs = contexts.flatMap { case (entity, ms) =>
      ms.filter(_.offset < content.length).map(m => (entity, m))
    }.sortBy(_._2.offset)
    val mentions = pairs.map { case (_, m) => MentionSpan(m.text, m.offset) }
    val titles = pairs.map(_._1)
    val result = Iobes.pageIobes(content, mentions, titles)
    assert(result.length == paradeIobesGolden.length,
      s"sentence groups: got ${result.length}, want ${paradeIobesGolden.length}\n" +
        result.map(_.map(_.head).take(6).mkString(" ")).mkString("\n"))
    result.zip(paradeIobesGolden).zipWithIndex.foreach { case ((got, want), idx) =>
      assert(got == want, s"sentence group $idx differs")
    }
  }

  test("word-match tagging with unicode escape (iobes_test.py:40-51)") {
    val content = "*2002–03 NHL season"
    val mentions = Seq(MentionSpan("2002–03 NHL season", 1))
    val titles = Seq("2002–03 NHL season")
    val result = Iobes.pageIobes(content, mentions, titles)
    assert(result == Vector(Vector(
      Vector("*", "O"),
      Vector("2002–03", "2002%E2%80%9303%20NHL%20season", "B"),
      Vector("NHL", "2002%E2%80%9303%20NHL%20season", "I"),
      Vector("season", "2002%E2%80%9303%20NHL%20season", "E"))))
  }

  test("straddling mention sentences are merged (iobes_test.py:53-64)") {
    val content = "2002–03 NHL. season"
    val mentions = Seq(MentionSpan("2002–03 NHL. season", 0))
    val titles = Seq("2002–03 NHL season")
    val result = Iobes.pageIobes(content, mentions, titles)
    assert(result == Vector(Vector(
      Vector("2002–03", "2002%E2%80%9303%20NHL%20season", "B"),
      Vector("NHL", "2002%E2%80%9303%20NHL%20season", "I"),
      Vector(".", "2002%E2%80%9303%20NHL%20season", "I"),
      Vector("season", "2002%E2%80%9303%20NHL%20season", "E"))))
  }

  test("formatPageIobes emits the reference file layout (iobes.py:105-115)") {
    val iobes = Vector(
      Vector(Vector("a", "O"), Vector("b", "X", "S")),
      Vector(Vector("c", "O")))
    assert(Iobes.formatPageIobes("T", iobes) == "T\na O\nb X S\n\nc O")
  }
}
