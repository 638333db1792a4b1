package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Mention
import graft.tools.PrettyPrint

/** Terminal pretty-printers (reference pretty_printers.py:6-24): ANSI
  * rendering rules + the reverse-offset insertion trick. */
class PrettyPrintSpec extends AnyFunSuite {

  private val G = "\u001b[32m"
  private val C = "\u001b[4;36m"
  private val R = "\u001b[0m"

  private def m(entity: String, text: String, offset: Int) =
    Mention(entity, text, None, offset, "Page", entity)

  test("page contents: mentions green, entity appended cyan-underlined") {
    val content = "Alpha beta gamma delta"
    val out = PrettyPrint.pageContentsWithMentions(
      content, Seq(m("Greek B", "beta", 6), m("Greek D", "delta", 17)))
    assert(out ==
      s"Alpha ${G}beta$R${C}Greek B$R gamma ${G}delta$R${C}Greek D$R")
    // stripped of ANSI, the original text is intact with entities inlined
    val stripped = out.replaceAll("\u001b\\[[0-9;]*m", "")
    assert(stripped == "Alpha betaGreek B gamma deltaGreek D")
  }

  test("mention order does not matter (sorted, applied in reverse)") {
    val content = "one two three"
    val a = PrettyPrint.pageContentsWithMentions(
      content, Seq(m("E3", "three", 8), m("E1", "one", 0)))
    val b = PrettyPrint.pageContentsWithMentions(
      content, Seq(m("E1", "one", 0), m("E3", "three", 8)))
    assert(a == b)
    assert(a.startsWith(s"${G}one$R${C}E1$R two "))
  }

  test("no mentions: content unchanged; over-long mention clamped") {
    assert(PrettyPrint.pageContentsWithMentions("plain", Nil) == "plain")
    val out = PrettyPrint.pageContentsWithMentions(
      "tail", Seq(m("E", "tail-overrun", 0)))
    assert(out == s"${G}tail$R${C}E$R")
  }

  test("IOBES: tagged 3-field lines green, 2-field lines plain") {
    val out = PrettyPrint.pageIobes("The O\nParis B-LOC I\nis O")
    assert(out == s"The O\n${G}Paris B-LOC I$R\nis O")
  }
}
