package graft.tools

import graft.model.Mention

/** Terminal pretty-printers — the reference's debug display helpers
  * (/root/reference/src/pretty_printers.py:6-24 via
  * src/scripts/print_page.py), completing the last piece of its surface.
  * Pure String => String (ANSI escapes), so they are unit-testable and
  * usable from any driver; `graft.Main print` wires them to the engine's
  * extraction output.
  */
object PrettyPrint {
  private val Green = "\u001b[32m"
  private val CyanUnderline = "\u001b[4;36m"
  private val Reset = "\u001b[0m"

  /** pretty_printers.page_iobes:6-13 — IOBES lines, with tagged (3-field)
    * chunks rendered green and plain (2-field) ones untouched. */
  def pageIobes(iobesText: String): String =
    iobesText.split("\n", -1).map { line =>
      if (line.trim.nonEmpty && line.trim.split("\\s+").length == 3)
        Green + line + Reset
      else line
    }.mkString("\n")

  /** pretty_printers.page_contents_with_mentions:16-24 — each mention's
    * surface text highlighted green with its entity appended
    * cyan-underlined. Mentions are offset-sorted and applied in REVERSE
    * order (utils.sort_mentions:10-11 + the reversed loop), so original
    * offsets stay valid as the string grows — same trick as the
    * reference. Assumes the non-overlapping mention set the pipeline's
    * W2 suppression guarantees. */
  def pageContentsWithMentions(content: String, mentions: Seq[Mention]): String =
    mentions.sortBy(_.offset).reverse.foldLeft(content) { (acc, m) =>
      val start = m.offset
      val end = math.min(m.offset + m.text.length, content.length)
      acc.substring(0, start) + Green + content.substring(start, end) + Reset +
        CyanUnderline + m.entity + Reset + acc.substring(end)
    }
}
