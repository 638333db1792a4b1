package graft.operators

import graft.functions.TextFunctions.{escapeTitle, matchAll}
import graft.functions.Tokenizers

/** IOBES sequence-label export — the pure per-page core of the reference's
  * training-set generation (/root/reference/src/iobes.py:9-103, SURVEY §2.4
  * G4). Sequence-stateful within a page, so it runs as a typed per-page
  * transform (pages are the parallel unit); nothing here touches Spark.
  */
object Iobes {

  val MentionStartToken = "MENTION_START_HERE"
  val MentionEndToken = "MENTION_END_HERE"

  /** A mention span to tag: its surface text and absolute page offset. */
  final case class MentionSpan(text: String, offset: Int)

  /** /root/reference/src/iobes.py:12-22 — splice " MENTION_START_HERE " and
    * " MENTION_END_HERE " around the span. */
  def insertMentionFlags(content: String, m: MentionSpan): String = {
    require(m.offset < content.length, s"mention offset ${m.offset} out of bounds")
    val start = m.offset
    val end = start + m.text.length
    content.substring(0, start) +
      " " + MentionStartToken + " " + m.text + " " + MentionEndToken + " " +
      content.substring(math.min(end, content.length))
  }

  /** /root/reference/src/iobes.py:24-29 */
  def sentenceIsUnbalanced(sentence: String): Boolean =
    matchAll(MentionStartToken, sentence).length !=
      matchAll(MentionEndToken, sentence).length

  /** /root/reference/src/iobes.py:31-51 — greedily join sentences until
    * every mention's start/end flags balance. */
  def mergeStraddling(sentences: Seq[String]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sentences.length) {
      var s = sentences(i)
      if (sentenceIsUnbalanced(s)) {
        i += 1
        s = s + " " + sentences(i)
        while (sentenceIsUnbalanced(s)) {
          i += 1
          s = s + " " + sentences(i)
        }
        i += 1
        out += s
      } else {
        i += 1
        out += s
      }
    }
    out.result()
  }

  /** /root/reference/src/iobes.py:53-103 — flag insertion right-to-left
    * over offset-desc-sorted mentions, re-segmentation, straddle merge,
    * then the B/I/E/S/O state machine. `mentions` and `linkTitles` (and
    * `preredirects` when present) are parallel, offset-ascending — exactly
    * the reference's calling convention. Output: per sentence, per token,
    * [token, (escaped preredirect)?, escaped entity, tag] with O rows as
    * [token, "O"]. */
  def pageIobes(
      content: String,
      mentions: Seq[MentionSpan],
      linkTitles: Seq[String],
      preredirects: Option[Seq[String]] = None): Vector[Vector[Vector[String]]] = {
    val flagged = mentions.sortBy(-_.offset)
      .foldLeft(content)((c, m) => insertMentionFlags(c, m))
    val sents = mergeStraddling(Tokenizers.sentences(flagged))
    val out = Vector.newBuilder[Vector[Vector[String]]]
    var linkTitleCtr = 0
    var inAMention = false // persists across sentences, as in the reference
    sents.foreach { sentence =>
      val tokens = Tokenizers.parseTextForTokens(sentence)
      val sentenceIobes = Vector.newBuilder[Vector[String]]
      var i = 0
      while (i < tokens.length) {
        val current = tokens(i)
        val prev = if (i != 0) tokens(i - 1) else null
        val next = if (i + 1 != tokens.length) tokens(i + 1) else null
        if (current != MentionStartToken && current != MentionEndToken) {
          val tag =
            if (prev == MentionStartToken && next == MentionEndToken) "S"
            else if (prev == MentionStartToken) { inAMention = true; "B" }
            else if (next == MentionEndToken) { inAMention = false; "E" }
            else if (inAMention) "I"
            else "O"
          if (tag == "O") sentenceIobes += Vector(current, tag)
          else {
            preredirects match {
              case Some(pre) =>
                sentenceIobes += Vector(current,
                  escapeTitle(pre(linkTitleCtr)),
                  escapeTitle(linkTitles(linkTitleCtr)), tag)
              case None =>
                sentenceIobes += Vector(current,
                  escapeTitle(linkTitles(linkTitleCtr)), tag)
            }
            if (tag == "S" || tag == "E") linkTitleCtr += 1
          }
        }
        i += 1
      }
      out += sentenceIobes.result()
    }
    out.result()
  }

  /** File-content formatting (/root/reference/src/iobes.py:105-115), kept
    * as a (title, text) row instead of a file-per-page (SURVEY §2.1 S10).
    */
  def formatPageIobes(title: String, pageIobes: Seq[Seq[Seq[String]]]): String =
    title + "\n" + pageIobes
      .map(_.map(_.mkString(" ")).mkString("\n"))
      .mkString("\n\n")

  /** The merge sink separator (/root/reference/src/scripts/merge.py:9). */
  val MergeSeparator = "\n----------.----------\n"
}
