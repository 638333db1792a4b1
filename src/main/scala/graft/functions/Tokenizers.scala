package graft.functions

import scala.util.matching.Regex

/** Deterministic sentence segmentation + word tokenization.
  *
  * The reference uses NLTK's pretrained punkt model and a customized
  * Treebank tokenizer (/root/reference/src/parsers.py:9-39). Punkt is a
  * trained statistical model; our engine replaces it with a deterministic
  * rule set (SURVEY §2.3 P12: "port punkt-equivalent rule set") whose
  * behavior is pinned by the reference's IOBES goldens
  * (test/fixtures/parade_iobes.py). The Treebank rules themselves are the
  * public PTB tokenizer sed rules plus the reference's extra unicode-quote
  * and sentence-final-period rules (parsers.py:11-20).
  */
object Tokenizers {

  // ------------------------------------------------------------ sentences

  private val Closers = "\\])}>\"'»”’"

  /** Punkt-equivalent deterministic splitter: break after [.!?] (plus any
    * closing quotes/brackets) followed by whitespace, unless the token
    * before the period is a single-letter initial ("W. Goscombe"). Like
    * punkt's default for unknown non-abbreviation types, a period breaks
    * even before a lowercase continuation (pinned by the straddling-mention
    * golden, iobes_test.py:53-64). */
  def sentences(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var j = i + 1
        while (j < n && Closers.indexOf(text.charAt(j)) >= 0) j += 1
        var k = j
        while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
        val hasGap = k > j
        if (k >= n) {
          i = n // trailing sentence handled after loop
        } else if (hasGap && isBoundary(text, i, text.charAt(k))) {
          out += text.substring(start, j).trim
          start = k
          i = k
        } else i += 1
      } else i += 1
    }
    if (start < n) {
      val last = text.substring(start).trim
      if (last.nonEmpty) out += last
    }
    out.result()
  }

  /** Boundary heuristics at a period position `p` with next sentence
    * starting at char `next`. */
  private def isBoundary(text: String, p: Int, next: Char): Boolean = {
    // single uppercase letter before the period = initial, no break
    var w = p - 1
    while (w >= 0 && Character.isLetter(text.charAt(w))) w -= 1
    val wordLen = p - 1 - w
    val isInitial = wordLen == 1 && Character.isUpperCase(text.charAt(p - 1))
    !isInitial
  }

  // ---------------------------------------------------------- word tokens

  private final case class Rule(re: Regex, repl: String)

  // STARTING_QUOTES with the reference's customizations at the head
  // (parsers.py:17-19): ('')-as-open-quote, unicode open quotes.
  private val startingQuotes = Seq(
    Rule("('')".r, " $1 "),
    Rule("([«“‘„]|[`]+)".r, " $1 "),
    Rule("^\"".r, "`` "),
    Rule("(``)".r, " $1 "),
    Rule("([ \\(\\[{<])(\"|'{2})".r, "$1 `` "))

  // PUNCTUATION with the reference's improved sentence-final-period rule
  // first (parsers.py:15,20) then the public PTB rules.
  private val punctuation = Seq(
    Rule(("([^\\.])(\\.)([\\]\\)}>\"'»”’ ]*)\\s*$").r, "$1 $2 $3 "),
    Rule("([:,])([^\\d])".r, " $1 $2"),
    Rule("([:,])$".r, " $1 "),
    Rule("\\.\\.\\.".r, " ... "),
    Rule("[;@#$%&]".r, " $0 "),
    Rule("([^\\.])(\\.)([\\]\\)}>\"']*)\\s*$".r, "$1 $2$3 "),
    Rule("[?!]".r, " $0 "),
    Rule("([^'])' ".r, "$1 ' "))

  private val parensBrackets = Seq(Rule("[\\]\\[\\(\\)\\{\\}<>]".r, " $0 "))
  private val doubleDashes = Seq(Rule("--".r, " -- "))

  // ENDING_QUOTES with the reference's customizations at the head.
  private val endingQuotes = Seq(
    Rule("('')".r, " $1 "),
    Rule("([»”’])".r, " $1 "),
    Rule("\"".r, " '' "),
    Rule("(\\S)('')".r, "$1 $2 "),
    Rule("([^' ])('[sS]|'[mM]|'[dD]|') ".r, "$1 $2 "),
    Rule("([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ".r, "$1 $2 "))

  private val contractions = Seq(
    "(?i)\\b(can)(not)\\b", "(?i)\\b(d)('ye)\\b", "(?i)\\b(gim)(me)\\b",
    "(?i)\\b(gon)(na)\\b", "(?i)\\b(got)(ta)\\b", "(?i)\\b(lem)(me)\\b",
    "(?i)\\b(mor)('n)\\b", "(?i)\\b(wan)(na) ",
    "(?i) ('t)(is)\\b", "(?i) ('t)(was)\\b")
    .map(p => Rule(p.r, " $1 $2 "))

  private def applyRules(text: String, rules: Seq[Rule]): String =
    rules.foldLeft(text) { (t, r) => r.re.replaceAllIn(t, r.repl) }

  /** Treebank-style tokenization of one sentence (parsers.py semantics,
    * before hyphen splitting). */
  def treebankTokens(sentence: String): Vector[String] = {
    var t = sentence
    t = applyRules(t, startingQuotes)
    t = applyRules(t, punctuation)
    t = applyRules(t, parensBrackets)
    t = applyRules(t, doubleDashes)
    t = " " + t + " "
    t = applyRules(t, endingQuotes)
    t = applyRules(t, contractions)
    t.split("\\s+").filter(_.nonEmpty).toVector
  }

  /** Split a token on '-' keeping the hyphens as tokens
    * (parsers.py:30-35): "Suid-Afrika" -> ["Suid","-","Afrika"]. */
  def splitTokenOnHyphen(token: String): Vector[String] = {
    val parts = token.split("-", -1)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out += parts(i)
      if (i < parts.length - 1) out += "-"
      i += 1
    }
    out.result()
  }

  /** parse_for_tokens (parsers.py:37-38). */
  def parseForTokens(sentence: String): Vector[String] =
    treebankTokens(sentence).flatMap(splitTokenOnHyphen)

  /** parse_text_for_tokens (parsers.py:40-42): re-segment then tokenize. */
  def parseTextForTokens(text: String): Vector[String] =
    sentences(text).flatMap(parseForTokens)
}
