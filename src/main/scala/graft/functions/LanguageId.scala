package graft.functions

/** Language identification by stopword-profile scoring — the deterministic,
  * oracle-expressible classifier a training-data pipeline needs for the
  * `lang` column (the reference stores language-partitioned dumps; webtext
  * pipelines filter on detected language before training).
  *
  * Method: lowercase, split on non-letter runs, count tokens hitting each
  * language's closed stopword profile (duplicates count — these are
  * function words, frequency IS the signal), argmax with a fixed
  * profile-order tiebreak. Pure Column algebra — codegen'd, shuffle-free —
  * and fully mirrored in the DuckDB oracle (catalog q20): both engines'
  * expressions are GENERATED from [[Profiles]], so they cannot drift.
  *
  * Profiles are the top function words of five languages (public
  * frequency-list knowledge); a production system would extend the
  * profiles, not the operator shape.
  */
object LanguageId {

  /** (lang, stopword profile). Order = argmax tiebreak (first wins). */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was",
      "for", "on", "with", "as", "are", "this", "be", "at", "by", "from"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "eine", "den", "von", "zu", "im", "auf", "sich", "des", "dem", "als", "auch"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "que",
      "pour", "qui", "pas", "sur", "avec", "son", "plus", "au", "ce", "il", "ne"),
    "es" -> Seq("el", "los", "las", "una", "es", "en", "por", "que", "del",
      "se", "con", "para", "su", "al", "como", "lo", "mas", "pero", "sus"),
    "it" -> Seq("il", "di", "che", "la", "per", "una", "sono", "non", "con",
      "del", "gli", "nel", "si", "da", "come", "le", "della", "un", "anche"))

  /** Tokenization both engines share: lowercase, split on non-letter runs
    * (Latin range incl. the fold-range accents). */
  val TokenSplitRegex = "[^a-zà-ÿ]+"

  private def scoreName(lang: String) = s"score_$lang"

  /** Spark SQL expression strings: one stopword-hit count per language
    * (cast to BIGINT) + the argmax lang column. Feed to selectExpr. */
  def sparkScoreExprs(textCol: String): Seq[String] =
    Profiles.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString(", ")
      s"CAST(size(filter(split(lower($textCol), '$TokenSplitRegex'), t -> array_contains(array($arr), t))) AS BIGINT) AS ${scoreName(lang)}"
    }

  /** Argmax CASE chain over the score columns (first profile wins ties). */
  def argmaxCase: String = {
    val langs = Profiles.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langs.drop(i + 1)
      val conds = rest.map(o => s"${scoreName(lang)} >= ${scoreName(o)}").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END AS lang_guess"
  }

  /** DuckDB mirror of [[sparkScoreExprs]]. */
  def duckScoreExprs(textCol: String): Seq[String] =
    Profiles.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(regexp_split_to_array(lower($textCol), '$TokenSplitRegex'), t -> list_contains([$arr], t))) AS BIGINT) AS ${scoreName(lang)}"
    }

  /** Scalar form for tests / typed transforms. Returns (lang, scores). */
  def detect(text: String): (String, Map[String, Int]) = {
    if (text == null) return (Profiles.head._1, Profiles.map(_._1 -> 0).toMap)
    val toks = text.toLowerCase.split(TokenSplitRegex).filter(_.nonEmpty)
    val sets = Profiles.map { case (l, ws) => (l, ws.toSet) }
    val scores = sets.map { case (l, ws) => l -> toks.count(ws.contains) }
    val best = scores.maxBy { case (_, s) => s }._2
    (scores.find(_._2 == best).get._1, scores.toMap)
  }
}
