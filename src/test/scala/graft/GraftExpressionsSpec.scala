package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Similarity, TextFunctions}

/** Native expressions: SQL-land results must equal the scalar functions,
  * and the plan must stay inside whole-stage codegen. */
class GraftExpressionsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("graft_ascii_fold equals TextFunctions.asciiFold") {
    import spark.implicits._
    val inputs = Seq("Wêreldé", "Straße", "plain", "Suid-Afrika ü")
    val viaSql = inputs.toDF("s")
      .selectExpr("graft_ascii_fold(s)").as[String].collect().toSeq
    assert(viaSql == inputs.map(TextFunctions.asciiFold))
  }

  test("graft_escape_title equals TextFunctions.escapeTitle") {
    import spark.implicits._
    val inputs = Seq("List of countries", "a+b&c=d", "2002–03 NHL season")
    val viaSql = inputs.toDF("s")
      .selectExpr("graft_escape_title(s)").as[String].collect().toSeq
    assert(viaSql == inputs.map(TextFunctions.escapeTitle))
  }

  test("graft_jaro_winkler equals Similarity.jaroWinkler and handles nulls") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("src1", "src2"))
    val viaSql = pairs.toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b)").as[Double].collect().toSeq
    assert(viaSql == pairs.map { case (a, b) => Similarity.jaroWinkler(a, b) })
    val withNull = spark.sql("SELECT graft_jaro_winkler(NULL, 'x')").collect()
    assert(withNull.head.isNullAt(0))
  }

  test("graft_rolling_fp equals the exploded rollHash SQL formula") {
    import spark.implicits._
    // strings exercising: shorter than one gram, exactly one gram,
    // repeated content (duplicate fingerprints), multi-byte chars, and a
    // long pseudo-random body (deterministic — no wall-clock RNG)
    val inputs = Seq(
      "short", "exactly8", "aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "héllo wörld héllo wörld héllo wörld",
      (1 to 600).map(i => ('a' + (i * 7919 % 26)).toChar).mkString)
    val df = inputs.toDF("text").select(
      substring($"text", 1, 512).as("s"))
    val native = df
      .selectExpr("graft_rolling_fp(s) AS fps")
      .as[Seq[Long]].collect().toSeq
    // the oracle-shaped pipeline: explode positions, cut the gram, hash
    // it with the exact rollHashSql arithmetic (mirrored inline here)
    val rollHashSql = (2 to 8).foldLeft(
      "CAST(ascii(substring(g,1,1)) AS BIGINT)") { (acc, i) =>
      s"(($acc * 257 + ascii(substring(g,$i,1))) % 2147483647)"
    }
    val exploded = df
      .withColumn("idx", monotonically_increasing_id())
      .select($"idx",
        explode(
          when(length($"s") >= 8, expr("sequence(1, length(s) - 7)"))
            .otherwise(array().cast("array<int>"))).as("i"),
        $"s")
      .select($"idx", $"i", expr("substring(s, i, 8)").as("g"))
      .select($"idx", $"i", expr(rollHashSql).as("h"))
      .where($"h" % 64 === 0)
      .orderBy("idx", "i")
      .select("idx", "h")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    inputs.indices.foreach { i =>
      assert(native(i) == exploded.getOrElse(i.toLong, Seq.empty),
        s"mismatch for input $i")
    }
  }

  test("graft_charclass_counts equals the regex gate battery (r07)") {
    import spark.implicits._
    // edge inputs: ellipsis runs (overlap semantics: '....' is ONE match,
    // '......' is two), unicode (multi-byte chars must not perturb ASCII
    // counts), braces, case-folded 'JavaScript', digit-heavy, empty
    val inputs = Seq(
      "plain text with... some...... dots....",
      "héllo wörld — ümlaut ALPHA 123 {code}",
      "No JAVASCRIPT here? JavaScripT!",
      "0123456789 and ...", "...", "....", "..", "",
      "ja vascript javascrip javascriptX",
      (1 to 300).map(i => ('0' + i % 75).toChar).mkString)
    val df = inputs.toDF("text")
    val viaExpr = df.selectExpr("graft_charclass_counts(text) AS cc")
      .selectExpr("cc.ellipsis_ct", "cc.upper_ct", "cc.alpha_ct",
        "cc.digit_ct", "cc.has_brace", "cc.has_js")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val viaRegex = df.selectExpr(
      "CAST((length(text) - length(regexp_replace(text, '\\\\.\\\\.\\\\.', ''))) div 3 AS BIGINT)",
      "CAST(length(regexp_replace(text, '[^A-Z]', '')) AS BIGINT)",
      "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS BIGINT)",
      "CAST(length(regexp_replace(text, '[^0-9]', '')) AS BIGINT)",
      "CAST(CASE WHEN contains(text, '{') OR contains(text, '}') THEN 1 ELSE 0 END AS BIGINT)",
      "CAST(CASE WHEN contains(lower(text), 'javascript') THEN 1 ELSE 0 END AS BIGINT)")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(viaExpr == viaRegex)
  }

  test("expressions stay inside WholeStageCodegen") {
    // a LocalTableScan short-circuits codegen, so drive through range()
    val plan = spark.range(10)
      .selectExpr("graft_ascii_fold(cast(id AS string)) AS f",
        "graft_jaro_winkler(cast(id AS string), 'x') AS j")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    // and produce correct values through the codegen path
    val rows = spark.range(2)
      .selectExpr("graft_ascii_fold(concat('é', id))").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("e0", "e1"))
  }
}
