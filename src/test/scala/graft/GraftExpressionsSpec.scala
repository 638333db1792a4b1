package graft

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
