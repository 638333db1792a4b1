package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression guard (VERDICT r02 #8): pins the at-scale physical-plan
  * properties the catalog has earned, so a future edit cannot silently
  * reintroduce a scale-killer. Inspects the compiled physical plan of every
  * catalog query (initial AQE plan — what the optimizer commits to before
  * runtime stats):
  *  - no CartesianProduct anywhere;
  *  - nested-loop joins only in the labeled brute-force baselines
  *    (q24/q26/q33 tiny-domain baselines; q28's join against a single
  *    reference row, which broadcasts one row — fine at any scale);
  *  - no single-partition Exchange (a global-window / global-repartition
  *    smell: one task does all the work);
  *  - the q04 star join keeps its broadcast dimension tables.
  */
class PlanGuardSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  /** Cross-join-shaped plans allowed: documented brute-force baselines over
    * tiny/bounded domains (q24 labeled ANN baseline, q26/q33 distinct-source
    * pair domains) and q28's single-reference-row join. */
  private val NestedLoopAllowed =
    Set("q24_embed_knn", "q26_levenshtein", "q33_jaro_winkler_expr", "q28_simhash")

  private lazy val plans: Map[String, String] =
    Queries.all.map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan.toString
    }

  test("no CartesianProduct anywhere in the catalog") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products crept in: $offenders")
  }

  test("nested-loop joins only in the labeled baselines") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") && !NestedLoopAllowed(n) => n
    }
    assert(offenders.isEmpty, s"nested-loop joins outside the baselines: $offenders")
  }

  test("no single-partition exchange in any catalog plan") {
    val offenders = plans.collect {
      case (n, p) if p.contains("Exchange SinglePartition") => n
    }
    assert(offenders.isEmpty, s"single-partition exchanges (global windows?): $offenders")
  }

  test("q04 star join broadcasts its dimension tables") {
    assert(plans("q04_star_join").contains("BroadcastHashJoin"),
      "q04's dimension joins are no longer broadcast")
  }
}
