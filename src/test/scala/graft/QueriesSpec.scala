package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-runs every catalog query at sf0.001 (schema + execution sanity;
  * value correctness is the driver's DuckDB oracle at sf0.01). */
class QueriesSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and yields a well-formed result") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty at any sf
      if (!Set("q06_anti_join", "q25_ngram_jaccard").contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(Queries.oracles.keySet.subsetOf(Queries.all.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
