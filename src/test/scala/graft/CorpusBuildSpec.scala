package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusBuild
import graft.sources.SnapshotStore

/** End-to-end corpus build (VERDICT r05 #6): stage composition invariants
  * and the kill-after-stage resume discipline (same as
  * EntityResolutionSpec's). Value-level correctness of the composition is
  * the q69 oracle's job; this spec pins the PIPELINE properties — commit
  * protocol, resume identity, and cross-stage consistency. */
class CorpusBuildSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"
  private val stages =
    Seq("gated", "fingerprints", "canonical", "survivors", "packed", "mixture")

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def packedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)

  test("manifest commit is atomic: a tmp-only manifest reads as uncommitted (r07)") {
    // VERDICT r06 #4: the commit protocol's contract is "manifest written
    // LAST, appears atomically". Simulate the torn-commit window the old
    // create-then-write path could leave (kill between create and close):
    // data files complete, final manifest absent, only a TRUNCATED tmp.
    val root = tmpDir("atomic_manifest")
    val store = new SnapshotStore(spark, root)
    var computes = 0
    def frame = { computes += 1; spark.range(5).toDF("id") }
    store.getOrCreate("s")(frame)
    assert(computes == 1 && store.exists("s"))
    val stageDir = java.nio.file.Paths.get(root, "s")
    Files.delete(stageDir.resolve("_MANIFEST.json"))
    Files.writeString(stageDir.resolve("_MANIFEST.json.tmp"), """{"stage":"s","ro""")
    assert(!store.exists("s"), "a tmp-only manifest must read as uncommitted")
    val replayed = store.getOrCreate("s")(frame)
    assert(computes == 2, "the stage must recompute after a torn commit")
    assert(replayed.count() == 5)
    assert(store.manifest("s").exists(m => m.startsWith("{") && m.endsWith("}")),
      "the recommitted manifest must be complete JSON")
  }

  test("full run commits every stage; output respects the stage contracts") {
    val out = tmpDir("corpus-build-")
    val store = new SnapshotStore(spark, out)
    val docs = spark.read.parquet(docsPath)
    val packed = CorpusBuild.run(spark, store, docs)
    stages.foreach(s => assert(store.exists(s), s"stage $s not committed"))

    val rows = packedRows(packed)
    assert(rows.nonEmpty)
    val ids = rows.map(_._1).toSet
    // survivors ⊆ gated keeps, never the eval slice
    assert(rows.forall(_._1 % 97 != 0), "an eval-slice doc reached the corpus")
    val gatedIds = store.read("gated").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(gatedIds), "a packed doc never passed the gate")
    // canonical drops are really gone: every cluster contributes ≤1 doc
    val keeps = store.read("canonical").where("keep = 1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keeps), "a packed doc was not its cluster's canonical")
    // pack tiling: per shard, start_tok is the exact running sum and the
    // straddle flag matches the boundary arithmetic
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._1).foreach { case (_, _, n, start, pack, straddle) =>
        assert(start == cum, "start_tok is not the shard running sum")
        assert(pack == start / 2048)
        assert(straddle == (if ((start + n - 1) / 2048 != start / 2048) 1L else 0L))
        cum += n
      }
    }
    // mixture is committed over the FINAL corpus: token totals agree
    val mixTokens = store.read("mixture").selectExpr("sum(tokens)").head().getLong(0)
    assert(mixTokens == rows.map(_._3).sum,
      "mixture token total diverges from the packed corpus")
  }

  test("output is invariant to input partitioning") {
    // every stage is either map-side, keyed, or a key-partitioned window
    // ordered by doc_id — so how the input happens to be split must not
    // show through (at scale the corpus arrives at whatever partitioning
    // the upstream writer chose)
    val docs = spark.read.parquet(docsPath)
    val a = packedRows(CorpusBuild.run(
      spark, new SnapshotStore(spark, tmpDir("corpus-p7-")), docs.repartition(7)))
    val b = packedRows(CorpusBuild.run(
      spark, new SnapshotStore(spark, tmpDir("corpus-p3-")), docs.repartition(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("resume: a kill after any stage replays committed work identically") {
    val out = tmpDir("corpus-resume-")
    val store = new SnapshotStore(spark, out)
    val docs = spark.read.parquet(docsPath)
    val first = packedRows(CorpusBuild.run(spark, store, docs))

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // simulate a kill after 'canonical': later snapshots vanish, earlier
    // ones must replay byte-identically (their manifests untouched)
    val manifestBefore = store.manifest("fingerprints").get
    Seq("survivors", "packed", "mixture").foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(out, s), true)
    }
    val second = packedRows(CorpusBuild.run(spark, store, docs))
    assert(first.toSeq == second.toSeq)
    assert(store.manifest("fingerprints").get == manifestBefore,
      "a committed upstream stage was recomputed on resume")
    // manifests carry counters + per-partition lineage rows
    val m = store.manifest("packed").get
    assert(m.contains("\"rows\":") && m.contains("\"partitions\":"))
  }
}
