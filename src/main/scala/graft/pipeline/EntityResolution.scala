package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HtmlExtract
import graft.model.{Edge, LabeledPair, WebPage}
import graft.operators.{Blocking, ConnectedComponents, PairScoring}
import graft.operators.Blocking.ExtractedDoc
import graft.sources.{SnapshotStore, WebPagesGen}

/** The end-to-end record-linkage pipeline (north rule):
  *
  *   webpages → extract (byte-identical text per url) → features
  *   (normalize + TF-IDF + MinHash) → blocking keys → candidate pairs
  *   (stop-block cap + salted repartition) → batched pairwise scoring →
  *   duplicate edges → large-star/small-star transitive clustering →
  *   cluster assignments + pairwise-F1 vs labeled pairs.
  *
  * Every stage commits a SnapshotStore snapshot (per-partition lineage rows
  * + counters) and is resumable: rerunning with the same outDir replays
  * committed stages and recomputes only uncommitted ones.
  */
object EntityResolution {

  final case class F1Report(
      tp: Long, fp: Long, fn: Long,
      precision: Double, recall: Double, f1: Double)

  /** Extraction stage: recompute text from html (the invariant surface) and
    * keep (id, url, title, text, lang). Map-only; no shuffle. */
  def extract(spark: SparkSession, pages: Dataset[WebPage]): Dataset[ExtractedDoc] = {
    import spark.implicits._
    pages.map { p =>
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      ExtractedDoc(
        id = Blocking.docId(p.url),
        url = p.url,
        title = HtmlExtract.extractTitle(html),
        text = HtmlExtract.extractText(html),
        lang = p.lang)
    }
  }

  /** Run all stages against an existing webpages table. Returns the cluster
    * assignment table (url, id, cluster). */
  def resolve(spark: SparkSession, store: SnapshotStore, pages: Dataset[WebPage]): DataFrame = {
    import spark.implicits._
    val extracted = store.getOrCreate("extracted")(extract(spark, pages).toDF())
      .as[ExtractedDoc]
    val feats = store.getOrCreate("features")(
      Blocking.features(spark, extracted).toDF())
      .as[Blocking.DocFeatures]
    val blocks = store.getOrCreate("blocks")(
      Blocking.blockEntries(spark, feats).toDF())
      .as[Blocking.BlockEntry]
    // the hot-block counter is forced AFTER the pairs snapshot commit so the
    // cached block histogram serves both the pair join and the counter; the
    // histogram is then released deterministically (blocking unpersist) in
    // the finally — no storage block outlives the stage regardless of
    // which path (fresh run / resume / failure) executes
    var gen: Option[Blocking.CandidatePairGen] = None
    val pairs =
      try {
        val committed = store.getOrCreate("pairs") {
          val g = Blocking.candidatePairs(spark, blocks)
          gen = Some(g)
          g.pairs.toDF()
        }.as[Blocking.CandidatePair]
        gen.map(_.hotBlocks()).filter(_ > 0).foreach(n =>
          System.err.println(s"[graft] dropped $n hot blocks over cap"))
        committed
      } finally gen.foreach(_.release())
    val scored = store.getOrCreate("scored")(
      PairScoring.score(spark, pairs, feats).toDF())
    val edges = scored.where(col("isDuplicate"))
      .select(col("src"), col("dst")).as[Edge]
    // assignManaged: the snapshot commit below is the single
    // materialization (SnapshotStore writes its own parquet table), so
    // assign()'s internal decoupling roundtrip would be a redundant
    // second write; the checkpoint is released once the commit returns
    var relCC: () => Unit = () => ()
    val assignments =
      try store.getOrCreate("clusters") {
        val vertices = feats.select(col("id"))
        // scored-pair edges are unique (src,dst) by construction
        val (assigned, rel) = ConnectedComponents.assignManaged(
          spark, edges, vertices, dedupEdges = false)
        relCC = rel
        feats.select(col("id"), col("url"))
          .join(assigned, "id")
          .select(col("url"), col("id"), col("comp").as("cluster"))
      } finally relCC()
    assignments
  }

  /** Pairwise F1 of predicted same-cluster vs labeled pairs (the metric in
    * BASELINE.json): a labeled pair is predicted duplicate iff both urls
    * land in the same cluster. */
  def pairwiseF1(
      spark: SparkSession,
      assignments: DataFrame,
      labeled: Dataset[LabeledPair]): F1Report = {
    val a = assignments.select(col("url").as("url_a"), col("cluster").as("cluster_a"))
    val b = assignments.select(col("url").as("url_b"), col("cluster").as("cluster_b"))
    val joined = labeled.toDF().join(a, "url_a").join(b, "url_b")
      .withColumn("predicted", col("cluster_a") === col("cluster_b"))
    val counts = joined.agg(
      sum(when(col("predicted") && col("is_duplicate"), 1).otherwise(0)).as("tp"),
      sum(when(col("predicted") && !col("is_duplicate"), 1).otherwise(0)).as("fp"),
      sum(when(!col("predicted") && col("is_duplicate"), 1).otherwise(0)).as("fn"))
      .head()
    val tp = counts.getLong(0); val fp = counts.getLong(1); val fn = counts.getLong(2)
    val precision = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f1 =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
    F1Report(tp, fp, fn, precision, recall, f1)
  }

  /** One store-free pipeline pass over a freshly generated corpus (JIT
    * warmup / probe unit): returns (docs clustered, seconds). */
  def runOnce(spark: SparkSession, nClusters: Long): (Long, Double) = {
    import spark.implicits._
    runOnPages(spark, WebPagesGen.webpages(spark, nClusters))
  }

  /** One pipeline pass over an EXISTING webpages table — the north rule's
    * unit of work (read table → extract → features → block → pair → score →
    * cluster) and the scaling-bench measurement unit: corpus generation is
    * benchmark scaffolding, not pipeline work, so it happens once outside
    * the timed region. Returns (docs clustered, seconds). */
  /** @param staticPlan the session runs this pipeline with AQE disabled
    *   and the corpus is known broadcast-sized: declare the one decision
    *   AQE was making (broadcast the block-histogram eligibility join)
    *   explicitly. Without the hint an AQE-off session falls back to
    *   shuffling every block entry through a sort-merge join.
    * @param lean specialized memory flags: Kryo-serialized caches, no
    *   histogram persist, no defensive edge dedup. Measured faster at
    *   every core count than the defaults (BENCH.md "fast-flags
    *   variant"); default false. NOTE the shipped scaling artifact
    *   measures `staticPlan = true` with AQE off — the static-plan
    *   configuration, labeled as such in its `er_config` field — not
    *   these API defaults. */
  def runOnTable(
      spark: SparkSession, path: String, staticPlan: Boolean = false,
      lean: Boolean = false): (Long, Double) = {
    import spark.implicits._
    runOnPages(spark, spark.read.parquet(path).as[WebPage], staticPlan, lean)
  }

  private def runOnPages(
      spark: SparkSession, pages: Dataset[WebPage],
      staticPlan: Boolean = false, lean: Boolean = false): (Long, Double) = {
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    val t0 = System.nanoTime()
    // Library-default configuration unless the caller opts into the
    // specialized flags (see runOnTable scaladoc + BENCH.md "fast-flags
    // variant"). The shipped scaling artifact opts into staticPlan
    // (AQE off + declared broadcast) and says so in er_config.
    val level =
      if (lean) StorageLevel.MEMORY_AND_DISK_SER else StorageLevel.MEMORY_AND_DISK
    val extracted = extract(spark, pages).persist(level)
    val feats = Blocking.features(spark, extracted).persist(level)
    val blocks = Blocking.blockEntries(spark, feats)
    val gen = Blocking.candidatePairs(spark, blocks, persistSizes = !lean,
      broadcastSizes = staticPlan)
    var relCC: () => Unit = () => ()
    val docs =
      try {
        val scored = PairScoring.score(spark, gen.pairs, feats)
        val edges = scored.where(col("isDuplicate"))
          .select(col("src"), col("dst")).as[Edge]
        // managed variant: the count below is the single materialization,
        // so the parquet decoupling roundtrip of assign() buys nothing —
        // the checkpoint is released in the finally instead
        val (assigned, rel) = ConnectedComponents.assignManaged(
          spark, edges, feats.select(col("id")), dedupEdges = !lean)
        relCC = rel
        assigned.count()
      } finally {
        // deterministic, BLOCKING cleanup: a repeated-pass session must end
        // each pass with zero surviving storage blocks (asserted in
        // EntityResolutionSpec) — cleanup coupled to GC or to an optional
        // counter thunk is exactly the leak shape of degrading bench passes
        relCC()
        gen.release()
        feats.unpersist(blocking = true)
        extracted.unpersist(blocking = true)
      }
    (docs, (System.nanoTime() - t0) / 1e9)
  }

  /** Generate the corpus, run the pipeline, evaluate F1, return a one-line
    * JSON report. `nClusters` clusters ≈ 2.05 docs each. */
  def runAndReport(spark: SparkSession, outDir: String, nClusters: Long): String = {
    import spark.implicits._
    val store = new SnapshotStore(spark, outDir)
    val t0 = System.nanoTime()
    val pages = store.getOrCreate("webpages")(
      WebPagesGen.webpages(spark, nClusters).toDF()).as[WebPage]
    val labeled = store.getOrCreate("labeled_pairs")(
      WebPagesGen.labeledPairs(spark, nClusters).toDF()).as[LabeledPair]
    val assignments = resolve(spark, store, pages)
    val nDocs = assignments.count()
    val report = pairwiseF1(spark, assignments, labeled)
    val elapsed = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nDocs / elapsed
    f"""{"docs":$nDocs,"clusters":$nClusters,"tp":${report.tp},"fp":${report.fp},"fn":${report.fn},""" +
      f""""precision":${report.precision}%.6f,"recall":${report.recall}%.6f,"f1":${report.f1}%.6f,""" +
      f""""elapsedSec":$elapsed%.3f,"docsPerSec":$docsPerSec%.1f}"""
  }
}
