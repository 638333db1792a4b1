package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowed-fingerprint passage dedup primitives — ONE code path shared by
  * the catalog queries (q59/q60/q63/q67 via Queries.winnowedFps /
  * cappedDupPairs) and the end-to-end [[graft.pipeline.CorpusBuild]], so
  * the join economics PlanGuardSpec pins on q59 hold everywhere the
  * derivation runs.
  *
  * Shapes (the exact-substring dedup family, Lee et al. 2022):
  *  - skim: one codegen'd pass per document through the native
  *    `graft_rolling_fp` expression emitting only the 1/64 winnowed
  *    8-gram fingerprints — never the 64× gram explode (the measured
  *    pushdown pessimization, see the expression's Scaladoc).
  *  - cappedPairs: per-fingerprint doc count capped to [2, 50] (the
  *    stop-fingerprint rule — boilerplate fingerprints never join), pair
  *    join blocked BY FINGERPRINT (≤C(50,2) pairs per block, never
  *    doc×doc), pairs kept at ≥2 shared fingerprints.
  */
object FingerprintDedup {

  /** Winnowed (doc_id, h) fingerprint skim of a (doc_id, text, …) frame.
    * At 100 TB this is the "fingerprint index" a dedup pipeline persists
    * once and reuses across audits — CorpusBuild snapshots it;
    * the catalog memoizes a localCheckpoint per session. */
  def skim(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(expr("graft_rolling_fp(substring(text, 1, 512))")).as("h"))
      .select("doc_id", "h").distinct()

  /** Capped duplicated-passage pair set over a fingerprint skim:
    * (src, dst, sfp) with src < dst and sfp = shared fingerprints ≥
    * `minShared`. */
  def cappedPairs(
      fps: DataFrame,
      minBlock: Int = 2, maxBlock: Int = 50, minShared: Int = 2): DataFrame = {
    val hcnt = fps.groupBy("h").agg(count(lit(1)).as("nd"))
      .where(col("nd").between(minBlock, maxBlock))
      .select("h")
    val blocked = fps.join(hcnt, "h")
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .agg(count(lit(1)).as("sfp"))
      .where(col("sfp") >= minShared)
  }
}
