package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Edge

/** Iterative transitive closure via alternating large-star / small-star as
  * self-joining DataFrames (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", 2014) — the north rule's clustering stage. The
  * reference's clustering is exact-key dedup into a UNIQUE(text) table
  * (/root/reference/db/create_tables.sql:41, src/db.py:38-47); this is its
  * scale-out generalization for near-duplicate edges (SURVEY §2.7 X2).
  *
  * Scale notes: each round is two shuffles (groupBy min + join), both
  * partial-aggregatable; `localCheckpoint` per round truncates lineage so
  * plans stay O(1); AQE handles skewed high-degree stars. Converges in
  * O(log n) rounds; component ids are the component's minimum node id, so
  * output is deterministic regardless of parallelism.
  */
object ConnectedComponents {

  /** One large-star round: each node connects its LARGER neighbors to the
    * minimum of its neighborhood (incl. itself). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
    val mins = sym.groupBy("u")
      .agg(min("v").as("nmin"))
      .select(col("u"), least(col("u"), col("nmin")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star round: orient edges toward the smaller endpoint; each
    * node connects its smaller-or-equal neighbors (and itself) to the
    * neighborhood minimum. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    val relinked = oriented.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val selfEdges = mins.select(col("u").as("src"), col("m").as("dst"))
    relinked.union(selfEdges).distinct()
  }

  /** Cheap deterministic fingerprint for convergence detection: the edge
    * set is stable when (count, xor of row hashes) stops changing. XOR is
    * order-independent and cannot overflow under ANSI mode. */
  private def fingerprint(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** Component assignment for every vertex incident to `edges` plus every
    * vertex in `allVertices` (singletons map to themselves). Returns
    * DataFrame(id, comp) where comp = min id of the component. */
  def assign(
      spark: SparkSession,
      edges: Dataset[Edge],
      allVertices: DataFrame, // single column "id"
      maxIterations: Int = 30): DataFrame = {
    // non-eager checkpoints: the fingerprint action materializes the
    // round's checkpoint AND computes the convergence stats in ONE job
    // (an eager checkpoint + separate agg doubles the per-round job count,
    // which is pure scheduling latency at any scale)
    var e: DataFrame = edges.toDF()
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    var prev = (-1L, 0L)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      e = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val fp = fingerprint(e)
      converged = fp == prev
      prev = fp
      iter += 1
    }
    // converged edge set is a forest of stars (child -> root)
    val assignments = e.select(col("src").as("id"), col("dst").as("comp"))
      .union(e.select(col("dst").as("id"), col("dst").as("comp")))
      .groupBy("id").agg(min("comp").as("comp"))
    allVertices.select(col("id"))
      .join(assignments, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
