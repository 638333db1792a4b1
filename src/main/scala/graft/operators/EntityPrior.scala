package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-prior construction
  * (/root/reference/src/scripts/create_entity_prior.py, SURVEY §3.3):
  * three grouped counts over (surface, entity) unioned and re-summed —
  * pass 1 anchors on a train split, pass 2 each entity's own text, pass 3
  * distinct preredirect surfaces. Two shuffles total; the reference's
  * O(n)-per-row list-membership train filter (create_entity_prior.py:43)
  * becomes a broadcast-join against the rank table.
  */
object EntityPrior {

  /** O4 deterministic permutation: the reference shuffles page ids with a
    * process-local RNG and pickles the order
    * (/root/reference/src/scripts/create_page_id_order.py:26-41); the
    * engine's replacement is a seeded hash rank — stable across runs and
    * cluster sizes. Returns (page_id, rank) with rank in [1, n]. */
  def pageIdOrder(pages: DataFrame, pageIdCol: String, seed: Long): DataFrame =
    pages.select(col(pageIdCol).as("page_id")).distinct()
      .withColumn("rank",
        row_number().over(Window.orderBy(
          xxhash64(col("page_id"), lit(seed)), col("page_id"))).cast("long"))

  /** F8 train filter + A3/A4 three-pass prior.
    *
    * @param mentions (page_id, mention_text, entity, preredirect) rows —
    *                 the exploded `entity_mentions_text` view (J5)
    * @param trainFraction 0.8 in the reference; 1.0 = the `_full` variant
    *                 (/root/reference/src/scripts/create_entity_prior_full.py)
    * @return (surface, entity, cnt) — the prior counts table (S12 becomes a
    *         real table instead of a pickle)
    */
  def candidatePrior(
      spark: SparkSession,
      mentions: DataFrame,
      trainFraction: Double = 0.8,
      seed: Long = 42L): DataFrame = {
    val order = pageIdOrder(mentions, "page_id", seed)
    val n = order.count()
    val cutoff = (trainFraction * n).toLong
    val train = mentions.join(
      broadcast(order.where(col("rank") <= cutoff).select("page_id")), "page_id")

    // pass 1: anchor-text surfaces over train pages (create_entity_prior.py:40-45)
    val p1 = train.groupBy(col("mention_text").as("surface"), col("entity"))
      .agg(count(lit(1)).as("cnt"))
    // pass 2: each entity's own text as a surface, once (:47-52)
    val p2 = mentions.select(col("entity")).distinct()
      .select(col("entity").as("surface"), col("entity"), lit(1L).as("cnt"))
    // pass 3: distinct preredirect surfaces, once per (preredirect, entity) (:54-59)
    val p3 = mentions.select(col("preredirect"), col("entity")).distinct()
      .select(col("preredirect").as("surface"), col("entity"), lit(1L).as("cnt"))

    p1.unionByName(p2).unionByName(p3)
      .groupBy("surface", "entity")
      .agg(sum("cnt").cast("long").as("cnt"))
  }

  /** A2/J7: mention counts per entity — the decorrelated form of the
    * reference's correlated UPDATE
    * (/root/reference/src/scripts/alter_table_entities.py:30). */
  def numMentionsPerEntity(mentions: DataFrame): DataFrame =
    mentions.groupBy("entity").agg(count(lit(1)).as("num_mentions"))
}
