package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Candidate-prior construction
  * (/root/reference/src/scripts/create_entity_prior.py, SURVEY §3.3):
  * three grouped counts over (surface, entity) unioned and re-summed —
  * pass 1 anchors on a train split, pass 2 each entity's own text, pass 3
  * distinct preredirect surfaces. Two shuffles total; the reference's
  * O(n)-per-row list-membership train filter (create_entity_prior.py:43)
  * becomes a pure hash-threshold predicate — no sort, no rank broadcast.
  */
object EntityPrior {

  /** Appends a dense 0/1-based rank column by GLOBAL order WITHOUT a
    * single-partition window: range-repartition on the sort key, sort
    * within partitions, then zipWithIndex (per-partition offsets from one
    * lightweight count job). Rank values depend only on the total order,
    * not on where partition boundaries land. */
  private def rankBySortedOrder(
      df: DataFrame, sortCols: Seq[Column], outName: String, start: Long): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outFields = df.schema.fields :+ StructField(outName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + start))
    }
    spark.createDataFrame(rdd, StructType(outFields))
  }

  /** O4 deterministic permutation: the reference shuffles page ids with a
    * process-local RNG and pickles the order
    * (/root/reference/src/scripts/create_page_id_order.py:26-41); the
    * engine's replacement ranks the (xxhash64(page_id, seed), page_id)
    * total order — stable across runs and cluster sizes, computed with
    * range partitioning + local sorts (no global single-task sort).
    * Returns (page_id, rank) with rank in [1, n]. */
  def pageIdOrder(pages: DataFrame, pageIdCol: String, seed: Long): DataFrame =
    rankBySortedOrder(
      pages.select(col(pageIdCol).as("page_id")).distinct()
        .withColumn("h", xxhash64(col("page_id"), lit(seed))),
      Seq(col("h"), col("page_id")), "rank", 1L)
      .select("page_id", "rank")

  /** F8 train membership as a pure hash threshold: a page is train iff its
    * seeded 53-bit hash fraction < trainFraction. Same determinism as the
    * pickled permutation prefix, but zero extra shuffle, zero broadcast,
    * O(1) per row — the train SHARE is trainFraction in expectation rather
    * than an exact prefix count (documented deviation from
    * create_entity_prior.py:38-43; downstream only the split law matters). */
  def isTrainPage(pageId: Column, trainFraction: Double, seed: Long): Column =
    (shiftrightunsigned(xxhash64(pageId, lit(seed)), 11)
      .cast("double") / lit((1L << 53).toDouble)) < lit(trainFraction)

  /** A4 dense entity labels: the reference assigns `len(entity_labels)` at
    * first encounter in cursor order (create_entity_prior.py:41-42) —
    * cursor order is storage-dependent, so the engine defines the
    * deterministic total order `entity ASC` instead (documented deviation,
    * SURVEY §2.6 A4; the label *law* — dense 0..n-1, stable — is what
    * downstream EL training consumes). Input: one row per distinct entity. */
  def entityLabels(entities: DataFrame, entityCol: String = "entity"): DataFrame =
    rankBySortedOrder(
      entities.select(col(entityCol).as("entity")).distinct(),
      Seq(col("entity")), "label", 0L)

  /** F8 train filter + A3 three-pass prior.
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
    val train =
      if (trainFraction >= 1.0) mentions
      else mentions.where(isTrainPage(col("page_id"), trainFraction, seed))

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

  /** [[candidatePrior]] + A4 dense labels: (surface, entity, entity_label,
    * cnt) — the Spark-native shape of the reference's prior pickle
    * (entity_candidates_prior + entity_labels,
    * create_entity_prior.py:60-64). */
  def candidatePriorLabeled(
      spark: SparkSession,
      mentions: DataFrame,
      trainFraction: Double = 0.8,
      seed: Long = 42L): DataFrame =
    candidatePrior(spark, mentions, trainFraction, seed)
      .join(entityLabels(mentions.select("entity")), "entity")
      .select(col("surface"), col("entity"), col("label").as("entity_label"), col("cnt"))

  /** A2/J7: mention counts per entity — the decorrelated form of the
    * reference's correlated UPDATE
    * (/root/reference/src/scripts/alter_table_entities.py:30). */
  def numMentionsPerEntity(mentions: DataFrame): DataFrame =
    mentions.groupBy("entity").agg(count(lit(1)).as("num_mentions"))
}
