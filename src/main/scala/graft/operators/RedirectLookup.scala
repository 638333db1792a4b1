package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1/P10/P11: the redirects lookup as a DISTRIBUTED operator.
  *
  * The reference builds a driver-side dict from
  * `page INNER JOIN redirect ON rd_from = page_id WHERE page_namespace = 0`
  * with `_`→space on both titles and BOTH first-letter capitalizations
  * inserted as keys (/root/reference/src/lookups.py:24-34). At web scale
  * that dict is a table; this operator builds it as one equi join + a key
  * explosion + a per-key dedup window — every stage partition-parallel.
  */
object RedirectLookup {

  private def upperFirstCol(c: Column): Column =
    concat(upper(substring(c, 1, 1)), c.substr(lit(2), length(c)))
  private def lowerFirstCol(c: Column): Column =
    concat(lower(substring(c, 1, 1)), c.substr(lit(2), length(c)))

  /** Build the lookup table (from_key, to_page).
    *
    * @param pages     (page_id, page_title, page_namespace) rows
    * @param redirects (rd_from, rd_title) rows
    *
    * Key-collision semantics: the reference dict is last-writer-wins in
    * cursor order (storage-dependent). The engine resolves
    * deterministically instead: a case-EXACT key (the title's own
    * capitalization) beats a case-flipped one, remaining ties take the
    * smallest target (documented deviation; collisions only arise when two
    * pages differ solely in first-letter case). */
  def build(pages: DataFrame, redirects: DataFrame): DataFrame = {
    val joined = pages
      .where(col("page_namespace") === 0) // F4, lookups.py:24
      .join(redirects, col("rd_from") === col("page_id")) // J1
      .select(
        regexp_replace(col("page_title"), "_", " ").as("from_page"), // P11
        regexp_replace(col("rd_title"), "_", " ").as("to_page"))
    // P10: both capitalizations become keys (lookups.py:32-33)
    val keys = joined
      .select(upperFirstCol(col("from_page")).as("from_key"), col("from_page"), col("to_page"))
      .unionByName(joined
        .select(lowerFirstCol(col("from_page")).as("from_key"), col("from_page"), col("to_page")))
      .withColumn("prio", when(col("from_key") === col("from_page"), 0).otherwise(1))
    keys
      .withColumn("rn", row_number().over(
        Window.partitionBy("from_key").orderBy(col("prio"), col("to_page"))))
      .where(col("rn") === 1)
      .select("from_key", "to_page")
  }

  /** Driver-side dict for the broadcast path (small lookups — the golden
    * per-page pipeline ships this via sparkContext.broadcast, exactly the
    * reference's in-memory dict shape). */
  def collectLookup(lookup: DataFrame): Map[String, String] =
    lookup.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Join-based resolution for the exploded mention model — the at-scale
    * form of the reference's `redirects_lookup.get(page, page)` +
    * upper_first (/root/reference/src/process_pages.py:83-86). No
    * broadcast hint: real redirect tables are too large to replicate;
    * Catalyst/AQE picks the join strategy from stats. */
  def resolveEntities(mentions: DataFrame, entityCol: String, lookup: DataFrame): DataFrame =
    mentions
      .join(lookup, mentions(entityCol) === lookup("from_key"), "left")
      .withColumn(entityCol, upperFirstCol(coalesce(col("to_page"), col(entityCol))))
      .drop("from_key", "to_page")
}
