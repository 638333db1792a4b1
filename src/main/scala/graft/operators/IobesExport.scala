package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Iobes.MentionSpan

/** The IOBES training-set job
  * (/root/reference/src/scripts/create_iobes_training_set.py, SURVEY §3.2)
  * as ONE join + ONE per-page group instead of the reference's N+1
  * per-page SQL: pages ⋈ mentions, repartition by page, offset-sorted
  * per-page fold, text rows out (S10 file-per-page becomes (title, text)
  * rows; S11 merge becomes coalesce + separator).
  */
object IobesExport {

  /** @param pages    (page_id, title, content), non-disambiguation already
    *                 filtered (F5)
    * @param mentions (page_id, entity, mention_text, offset, preredirect)
    * @return (title, iobes) rows */
  def pageIobesRows(
      spark: SparkSession,
      pages: DataFrame,
      mentions: DataFrame,
      withPreredirect: Boolean = false): Dataset[(String, String)] = {
    import spark.implicits._
    val joined = pages
      .join(mentions, "page_id")
      .select(
        col("page_id").cast("long"), col("title"), col("content"),
        col("entity"), col("mention_text"), col("offset").cast("int"),
        col("preredirect"))
      .as[(Long, String, String, String, String, Int, String)]
    joined
      .groupByKey(_._1)
      .mapGroups { (_, it) =>
        val rows = it.toVector
        val title = rows.head._2
        val content = rows.head._3
        // O1: offset-ascending, stable — the reference's ORDER BY offset
        val sorted = rows
          .filter(r => r._6 < content.length) // out-of-bounds guard (iobes_test.py:29)
          .sortBy(_._6)
        val spans = sorted.map(r => MentionSpan(r._5, r._6))
        val titles = sorted.map(_._4)
        val pre = if (withPreredirect) Some(sorted.map(_._7)) else None
        val iobes = Iobes.pageIobes(content, spans, titles, pre)
        (title, Iobes.formatPageIobes(title, iobes))
      }
  }

  /** S11 merge sink: k output rows, each the concatenation of a batch of
    * page IOBES texts with the reference separator
    * (/root/reference/src/scripts/merge.py:1-18). */
  def mergedBatches(rows: Dataset[(String, String)], k: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.coalesce(k)
      .mapPartitions(it => Iterator.single(it.map(_._2).mkString(Iobes.MergeSeparator)))
      .toDF("merged")
  }
}
