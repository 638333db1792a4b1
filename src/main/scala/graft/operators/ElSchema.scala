package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ProcessedPage

/** The reference's relational star schema
  * (/root/reference/db/create_tables.sql) built as partitioned tables from
  * processed pages, plus its four views (db/create_views.sql:1-29) and the
  * pre-sorted materialized view (db/create_materialized_views.sql:1-9).
  *
  * Spark-native replacements for MySQL idioms (SURVEY §1.2):
  *  - auto-increment surrogate ids -> deterministic content hashes
  *    (xxhash64-class), stable across reruns/resume;
  *  - REPLACE INTO / ON DUPLICATE KEY (S8/S9) -> dropDuplicates before
  *    append — idempotent by construction;
  *  - UNIQUE(text) entity dedup via the driver-side lookup
  *    (/root/reference/src/db.py:38-47) -> distinct on the normalized key;
  *  - the F6 entity-has-page gate (db.py:5-6) -> left-semi join against
  *    the titles set on the cleanEntity-normalized key.
  */
object ElSchema {

  final case class ElTables(
      pages: DataFrame, // id, source_id, title, content, source, is_seed_page, is_disambiguation_page
      categories: DataFrame, // id, category
      pageCategories: DataFrame, // category_id, page_id
      entities: DataFrame, // id, text, num_mentions
      mentions: DataFrame, // id, text, offset, page_id, preredirect
      entityMentions: DataFrame) // entity_id, mention_id

  def pageId(source: String, sourceId: String): Long =
    graft.functions.Hashing.hashString(s"page:$source:$sourceId")

  /** Build all six tables. `wikiTitles` is the F6 gate: entities whose
    * normalized text has no page are dropped, mirroring
    * insert_link_contexts (/root/reference/src/db.py:132-141). Pass None
    * to keep everything. */
  def build(
      spark: SparkSession,
      processed: Dataset[ProcessedPage],
      source: String,
      wikiTitles: Option[DataFrame] = None): ElTables = {
    import spark.implicits._

    val pages = processed.map { p =>
      val info = p.documentInfo
      val sid = info.sourceId.getOrElse("")
      (pageId(source, sid), sid, info.title, info.text, source,
        info.isSeedPage, info.isDisambiguationPage)
    }.toDF("id", "source_id", "title", "content", "source",
      "is_seed_page", "is_disambiguation_page")
      .dropDuplicates("source", "source_id") // S8 REPLACE INTO idempotence

    val pageCategoriesRaw = processed.flatMap { p =>
      val pid = pageId(source, p.documentInfo.sourceId.getOrElse(""))
      p.documentInfo.categories.map(c => (c, pid))
    }.toDF("category", "page_id")

    val categories = pageCategoriesRaw.select("category").distinct() // S9 dedup sink
      .withColumn("id", xxhash64(lit("category:"), col("category")))
      .select("id", "category")

    val pageCategories = pageCategoriesRaw
      .join(categories, "category")
      .select(col("id").as("category_id"), col("page_id"))

    // cleanEntity (db.py:12-13) as pure Column algebra: the native
    // graft_ascii_fold expression (codegen'd, GraftExtensions) composed
    // with builtin lower+trim — no Scala UDF in the F6 gate / id path, so
    // the whole mention projection stays inside whole-stage codegen.
    def cleanEntityCol(c: String): org.apache.spark.sql.Column =
      lower(trim(expr(s"graft_ascii_fold(`$c`)")))

    val mentionRows = processed.flatMap { p =>
      val pid = pageId(source, p.documentInfo.sourceId.getOrElse(""))
      p.mentions.map(m => (m.entity, m.text, m.offset, pid, m.preredirect))
    }.toDF("entity", "text", "offset", "page_id", "preredirect")
      .withColumn("entity_clean", cleanEntityCol("entity"))

    // F6: keep entities whose normalized text exists in the titles set
    val gated = wikiTitles match {
      case Some(titles) =>
        val keys = titles.select(cleanEntityCol(titles.columns.head).as("entity_clean"))
          .distinct()
        mentionRows.join(broadcast(keys), Seq("entity_clean"), "left_semi")
      case None => mentionRows
    }

    val entitiesBase = gated.select(col("entity_clean").as("text")).distinct()
      .withColumn("id", xxhash64(lit("entity:"), col("text")))

    val mentions = gated
      .withColumn("id",
        xxhash64(lit("mention:"), col("page_id"), col("offset"), col("text")))
      .select("id", "text", "offset", "page_id", "preredirect", "entity_clean")

    val entityMentions = mentions
      .join(entitiesBase.select(col("id").as("entity_id"), col("text").as("entity_clean")),
        "entity_clean")
      .select(col("entity_id"), col("id").as("mention_id"))

    // A2/J7: num_mentions maintained as a grouped count + join (the
    // decorrelated UPDATE, alter_table_entities.py:30)
    val entities = entitiesBase
      .join(
        entityMentions.groupBy("entity_id").agg(count(lit(1)).as("num_mentions")),
        entitiesBase("id") === col("entity_id"), "left")
      .select(entitiesBase("id"), col("text"),
        coalesce(col("num_mentions"), lit(0L)).as("num_mentions"))

    ElTables(pages, categories, pageCategories, entities,
      mentions.drop("entity_clean"), entityMentions)
  }

  /** J2 view: mention_by_entity (db/create_views.sql:1-8). */
  def mentionByEntity(t: ElTables): DataFrame =
    t.mentions.as("m")
      .join(t.entityMentions.as("em"), col("m.id") === col("em.mention_id"))
      .join(t.entities.as("e"), col("em.entity_id") === col("e.id"))
      .select(
        col("m.id").as("mention_id"), col("m.text").as("mention"),
        col("m.offset"), col("m.page_id"), col("m.preredirect"),
        col("e.id").as("entity_id"), col("e.text").as("entity"))

  /** J3 view: category_by_page (db/create_views.sql:10-12). */
  def categoryByPage(t: ElTables): DataFrame =
    t.categories.as("c")
      .join(t.pageCategories.as("pc"), col("c.id") === col("pc.category_id"))
      .join(t.pages.as("p"), col("pc.page_id") === col("p.id"))
      .select(col("p.id").as("page_id"), col("p.title"), col("c.category"))

  /** J4 view: entity_by_page — equi join on TEXT key
    * (db/create_views.sql:14-19). */
  def entityByPage(t: ElTables): DataFrame =
    t.pages.as("p")
      .join(t.entities.as("e"), col("p.title") === col("e.text"))
      .select(col("p.id").as("page_id"), col("p.title"),
        col("e.id").as("entity_id"), col("e.num_mentions"))

  /** J5 view: entity_mentions_text (db/create_views.sql:21-29). */
  def entityMentionsText(t: ElTables): DataFrame =
    mentionByEntity(t).select(
      col("mention"), col("offset"), col("page_id"),
      col("preredirect"), col("entity_id"), col("entity"))

  /** O2: the materialized view, range-partitioned by page_id and sorted
    * within partitions — total order is unnecessary, range + local sort
    * gives the same per-page scan order without a global sort barrier
    * (db/create_materialized_views.sql:9). */
  def materializeEntityMentionsText(t: ElTables, partitions: Int): DataFrame =
    entityMentionsText(t)
      .repartitionByRange(partitions, col("page_id"))
      .sortWithinPartitions(col("page_id"), col("offset"))
}
