package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ElSchema, MentionPipeline}

/** Star-schema build + views over the parade fixture (SURVEY §1.2, J2-J5,
  * O2, F6, S8/S9 semantics). */
class ElSchemaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val tables = {
    import spark.implicits._
    val pages = spark.createDataset(Seq(Fixtures.parsePage("parade_page.json")))
    val processed = MentionPipeline.processPages(spark, pages, Map.empty, isSeedPage = true)
    ElSchema.build(spark, processed, source = "wikipedia")
  }

  test("tables carry the reference schema with stable content-hash ids") {
    val pages = tables.pages.collect()
    assert(pages.length == 1)
    val p = pages.head
    assert(p.getAs[String]("title") == "Parade")
    assert(p.getAs[String]("source_id") == "90542")
    assert(!p.getAs[Boolean]("is_disambiguation_page"))
    assert(p.getAs[Boolean]("is_seed_page"))
    // entity texts are cleanEntity-normalized (db.py:12-13): folded + lowered
    val entityTexts = tables.entities.collect().map(_.getAs[String]("text")).toSet
    assert(entityTexts.contains("parade"))
    assert(entityTexts.contains("fifa sokker-wereldbekertoernooi in 2010")) // ê folded
    // 17 mentions from the golden; all linked
    assert(tables.mentions.count() == 17)
    assert(tables.entityMentions.count() == 17)
    // ids deterministic across rebuilds
    val again = {
      import spark.implicits._
      val ps = spark.createDataset(Seq(Fixtures.parsePage("parade_page.json")))
      ElSchema.build(spark,
        MentionPipeline.processPages(spark, ps, Map.empty, isSeedPage = true),
        "wikipedia")
    }
    assert(tables.mentions.collect().map(_.getLong(0)).sorted.toSeq ==
      again.mentions.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("num_mentions matches grouped mention counts (J7 decorrelated)") {
    val byEntity = ElSchema.mentionByEntity(tables)
      .groupBy("entity").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val numMentions = tables.entities.collect()
      .map(r => r.getAs[String]("text") -> r.getAs[Long]("num_mentions")).toMap
    assert(byEntity("parade") == 6)
    byEntity.foreach { case (e, n) => assert(numMentions(e) == n) }
  }

  test("J2/J3/J4/J5 views produce joined rows") {
    assert(ElSchema.mentionByEntity(tables).count() == 17)
    assert(ElSchema.categoryByPage(tables).count() == 2) // two categories on parade
    // entity_by_page: title 'Parade' vs normalized entity text 'parade' —
    // the reference's equi join on raw text matches only exact case; our
    // entities store normalized text, so this is empty here (as it would
    // be in the reference for any non-lowercase title)
    assert(ElSchema.entityByPage(tables).count() == 0)
    val emt = ElSchema.entityMentionsText(tables)
    assert(emt.count() == 17)
    assert(emt.columns.toSeq ==
      Seq("mention", "offset", "page_id", "preredirect", "entity_id", "entity"))
  }

  test("O2 materialization is sorted within range partitions") {
    val mat = ElSchema.materializeEntityMentionsText(tables, 2)
    import org.apache.spark.sql.functions.spark_partition_id
    val rows = mat.withColumn("pid", spark_partition_id())
      .select("pid", "page_id", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    rows.groupBy(_._1).values.foreach { part =>
      val seq = part.map(r => (r._2, r._3)).toSeq
      assert(seq == seq.sorted)
    }
  }

  test("F6 gate drops entities without a page") {
    import spark.implicits._
    val pages = spark.createDataset(Seq(Fixtures.parsePage("parade_page.json")))
    val processed = MentionPipeline.processPages(spark, pages, Map.empty)
    val titles = Seq("Parade", "Kaapstad").toDF("title")
    val gated = ElSchema.build(spark, processed, "wikipedia", Some(titles))
    val kept = gated.entities.collect().map(_.getAs[String]("text")).toSet
    assert(kept == Set("parade", "kaapstad"))
    assert(gated.mentions.count() == 9) // 6 parade + 3 kaapstad mentions
  }
}
