package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Page
import graft.operators.{EntityPrior, IobesExport, MentionPipeline}

/** Dataset-level lifecycle tests: BFS golden
  * (process_pages_test.py:116-145), the prior counts, and the one-join
  * IOBES export job. */
class MentionPipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val corpusPages: Seq[Page] = Seq(
    "made.json", "koning.json", "tweede.json", "parade_small_page.json")
    .map(Fixtures.parsePage)

  test("BFS depth 0/1/2 over the 4-page fixture corpus (process_pages_test.py:116-145)") {
    import spark.implicits._
    val corpus = spark.createDataset(corpusPages)
    val seeds = spark.createDataset(corpusPages.filter(_.title == "Parade"))
    def titlesAt(depth: Int): Set[String] =
      MentionPipeline.processSeedPages(spark, corpus, Map.empty, seeds, depth)
        .collect().map(_.documentInfo.title).toSet
    assert(titlesAt(0) == Set("Parade"))
    assert(titlesAt(1) == Set("Parade", "Tweede Vryheidsoorlog", "Koning Edward VII-standbeeld"))
    assert(titlesAt(2) == Set("Parade", "Tweede Vryheidsoorlog",
      "Koning Edward VII-standbeeld", "Made up page"))
  }

  test("candidate prior: three passes union into (surface, entity, cnt)") {
    import spark.implicits._
    val mentions = Seq(
      // page 1 (train or not depends on hash rank; use fraction 1.0 first)
      (1L, "big apple", "New York City", "NYC"),
      (1L, "NYC", "New York City", "NYC"),
      (2L, "NYC", "New York City", "New york"),
      (2L, "paris", "Paris", "Paris"))
      .toDF("page_id", "mention_text", "entity", "preredirect")
    val prior = EntityPrior.candidatePrior(spark, mentions, trainFraction = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(prior == Set(
      ("big apple", "New York City", 1L),
      ("NYC", "New York City", 3L), // 2 anchors + 1 distinct preredirect pair
      ("New york", "New York City", 1L),
      ("New York City", "New York City", 1L),
      ("paris", "Paris", 1L),
      ("Paris", "Paris", 2L))) // own text + preredirect
  }

  test("train fraction filters pages deterministically") {
    import spark.implicits._
    val mentions = (1L to 10L).map(p => (p, s"m$p", s"e$p", s"r$p"))
      .toDF("page_id", "mention_text", "entity", "preredirect")
    val full = EntityPrior.candidatePrior(spark, mentions, 1.0)
    val train = EntityPrior.candidatePrior(spark, mentions, 0.5)
    // pass-1 rows shrink with the split; passes 2-3 are split-independent
    assert(train.count() < full.count())
    val again = EntityPrior.candidatePrior(spark, mentions, 0.5)
    assert(train.collect().toSet == again.collect().toSet)
  }

  test("O4 pageIdOrder: seeded-hash rank is a deterministic non-identity permutation") {
    import spark.implicits._
    val pages = (1L to 200L).map(p => (p, s"x$p")).toDF("page_id", "junk")
    val order = EntityPrior.pageIdOrder(pages, "page_id", seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(order.map(_._2).sorted.toSeq == (1L to 200L)) // ranks are 1..n
    assert(order.toMap.size == 200)
    // shuffled, not id order (a hash order that degenerated to identity
    // would silently turn the train split into a prefix split)
    val byId = order.sortBy(_._1).map(_._2)
    assert(byId.toSeq != (1L to 200L))
    val again = EntityPrior.pageIdOrder(pages, "page_id", seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(again.toMap == order.toMap) // stable across runs
    assert(EntityPrior.pageIdOrder(pages, "page_id", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap != order.toMap)
  }

  test("A2 numMentionsPerEntity: the decorrelated correlated-UPDATE counts") {
    import spark.implicits._
    val mentions = Seq(
      (1L, "a", "Paris", "p"), (2L, "b", "Paris", "p"), (3L, "c", "Rome", "r"))
      .toDF("page_id", "mention_text", "entity", "preredirect")
    val counts = EntityPrior.numMentionsPerEntity(mentions)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("Paris" -> 2L, "Rome" -> 1L))
  }

  test("A4 dense entity labels: dense 0..n-1 over entity ASC, prior join carries them") {
    import spark.implicits._
    val mentions = Seq(
      (1L, "big apple", "New York City", "NYC"),
      (2L, "ville lumiere", "Paris", "Paris"),
      (3L, "paris", "Paris", "Paris"),
      (4L, "alexandria", "Alexandria", "Alexandria"))
      .toDF("page_id", "mention_text", "entity", "preredirect")
    val labels = EntityPrior.entityLabels(mentions.select("entity"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // dense, 0-based, deterministic entity-ASC order (documented A4 deviation)
    assert(labels == Map("Alexandria" -> 0L, "New York City" -> 1L, "Paris" -> 2L))
    val labeled = EntityPrior.candidatePriorLabeled(spark, mentions, trainFraction = 1.0)
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2), r.getLong(3)))
    // every prior row carries its entity's dense label
    assert(labeled.nonEmpty)
    assert(labeled.forall { case (entity, _, label, _) => labels(entity) == label })
    // rerun yields identical labels (stability across runs)
    val again = EntityPrior.entityLabels(mentions.select("entity"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == labels)
  }

  test("IOBES export: one join + per-page group reproduces the golden") {
    import spark.implicits._
    val db = Fixtures.readTree("parade_page_db.json")
    val content = db.get("content").asText
    val contexts = Fixtures.parseContexts("parade_page_contexts.json")
    val pages = Seq((1L, "Parade", content)).toDF("page_id", "title", "content")
    val mentions = contexts.flatMap { case (entity, ms) =>
      ms.map(m => (1L, entity, m.text, m.offset, m.preredirect))
    }.toDF("page_id", "entity", "mention_text", "offset", "preredirect")
    val rows = IobesExport.pageIobesRows(spark, pages, mentions).collect()
    assert(rows.length == 1)
    val (title, text) = rows.head
    assert(title == "Parade")
    assert(text.startsWith("Parade\nduimnael|480px|'n O\nPanoramiese O"))
    assert(text.contains("Mandela Nelson%20Mandela E"))
    // merged sink: single batch contains the page + separator semantics
    val merged = IobesExport.mergedBatches(
      spark.createDataset(Seq(("A", "a-text"), ("B", "b-text"))), 1)
      .collect().map(_.getString(0))
    assert(merged.length == 1)
    assert(merged.head.contains("----------.----------"))
  }
}
