package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RedirectLookup

/** J1/P10/P11 distributed redirect-lookup build — reproduces
  * /root/reference/src/lookups.py:24-34 semantics: namespace-0 inner join,
  * '_'->space on both titles, both first-letter capitalizations as keys. */
class RedirectLookupSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def tables = {
    import spark.implicits._
    val pages = Seq(
      (1L, "Tweede_Vryheidsoorlog", 0L),
      (2L, "anglo-boereoorlog", 0L),
      (3L, "Template_Redirect", 10L), // non-zero namespace: excluded (F4)
      (4L, "No_redirect_page", 0L) // no redirect row: inner join drops it
    ).toDF("page_id", "page_title", "page_namespace")
    val redirects = Seq(
      (1L, "Tweede_Boereoorlog"),
      (2L, "Tweede_Boereoorlog"),
      (3L, "Elsewhere")
    ).toDF("rd_from", "rd_title")
    (pages, redirects)
  }

  test("build: both-case keys, underscore->space, namespace gate (lookups.py:24-34)") {
    val (pages, redirects) = tables
    val lookup = RedirectLookup.collectLookup(RedirectLookup.build(pages, redirects))
    // both capitalizations of every from-title resolve
    assert(lookup("Tweede Vryheidsoorlog") == "Tweede Boereoorlog")
    assert(lookup("tweede Vryheidsoorlog") == "Tweede Boereoorlog")
    assert(lookup("Anglo-boereoorlog") == "Tweede Boereoorlog")
    assert(lookup("anglo-boereoorlog") == "Tweede Boereoorlog")
    // spaces are spaces, not underscores (docstring in lookups.py:37-38)
    assert(!lookup.contains("Tweede_Vryheidsoorlog"))
    // namespace != 0 and non-redirect pages contribute nothing
    assert(!lookup.valuesIterator.contains("Elsewhere"))
    assert(lookup.size == 4)
  }

  test("key collisions resolve deterministically (case-exact wins)") {
    import spark.implicits._
    // two pages differing only in first-letter case -> their key sets
    // overlap on BOTH keys; the reference dict is cursor-order-dependent,
    // the engine picks the case-exact entry per key
    val pages = Seq(
      (1L, "Foo", 0L),
      (2L, "foo", 0L)
    ).toDF("page_id", "page_title", "page_namespace")
    val redirects = Seq(
      (1L, "Target_Upper"),
      (2L, "Target_Lower")
    ).toDF("rd_from", "rd_title")
    val lookup = RedirectLookup.collectLookup(RedirectLookup.build(pages, redirects))
    assert(lookup == Map(
      "Foo" -> "Target Upper", // case-exact: page "Foo"
      "foo" -> "Target Lower")) // case-exact: page "foo"
  }

  test("processPagesWithLookup: built table drives the per-page pipeline") {
    import spark.implicits._
    val (pages, redirects) = tables
    val lookup = graft.operators.RedirectLookup.build(pages, redirects)
    val parade = spark.createDataset(Seq(Fixtures.parsePage("parade_small_page.json")))
    val withRedirects = graft.operators.MentionPipeline
      .processPagesWithLookup(spark, parade, lookup).collect()
    val without = graft.operators.MentionPipeline
      .processPages(spark, parade, Map.empty).collect()
    assert(withRedirects.length == 1 && without.length == 1)
    // the lookup reshapes entities that hit a redirect key; the rest agree
    assert(withRedirects.head.documentInfo.title == without.head.documentInfo.title)
  }

  test("resolveEntities: join resolution matches dict.get + upper_first (process_pages.py:83-86)") {
    import spark.implicits._
    val (pages, redirects) = tables
    val lookup = RedirectLookup.build(pages, redirects)
    val mentions = Seq(
      (10L, "tweede Vryheidsoorlog"), // redirected (lower-first key)
      (11L, "parade") // not in lookup: kept, upper_first applied
    ).toDF("page_id", "entity")
    val out = RedirectLookup.resolveEntities(mentions, "entity", lookup)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "Tweede Boereoorlog")
    assert(out(11L) == "Parade")
  }
}
