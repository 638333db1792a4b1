package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilaritySearch
import graft.operators.SimilaritySearch.EmbeddingRow

/** ANN over the embeddings table: brute-force baseline vs LSH-bucketed
  * scale path (recall measured against the exact top-k). */
class SimilaritySearchSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val embeddings = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id AS id", "embedding AS vec")
      .as[EmbeddingRow]
      .cache()
  }

  test("brute-force top-k is exact, ordered, self-excluded") {
    import spark.implicits._
    val queries = embeddings.filter((r: EmbeddingRow) => r.id < 5)
    val topk = SimilaritySearch.bruteForceTopK(spark, queries, embeddings, 10)
      .collect()
    assert(topk.length == 50) // 5 queries x 10
    val byQuery = topk.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse) // descending by rank
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0))) // no self
    }
  }

  test("LSH retrieves near-duplicate vectors at a fraction of brute-force cost") {
    import spark.implicits._
    // the dedup use case: queries are slightly perturbed corpus vectors
    // (cosine ~0.99 to their source) — sign-LSH collides them reliably,
    // while near-orthogonal random pairs mostly do not
    val nQueries = 50
    val queries = embeddings.filter((r: EmbeddingRow) => r.id < nQueries)
      .map { r =>
        val noisy = r.vec.zipWithIndex.map { case (x, i) =>
          x + 0.02f * ((graft.functions.Hashing.hash64(9L, r.id, i) % 100) / 100.0f)
        }
        EmbeddingRow(r.id + 1000000L, noisy)
      }
    val hits = SimilaritySearch.lshTopK(spark, queries, embeddings, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val recovered = hits.count { case (qid, cid) => qid - 1000000L == cid }
    assert(recovered >= (nQueries * 0.9).toInt, s"recovered $recovered/$nQueries")
    // and the bucket join prunes: candidate pairs << |Q| x |C|
    val candidateCount = SimilaritySearch.lshTopK(spark, queries, embeddings, 500)
      .count()
    assert(candidateCount < nQueries.toLong * 500L / 2, s"candidates = $candidateCount")
  }

  test("signatures and buckets are deterministic") {
    val vec = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val s1 = SimilaritySearch.signature(vec, 16, 42L)
    val s2 = SimilaritySearch.signature(vec.clone(), 16, 42L)
    assert(s1 == s2)
    assert(SimilaritySearch.bucketKeys(s1, 16, 4).toSeq ==
      SimilaritySearch.bucketKeys(s2, 16, 4).toSeq)
  }
}
