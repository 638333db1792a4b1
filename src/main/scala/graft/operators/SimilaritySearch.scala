package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.Similarity.denseCosine

/** Similarity search over an embedding column.
  *
  * Two paths (training-data pipeline requirement):
  *  - brute force: query × corpus cosine + per-query top-k — exact, O(|Q|·|C|),
  *    the baseline (also exposed as catalog query q24);
  *  - LSH-bucketed: sign-random-projection signatures, banded into bucket
  *    keys; candidates = bucket co-members, exactly re-ranked. At corpus
  *    scale the bucket join replaces the full cross product — the classic
  *    cosine-LSH recall/cost trade governed by (numPlanes, bands).
  *
  * Hyperplanes are derived deterministically from the seed (counter-based
  * hashing), so signatures are stable across runs and cluster sizes.
  */
object SimilaritySearch {

  final case class EmbeddingRow(id: Long, vec: Array[Float])

  val DefaultPlanes = 16
  val DefaultBands = 4 // 4 bands x 4 bits

  /** Deterministic ±1 hyperplane component for (plane, dim). */
  private def planeSign(seed: Long, plane: Int, dim: Int): Float =
    if ((Hashing.hash64(seed, plane.toLong, dim.toLong) & 1L) == 0L) 1.0f else -1.0f

  /** Sign-random-projection signature (numPlanes bits). */
  def signature(vec: Array[Float], numPlanes: Int, seed: Long): Int = {
    var sig = 0
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0f
      var i = 0
      while (i < vec.length) { dot += vec(i) * planeSign(seed, p, i); i += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Banded bucket keys from a signature: band index folded into the key. */
  def bucketKeys(sig: Int, numPlanes: Int, bands: Int): Array[Long] = {
    val bits = numPlanes / bands
    val mask = (1 << bits) - 1
    Array.tabulate(bands) { b =>
      Hashing.hash64(0x5ea4c11L, b.toLong, ((sig >> (b * bits)) & mask).toLong)
    }
  }

  /** Exact brute-force top-k: per query, the k nearest corpus rows by
    * cosine (excluding self-matches by id). */
  def bruteForceTopK(
      spark: SparkSession,
      queries: Dataset[EmbeddingRow],
      corpus: Dataset[EmbeddingRow],
      k: Int): DataFrame = {
    import spark.implicits._
    val scored = queries.toDF("qid", "qvec")
      .crossJoin(corpus.toDF("cid", "cvec"))
      .where(col("qid") =!= col("cid"))
      .as[(Long, Array[Float], Long, Array[Float])]
      .mapPartitions(_.map { case (qid, qvec, cid, cvec) =>
        (qid, cid, denseCosine(qvec, cvec))
      })
      .toDF("qid", "cid", "cosine")
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))))
      .where(col("rnk") <= k)
      .select("qid", "cid", "cosine", "rnk")
  }

  /** LSH-bucketed approximate top-k: candidates from bucket co-membership,
    * exact rerank within candidates. Scale shape: two map-only key
    * explosions + one equi join on bucket key (skew-bounded by bucket
    * cardinality 2^bits per band) + per-query top-k window. */
  def lshTopK(
      spark: SparkSession,
      queries: Dataset[EmbeddingRow],
      corpus: Dataset[EmbeddingRow],
      k: Int,
      numPlanes: Int = DefaultPlanes,
      bands: Int = DefaultBands,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def withBuckets(ds: Dataset[EmbeddingRow]): DataFrame =
      ds.flatMap { r =>
        bucketKeys(signature(r.vec, numPlanes, seed), numPlanes, bands)
          .map(b => (b, r.id, r.vec))
      }.toDF("bucket", "id", "vec")
    val q = withBuckets(queries).toDF("bucket", "qid", "qvec")
    val c = withBuckets(corpus).toDF("bucket", "cid", "cvec")
    val candidates = q.join(c, "bucket")
      .where(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .as[(Long, Long, Array[Float], Long, Array[Float])]
      .mapPartitions(_.map { case (_, qid, qvec, cid, cvec) =>
        (qid, cid, denseCosine(qvec, cvec))
      })
      .toDF("qid", "cid", "cosine")
    candidates
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))))
      .where(col("rnk") <= k)
      .select("qid", "cid", "cosine", "rnk")
  }
}
