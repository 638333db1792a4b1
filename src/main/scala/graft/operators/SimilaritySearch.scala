package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, OracleHash}
import graft.functions.Similarity.denseCosine

/** Similarity search over an embedding column.
  *
  * Two paths (training-data pipeline requirement):
  *  - brute force: query × corpus cosine + per-query top-k — exact,
  *    O(|Q|·|C|), the baseline (catalog query q24);
  *  - LSH-bucketed: sign-random-projection signatures banded into bucket
  *    keys; candidates = bucket co-members, exactly re-ranked (q34).
  *
  * Scale design of the LSH path:
  *  - ≥16 bits per band (default 96 planes / 6 bands): bucket cardinality
  *    2^16 per band, so candidate volume stays ~linear in corpus size —
  *    4-bit bands (16 buckets) would degenerate to ~N²/16 pairs;
  *  - hot-bucket cap: buckets above `maxBucketSize` corpus members are
  *    dropped (the stop-block analog in Blocking.candidatePairs);
  *  - (qid, cid) candidate ids are deduplicated across bands BEFORE the
  *    float vectors are re-attached — the wide rows never ride through the
  *    dedup shuffle.
  *
  * Signatures use integer-quantized vectors (floor(x·10⁴)) so the plane
  * dots are exact integer arithmetic — byte-identical across engines and
  * summation orders; with the md5 sign matrix ([[OracleHash.planeSign]])
  * the DuckDB oracle recomputes every signature, bucket, and candidate
  * (catalog q34). Production uses the fast seeded sign matrix.
  */
object SimilaritySearch {

  final case class EmbeddingRow(id: Long, vec: Array[Float])

  val DefaultPlanes = 96
  val DefaultBands = 6 // 16 bits per band
  val DefaultMaxBucketSize = 128
  val QuantScale = 10000.0

  /** floor(x · 10⁴) per component: exact in IEEE double, so any engine
    * computes the identical integers (no float-sum order sensitivity in
    * the signature path). 1e-4 quantization is far below embedding noise. */
  def quantized(vec: Array[Float]): Array[Long] = {
    val out = new Array[Long](vec.length)
    var i = 0
    while (i < vec.length) {
      out(i) = math.floor(vec(i).toDouble * QuantScale).toLong
      i += 1
    }
    out
  }

  /** Production ±1 hyperplane matrix — deterministic from the seed, stable
    * across runs and cluster sizes. */
  def hashSigns(numPlanes: Int, dims: Int, seed: Long): Array[Array[Long]] =
    Array.tabulate(numPlanes, dims)((p, d) =>
      if ((Hashing.hash64(seed, p.toLong, d.toLong) & 1L) == 0L) 1L else -1L)

  /** Oracle-reproducible ±1 matrix (md5 parity — OracleHash.planeSign). */
  def oracleSigns(numPlanes: Int, dims: Int): Array[Array[Long]] =
    Array.tabulate(numPlanes, dims)((p, d) => OracleHash.planeSign(p, d))

  /** Banded bucket keys: signature bit p is set iff Σ_d qv(d)·sign(p,d) ≥ 0;
    * band b's key = b · 2³² + its (planes/bands)-bit slice. Integer
    * arithmetic end-to-end (|qv| ≤ 2^40·dims stays far from overflow). */
  def bucketKeysOf(qv: Array[Long], signs: Array[Array[Long]], bands: Int): Array[Long] = {
    val numPlanes = signs.length
    val bits = numPlanes / bands
    val keys = new Array[Long](bands)
    var p = 0
    while (p < numPlanes) {
      val s = signs(p)
      val n = math.min(qv.length, s.length)
      var dot = 0L
      var d = 0
      while (d < n) { dot += qv(d) * s(d); d += 1 }
      if (dot >= 0L) keys(p / bits) |= (1L << (p % bits))
      p += 1
    }
    var b = 0
    while (b < bands) { keys(b) = b.toLong * 4294967296L + keys(b); b += 1 }
    keys
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

  /** LSH candidate set with exact cosines, pre-ranking: ids-only bucket
    * join (hot buckets capped) → (qid, cid) dedup → vectors re-attached →
    * cosine in mapPartitions. Returns (qid, cid, cosine). */
  def lshCandidates(
      spark: SparkSession,
      queries: Dataset[EmbeddingRow],
      corpus: Dataset[EmbeddingRow],
      signs: Array[Array[Long]],
      bands: Int = DefaultBands,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    import spark.implicits._
    val signsB = spark.sparkContext.broadcast(signs)
    def keyed(ds: Dataset[EmbeddingRow], idName: String): DataFrame =
      ds.flatMap { r =>
        bucketKeysOf(quantized(r.vec), signsB.value, bands).map(k => (k, r.id))
      }.toDF("bucket", idName)
    val cKeys = keyed(corpus, "cid")
    val sizes = cKeys.groupBy("bucket").agg(count(lit(1)).as("sz"))
    val eligible = sizes.where(col("sz") <= maxBucketSize).select("bucket")
    val candIds = keyed(queries, "qid")
      .join(cKeys.join(eligible, "bucket"), "bucket")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .dropDuplicates("qid", "cid") // ids only — no vectors in this shuffle
    candIds
      .join(queries.toDF("qid", "qvec"), "qid")
      .join(corpus.toDF("cid", "cvec"), "cid")
      .select(col("qid"), col("cid"), col("qvec"), col("cvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qid, cid, a, b) =>
        (qid, cid, denseCosine(a, b))
      })
      .toDF("qid", "cid", "cosine")
  }

  val DefaultNumCentroids = 16
  val DefaultNProbe = 4

  /** Spark `round(_, 4)` / DuckDB `round(_, 4)` parity: half away from
    * zero. Assignment decisions made in Scala code (the coarse quantizer)
    * must round exactly like the SQL oracle's `round(cs, 4)`. */
  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Nearest centroid id by 4dp-rounded cosine, smaller id on ties —
    * identical to `row_number() OVER (ORDER BY cs DESC, cent_id)` = 1. */
  def nearestCentroids(
      vec: Array[Float], centroids: Array[(Long, Array[Float])], n: Int): Array[Long] =
    centroids
      .map { case (cid, cvec) => (round4(denseCosine(vec, cvec)), cid) }
      .sortBy { case (cs, cid) => (-cs, cid) }
      .take(n)
      .map(_._2)

  /** IVF-flat approximate top-k — the inverted-file ANN layout (the other
    * standard scale path next to sign-LSH [[lshTopK]]):
    *
    *  - coarse quantizer: a small centroid codebook, BROADCAST (the IVF
    *    invariant — codebooks are ≤64k entries by construction, exactly
    *    Spark's small-dim broadcast case). Deterministic stand-in here:
    *    the `numCentroids` lowest-id corpus vectors. Production trains
    *    k-means offline and ships the codebook the same way; every other
    *    moving part (map-side assignment, inverted lists, probe join,
    *    exact rerank) is the real operator.
    *  - inverted lists: each corpus row assigned map-side to its nearest
    *    centroid (NO shuffle — the classic IVF win over all-pairs);
    *  - probe: each query scores the codebook and joins the `nprobe`
    *    nearest lists; candidates are (qid, cid) ids only, vectors
    *    re-attached after dedup (same payload discipline as LSH);
    *  - exact rerank: cosine in mapPartitions, per-query top-k window.
    *
    * Assignment + ranking use 4dp-rounded cosines with id tiebreaks, so a
    * SQL oracle reproduces every list, probe, and rank bit-for-bit. */
  def ivfFlatTopK(
      spark: SparkSession,
      queries: Dataset[EmbeddingRow],
      corpus: Dataset[EmbeddingRow],
      k: Int,
      numCentroids: Int = DefaultNumCentroids,
      nprobe: Int = DefaultNProbe): DataFrame = {
    import spark.implicits._
    val codebook = corpus.orderBy(col("id")).limit(numCentroids)
      .collect().map(r => (r.id, r.vec)).sortBy(_._1)
    val centB = spark.sparkContext.broadcast(codebook)
    val lists = corpus.map { r =>
      (nearestCentroids(r.vec, centB.value, 1)(0), r.id)
    }.toDF("cent_id", "cid")
    val probes = queries.flatMap { q =>
      nearestCentroids(q.vec, centB.value, nprobe).map(c => (c, q.id))
    }.toDF("cent_id", "qid")
    val candIds = probes.join(lists, "cent_id")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .dropDuplicates("qid", "cid") // a cid can sit in ≤1 list, but qid probes overlap after the join
    candIds
      .join(queries.toDF("qid", "qvec"), "qid")
      .join(corpus.toDF("cid", "cvec"), "cid")
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (cid, qid, qvec, cvec) =>
        (qid, cid, denseCosine(qvec, cvec))
      })
      .toDF("qid", "cid", "cosine")
      .withColumn("cos_sim", round(col("cosine"), 4))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("cid"))).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "cid", "cos_sim", "rnk")
  }

  /** LSH-bucketed approximate top-k (production wrapper): candidates from
    * [[lshCandidates]], per-query top-k window. */
  def lshTopK(
      spark: SparkSession,
      queries: Dataset[EmbeddingRow],
      corpus: Dataset[EmbeddingRow],
      k: Int,
      numPlanes: Int = DefaultPlanes,
      bands: Int = DefaultBands,
      seed: Long = 42L,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val dims = corpus.head().vec.length
    val cands =
      lshCandidates(spark, queries, corpus, hashSigns(numPlanes, dims, seed),
        bands, maxBucketSize)
    cands
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))))
      .where(col("rnk") <= k)
      .select("qid", "cid", "cosine", "rnk")
  }
}
