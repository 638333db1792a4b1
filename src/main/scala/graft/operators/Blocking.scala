package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing._
import graft.functions.{Similarity, TextFunctions}

/** Document features + blocking-key generation for record linkage.
  *
  * Two native key families (north rule):
  *  - normalized-title key: `cleanEntity(title)` — the Spark-native
  *    generalization of the reference's entity key
  *    (/root/reference/src/db.py:12-13, UNIQUE(text) at
  *    db/create_tables.sql:41);
  *  - MinHash-LSH band keys over word 3-shingles of the ASCII-folded text
  *    (bands=5 × rows=4 → Jaccard threshold ≈ 0.67).
  *
  * Shuffle layout: feature extraction is map-only; TF-IDF is the classic
  * three partial-agg shuffles (tf by (id,token), df by token, vector by
  * id); key explosion is map-only. Hot blocks (boilerplate-heavy domains)
  * are handled by a stop-block cap — blocks above `maxBlockSize` are
  * dropped and counted, the standard stop-word analog for blocking — and
  * candidate pairs are salted-repartitioned by pair hash before scoring.
  */
object Blocking {

  final case class ExtractedDoc(id: Long, url: String, title: String, text: String, lang: String)

  final case class DocFeatures(
      id: Long,
      url: String,
      normTitle: String,
      tokenHashes: Array[Long], // sorted distinct, for Jaccard
      tfKeys: Array[Long], // sorted, parallel to tfWeights (TF-IDF vector)
      tfWeights: Array[Double],
      minhash: Array[Long],
      simhash: Long,
      numTokens: Int)

  final case class BlockEntry(key: Long, id: Long)
  final case class CandidatePair(src: Long, dst: Long)

  val NumMinHashes = 20
  val RowsPerBand = 4
  val ShingleSize = 3
  val DefaultMaxBlockSize = 128

  /** Stable 64-bit doc id from the url — content-hash ids instead of
    * auto-increment (SURVEY §1.2: stable across reruns/resume). */
  def docId(url: String): Long = hashString("doc:" + url)

  def tokenHashesOf(text: String): Array[Long] =
    TextFunctions.wordTokens(TextFunctions.asciiFold(text)).map(hashString)

  /** TF-IDF sparse vectors, fully distributed (no driver collect):
    * tf by (id, token) -> df by token -> weighted vector by id. */
  def tfidfVectors(spark: SparkSession, tokens: Dataset[(Long, Array[Long])]): DataFrame = {
    import spark.implicits._
    val exploded = tokens.flatMap { case (id, ths) => ths.map(t => (id, t)) }
      .toDF("id", "token")
    val tf = exploded.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = tokens.count().toDouble
    tf.join(dfreq, "token")
      .withColumn("w", col("tf") * log(lit(n + 1.0) / (col("df") + 1.0)))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("token"), col("w")))).as("kv"))
      .select(
        col("id"),
        col("kv.token").as("tfKeys"),
        col("kv.w").as("tfWeights"))
  }

  /** Full feature table from extracted docs. */
  def features(spark: SparkSession, docs: Dataset[ExtractedDoc]): Dataset[DocFeatures] = {
    import spark.implicits._
    val perDoc = docs.map { d =>
      val raw = tokenHashesOf(d.text)
      val shingles = Similarity.shingleHashes(
        TextFunctions.wordTokens(TextFunctions.asciiFold(d.text)), ShingleSize)
      (d.id, d.url, TextFunctions.cleanEntity(d.title), raw.distinct.sorted,
        Similarity.minHashSignature(shingles, NumMinHashes),
        Similarity.simHash(raw), raw.length, raw)
    }.toDF("id", "url", "normTitle", "tokenHashes", "minhash", "simhash", "numTokens", "rawTokens")
    val vecs = tfidfVectors(spark, perDoc.select(col("id"), col("rawTokens"))
      .as[(Long, Array[Long])])
    perDoc.drop("rawTokens")
      .join(vecs, Seq("id"), "left")
      .select(
        col("id"), col("url"), col("normTitle"), col("tokenHashes"),
        coalesce(col("tfKeys"), array().cast("array<bigint>")).as("tfKeys"),
        coalesce(col("tfWeights"), array().cast("array<double>")).as("tfWeights"),
        col("minhash"), col("simhash"), col("numTokens"))
      .as[DocFeatures]
  }

  /** Blocking keys per doc: title key + LSH band keys. */
  def blockEntries(spark: SparkSession, feats: Dataset[DocFeatures]): Dataset[BlockEntry] = {
    import spark.implicits._
    feats.flatMap { f =>
      val titleKey =
        if (f.normTitle.nonEmpty) Seq(hashString("title:" + f.normTitle)) else Nil
      val bandKeys = Similarity.lshBandKeys(f.minhash, RowsPerBand)
      (titleKey ++ bandKeys).distinct.map(k => BlockEntry(k, f.id))
    }
  }

  /** Candidate pairs from block co-membership with stop-block removal.
    * Returns (pairs, droppedHotBlocks). Pair generation streams out of
    * `flatMapGroups` lazily; within-block work is O(|block|²) bounded by
    * `maxBlockSize`. Pairs are de-duplicated across keys (one scoring per
    * pair regardless of how many keys co-locate it) and salted-repartitioned
    * by pair hash so the scoring stage is skew-free by construction. */
  def candidatePairs(
      spark: SparkSession,
      entries: Dataset[BlockEntry],
      maxBlockSize: Int = DefaultMaxBlockSize): (Dataset[CandidatePair], Long) = {
    import spark.implicits._
    val sizes = entries.groupBy("key").agg(count(lit(1)).as("sz"))
    val hotBlocks = sizes.where(col("sz") > maxBlockSize).count()
    val eligible = entries.join(
      sizes.where(col("sz") >= 2 && col("sz") <= maxBlockSize), "key")
      .select(col("key"), col("id")).as[BlockEntry]
    val pairs = eligible
      .groupByKey(_.key)
      .flatMapGroups { (_, it) =>
        val ids = it.map(_.id).toArray
        java.util.Arrays.sort(ids)
        for {
          i <- ids.indices.iterator
          j <- (i + 1) until ids.length
        } yield CandidatePair(ids(i), ids(j))
      }
      .dropDuplicates("src", "dst")
      // deterministic salt: uniform pair-hash repartition before scoring
      .repartition(spark.sessionState.conf.numShufflePartitions,
        xxhash64(col("src"), col("dst")))
      .as[CandidatePair]
    (pairs, hotBlocks)
  }
}
