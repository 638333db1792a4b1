package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.Hashing

/** Multimodal column plumbing for a training-data pipeline: media ride as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run batched inside `mapPartitions` (the JVM
  * analog of `mapInPandas` — fixed-size batches amortize per-call setup
  * exactly like Arrow record batches do).
  *
  * The DECODE STEP IS A STUB: this container ships no media codecs, so
  * `decodeStub` derives deterministic fake dimensions/durations from the
  * content hash (clearly marked; swap in a real codec per modality in
  * deployment). Everything around it — schema, batch shape, partition
  * behavior, null handling — is real and tested.
  */
object Multimodal {

  final case class MediaRow(id: Long, modality: String, bytes: Array[Byte])

  final case class MediaFeatures(
      id: Long,
      modality: String,
      byteLen: Long,
      contentHash: Long,
      contentMd5: String, // md5 hex of the payload — dedup fingerprint
      width: Int, // images/video; 0 otherwise
      height: Int,
      durationMs: Long, // audio/video; 0 otherwise
      frameCount: Int) // video sample frames; 0 otherwise

  val BatchSize = 64

  /** STUB decode: deterministic pseudo-metadata from the content hash.
    * Replace with a real codec (e.g. image header parse) in deployment. */
  def decodeStub(modality: String, bytes: Array[Byte]): (Int, Int, Long, Int) = {
    val h = Hashing.hash64(bytes.length.toLong,
      if (bytes.nonEmpty) bytes(0).toLong else 0L,
      Hashing.hashString(modality))
    modality match {
      case "image" =>
        (320 + (math.abs(h) % 1600).toInt, 240 + (math.abs(h >> 16) % 900).toInt, 0L, 0)
      case "audio" =>
        (0, 0, 1000L + (math.abs(h) % 600000L), 0)
      case "video" =>
        (640 + (math.abs(h) % 1280).toInt, 360 + (math.abs(h >> 16) % 720).toInt,
          5000L + (math.abs(h >> 8) % 7200000L), 1 + (math.abs(h >> 24) % 32).toInt)
      case _ => (0, 0, 0L, 0)
    }
  }

  /** Batched feature extraction: partitions stream through in
    * `BatchSize`-row groups (the mapInPandas batch shape) — a real decoder
    * would initialize once per batch/partition, not per row. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-PARTITION setup (a real decoder's codec handles / model weights
      // initialize here, once, then serve every batch below)
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch work: a real pipeline hands `batch` to the codec in one
        // call (the Arrow-record-batch shape of mapInPandas)
        batch.iterator.map { m =>
          val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
          val (w, hgt, dur, frames) = decodeStub(m.modality, bytes)
          md5.reset()
          val hex = md5.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
          MediaFeatures(m.id, m.modality, bytes.length.toLong,
            Hashing.hash64(bytes.length.toLong, bytes.take(8).map(_.toLong).sum),
            hex, w, hgt, dur, frames)
        }
      }
    }
  }

  /** Frame-sampling plan for videos: deterministic, evenly spaced sample
    * timestamps — the shuffle-free explode a real sampler would feed to a
    * decode stage. */
  def sampleFramePlan(spark: SparkSession, feats: Dataset[MediaFeatures], maxFrames: Int): DataFrame = {
    import spark.implicits._
    feats.filter((f: MediaFeatures) => f.modality == "video" && f.frameCount > 0)
      .flatMap { f =>
        val n = math.min(maxFrames, f.frameCount)
        (0 until n).map { i =>
          (f.id, i, f.durationMs * (2L * i + 1) / (2L * n))
        }
      }.toDF("id", "frame_idx", "ts_ms")
  }
}
