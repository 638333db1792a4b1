package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.Hashing

/** Multimodal column plumbing for a training-data pipeline: media ride as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run batched inside `mapPartitions` (the JVM
  * analog of `mapInPandas` — fixed-size batches amortize per-call setup
  * exactly like Arrow record batches do).
  *
  * IMAGE dimensions are decoded FOR REAL: PNG IHDR and JPEG SOF markers
  * carry width×height in plain header bytes, no codec needed
  * (`parseImageDims`). WAV audio metadata is likewise REAL: the RIFF
  * fmt/data chunks carry sample rate, channels and declared payload size
  * (`parseWavMeta`), hence duration, codec-free. Decode for the
  * codec-REQUIRING formats (compressed audio, all video) remains a
  * clearly-marked stub (`decodeStub` — the container ships no media
  * codecs); everything around it — schema, batch shape, partition
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
      contentHexMd5: String, // md5 of uppercase-hex(payload): the oracle-
      // expressible fingerprint variant (DuckDB 1.0 md5 is VARCHAR-only,
      // so the engine-neutral form hashes the hex encoding, not the blob)
      width: Int, // images/video; 0 otherwise
      height: Int,
      durationMs: Long, // audio/video; 0 otherwise
      frameCount: Int, // video sample frames; 0 otherwise
      sampleRateHz: Int, // audio (real WAV header decode); 0 otherwise
      channels: Int) // audio; 0 otherwise

  /** Decoded per-row media metadata — the decode dispatch's result shape. */
  final case class DecodedMeta(
      width: Int, height: Int, durationMs: Long, frameCount: Int,
      sampleRateHz: Int, channels: Int)

  val BatchSize = 64

  // Hex tables for the per-row fingerprint encoding. The original
  // per-byte `f"$b%02x"` formatting was the measured hot path of q30/q68
  // (a String.format call per payload byte — ~µs each, dominating the
  // whole decode stage); a table lookup is the same bytes at array-copy
  // speed (guide §1.2: fix per-task work once the job shape is right).
  private val HexLower = "0123456789abcdef".toCharArray
  private val HexUpperB = "0123456789ABCDEF".getBytes("US-ASCII")

  /** Lowercase hex of a byte array (value-identical to the formatted
    * original). */
  private def hexLower(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(2 * i) = HexLower(v >>> 4)
      out(2 * i + 1) = HexLower(v & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The US-ASCII bytes of the UPPERCASE hex encoding — the md5 input of
    * the oracle-expressible fingerprint (DuckDB `md5(hex(bytes))`),
    * built directly as bytes so no intermediate String is allocated. */
  private def upperHexAscii(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(2 * i) = HexUpperB(v >>> 4)
      out(2 * i + 1) = HexUpperB(v & 0xf)
      i += 1
    }
    out
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Real pure-JVM image-header decode — dimensions live in plain header
    * bytes, no codec required (PNG spec: the 8-byte signature is followed
    * by the IHDR chunk whose first 8 data bytes are big-endian
    * width/height; JPEG/JFIF: the SOFn segment carries big-endian
    * height/width at data offsets 1/3). Returns None when the bytes are
    * neither format or the header is truncated. */
  def parseImageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null) return None
    // PNG: sig(8) len(4) 'IHDR'(4) width(4) height(4)
    if (bytes.length >= 24 &&
      (0 until 8).forall(i => bytes(i) == PngSignature(i)) &&
      bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      return Some((be32(bytes, 16), be32(bytes, 20)))
    // JPEG: SOI (FFD8), then marker segments; SOFn (C0-CF except the
    // non-frame C4/C8/CC) = len(2) precision(1) height(2) width(2)
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // lost sync: not a JPEG stream
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
        else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 < bytes.length)
            return Some((be16(bytes, i + 7), be16(bytes, i + 5)))
          return None
        } else {
          val segLen = be16(bytes, i + 2)
          if (segLen < 2) return None
          i += 2 + segLen
        }
      }
      return None
    }
    None
  }

  /** Synthesize a minimal, well-formed PNG header (33 bytes: signature +
    * IHDR with the given dimensions; CRC left zero — the oracle cannot
    * compute CRC32 and `parseImageDims` reads dimensions only). Used by
    * the generator-side of q30 and the specs. */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(PngSignature)
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC (unvalidated by dimension readers)
    out.array()
  }

  /** WAV (RIFF/WAVE) audio metadata, parsed from plain header bytes — the
    * same codec-free header trick as PNG/JPEG (VERDICT r05 #5): the RIFF
    * container is 'RIFF' size 'WAVE' then chunks of id(4)+size(LE32); the
    * 'fmt ' chunk carries format/channels/sampleRate/byteRate (all LE) and
    * the 'data' chunk declares the sample-payload size, from which
    * durationMs = dataSize·1000/byteRate. The declared data size is used
    * (not the bytes present): crawled WAVs are routinely truncated, and
    * the header is the format's own statement of duration. Returns None
    * on non-WAV bytes, a truncated header, or a nonsensical byteRate. */
  final case class WavMeta(
      sampleRateHz: Int, channels: Int, bitsPerSample: Int, durationMs: Long)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def ascii4(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  def parseWavMeta(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (ascii4(bytes, 0) != "RIFF" || ascii4(bytes, 8) != "WAVE") return None
    var sampleRate = 0; var chans = 0; var bits = 0; var byteRate = 0L
    var dataSize = -1L
    // the walk index is a LONG: a (hostile) ~4 GB declared chunk size
    // overflows an int step to negative — an infinite loop or a negative
    // array index on crawled garbage (caught by the fuzz spec)
    var i = 12L
    while (i + 8 <= bytes.length && (dataSize < 0 || sampleRate == 0)) {
      val at = i.toInt
      val id = ascii4(bytes, at)
      val size = le32(bytes, at + 4)
      // the fmt chunk's own declared size must cover the 16 PCM fields —
      // a short declared size with trailing bytes present would otherwise
      // read the NEXT chunk's bytes as channels/sampleRate (ADVICE r06)
      if (id == "fmt " && size >= 16 && i + 24 <= bytes.length) {
        chans = le16(bytes, at + 10)
        sampleRate = le32(bytes, at + 12).toInt
        byteRate = le32(bytes, at + 16)
        bits = le16(bytes, at + 22)
      } else if (id == "data") {
        dataSize = size // declared, possibly beyond the bytes present
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    if (sampleRate <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(WavMeta(sampleRate, chans, bits, dataSize * 1000L / byteRate))
  }

  /** Synthesize a canonical 44-byte WAV header (PCM fmt + data chunk
    * declaring `nSamples` frames; no sample payload — [[parseWavMeta]]
    * reads the declared size). The q68 fixture generator and the oracle
    * reconstruct this byte-identically. */
  def wavHeader(sampleRateHz: Int, channels: Int, bitsPerSample: Int, nSamples: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    // the RIFF size fields are 32-bit: an oversized payload must fail
    // loudly, not silently truncate into a corrupt header (ADVICE r06)
    require(dataSize >= 0 && dataSize <= 0xFFFFFFFFL - 36,
      s"WAV data size $dataSize exceeds the 32-bit RIFF size field")
    val byteRate = sampleRateHz.toLong * blockAlign
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt((36L + dataSize).toInt)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRateHz)
      .putInt(byteRate.toInt)
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize.toInt)
    out.array()
  }

  /** Decode dispatch: REAL header parse for images (PNG/JPEG) and WAV
    * audio, stub for the codec-requiring modalities (compressed audio,
    * all video). */
  def decode(modality: String, bytes: Array[Byte]): DecodedMeta =
    modality match {
      case "image" =>
        parseImageDims(bytes)
          .map { case (w, h) => DecodedMeta(w, h, 0L, 0, 0, 0) }
          .getOrElse(stubMeta(modality, bytes))
      case "audio" =>
        parseWavMeta(bytes)
          .map(m => DecodedMeta(0, 0, m.durationMs, 0, m.sampleRateHz, m.channels))
          .getOrElse(stubMeta(modality, bytes))
      case _ => stubMeta(modality, bytes)
    }

  private def stubMeta(modality: String, bytes: Array[Byte]): DecodedMeta = {
    val (w, h, dur, frames) = decodeStub(modality, bytes)
    DecodedMeta(w, h, dur, frames, 0, 0)
  }

  /** STUB decode: deterministic pseudo-metadata from the content hash.
    * Replace with a real codec (audio/video; unparseable images) in
    * deployment — this container ships no media codecs. */
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
          val meta = decode(m.modality, bytes)
          md5.reset()
          val hex = hexLower(md5.digest(bytes))
          md5.reset()
          val hexFp = hexLower(md5.digest(upperHexAscii(bytes)))
          MediaFeatures(m.id, m.modality, bytes.length.toLong,
            Hashing.hash64(bytes.length.toLong, bytes.take(8).map(_.toLong).sum),
            hex, hexFp, meta.width, meta.height, meta.durationMs,
            meta.frameCount, meta.sampleRateHz, meta.channels)
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
