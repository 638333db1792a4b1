package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.sql.Timestamp
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.WebPage

/** WARC ingest for Common-Crawl-style archives — the at-scale form of S1
  * (SURVEY §2.1: "at real scale `spark.read.format("binaryFile")`/WARC
  * reader"). Feeds the `webpages(url, warc_ts, html, text, lang)` table
  * the rest of the pipeline reads.
  *
  * Scale shape: Common Crawl ships ~thousands of ~1 GB archives per
  * segment; FILE-level parallelism (one task per archive via the
  * binaryFile source) is the natural split — the same layout production
  * CC Spark jobs use. Per-record gzip members (CC's compression scheme)
  * decode with java.util.zip's multi-member GZIPInputStream; no external
  * codecs.
  *
  * Parsing follows the public WARC/1.0 format (ISO 28500): records are a
  * `WARC/…` version line, CRLF headers, a Content-Length payload, and a
  * CRLF CRLF trailer. `response`/`conversion` records with a
  * WARC-Target-URI are emitted; response payloads have their HTTP header
  * block stripped so `html` is the raw body bytes.
  */
object WarcSource {

  final case class WarcRecord(
      url: String,
      ts: Timestamp,
      warcType: String,
      body: Array[Byte])

  /** Read a CRLF-terminated header line as ISO-8859-1 (header charset per
    * spec); null at EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    if (n > Int.MaxValue) throw new EOFException(s"record too large: $n")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) throw new EOFException("truncated WARC payload")
      off += r
    }
    buf
  }

  /** Offset just past the HTTP header block, or 0 if the payload is not an
    * HTTP message (conversion records carry the body directly). */
  private def httpBodyOffset(payload: Array[Byte]): Int = {
    if (payload.length < 5 ||
      !(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' && payload(3) == 'P'))
      return 0
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') return i + 4
      i += 1
    }
    0
  }

  /** Stream-parse every record of one (decompressed) WARC stream.
    * Malformed records never propagate out of the iterator — one bad
    * record in a ~1 GB archive must not kill that file's whole ingest
    * task. Recoverable damage (bad WARC-Date) falls back per-field; a
    * corrupt Content-Length or truncated payload makes the rest of the
    * stream unframeable (record boundaries ARE the length), so the stream
    * is abandoned at that point and `onSkip` is told why. */
  def parseWarcStream(
      in: InputStream,
      onSkip: String => Unit = _ => ()): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = advance()

      private def advance(): WarcRecord = {
        try {
          while (true) {
            var line = readLine(in)
            while (line != null && line.isEmpty) line = readLine(in) // inter-record CRLFs
            if (line == null) return null
            if (!line.startsWith("WARC/")) {
              onSkip(s"non-WARC framing line, abandoning stream tail: " +
                line.take(64))
              return null
            }
            val headers = scala.collection.mutable.Map.empty[String, String]
            var h = readLine(in)
            while (h != null && h.nonEmpty) {
              val idx = h.indexOf(':')
              if (idx > 0) headers(h.substring(0, idx).trim.toLowerCase) =
                h.substring(idx + 1).trim
              h = readLine(in)
            }
            val lenOpt = headers.get("content-length") match {
              case Some(v) =>
                val parsed = v.toLongOption.filter(_ >= 0)
                if (parsed.isEmpty)
                  onSkip(s"unparseable Content-Length '$v' — record boundaries " +
                    "are lost, abandoning stream tail")
                parsed
              case None => Some(0L)
            }
            if (lenOpt.isEmpty) return null
            val payload = readFully(in, lenOpt.get)
            val warcType = headers.getOrElse("warc-type", "")
            val uri = headers.get("warc-target-uri")
            if ((warcType == "response" || warcType == "conversion") && uri.isDefined) {
              val ts = headers.get("warc-date")
                .flatMap(d =>
                  scala.util.Try(Timestamp.from(java.time.Instant.parse(d)))
                    .recover { case _ => onSkip(s"bad WARC-Date '$d', using epoch 0")
                      new Timestamp(0L) }.toOption)
                .getOrElse(new Timestamp(0L))
              val off = if (warcType == "response") httpBodyOffset(payload) else 0
              val body =
                if (off == 0) payload
                else java.util.Arrays.copyOfRange(payload, off, payload.length)
              return WarcRecord(
                // CC WARC-Target-URIs are sometimes <>-wrapped
                uri.get.stripPrefix("<").stripSuffix(">"), ts, warcType, body)
            }
            // other record types (warcinfo, request, metadata): skip
          }
          null // unreachable
        } catch {
          case e: EOFException =>
            onSkip(s"truncated record (${e.getMessage}), abandoning stream tail")
            null
          case e: java.io.IOException =>
            onSkip(s"stream error (${e.getMessage}), abandoning stream tail")
            null
        }
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Read a directory (or glob) of `.warc` / `.warc.gz` files into the
    * engine's webpages shape. `text`/`lang` are left empty — extraction
    * (EntityResolution.extract) owns html→text with its byte-identical
    * invariant, and language ID (LanguageId) runs downstream.
    *
    * Scale shape: files are ENUMERATED on the driver (a cheap metadata
    * listing) and STREAMED record-by-record inside tasks — one partition
    * per archive, records parsed straight off the open file handle. The
    * earlier `binaryFile` approach materialized each ~1 GB archive as one
    * byte array per task; at Common-Crawl scale that is an avoidable
    * 1 GB/task heap spike (and a hard 2 GB ceiling). Peak memory per task
    * is now one record, not one archive. */
  def readPages(spark: SparkSession, path: String): Dataset[WebPage] = {
    import spark.implicits._
    val skipped = spark.sparkContext.longAccumulator("warcSkippedRecords")
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val listed = fs.globStatus(p) match {
      case null | Array() => // not a glob match: treat as dir (or file)
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) buf += it.next().getPath.toString
        buf.toSeq
      case matches =>
        matches.toSeq.flatMap { st =>
          if (st.isDirectory) {
            val it = fs.listFiles(st.getPath, true)
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (it.hasNext) buf += it.next().getPath.toString
            buf.toSeq
          } else Seq(st.getPath.toString)
        }
    }
    val warcFiles = listed.filter(f =>
      f.endsWith(".warc") || f.endsWith(".warc.gz")).sorted
    spark
      .createDataset(warcFiles)
      .repartition(math.max(1, warcFiles.size)) // one task per archive
      .flatMap { file =>
        val onSkip = (reason: String) => {
          skipped.add(1L)
          System.err.println(s"[warc] $file: $reason")
        }
        val fp = new org.apache.hadoop.fs.Path(file)
        val taskFs = fp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val inOpt: Option[InputStream] =
          try {
            val raw = new BufferedInputStream(taskFs.open(fp), 1 << 16)
            if (file.endsWith(".gz"))
              Some(new BufferedInputStream(new GZIPInputStream(raw, 1 << 16)))
            else Some(raw)
          } catch { case e: java.io.IOException =>
            onSkip(s"unreadable (${e.getMessage}), skipping file"); None }
        inOpt.iterator.flatMap { in =>
          val base = parseWarcStream(in, onSkip).map(r =>
            WebPage(url = r.url, warc_ts = r.ts, html = r.body, text = "", lang = ""))
          // close the handle when the record stream is exhausted
          new Iterator[WebPage] {
            override def hasNext: Boolean = {
              val h = base.hasNext
              if (!h) scala.util.Try(in.close())
              h
            }
            override def next(): WebPage = base.next()
          }
        }
      }
  }
}
