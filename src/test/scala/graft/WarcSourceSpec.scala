package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcSource

/** WARC ingest (S1 at Common-Crawl scale): record framing, HTTP header
  * stripping, record-type filtering, multi-member gzip, and the handoff
  * into the extraction stage. */
class WarcSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def record(
      warcType: String,
      uri: Option[String],
      date: String,
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    uri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    sb.append(s"WARC-Date: $date\r\n")
    sb.append("WARC-Record-ID: <urn:uuid:test>\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream()
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private val html1 = "<html><head><title>Alpha</title></head><body><p>one two three</p></body></html>"
  private val html2 = "<html><head><title>Beta</title></head><body><p>vier fünf</p></body></html>"

  private def httpResponse(body: String): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" + body)
      .getBytes(UTF_8)

  private def warcBytes: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", None, "2024-01-01T00:00:00Z",
      "software: test\r\n".getBytes(UTF_8)))
    out.write(record("request", Some("https://a.example/1"), "2024-01-01T00:00:01Z",
      "GET /1 HTTP/1.1\r\n\r\n".getBytes(UTF_8)))
    out.write(record("response", Some("https://a.example/1"), "2024-01-02T03:04:05Z",
      httpResponse(html1)))
    out.write(record("conversion", Some("<https://b.example/2>"), "2024-02-03T04:05:06Z",
      html2.getBytes(UTF_8)))
    out.toByteArray
  }

  test("plain .warc: framing, type filter, HTTP header strip, <>-unwrap") {
    val dir = Files.createTempDirectory("warc-plain-")
    Files.write(dir.resolve("part-0.warc"), warcBytes)
    val pages = WarcSource.readPages(spark, dir.toString)
      .collect().sortBy(_.url)
    assert(pages.length == 2) // warcinfo + request skipped
    val p1 = pages.find(_.url == "https://a.example/1").get
    assert(new String(p1.html, UTF_8) == html1) // HTTP headers stripped
    assert(p1.warc_ts.toInstant.toString == "2024-01-02T03:04:05Z")
    val p2 = pages.find(_.url == "https://b.example/2").get // <>-unwrapped
    assert(new String(p2.html, UTF_8) == html2) // conversion body verbatim
  }

  test("multi-member .warc.gz (Common Crawl's per-record compression)") {
    val dir = Files.createTempDirectory("warc-gz-")
    val out = new ByteArrayOutputStream()
    // two gzip members in one file, one record each
    for (rec <- Seq(
        record("response", Some("https://a.example/1"), "2024-01-02T03:04:05Z",
          httpResponse(html1)),
        record("conversion", Some("https://b.example/2"), "2024-02-03T04:05:06Z",
          html2.getBytes(UTF_8)))) {
      val gz = new GZIPOutputStream(out)
      gz.write(rec); gz.finish()
    }
    Files.write(dir.resolve("part-0.warc.gz"), out.toByteArray)
    val pages = WarcSource.readPages(spark, dir.toString).collect().sortBy(_.url)
    assert(pages.map(_.url).toSeq ==
      Seq("https://a.example/1", "https://b.example/2"))
  }

  test("malformed records degrade gracefully, never fail the task") {
    // bad WARC-Date → record kept with epoch-0 timestamp
    val badDate = record("response", Some("https://c.example/3"),
      "not-a-date", httpResponse(html1))
    var skips = List.empty[String]
    val recs1 = WarcSource.parseWarcStream(
      new java.io.ByteArrayInputStream(badDate), skips ::= _).toList
    assert(recs1.map(_.url) == List("https://c.example/3"))
    assert(recs1.head.ts.getTime == 0L)
    assert(skips.exists(_.contains("bad WARC-Date")))

    // unparseable Content-Length → framing lost: stream abandoned at that
    // record, everything BEFORE it survives, no exception
    val good = record("response", Some("https://a.example/1"),
      "2024-01-02T03:04:05Z", httpResponse(html1))
    val corrupt = good ++
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.example/\r\n" +
        "Content-Length: twelve\r\n\r\n").getBytes(UTF_8) ++
      record("response", Some("https://never.example/"), "2024-01-01T00:00:00Z",
        httpResponse(html2))
    skips = Nil
    val recs2 = WarcSource.parseWarcStream(
      new java.io.ByteArrayInputStream(corrupt), skips ::= _).toList
    assert(recs2.map(_.url) == List("https://a.example/1"))
    assert(skips.exists(_.contains("Content-Length")))

    // truncated payload (file cut mid-record) → clean stop, no exception
    val truncated = good.take(good.length - 40) // cut inside html1's body
    skips = Nil
    val recs3 = WarcSource.parseWarcStream(
      new java.io.ByteArrayInputStream(truncated), skips ::= _).toList
    assert(recs3.isEmpty)
    assert(skips.exists(_.contains("truncated")))

    // a bad file among good ones: ingest keeps the good file's pages
    val dir = Files.createTempDirectory("warc-mixed-")
    Files.write(dir.resolve("good.warc"), warcBytes)
    Files.write(dir.resolve("bad.warc.gz"), "not gzip at all".getBytes(UTF_8))
    val pages = WarcSource.readPages(spark, dir.toString).collect()
    assert(pages.length == 2)
  }

  test("property: random record mixes round-trip through the parser") {
    // deterministic pseudo-random corpora: every response/conversion
    // record with a URI comes back with exactly its body bytes, in order,
    // regardless of record mix, body sizes, or binary content
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(9000 + trial)
      val types = Vector("response", "conversion", "request", "warcinfo", "metadata")
      val recs = (0 until (1 + rnd.nextInt(12))).map { i =>
        val t = types(rnd.nextInt(types.length))
        val body = new Array[Byte](rnd.nextInt(2000))
        rnd.nextBytes(body)
        val payload =
          if (t == "response") httpResponse("") ++ body // header + binary body
          else body
        val uri = if (rnd.nextBoolean() || t == "response" || t == "conversion")
          Some(s"https://ex$trial.org/$i") else None
        (t, uri, body, record(t, uri, "2024-06-01T00:00:00Z",
          if (t == "response") (s"HTTP/1.1 200 OK\r\nContent-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
          else payload))
      }
      val out = new ByteArrayOutputStream()
      recs.foreach(r => out.write(r._4))
      val parsed = WarcSource.parseWarcStream(
        new java.io.ByteArrayInputStream(out.toByteArray)).toList
      val expected = recs.collect {
        case (t, Some(u), body, _) if t == "response" || t == "conversion" => (u, body)
      }
      assert(parsed.map(_.url) == expected.map(_._1), s"trial $trial urls")
      parsed.zip(expected).foreach { case (got, (_, body)) =>
        assert(java.util.Arrays.equals(got.body, body), s"trial $trial body")
      }
    }
  }

  test("WARC pages flow into the extraction stage (title + text)") {
    val dir = Files.createTempDirectory("warc-extract-")
    Files.write(dir.resolve("part-0.warc"), warcBytes)
    val extracted = graft.pipeline.EntityResolution
      .extract(spark, WarcSource.readPages(spark, dir.toString))
      .collect().sortBy(_.url)
    assert(extracted.map(_.title).toSeq == Seq("Alpha", "Beta"))
    assert(extracted.forall(_.text.nonEmpty))
  }
}
