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
