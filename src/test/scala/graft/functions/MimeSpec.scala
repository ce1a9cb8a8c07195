package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** X26: magic-byte MIME sniffing — signature table, brand dispatch,
  * HTML/XML text probe, NUL fallback, and the crawl-door gate.
  */
class MimeSpec extends SparkTestBase {

  private def sniff(bytes: Array[Byte]): String = {
    val r = Mime.sniff(bytes)
    if (r == null) null else r.toString
  }
  private def s(str: String): Array[Byte] = str.getBytes("ISO-8859-1")

  test("binary signatures") {
    assert(sniff(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1)) == "image/png")
    assert(sniff(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte)) == "image/jpeg")
    assert(sniff(s("GIF87a.....")) == "image/gif")
    assert(sniff(s("RIFFxxxxWEBPVP8 ")) == "image/webp")
    assert(sniff(s("RIFFxxxxWAVEfmt ")) == "audio/wav")
    assert(sniff(s("RIFFxxxxAVI LIST")) == "video/x-msvideo")
    assert(sniff(s("RIFFxxxxELSE")) == "application/octet-stream")
    assert(sniff(s("RIFFxxx")) == "text/plain") // truncated RIFF (<12 bytes) falls to the text probe
    assert(sniff(s("\u0000\u0000\u0000\u0010ftypisom")) == "video/mp4")
    assert(sniff(s("\u0000\u0000\u0000\u0010ftypM4A mdat")) == "audio/mp4")
    assert(sniff(s("%PDF-1.7 blah")) == "application/pdf")
    assert(sniff(Array[Byte](0x1f, 0x8b.toByte, 8, 0)) == "application/gzip")
    assert(sniff(s("PKzipdata")) == "application/zip")
    assert(sniff(s("OggS page")) == "audio/ogg")
    assert(sniff(s("ID3tag")) == "audio/mpeg")
  }

  test("text probe: whitespace/BOM tolerance, case-insensitive tags") {
    assert(sniff(s("<!DOCTYPE html><p>x")) == "text/html")
    assert(sniff(s("\n\t  <HTML><body>")) == "text/html")
    assert(sniff(s("ï»¿<html>")) == "text/html") // UTF-8 BOM
    assert(sniff(s("<?xml version=\"1.0\"?>")) == "text/xml")
    assert(sniff(s("<br/>")) == "text/html")
    assert(sniff(s("<param>")) == "text/plain") // 'p' needs a terminator
    assert(sniff(s("plain old text")) == "text/plain")
    assert(sniff(s("")) == "text/plain")
    assert(sniff(s("bin") ++ Array[Byte](0) ++ s("ary")) == "application/octet-stream")
    assert(sniff(null) == null)
  }

  test("SQL surface: sniff_mime registered (X26)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sniff_mime(CAST('%PDF-1.4' AS BINARY)) AS a, " +
        "sniff_mime(CAST('  <div>hi' AS BINARY)) AS b").head()
    assert(r.getString(0) == "application/pdf")
    assert(r.getString(1) == "text/html")
  }

  test("crawl door drops binary-media entities, keeps unprovable text") {
    import spark.implicits._
    def http(body: Array[Byte]): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n").getBytes("ISO-8859-1") ++ body
    val recs = Seq(
      ("response", false, "https://ok.com/page", "2025-01-01T00:00:00Z", "a.warc", 0L,
        http(s("<html><p>Real page content here, long enough to extract.</p></html>"))),
      ("response", false, "https://ok.com/logo.png", "2025-01-01T00:00:00Z", "a.warc", 1L,
        http(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 9, 9))),
      ("response", false, "https://ok.com/doc.pdf", "2025-01-01T00:00:00Z", "a.warc", 2L,
        http(s("%PDF-1.5 stream"))),
      // a NUL-laden entity WITHOUT a known signature must survive to
      // the charset decoder (BOM-less UTF-16 looks exactly like this)
      ("response", false, "https://ok.com/utf16ish", "2025-01-01T00:00:00Z", "a.warc", 3L,
        http(s("<\u0000h\u0000t\u0000m\u0000l\u0000>\u0000"))))
      .toDF("warc_type", "truncated", "target_uri", "warc_date", "path", "offset", "payload")
    val out = CrawlGateProbe.run(recs)
    assert(out.contains("https://ok.com/page"))
    assert(!out.contains("https://ok.com/logo.png"))
    assert(!out.contains("https://ok.com/doc.pdf"))
    assert(out.contains("https://ok.com/utf16ish"))
  }
}

/** Small indirection so the spec reads clean. */
private object CrawlGateProbe {
  def run(recs: org.apache.spark.sql.DataFrame): Set[String] =
    graft.operators.CrawlIngest.crawlDocs(recs)
      .select("url").collect().map(_.getString(0)).toSet
}
