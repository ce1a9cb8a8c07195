package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t37 sniff lattice: BOM > Content-Type header > meta prescan >
  * UTF-8 default; CRLF and bare-LF header framing; non-HTTP payloads
  * decoded whole (never truncated at an incidental blank line);
  * fallback decodes flagged via charset_known.
  */
class HttpPayloadSpec extends SparkTestBase {
  import spark.implicits._

  private def decodeAll(payloads: Seq[Array[Byte]]) =
    HttpPayload.withDecodedEntity(
      payloads.zipWithIndex.map { case (p, i) => (i, p) }.toDF("i", "payload"),
      "payload")
      .orderBy($"i")
      .select($"charset", $"charset_known", $"html")
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))

  test("header charset wins over meta; aliases canonicalize; LF framing accepted") {
    val out = decodeAll(Seq(
      // CRLF + quoted alias label
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"latin-1\"\r\n\r\ncafé"
        ).getBytes("ISO-8859-1"),
      // bare-LF headers (sloppy server), meta-only charset
      ("HTTP/1.1 200 OK\nContent-Type: text/html\n\n<meta charset=Shift_JIS><p>カタカナ</p>"
        ).getBytes("Shift_JIS"),
      // header beats a LYING meta tag (the browser rule)
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<meta charset=latin-1>é"
        ).getBytes("UTF-8"),
      // no label anywhere: UTF-8 default
      "HTTP/1.1 200 OK\r\nServer: x\r\n\r\nünïcode".getBytes("UTF-8")))
    assert(out(0) == (("iso-8859-1", true, "café")))
    assert(out(1) == (("shift_jis", true, "<meta charset=Shift_JIS><p>カタカナ</p>")))
    assert(out(2) == (("utf-8", true, "<meta charset=latin-1>é")))
    assert(out(3) == (("utf-8", true, "ünïcode")))
  }

  test("BOM wins outright and the BOM code point is stripped") {
    val body = "utf16 content ✓"
    val utf16 = Array(0xFF.toByte, 0xFE.toByte) ++ body.getBytes("UTF-16LE")
    val utf8Bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "bomé".getBytes("UTF-8")
    val out = decodeAll(Seq(
      // header LIES latin-1; the BOM overrules it
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=latin-1\r\n\r\n".getBytes("US-ASCII") ++ utf16,
      "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII") ++ utf8Bom))
    assert(out(0) == (("utf-16le", true, body)))
    assert(out(1) == (("utf-8", true, "bomé")))
  }

  test("non-HTTP payloads decode whole — an incidental blank line truncates nothing") {
    val raw = "line one\r\n\r\nline two é".getBytes("UTF-8")
    val out = decodeAll(Seq(raw))
    assert(out(0) == (("utf-8", true, "line one\r\n\r\nline two é")))
  }

  test("headers-only capture (no blank line) yields an empty entity, not the status line") {
    val out = decodeAll(Seq(
      "HTTP/1.1 204 No Content\r\nServer: x".getBytes("US-ASCII")))
    assert(out(0) == (("utf-8", true, "")))
  }

  test("a parameter NAME ending in 'charset' cannot fabricate a label (header or meta)") {
    val out = decodeAll(Seq(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; x-amz-meta-charset=ebcdic\r\n\r\né"
        ).getBytes("UTF-8"),
      ("HTTP/1.1 200 OK\r\n\r\n<meta data-charset=koi8-r content=x>é").getBytes("UTF-8")))
    assert(out(0) == (("utf-8", true, "é")), s"got ${out(0)}")
    assert(out(1)._1 == "utf-8", s"meta attr name fabricated a charset: ${out(1)}")
  }

  test("unknown label: UTF-8 fallback, flagged not-known") {
    val out = decodeAll(Seq(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-nope\r\n\r\nfallbäck"
        .getBytes("UTF-8")))
    assert(out(0) == (("x-nope", false, "fallbäck")))
  }

  test("crawlDocs decodes Latin-1 and Shift-JIS pages to clean text (no mojibake keys)") {
    def rec(uri: String, id: String, headers: String, body: Array[Byte]): Array[Byte] = {
      val payload = headers.getBytes("US-ASCII") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:$id>\r\n" +
        s"WARC-Date: 2026-08-16T00:00:00Z\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
        payload ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val latin = (1 to 40).map(i => s"mot$i").mkString(" ") + " café déjà"
    val sjis = (1 to 40).map(i => s"w$i").mkString(" ") + " カタカナ文字です"
    val archive =
      rec("https://fr.example.com/a", "L1",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=latin-1\r\n\r\n",
        s"<html><body><p>$latin</p></body></html>".getBytes("ISO-8859-1")) ++
      rec("https://jp.example.com/b", "S1",
        "HTTP/1.1 200 OK\nContent-Type: text/html\n\n", // bare-LF headers
        s"<html><head><meta charset=Shift_JIS></head><body><p>$sjis</p></body></html>"
          .getBytes("Shift_JIS"))
    val records = Seq(("cs.warc", archive)).toDF("path", "content")
    val docs = CrawlIngest.crawlDocs(graft.sources.Warc.records(records).toDF())
      .orderBy($"url").collect().map(r => (r.getString(1), r.getString(2)))
    assert(docs.map(_._1).toSeq ==
      Seq("https://fr.example.com/a", "https://jp.example.com/b"))
    assert(docs(0)._2 == latin, s"latin-1 mojibake: ${docs(0)._2}")
    assert(docs(1)._2 == sjis, s"shift-jis mojibake: ${docs(1)._2}")
  }
}
