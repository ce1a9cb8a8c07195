package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** Charset-aware HTTP payload decode (t37) — the step between S8's
  * raw WARC capture and t34's HTML extraction. A large fraction of
  * the real web is not UTF-8 (Latin-1, Shift-JIS, GBK, Windows-125x);
  * casting captured bytes to string mojibakes those pages, which then
  * poisons content-dedup keys, gram novelty, and quality scores. This
  * operator sniffs the charset the way a browser does and decodes the
  * entity bytes with it:
  *
  *  1. BOM on the entity bytes (UTF-8 / UTF-16LE / UTF-16BE) — wins
  *     outright (the WHATWG rule);
  *  2. `charset=` parameter of the Content-Type response header
  *     (headers = the capture before its first blank line; CRLF and
  *     bare-LF header framing both accepted — sloppy servers emit
  *     LF-only);
  *  3. `<meta charset=...>` / `<meta http-equiv... charset=...>` in
  *     the first 1024 chars of the entity (the HTML5 prescan window);
  *  4. UTF-8 default.
  *
  * The label then runs through the web-alias table (latin-1,
  * sjis, gb2312, ... — [[graft.functions.Charsets]]) and the X18
  * codegen decode; unknown labels fall back to UTF-8 with a
  * countable `charset_known` flag. Non-HTTP payloads (no status
  * line) are decoded whole — never truncated at an incidental blank
  * line.
  *
  * Scale shape: pure per-row columnar string/byte work on top of the
  * byte-transparent ISO-8859-1 view (bytes → latin-1 chars is a
  * bijection, so header/BOM sniffing needs no second byte pass and
  * the entity bytes are recovered exactly for the real decode) — the
  * t34 class: map-only at any corpus size, whole-stage codegen, no
  * shuffle, no UDF.
  */
object HttpPayload {

  /** Sloppy-web label → canonical lowercase label — DERIVED from
    * [[graft.functions.Charsets]]' alias table (one source of truth:
    * the label this column reports and the charset the X18 decode
    * actually resolves cannot drift; the PslRules lesson applied to
    * charsets). Identity entries drop out — the coalesce fallback
    * already passes unmapped labels through.
    */
  private[operators] val CanonicalAliases: Map[String, String] =
    graft.functions.Charsets.WebAliases
      .map { case (k, v) => k -> v.toLowerCase(java.util.Locale.ROOT) }
      .filter { case (k, v) => k != v }

  /** Canonical lowercase form of a charset label (quotes stripped,
    * lowercased, alias-mapped; unknown labels pass through so the
    * fallback stays countable under the raw label).
    */
  def canonicalCharset(cs: Column): Column = {
    val t = lower(trim(regexp_replace(cs, "[\"']", "")))
    coalesce(element_at(typedLit(CanonicalAliases), t), t)
  }

  /** Byte-transparent view of the whole captured message: ISO-8859-1
    * maps each byte to the code point of the same value, so regex
    * sniffing over this string IS byte-level sniffing, and
    * `encode(view, 'ISO-8859-1')` recovers the exact original bytes.
    */
  private def messageView(payload: Column): Column =
    decode(payload, "ISO-8859-1")

  private def isHttp(view: Column): Column = view.startsWith("HTTP/")

  // \z, not $: Java's $ also matches before a FINAL newline, which
  // would end a headers-only capture one line early. Bare-LF blank
  // lines accepted (\r?\n\r?\n) — sloppy servers emit LF framing.
  private val HeaderSplit = "(?s)^(.*?)(?:\r?\n\r?\n|\\z)"

  private def headersView(view: Column): Column =
    when(isHttp(view), regexp_extract(view, HeaderSplit, 1)).otherwise(lit(""))

  /** Entity (body) in the byte-transparent view: everything after the
    * first blank line for HTTP captures; the WHOLE payload otherwise
    * (a non-HTTP record must not lose content at an incidental blank
    * line).
    */
  private[operators] def entityView(view: Column): Column =
    when(isHttp(view), regexp_replace(view, "(?s)^.*?(?:\r?\n\r?\n|\\z)", ""))
      .otherwise(view)

  /** The sniffed, canonicalized charset label of a captured HTTP
    * message (BOM > Content-Type header > meta prescan > utf-8).
    */
  def sniffCharset(payload: Column): Column = {
    val view = messageView(payload)
    val entity = entityView(view)
    val bom = when(entity.startsWith("\u00EF\u00BB\u00BF"), "utf-8")
      .when(entity.startsWith("\u00FF\u00FE"), "utf-16le")
      .when(entity.startsWith("\u00FE\u00FF"), "utf-16be")
    // the boundary class before 'charset' keeps a parameter whose
    // NAME merely ends in it (x-amz-meta-charset=…) from fabricating
    // a label; ';' or whitespace is what precedes the real parameter
    val hdrCs = regexp_extract(headersView(view),
      "(?im)^content-type\\s*:[^\r\n]*?[;\\s]charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+-]+)", 1)
    val metaCs = regexp_extract(substring(entity, 1, 1024),
      "(?i)<meta[^>]*?[\\s;\"'=]charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+-]+)", 1)
    coalesce(bom, canonicalCharset(coalesce(
      nullif(hdrCs, lit("")), nullif(metaCs, lit("")), lit("utf-8"))))
  }

  /** Entity text decoded with a sniffed charset label (X18; unknown
    * label → UTF-8), leading BOM code point stripped.
    */
  def decodedEntity(payload: Column, charset: Column): Column = {
    val entityBytes = encode(entityView(messageView(payload)), "ISO-8859-1")
    regexp_replace(
      GraftExpressions.charsetDecode(entityBytes, charset), "^\uFEFF", "")
  }

  /** One-call form: adds (charset, charset_known, html) — the crawl
    * front door's decode step ([[CrawlIngest.crawlDocs]] consumes
    * `html`; `charset_known=false` counts fallback-decoded captures).
    */
  def withDecodedEntity(df: DataFrame, payloadCol: String): DataFrame = {
    Seq("charset", "charset_known", "html").foreach(c =>
      require(!df.columns.contains(c),
        s"withDecodedEntity: input already has a '$c' column — rename it first"))
    df.withColumn("charset", sniffCharset(col(payloadCol)))
      .withColumn("charset_known", GraftExpressions.charsetKnown(col("charset")))
      .withColumn("html", decodedEntity(col(payloadCol), col("charset")))
  }

  /** The Location header of a captured HTTP message — the redirect
    * target (possibly relative; resolve against the capture's URL
    * with X25 / [[graft.operators.Redirects.chains]]). NULL when
    * absent or for non-HTTP captures.
    */
  def httpLocation(payload: Column): Column = {
    val loc = trim(regexp_extract(headersView(messageView(payload)),
      "(?im)^location\\s*:\\s*([^\r\n]+)", 1))
    when(loc === "", null).otherwise(loc)
  }

  /** Magic-byte MIME of the captured message's ENTITY (X26) — the
    * bytes-don't-lie companion to [[withHttpMeta]]'s header
    * `mime_type` (servers mislabel; the signature table doesn't).
    * For non-HTTP captures the whole payload is the entity.
    */
  def sniffedMime(payload: Column): Column =
    GraftExpressions.sniffMime(
      encode(entityView(messageView(payload)), "ISO-8859-1"))

  /** The X26 labels that are CONFIDENT binary-media signatures — the
    * crawl text door drops these before extraction (they belong to
    * the m01-class media pipeline). Deliberately NOT including
    * text/plain or application/octet-stream: an encoding the sniffer
    * can't prove text (UTF-16 without BOM reads as NUL-laden bytes)
    * must still reach the charset decoder, which owns encodings.
    */
  val BinaryMimes: Seq[String] = Seq(
    "image/png", "image/jpeg", "image/gif", "image/webp",
    "audio/wav", "video/x-msvideo", "video/mp4", "audio/mp4",
    "application/pdf", "application/gzip", "application/zip",
    "audio/ogg", "audio/mpeg")

  /** Fetch-metadata columns from a captured HTTP message — the audit
    * surface a crawl store keeps next to the payload: `http_status`
    * (int, NULL for non-HTTP captures) and `mime_type` (lowercased
    * Content-Type media type, parameters stripped, NULL when absent).
    * Same byte-transparent view as the charset sniff; map-only.
    */
  def withHttpMeta(df: DataFrame, payloadCol: String): DataFrame = {
    Seq("http_status", "mime_type").foreach(c =>
      require(!df.columns.contains(c),
        s"withHttpMeta: input already has a '$c' column — rename it first"))
    val view = messageView(col(payloadCol))
    val status = regexp_extract(view, "^HTTP/[0-9.]+\\s+([0-9]{3})", 1)
    val mime = lower(trim(regexp_extract(headersView(view),
      "(?im)^content-type\\s*:\\s*([^;\r\n]+)", 1)))
    df.withColumn("http_status",
        when(status === "", null).otherwise(status).cast("int"))
      .withColumn("mime_type", when(mime === "", null).otherwise(mime))
  }

  // -----------------------------------------------------------------
  // t37: the canned query — format-true multi-charset HTTP captures
  // built INSIDE the plan (X19 encode) over the documents table, then
  // sniffed + decoded (X18). Seven classes cover the sniff lattice:
  // header charset (canonical + quoted alias), meta-only with bare-LF
  // headers, windows-1252 (bytes that DIFFER from latin-1: the euro /
  // smart quotes), no label at all (utf-8 default on real multibyte
  // content), a UTF-16LE BOM (BOM wins, BOM char stripped), and an
  // unknown label (utf-8 fallback, charset_known=false). The oracle
  // restates the ground truth directly from `documents.text` — the
  // Spark side must round-trip encode→capture→sniff→decode exactly.
  // -----------------------------------------------------------------

  /** (encode label in the payload, sniffed canonical label, non-ASCII
    * suffix appended to the doc text) per doc_id % 7 class.
    */
  private[operators] val T37Classes: Seq[(String, String, String)] = Seq(
    ("utf-8", "utf-8", " na\u00efve r\u00e9sum\u00e9"),
    ("iso-8859-1", "iso-8859-1", " caf\u00e9 \u00df\u00a1"),
    ("shift_jis", "shift_jis", " \u30ab\u30bf\u30ab\u30ca\u6587\u5b57"),
    ("windows-1252", "windows-1252", " \u20ac\u201csmart\u201d"),
    ("utf-8", "utf-8", " \u00fcn\u00efcode \u2713"),
    ("utf-16le", "utf-16le", " utf16 \u2713"),
    ("x-unknown-enc", "x-unknown-enc", " fallb\u00e4ck")
  )

  private val MetaTag = "<meta charset=Shift_JIS>"

  private[operators] def syntheticCaptures(docs: DataFrame): DataFrame = {
    val cls = (col("doc_id") % 7).cast("int")
    val headers = element_at(array(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\nServer: t37\r\n\r\n"),
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"latin-1\"\r\n\r\n"),
      lit("HTTP/1.1 200 OK\nContent-Type: text/html\n\n"),
      lit("HTTP/1.1 200 OK\r\ncontent-type: TEXT/HTML; Charset=Windows-1252\r\n\r\n"),
      lit("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"),
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"),
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-unknown-enc\r\n\r\n")
    ), cls + 1)
    val label = element_at(array(T37Classes.map(c => lit(c._1)): _*), cls + 1)
    val suffix = element_at(array(T37Classes.map(c => lit(c._3)): _*), cls + 1)
    val entityText = concat(
      when(cls === 2, MetaTag).otherwise(""), col("text"), suffix)
    val bom = when(cls === 5, lit(Array(0xFF.toByte, 0xFE.toByte)))
      .otherwise(lit(Array.emptyByteArray))
    docs.select(col("doc_id"), concat(
      encode(headers, "UTF-8"), bom,
      GraftExpressions.charsetEncode(entityText, label)).as("payload"))
  }

  val all: Seq[Q] = Seq(
    Q(
      "t37_charset_decode",
      "Charset-aware HTTP payload decode: BOM/Content-Type/meta sniff, web alias map, UTF-8 fallback",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        withDecodedEntity(syntheticCaptures(docs), "payload")
          .select(col("doc_id"), col("charset"), col("charset_known"),
            col("html").as("text"))
          .orderBy(col("doc_id"))
      },
      Some {
        val csCase = T37Classes.map(_._2).zipWithIndex
          .map { case (cs, i) => s"WHEN $i THEN '$cs'" }.mkString(" ")
        val sufCase = T37Classes.map(_._3).zipWithIndex
          .map { case (s, i) => s"WHEN $i THEN '$s'" }.mkString(" ")
        s"""SELECT doc_id,
          CASE CAST(doc_id % 7 AS INT) $csCase END AS charset,
          CAST(doc_id % 7 AS INT) <> 6 AS charset_known,
          CASE WHEN doc_id % 7 = 2 THEN '$MetaTag' ELSE '' END
            || text || CASE CAST(doc_id % 7 AS INT) $sufCase END AS text
        FROM documents ORDER BY doc_id"""
      }
    )
  )
}
