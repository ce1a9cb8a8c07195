package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** m11: magic-byte MIME sniffing (X26) over opaque binary payloads —
  * the route-by-bytes step between the crawl capture and the typed
  * pipelines (text → t34 extraction, media → the m01 container
  * walks). The canned query frames the documents corpus into ten
  * deterministic payload families (eight binary signatures, an HTML
  * page, plain text) and sniffs them back; the oracle RE-DERIVES each
  * label from the hex image of the very bytes (not from the family
  * id), so a sniffer regression and a framing regression both fail
  * the gate.
  *
  * Scale: one codegen expression per row, map-only — the t34 shape.
  */
object Sniff {

  private[operators] def syntheticPayloads(docs: DataFrame): DataFrame = {
    val textBin = col("text").cast("binary")
    def magic(bytes: Int*): org.apache.spark.sql.Column =
      lit(bytes.map(_.toByte).toArray)
    val fam = col("doc_id") % 10
    val payload = when(fam === 0,
        concat(magic(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), textBin))
      .when(fam === 1, concat(magic(0xff, 0xd8, 0xff, 0xe0), textBin))
      .when(fam === 2, concat(lit("GIF89a").cast("binary"), textBin))
      .when(fam === 3,
        concat(lit("RIFF").cast("binary"), magic(0x10, 0, 0, 0),
          lit("WEBP").cast("binary"), textBin))
      .when(fam === 4,
        concat(magic(0, 0, 0, 0x10), lit("ftypisom").cast("binary"), textBin))
      .when(fam === 5, concat(lit("%PDF-1.4\n").cast("binary"), textBin))
      .when(fam === 6, concat(magic(0x1f, 0x8b, 0x08, 0x00), textBin))
      .when(fam === 7, concat(magic('P', 'K', 0x03, 0x04), textBin))
      .when(fam === 8,
        concat(lit("<!DOCTYPE html><p>").cast("binary"), textBin))
      .otherwise(concat(lit("plain: ").cast("binary"), textBin))
    docs.select(col("doc_id"), payload.as("payload"))
  }

  private val duckSyntheticPayloads: String =
    "SELECT doc_id, CASE CAST(doc_id % 10 AS INT) " +
      "WHEN 0 THEN unhex('89504E470D0A1A0A') || encode(text) " +
      "WHEN 1 THEN unhex('FFD8FFE0') || encode(text) " +
      "WHEN 2 THEN encode('GIF89a') || encode(text) " +
      "WHEN 3 THEN encode('RIFF') || unhex('10000000') || encode('WEBP') || encode(text) " +
      "WHEN 4 THEN unhex('00000010') || encode('ftypisom') || encode(text) " +
      "WHEN 5 THEN encode('%PDF-1.4' || chr(10)) || encode(text) " +
      "WHEN 6 THEN unhex('1F8B0800') || encode(text) " +
      "WHEN 7 THEN encode('PK') || unhex('0304') || encode(text) " +
      "WHEN 8 THEN encode('<!DOCTYPE html><p>' || text) " +
      "ELSE encode('plain: ' || text) END AS payload FROM documents"

  // label RE-DERIVED from the payload's hex image — byte-level, like
  // the X26 table itself (uppercase hex: DuckDB's hex())
  private val duckSniff: String =
    """CASE WHEN substr(hp, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
      WHEN substr(hp, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
      WHEN substr(hp, 1, 12) IN ('474946383761', '474946383961') THEN 'image/gif'
      WHEN substr(hp, 1, 8) = '52494646' AND substr(hp, 17, 8) = '57454250' THEN 'image/webp'
      WHEN length(hp) >= 24 AND substr(hp, 9, 8) = '66747970' THEN 'video/mp4'
      WHEN substr(hp, 1, 10) = '255044462D' THEN 'application/pdf'
      WHEN substr(hp, 1, 4) = '1F8B' THEN 'application/gzip'
      WHEN substr(hp, 1, 8) = '504B0304' THEN 'application/zip'
      WHEN substr(hp, 1, 16) = '3C21444F43545950' THEN 'text/html'
      ELSE 'text/plain' END"""

  val all: Seq[Q] = Seq(
    Q(
      "m11_mime_sniff",
      "Magic-byte MIME sniff (X26) over ten payload families; oracle re-derives labels from the hex image",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        syntheticPayloads(docs)
          .select(col("doc_id"),
            GraftExpressions.sniffMime(col("payload")).as("mime"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH p AS ($duckSyntheticPayloads),
        hx AS (SELECT doc_id, hex(payload) AS hp FROM p)
        SELECT doc_id, $duckSniff AS mime FROM hx ORDER BY doc_id""")
    )
  )
}
