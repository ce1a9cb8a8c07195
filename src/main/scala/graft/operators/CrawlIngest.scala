package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The crawl front door: WARC archive records → admission-ready
  * documents — the composition S8 (source), t34 (extraction) and t35
  * (provenance gate) exist to feed, in the order a production
  * pipeline runs them: cheap provenance FIRST (a blocked domain's
  * records never cost extraction work), extraction second, admission
  * (quality/novelty, O56) downstream via [[graft.streaming.Streams]]'
  * ST29 loop.
  *
  * Scale shape: everything here is batch-bounded — the gate and the
  * extraction are per-row columnar work; the recrawl choice and the
  * exact-content dedup are combinable aggs whose exchanges move one
  * candidate payload per url (max_by) and (md5, url) pairs
  * respectively — extracted texts never re-shuffle. Nothing
  * corpus-scaled is touched until the admission trigger probes the
  * gram index (which is bucket-pruned — the O52 shape).
  */
object CrawlIngest {

  /** Archive records (the [[graft.sources.Warc]] schema) →
    * (doc_id, url, text): response records only, truncated captures
    * dropped (their entity is incomplete — re-fetch, don't curate),
    * urls CANONICALIZED (t36 — so recrawls AND mirror variants that
    * differ only in tracking params / fragments / case / default
    * ports collapse to one resource), the LATEST capture per
    * canonical url kept — latest by WARC-Date (ISO-8601 strings, so
    * lexicographic == chronological; archive NAMING must not decide
    * recency, 'crawl-9' sorts after 'crawl-10'), with (path, offset)
    * as the deterministic tiebreaker for same-second captures —
    * blocked/invalid domains dropped BEFORE extraction, then the HTTP
    * entity (after the message's first blank line) through t34's
    * extraction, then intra-batch EXACT-CONTENT dedup: same-batch
    * copies of one non-empty text collapse to the min-url keeper
    * (full-md5 keys; empty-text docs are exempt so every degenerate
    * page still gets its own admission verdict). Output: one row per
    * surviving canonical url — same-batch content copies and
    * blocked/invalid/truncated captures do NOT appear. doc_id =
    * hash60(canonical url) and `url` IS the canonical form —
    * deterministic, so a consumer can rebuild the url ↔ doc_id map
    * from the crawl store at any time.
    */
  def crawlDocs(
      records: DataFrame,
      allow: Seq[String] = Nil,
      block: Seq[String] = Nil): DataFrame = {
    val resp = records
      .where(col("warc_type") === "response" && !col("truncated") &&
        col("target_uri") =!= "")
      .select(col("target_uri").as("raw_url"), col("warc_date"),
        col("path"), col("offset"), col("payload"))
      .withColumn("url", UrlCuration.canonicalUrl(col("raw_url")))
      .where(col("url").isNotNull)
    // the provenance gate runs on the url alone — BEFORE the payload
    // is decoded or extracted (a blocked domain costs one regex)
    val gated = UrlCuration.urlVerdicts(resp, "url", allow, block)
      .where(col("verdict") === "neutral" || col("verdict") === "allowed")
    // latest capture via max_by with map-side combine: each partition
    // reduces to ONE candidate per url before the exchange, so only
    // per-partition winners' payloads cross the shuffle (a window
    // would shuffle every captured page body just to pick a winner)
    // charset-aware decode (t37): BOM / Content-Type / meta-prescan
    // sniff, web-alias map, UTF-8 fallback — a Latin-1 or Shift-JIS
    // page must reach extraction as text, not mojibake (which would
    // also poison the md5 content-dedup keys and gram novelty).
    // Headers are stripped only when the capture IS an HTTP message
    // (status line present), CRLF or bare-LF framed.
    val latest = HttpPayload.withDecodedEntity(
      gated
        .groupBy(col("url"))
        .agg(max_by(col("payload"),
          struct(col("warc_date"), col("path"), col("offset"))).as("_pay")),
      "_pay").select(col("url"), col("html"))
    // intra-batch exact-content dedup (d01 at the front door): two
    // DIFFERENT canonical urls carrying the same NON-EMPTY extracted
    // text in ONE batch would otherwise both pass admission — novelty
    // is measured against the standing index, and the batch is probed
    // BEFORE it appends (the ST27 contract), so same-batch copies are
    // invisible to each other. Keeper = min url (deterministic,
    // replay-stable); keys are the FULL md5 (the d01 discipline — a
    // 60-bit key would silently drop a colliding different document);
    // EMPTY-text docs are exempt (each carries its own
    // rejected_quality audit row — collapsing them would silently
    // lose verdicts, not dedup content). Only (md5, url) pairs cross
    // the dedup shuffle; the keeper set broadcasts back, so extracted
    // texts never re-shuffle.
    val extracted = Html.htmlExtract(latest, "url", "html")
    val keepers = extracted.where(col("text") =!= "")
      .groupBy(md5(col("text")).as("_ch"))
      .agg(min(col("url")).as("url"))
      .select(col("url"))
    extracted.where(col("text") === "")
      .unionByName(extracted.join(broadcast(keepers), Seq("url"), "left_semi"))
      .select(
        graft.functions.PortableHash.hash60(col("url")).as("doc_id"),
        col("url"), col("text"))
  }
}
