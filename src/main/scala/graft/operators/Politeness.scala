package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions

/** Crawl politeness gate (O58): RFC 9309 robots.txt decisions over a
  * url stream — the companion to t35's domain blocklist (a domain
  * may be allowed and still forbid specific paths) and the last of
  * the round-15 verdict's missing crawl-pipeline surfaces.
  *
  * Scale shape: robots bodies are PER HOST — [[robotsRules]] parses
  * each body once (X20, group selection done at parse time) into a
  * host-keyed rules frame that is dictionary-sized next to the url
  * stream, so [[withRobotsVerdict]] is one broadcast-hinted left
  * join plus the X21 per-url longest-match check (codegen, no
  * shuffle of the url side beyond the join). Hosts with no fetched
  * robots.txt are ALLOWED (the RFC default).
  */
object Politeness {

  /** (host, robots_txt) → (host, allow, disallow): the RFC 9309
    * group governing `agent`, parsed once per host.
    */
  def robotsRules(
      robots: DataFrame,
      hostCol: String = "host",
      txtCol: String = "robots_txt",
      agent: String = "*"): DataFrame =
    robots.select(lower(col(hostCol)).as("host"), col(txtCol).as("_t"))
      // one row per host BEFORE parsing: an append-log robots store
      // holds multiple fetches per host, and duplicate rule rows
      // would fan every url of that host into duplicate verdicts
      // through the join. max_by(warc-date) belongs to the fetch
      // store; here the collapse is deterministic (max text) — pass
      // a pre-deduped latest-fetch frame when recency matters.
      .groupBy(col("host")).agg(max(col("_t")).as("_t"))
      .select(col("host"),
        GraftExpressions.robotsRules(col("_t"), lit(agent)).as("_r"))
      .select(col("host"), col("_r.allow").as("allow"),
        col("_r.disallow").as("disallow"))

  /** Adds `robots_allowed` to a url frame by joining [[robotsRules]]
    * output on the url's host: longest-match RFC decision against
    * the path+query, missing robots → allowed.
    */
  def withRobotsVerdict(
      urls: DataFrame,
      rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    Seq("robots_allowed", "allow", "disallow", "_h").foreach(c =>
      require(!urls.columns.contains(c),
        s"withRobotsVerdict: input already has a '$c' column — rename it first"))
    val path0 = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = when(path0 === "", "/").otherwise(path0)
    val emptyArr = array().cast("array<string>")
    urls
      .withColumn("_h", UrlCuration.hostOf(col(urlCol)))
      .join(broadcast(rules.withColumnRenamed("host", "_h")), Seq("_h"), "left")
      .withColumn("robots_allowed",
        GraftExpressions.robotsAllowed(path,
          coalesce(col("allow"), emptyArr),
          coalesce(col("disallow"), emptyArr)))
      .drop("_h", "allow", "disallow")
  }
}
