package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** Sitemap parsing (O60, t39): the frontier-seeding leg of a crawl —
  * <urlset> page entries (loc/lastmod/changefreq/priority) and
  * <sitemapindex> child-sitemap entries pulled from sitemap XML, loc
  * values XML-entity-decoded and flagged for the same-host policy
  * (the sitemaps.org scope rule: a sitemap may only name URLs on its
  * own host — cross-host entries are the classic sitemap-spam
  * vector, so the flag is the curation signal, not a hard drop).
  *
  * Engine-neutral by the t34 discipline: RE2-safe regexes only
  * ((?is) + non-greedy fragment scan — no backreferences, no
  * lookaround), ordered entity decode with &amp; last, and the DuckDB
  * oracle replays the identical pipeline. lastmod stays a STRING
  * (W3C datetime is a family of shapes; parsing policy belongs to the
  * caller — a wrong-shape value must surface, not silently NULL).
  *
  * Scale: per-row regex + one posexplode, map-only — the t34/t38
  * shape. A 50k-URL sitemap (the spec cap) is one row in, 50k rows
  * out; fan-out is bounded by the format itself.
  */
object Sitemaps {

  /** XML entity decode for loc values (predefined entities only —
    * sitemap XML escapes URLs with exactly these): named first,
    * `&amp;` strictly last so `&amp;lt;` round-trips literally.
    */
  private def decodeXml(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (x, (from, to)) => regexp_replace(x, from, to) }

  private def duckDecodeXml(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "''", "&amp;" -> "&")
      .foldLeft(e) { case (x, (from, to)) => s"replace($x, '$from', '$to')" }

  private def childTag(entry: Column, tag: String): Column = {
    val v = regexp_extract(entry, s"(?is)<$tag>\\s*(.*?)\\s*</$tag>", 1)
    when(v === "", null).otherwise(v)
  }

  private def duckChildTag(e: String, tag: String): String =
    s"nullif(regexp_extract($e, '(?is)<$tag>\\s*(.*?)\\s*</$tag>', 1), '')"

  /** One row per sitemap entry: (input cols minus xmlCol) +
    * (kind 'url'|'sitemap', ord, loc, lastmod, changefreq, priority,
    * same_host). kind comes from the ROOT element (urlset vs
    * sitemapindex); documents whose root is neither, and entries
    * without the mandatory <loc>, contribute no rows. priority is
    * DOUBLE (NULL when absent); lastmod/changefreq stay strings.
    * same_host compares the loc host to the sitemap's own URL host
    * (urlCol) — NULL-safe, so an unparseable loc reads false.
    */
  def parse(
      df: DataFrame,
      xmlCol: String = "xml",
      urlCol: String = "url"): DataFrame = {
    Seq("kind", "ord", "loc", "lastmod", "changefreq", "priority",
      "same_host", "_entry").foreach(c =>
      require(!df.columns.contains(c),
        s"Sitemaps.parse: input already has a '$c' column — rename it first"))
    val x = coalesce(col(xmlCol), lit(""))
    val kind = when(x.rlike("(?is)<sitemapindex[\\s>]"), "sitemap")
      .when(x.rlike("(?is)<urlset[\\s>]"), "url")
      .otherwise(lit(null).cast("string"))
    val entries = regexp_extract_all(x,
      lit("(?is)<(?:url|sitemap)>.*?</(?:url|sitemap)>"), lit(0))
    val keep = df.columns.filterNot(_ == xmlCol).map(col).toSeq
    df.withColumn("kind", kind)
      .where(col("kind").isNotNull)
      .select((keep :+ col("kind")) :+
        posexplode(entries).as(Seq("ord", "_entry")): _*)
      .withColumn("loc", decodeXml(childTag(col("_entry"), "loc")))
      .where(col("loc").isNotNull)
      .withColumn("lastmod", childTag(col("_entry"), "lastmod"))
      .withColumn("changefreq", childTag(col("_entry"), "changefreq"))
      .withColumn("priority", childTag(col("_entry"), "priority").cast("double"))
      .withColumn("same_host",
        GraftExpressions.urlHost(col("loc")) <=> GraftExpressions.urlHost(col(urlCol)))
      .withColumn("ord", col("ord").cast("long"))
      .drop("_entry")
  }

  /** `Sitemap:` directives from robots.txt bodies — how crawlers
    * actually FIND sitemaps (RFC 9309 §2.3 allows the line anywhere,
    * outside any user-agent group, case-insensitive; `#` comment
    * lines never match the line-anchored scan). One row per
    * directive: (input cols minus txtCol) + (ord, sitemap_url,
    * sitemap_host). sitemap_host is NULL for relative/garbage values
    * (the directive requires an absolute URL) — the caller's
    * `invalid` routing; cross-host directives are LEGAL (a site may
    * host its sitemap on a CDN), so host comparison is the caller's
    * policy, not a drop here. Bridges O58 (robots fetch) to O60
    * ([[parse]]) in the discovery loop.
    */
  def sitemapDirectives(
      df: DataFrame,
      txtCol: String = "robots_txt"): DataFrame = {
    Seq("ord", "sitemap_url", "sitemap_host").foreach(c =>
      require(!df.columns.contains(c),
        s"sitemapDirectives: input already has a '$c' column — rename it first"))
    val keep = df.columns.filterNot(_ == txtCol).map(col).toSeq
    df.select(keep :+ posexplode(regexp_extract_all(
        coalesce(col(txtCol), lit("")),
        lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)"), lit(1)))
      .as(Seq("ord", "sitemap_url")): _*)
      .withColumn("sitemap_host", GraftExpressions.urlHost(col("sitemap_url")))
      .withColumn("ord", col("ord").cast("long"))
  }

  // -----------------------------------------------------------------
  // t39: the canned query — a deterministic sitemap per document
  // (most docs: a 3-entry urlset with an entity-escaped query URL, a
  // cross-host spam entry, and a whitespace-padded loc; every 7th
  // doc: a 2-child sitemapindex), parsed end-to-end.
  // -----------------------------------------------------------------

  private[operators] def syntheticSitemaps(docs: DataFrame): DataFrame = {
    val m = (n: Int) => (col("doc_id") % n).cast("string")
    val id = col("doc_id").cast("string")
    val host = concat(lit("site"), m(20), lit(".example.com"))
    val base = concat(lit("https://"), host, lit("/sitemap.xml"))
    val urlset = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n <url>\n" +
        "  <loc>https://"), host, lit("/p/"), id,
      lit("?x=1&amp;y=2</loc>\n  <lastmod>2025-0"), (col("doc_id") % 9 + 1).cast("string"),
      lit("-1"), m(3),
      lit("</lastmod>\n  <changefreq>daily</changefreq>\n  <priority>0."), m(10),
      lit("</priority>\n </url>\n <url><loc>https://other.example.org/q/"), id,
      lit("</loc></url>\n <url><loc>  https://"), host, lit("/sp/"), id,
      lit("  </loc><lastmod>2024-12-31</lastmod></url>\n</urlset>"))
    val index = concat(
      lit("<?xml version=\"1.0\"?><sitemapindex " +
        "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
        "<sitemap><loc>https://"), host, lit("/maps/part"), m(4),
      lit(".xml</loc><lastmod>2025-01-0"), (col("doc_id") % 5 + 1).cast("string"),
      lit("</lastmod></sitemap><sitemap><loc>https://"), host,
      lit("/maps/news.xml</loc></sitemap></sitemapindex>"))
    docs.select(col("doc_id"), base.as("url"),
      when(col("doc_id") % 7 === 0, index).otherwise(urlset).as("xml"))
  }

  private val duckSyntheticSitemaps: String = {
    val host = "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'"
    val urlset = "'<?xml version=\"1.0\" encoding=\"UTF-8\"?>' || chr(10) || " +
      "'<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">' || chr(10) || ' <url>' || chr(10) || " +
      s"'  <loc>https://' || $host || '/p/' || CAST(doc_id AS VARCHAR) || " +
      "'?x=1&amp;y=2</loc>' || chr(10) || '  <lastmod>2025-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || " +
      "'-1' || CAST(doc_id % 3 AS VARCHAR) || " +
      "'</lastmod>' || chr(10) || '  <changefreq>daily</changefreq>' || chr(10) || '  <priority>0.' || CAST(doc_id % 10 AS VARCHAR) || " +
      "'</priority>' || chr(10) || ' </url>' || chr(10) || ' <url><loc>https://other.example.org/q/' || CAST(doc_id AS VARCHAR) || " +
      s"'</loc></url>' || chr(10) || ' <url><loc>  https://' || $host || '/sp/' || CAST(doc_id AS VARCHAR) || " +
      "'  </loc><lastmod>2024-12-31</lastmod></url>' || chr(10) || '</urlset>'"
    val index = "'<?xml version=\"1.0\"?><sitemapindex " +
      "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">' || " +
      s"'<sitemap><loc>https://' || $host || '/maps/part' || CAST(doc_id % 4 AS VARCHAR) || " +
      "'.xml</loc><lastmod>2025-01-0' || CAST(doc_id % 5 + 1 AS VARCHAR) || " +
      s"'</lastmod></sitemap><sitemap><loc>https://' || $host || " +
      "'/maps/news.xml</loc></sitemap></sitemapindex>'"
    s"SELECT doc_id, 'https://' || $host || '/sitemap.xml' AS url, " +
      s"CASE WHEN doc_id % 7 = 0 THEN $index ELSE $urlset END AS xml FROM documents"
  }

  private def t39Oracle: String = {
    val loc = duckDecodeXml(duckChildTag("entry", "loc"))
    s"""WITH d AS ($duckSyntheticSitemaps),
      k AS (SELECT doc_id, url, xml,
          CASE WHEN regexp_matches(xml, '(?is)<sitemapindex[\\s>]') THEN 'sitemap'
               WHEN regexp_matches(xml, '(?is)<urlset[\\s>]') THEN 'url' END AS kind
        FROM d),
      f AS (SELECT doc_id, url, kind,
          regexp_extract_all(xml, '(?is)<(?:url|sitemap)>.*?</(?:url|sitemap)>') AS es
        FROM k WHERE kind IS NOT NULL),
      e AS (SELECT doc_id, url, kind, CAST(t.i - 1 AS BIGINT) AS ord, es[t.i] AS entry
        FROM f, UNNEST(generate_series(1, len(es))) AS t(i)),
      p AS (SELECT doc_id, kind, ord, $loc AS loc,
          ${duckChildTag("entry", "lastmod")} AS lastmod,
          ${duckChildTag("entry", "changefreq")} AS changefreq,
          CAST(${duckChildTag("entry", "priority")} AS DOUBLE) AS priority,
          ${UrlCuration.duckHostOf(loc)} IS NOT DISTINCT FROM ${UrlCuration.duckHostOf("url")} AS same_host
        FROM e)
      SELECT doc_id, kind, ord, loc, lastmod, changefreq, priority, same_host
      FROM p WHERE loc IS NOT NULL ORDER BY doc_id, ord"""
  }

  // -----------------------------------------------------------------
  // t44: robots.txt Sitemap: directives — deterministic robots bodies
  // per document (mixed-case directive, a CDN cross-host entry on
  // every 4th doc, a commented-out decoy, a relative-url invalid, and
  // surrounding group lines that must not match), extracted and
  // host-flagged.
  // -----------------------------------------------------------------

  private[operators] def syntheticRobots(docs: DataFrame): DataFrame = {
    val m = (n: Int) => (col("doc_id") % n).cast("string")
    val host = concat(lit("h"), m(20), lit(".example.com"))
    val txt = concat(
      lit("User-agent: *\nDisallow: /private/\n"),
      lit("SiteMap: https://"), host, lit("/sitemap"), m(3), lit(".xml\n"),
      when(col("doc_id") % 4 === 0,
        concat(lit("  sitemap:\thttps://cdn.example.net/maps/h"), m(20),
          lit(".xml\n"))).otherwise(""),
      lit("# Sitemap: https://commented.example.org/x.xml\n"),
      when(col("doc_id") % 5 === 0, "Sitemap: /relative/only.xml\n").otherwise(""),
      lit("Allow: /\n"))
    docs.select(col("doc_id"), host.as("host"), txt.as("robots_txt"))
  }

  private val duckSyntheticRobots: String = {
    val host = "'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'"
    s"SELECT doc_id, $host AS host, " +
      "'User-agent: *' || chr(10) || 'Disallow: /private/' || chr(10) || " +
      s"'SiteMap: https://' || $host || '/sitemap' || CAST(doc_id % 3 AS VARCHAR) || '.xml' || chr(10) || " +
      "CASE WHEN doc_id % 4 = 0 THEN '  sitemap:' || chr(9) || " +
      "'https://cdn.example.net/maps/h' || CAST(doc_id % 20 AS VARCHAR) || '.xml' || chr(10) ELSE '' END || " +
      "'# Sitemap: https://commented.example.org/x.xml' || chr(10) || " +
      "CASE WHEN doc_id % 5 = 0 THEN 'Sitemap: /relative/only.xml' || chr(10) ELSE '' END || " +
      "'Allow: /' || chr(10) AS robots_txt FROM documents"
  }

  private def t44Oracle: String =
    s"""WITH d AS MATERIALIZED ($duckSyntheticRobots),
      x AS MATERIALIZED (SELECT doc_id, host,
          regexp_extract_all(robots_txt, '(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)', 1) AS us
        FROM d),
      e AS MATERIALIZED (SELECT doc_id, host, CAST(t.k - 1 AS BIGINT) AS ord, us[t.k] AS sitemap_url
        FROM x, UNNEST(generate_series(1, len(us))) AS t(k)),
      h AS MATERIALIZED (SELECT doc_id, ord, sitemap_url,
          ${UrlCuration.duckHostOf("sitemap_url")} AS sitemap_host, host
        FROM e)
      SELECT doc_id, ord, sitemap_url,
        sitemap_host IS NOT NULL AS valid,
        sitemap_host IS NOT DISTINCT FROM host AS same_host
      FROM h ORDER BY doc_id, ord"""

  val all: Seq[Q] = Seq(
    Q(
      "t44_robots_sitemaps",
      "Sitemap: directives out of robots.txt (RFC 9309 2.3): line-anchored scan, comment immunity, absolute-url validity, host policy flag",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        sitemapDirectives(syntheticRobots(docs))
          .select(col("doc_id"), col("ord"), col("sitemap_url"),
            col("sitemap_host").isNotNull.as("valid"),
            (col("sitemap_host") <=> col("host")).as("same_host"))
          .orderBy(col("doc_id"), col("ord"))
      },
      Some(t44Oracle)
    ),
    Q(
      "t39_sitemap",
      "Sitemap parsing: urlset/sitemapindex entries, entity-decoded locs, same-host policy flag",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        parse(syntheticSitemaps(docs))
          .select(col("doc_id"), col("kind"), col("ord"), col("loc"),
            col("lastmod"), col("changefreq"), col("priority"), col("same_host"))
          .orderBy(col("doc_id"), col("ord"))
      },
      Some(t39Oracle)
    )
  )
}
