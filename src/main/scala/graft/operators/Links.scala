package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** Outlink extraction (O59, t38): the WAT leg of a crawl pipeline —
  * anchors pulled from raw HTML, hrefs resolved against the page URL
  * (X25, RFC 3986 reference resolution with exact
  * remove_dot_segments), and the host-/domain-level link graph
  * aggregated from the resolved targets. This is what turns an
  * archived crawl into (a) a frontier (new URLs to fetch) and (b) a
  * web graph for the g01/g04 domain-ranking shapes.
  *
  * Extraction is engine-neutral: the anchor scan and href-attribute
  * parse are RE2-safe regexes (quoted forms first — `\shref` requires
  * a whitespace boundary so `data-href=` never matches), and the
  * resolution semantics are restated by the DuckDB oracle as a CASE
  * chain plus BOUNDED dot-segment passes (4 combined passes; the
  * engine's X25 is exact at any depth — the twin's bound is
  * documented and the synthetic lattice stays within it; empty
  * segments adjacent to `..` are the one shape the bounded regex
  * cannot express).
  *
  * Scale shape: per-row regex work + one posexplode — map-only until
  * the caller aggregates; the domain-edge rollup is one combinable
  * groupBy. No join, no window. At 100 TB the only knob is input
  * splits, exactly like t34.
  */
object Links {

  /** All `<a ...>` open tags of an HTML column, document order. */
  private def anchorTags(html: Column): Column =
    regexp_extract_all(coalesce(html, lit("")), lit("(?i)<a\\s[^>]*>"), lit(0))

  /** The href attribute of one anchor tag: double-quoted, then
    * single-quoted, then bare value (first present wins). NULL when
    * the tag has no (non-empty) href. The `\s` boundary before `href`
    * keeps `data-href=`-style attributes from matching.
    */
  private[operators] def hrefOf(tag: Column): Column = {
    val dq = regexp_extract(tag, "(?i)\\shref\\s*=\\s*\"([^\"]*)\"", 1)
    val sq = regexp_extract(tag, "(?i)\\shref\\s*=\\s*'([^']*)'", 1)
    val bare = regexp_extract(tag, "(?i)\\shref\\s*=\\s*([^\\s\"'>][^\\s>]*)", 1)
    when(dq =!= "", dq).when(sq =!= "", sq).when(bare =!= "", bare)
      .otherwise(lit(null).cast("string"))
  }

  /** One row per resolvable link: (input cols minus htmlCol) +
    * (link_idx, href, target). link_idx is the anchor's ordinal in
    * document order (0-based, over ALL anchors — gaps where an anchor
    * had no fetchable target are expected); href is the raw
    * attribute; target is the X25-resolved absolute URL. Anchors with
    * no href, fragment-only hrefs, and opaque schemes
    * (mailto:/javascript:/data:/tel:) are dropped. Docs with no links
    * contribute no rows (edge-list semantics).
    */
  def outlinks(
      df: DataFrame,
      urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    Seq("link_idx", "href", "target", "_tag").foreach(c =>
      require(!df.columns.contains(c),
        s"outlinks: input already has a '$c' column — rename it first"))
    val keep = df.columns.filterNot(_ == htmlCol).map(col).toSeq
    df.select(keep :+ posexplode(anchorTags(col(htmlCol))).as(Seq("link_idx", "_tag")): _*)
      .withColumn("href", hrefOf(col("_tag")))
      .withColumn("target", GraftExpressions.resolveUrl(col(urlCol), col("href")))
      .where(col("target").isNotNull)
      .withColumn("link_idx", col("link_idx").cast("long"))
      .drop("_tag")
  }

  /** Entity decode for anchor text — Html.scala's exact ordered list
    * (named first, `&amp;` strictly last).
    */
  private def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (x, (from, to)) => regexp_replace(x, from, to) }

  private def duckDecodeEntities(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(e) { case (x, (from, to)) => s"replace($x, '$from', '$to')" }

  /** One row per resolvable anchor WITH its visible text: (input cols
    * minus htmlCol) + (link_idx, href, target, anchor_text) — the
    * anchor-text half of WAT extraction (anchor corpora pair what a
    * page SAYS about a target with the target). anchor_text is the
    * inner markup with tags stripped, entities decoded (Html.scala's
    * ordered fold), whitespace collapsed and trimmed — an anchor
    * wrapping only an image comes out '' (kept: the link still
    * exists; filter on anchor_text if only textual anchors matter).
    * Same skip classes and resolution as [[outlinks]]; same map-only
    * scale shape.
    */
  def anchorTexts(
      df: DataFrame,
      urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    Seq("link_idx", "href", "target", "anchor_text", "_a").foreach(c =>
      require(!df.columns.contains(c),
        s"anchorTexts: input already has a '$c' column — rename it first"))
    val anchors = regexp_extract_all(coalesce(col(htmlCol), lit("")),
      lit("(?is)<a\\s[^>]*>.*?</a>"), lit(0))
    val keep = df.columns.filterNot(_ == htmlCol).map(col).toSeq
    val inner = regexp_extract(col("_a"), "(?is)^<a\\s[^>]*>(.*)</a>$", 1)
    df.select(keep :+ posexplode(anchors).as(Seq("link_idx", "_a")): _*)
      .withColumn("href", hrefOf(regexp_extract(col("_a"), "(?is)^(<a\\s[^>]*>)", 1)))
      .withColumn("target", GraftExpressions.resolveUrl(col(urlCol), col("href")))
      .where(col("target").isNotNull)
      .withColumn("anchor_text",
        trim(regexp_replace(decodeEntities(
          regexp_replace(inner, "<[^>]*>", " ")), "\\s+", " ")))
      .withColumn("link_idx", col("link_idx").cast("long"))
      .drop("_a")
  }

  /** Registrable-domain link graph over [[outlinks]] output: one
    * combinable groupBy → (src_domain, dst_domain, n_links, n_urls
    * [distinct canonical targets], n_hosts [distinct target hosts]).
    * Rows whose source or target host doesn't reduce to a registrable
    * domain (IP literals pass through whole; bare public suffixes are
    * NULL) keep the NULL-free subset a blocklist join expects.
    */
  def domainEdges(
      links: DataFrame,
      urlCol: String = "url",
      targetCol: String = "target"): DataFrame = {
    val srcDomain = GraftExpressions.registrableDomain(
      GraftExpressions.urlHost(col(urlCol)))
    val dstHost = GraftExpressions.urlHost(col(targetCol))
    links
      .select(
        srcDomain.as("src_domain"),
        GraftExpressions.registrableDomain(dstHost).as("dst_domain"),
        dstHost.as("dst_host"),
        GraftExpressions.canonicalUrl(col(targetCol)).as("_canon"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull)
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(
        count(lit(1)).as("n_links"),
        countDistinct(col("_canon")).as("n_urls"),
        countDistinct(col("dst_host")).as("n_hosts"))
  }

  // -----------------------------------------------------------------
  // t38: the canned query — documents wrapped in a deterministic page
  // (base URL + anchors covering every href form: absolute with an
  // unsorted query, protocol-relative single-quoted uppercase tag,
  // unquoted root-relative guarded by a data-href decoy, ../ and ./
  // directory merges, fragment stripping, and the skipped classes:
  // mailto/javascript/fragment-only/no-href), then outlinks →
  // canonical targets → registrable-domain edges, oracle-gated
  // end-to-end.
  // -----------------------------------------------------------------

  private[operators] def syntheticPages(docs: DataFrame): DataFrame = {
    val m = (n: Int) => (col("doc_id") % n).cast("string")
    val base = concat(
      lit("https://www.src"), m(5), lit(".example"), m(3),
      lit(".com/sec"), m(4), lit("/p/page"), col("doc_id").cast("string"),
      lit(".html"))
    val html = concat(
      lit("<html><body><p>See <a href=\"https://out"), m(7),
      lit(".example.org/x/"), col("doc_id").cast("string"),
      lit("?b=2&a=1\">abs</a>.</p><A HREF='//cdn"), m(3),
      lit(".example.net/lib/app.js?v="), m(9),
      lit("'>cdn</A><a class=\"nav\" data-href=\"https://evil.example/x\" href=/root/"),
      m(4),
      lit(">r</a><a href=\"../up"), m(2),
      lit("/doc.html\">u</a><a href=\"./sib"), m(3),
      lit(".html#sec\">s</a><a href=\"?page="), m(4),
      lit("\">q</a><a href=\"mailto:team@example.com\">m</a>" +
        "<a href=\"javascript:void(0)\">j</a><a href=\"#top\">t</a>" +
        "<a name=\"anchor\">n</a></body></html>"))
    docs.select(col("doc_id"), base.as("url"), html.as("html"))
  }

  private val duckBase: String =
    "'https://www.src' || CAST(doc_id % 5 AS VARCHAR) || '.example' || " +
      "CAST(doc_id % 3 AS VARCHAR) || '.com/sec' || CAST(doc_id % 4 AS VARCHAR) || " +
      "'/p/page' || CAST(doc_id AS VARCHAR) || '.html'"

  private val duckHtml: String =
    "'<html><body><p>See <a href=\"https://out' || CAST(doc_id % 7 AS VARCHAR) || " +
      "'.example.org/x/' || CAST(doc_id AS VARCHAR) || " +
      "'?b=2&a=1\">abs</a>.</p><A HREF=''//cdn' || CAST(doc_id % 3 AS VARCHAR) || " +
      "'.example.net/lib/app.js?v=' || CAST(doc_id % 9 AS VARCHAR) || " +
      "'''>cdn</A><a class=\"nav\" data-href=\"https://evil.example/x\" href=/root/' || " +
      "CAST(doc_id % 4 AS VARCHAR) || " +
      "'>r</a><a href=\"../up' || CAST(doc_id % 2 AS VARCHAR) || " +
      "'/doc.html\">u</a><a href=\"./sib' || CAST(doc_id % 3 AS VARCHAR) || " +
      "'.html#sec\">s</a><a href=\"?page=' || CAST(doc_id % 4 AS VARCHAR) || " +
      "'\">q</a><a href=\"mailto:team@example.com\">m</a>" +
      "<a href=\"javascript:void(0)\">j</a><a href=\"#top\">t</a>" +
      "<a name=\"anchor\">n</a></body></html>'"

  /** One bounded dot-segment pass over path expression `e`: collapse
    * `/./`, then one `..` level, then a root-level `..` — the twin of
    * [[graft.functions.UrlOps.removeDotSegments]] (exact algorithm)
    * as repeated regex rewrites. Four passes cover the synthetic
    * lattice's depth with margin.
    */
  private def duckDotPass(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, " +
      s"'/\\.(/|$$)', '/', 'g'), " +
      s"'/[^/]*[^/.][^/]*/\\.\\.(/|$$)', '/', 'g'), " +
      s"'(://[^/?#]*)/\\.\\.(/|$$)', '\\1/', 'g')"

  /** The resolved-links CTE chain shared by the t38 and g12 oracles:
    * synthetic pages → anchor scan → href parse → bounded-pass
    * resolution, ending in `res(doc_id, base, target)`. Comma-joined
    * CTE definitions (caller supplies WITH and what follows).
    */
  private[operators] def duckResolvedLinks: String = {
    val dq = "regexp_extract(tag, '(?i)\\shref\\s*=\\s*\"([^\"]*)\"', 1)"
    val sq = "regexp_extract(tag, '(?i)\\shref\\s*=\\s*''([^'']*)''', 1)"
    val bare = "regexp_extract(tag, '(?i)\\shref\\s*=\\s*([^\\s\"''>][^\\s>]*)', 1)"
    val scheme = "regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)"
    val schemeAuth = "regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    val basePathFull = "regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    val baseDir = s"CASE WHEN regexp_replace($basePathFull, '[^/]*$$', '') = '' THEN '/' " +
      s"ELSE regexp_replace($basePathFull, '[^/]*$$', '') END"
    val passes = (1 to 4).foldLeft("pq")((e, _) => duckDotPass(e))
    // every stage AS MATERIALIZED — the g03/g01 inlining lesson:
    // without it DuckDB substitutes each CTE column into every
    // downstream reference, and the href CASE × resolution CASE ×
    // 12-regexp dot passes × host regex × PSL probes multiply into
    // thousands of regex evaluations PER ROW (measured: ~20 min for
    // the g12 oracle at sf0.01 unmaterialized, seconds materialized).
    s"""d AS MATERIALIZED (SELECT doc_id, $duckBase AS base, $duckHtml AS html FROM documents),
      tg AS MATERIALIZED (SELECT doc_id, base, regexp_extract_all(html, '(?i)<a\\s[^>]*>') AS tags FROM d),
      tag AS MATERIALIZED (SELECT doc_id, base, tags[k] AS tag
        FROM tg, UNNEST(generate_series(1, len(tags))) AS t(k)),
      hr AS MATERIALIZED (SELECT doc_id, base,
          CASE WHEN $dq <> '' THEN $dq WHEN $sq <> '' THEN $sq ELSE $bare END AS href
        FROM tag),
      h2 AS MATERIALIZED (SELECT doc_id, base, regexp_replace(trim(href), '#.*', '') AS h
        FROM hr WHERE href <> ''),
      r0 AS MATERIALIZED (SELECT doc_id, base,
          CASE WHEN h = '' THEN NULL
               WHEN regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN h
               WHEN regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
               WHEN h LIKE '//%' THEN $scheme || ':' || h
               WHEN h LIKE '/%' THEN $schemeAuth || h
               WHEN h LIKE '?%' THEN $schemeAuth ||
                 CASE WHEN $basePathFull = '' THEN '/' ELSE $basePathFull END || h
               ELSE $schemeAuth || $baseDir || h END AS t0
        FROM h2),
      sp AS MATERIALIZED (SELECT doc_id, base, regexp_extract(t0, '^([^?]*)', 1) AS pq,
          regexp_extract(t0, '(\\?.*)$$', 1) AS qs
        FROM r0 WHERE t0 IS NOT NULL),
      res AS MATERIALIZED (SELECT doc_id, base, $passes || qs AS target FROM sp)"""
  }

  private def t38Oracle: String =
    s"""WITH $duckResolvedLinks,
      eh AS MATERIALIZED (SELECT ${UrlCuration.duckHostOf("base")} AS src_host,
          ${UrlCuration.duckHostOf("target")} AS dst_host,
          ${UrlCuration.duckCanonicalUrl("target")} AS canon
        FROM res),
      e AS MATERIALIZED (SELECT ${UrlCuration.duckRegistrableDomain("src_host")} AS src_domain,
          ${UrlCuration.duckRegistrableDomain("dst_host")} AS dst_domain,
          dst_host, canon
        FROM eh)
      SELECT src_domain, dst_domain, CAST(COUNT(*) AS BIGINT) AS n_links,
        CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_urls,
        CAST(COUNT(DISTINCT dst_host) AS BIGINT) AS n_hosts
      FROM e WHERE src_domain IS NOT NULL AND dst_domain IS NOT NULL
      GROUP BY src_domain, dst_domain ORDER BY src_domain, dst_domain"""

  // -----------------------------------------------------------------
  // t43: anchor texts — a deterministic page per document whose
  // anchors carry entity-escaped multi-word text, nested inline
  // markup, an image-only (empty-text) anchor, and an href-less
  // decoy; rolled up per (target registrable domain, cleaned text).
  // -----------------------------------------------------------------

  private[operators] def anchorPages(docs: DataFrame): DataFrame = {
    val m = (n: Int) => (col("doc_id") % n).cast("string")
    val w1 = substring_index(col("text"), " ", 1)
    docs.select(col("doc_id"),
      concat(lit("https://site"), m(5), lit(".example.com/dir/page"),
        col("doc_id").cast("string"), lit(".html")).as("url"),
      concat(
        lit("<p><a href=\"https://out"), m(7),
        lit(".example.org/x\">Read &amp; enjoy "), w1,
        lit("</a><A HREF=/local/"), m(3), lit(">Local <b>link</b> "), m(3),
        lit("</A><a href=\"skip.html\"><img src=\"i.png\"/></a>" +
          "<a name=\"x\">plain</a></p>")).as("html"))
  }

  private def t43Oracle: String = {
    val dq = "regexp_extract(tag, '(?i)\\shref\\s*=\\s*\"([^\"]*)\"', 1)"
    val sq = "regexp_extract(tag, '(?i)\\shref\\s*=\\s*''([^'']*)''', 1)"
    val bare = "regexp_extract(tag, '(?i)\\shref\\s*=\\s*([^\\s\"''>][^\\s>]*)', 1)"
    val scheme = "regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)"
    val schemeAuth = "regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    val basePathFull = "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    val baseDir = s"CASE WHEN regexp_replace($basePathFull, '[^/]*$$', '') = '' THEN '/' " +
      s"ELSE regexp_replace($basePathFull, '[^/]*$$', '') END"
    val duckPages =
      "SELECT doc_id, 'https://site' || CAST(doc_id % 5 AS VARCHAR) || " +
        "'.example.com/dir/page' || CAST(doc_id AS VARCHAR) || '.html' AS url, " +
        "'<p><a href=\"https://out' || CAST(doc_id % 7 AS VARCHAR) || " +
        "'.example.org/x\">Read &amp; enjoy ' || split_part(text, ' ', 1) || " +
        "'</a><A HREF=/local/' || CAST(doc_id % 3 AS VARCHAR) || " +
        "'>Local <b>link</b> ' || CAST(doc_id % 3 AS VARCHAR) || " +
        "'</A><a href=\"skip.html\"><img src=\"i.png\"/></a>" +
        "<a name=\"x\">plain</a></p>' AS html FROM documents"
    val cleanText = s"trim(regexp_replace(${duckDecodeEntities(
      "regexp_replace(inr, '<[^>]*>', ' ', 'g')")}, '\\s+', ' ', 'g'))"
    // resolution restated WITHOUT the dot passes: this synthetic has
    // no dot segments (t38's oracle owns that branch)
    s"""WITH d AS MATERIALIZED ($duckPages),
      an AS MATERIALIZED (SELECT doc_id, url,
          regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>') AS arr FROM d),
      a1 AS MATERIALIZED (SELECT doc_id, url, arr[k] AS a
        FROM an, UNNEST(generate_series(1, len(arr))) AS t(k)),
      tg AS MATERIALIZED (SELECT doc_id, url,
          regexp_extract(a, '(?is)^(<a\\s[^>]*>)', 1) AS tag,
          regexp_extract(a, '(?is)^<a\\s[^>]*>(.*)</a>$$', 1) AS inr
        FROM a1),
      hr AS MATERIALIZED (SELECT doc_id, url,
          CASE WHEN $dq <> '' THEN $dq WHEN $sq <> '' THEN $sq ELSE $bare END AS href,
          $cleanText AS anchor_text
        FROM tg),
      h2 AS MATERIALIZED (SELECT doc_id, url, anchor_text,
          regexp_replace(trim(href), '#.*', '') AS h FROM hr WHERE href <> ''),
      res AS MATERIALIZED (SELECT doc_id, anchor_text,
          CASE WHEN h = '' THEN NULL
               WHEN regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN h
               WHEN regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
               WHEN h LIKE '//%' THEN $scheme || ':' || h
               WHEN h LIKE '/%' THEN $schemeAuth || h
               WHEN h LIKE '?%' THEN $schemeAuth ||
                 CASE WHEN $basePathFull = '' THEN '/' ELSE $basePathFull END || h
               ELSE $schemeAuth || $baseDir || h END AS target
        FROM h2),
      eh AS MATERIALIZED (SELECT anchor_text,
          ${UrlCuration.duckHostOf("target")} AS dst_host
        FROM res WHERE target IS NOT NULL),
      e AS MATERIALIZED (SELECT anchor_text,
          ${UrlCuration.duckRegistrableDomain("dst_host")} AS dst_domain FROM eh)
      SELECT dst_domain, anchor_text, CAST(COUNT(*) AS BIGINT) AS n
      FROM e WHERE dst_domain IS NOT NULL
      GROUP BY dst_domain, anchor_text ORDER BY dst_domain, anchor_text"""
  }

  val all: Seq[Q] = Seq(
    Q(
      "t43_anchor_text",
      "Anchor-text extraction: per-anchor visible text (tags stripped, entities decoded) rolled up per target domain",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        anchorTexts(anchorPages(docs))
          .select(
            GraftExpressions.registrableDomain(
              GraftExpressions.urlHost(col("target"))).as("dst_domain"),
            col("anchor_text"))
          .where(col("dst_domain").isNotNull)
          .groupBy(col("dst_domain"), col("anchor_text"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("dst_domain"), col("anchor_text"))
      },
      Some(t43Oracle)
    ),
    Q(
      "t38_outlinks",
      "Outlink extraction: anchors -> href parse -> RFC 3986 resolution (X25) -> registrable-domain link graph",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        domainEdges(outlinks(syntheticPages(docs)))
          .orderBy(col("src_domain"), col("dst_domain"))
      },
      Some(t38Oracle)
    )
  )
}
