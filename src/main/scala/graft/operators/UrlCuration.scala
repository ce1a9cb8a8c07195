package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** URL/domain curation (t35): host extraction, registrable-domain
  * reduction, allow/blocklist verdicts, per-domain stats — the
  * companion to t25's source caps (which assume a source column) and
  * the admission gate's provenance leg (a crawl pipeline blocks
  * domains BEFORE spending quality/novelty work on their documents).
  *
  * Exact string ops, engine-neutral (RE2-safe regex, list indexing),
  * fully oracle-able. All per-row columnar work — the t01/t34 shape:
  * map-only at any corpus size; the only aggregation is whatever
  * per-domain stat the caller asks for (one combinable groupBy).
  */
object UrlCuration {

  // (round 16) registrable-domain reduction moved to [[Psl]] — full
  // public-suffix-list rule semantics (normal + wildcard + exception
  // rules, private section) over a committed snapshot subset; this
  // object keeps the thin delegates so every caller and the t35
  // oracle stay on one implementation.

  /** Lowercased host from a URL: strips scheme, userinfo, port, path,
    * query, fragment — and any trailing dots (the FQDN form
    * `spam.net.` resolves identically in DNS; leaving the dot would
    * make the empty last label swallow the registrable domain and
    * turn a one-character URL tweak into a blocklist bypass). NULL
    * when the value has no `scheme://` frame.
    */
  def hostOf(url: Column): Column =
    graft.functions.GraftExpressions.urlHost(url)

  /** The columnar regex formulation of [[hostOf]], kept as the X23
    * PARITY REFERENCE (UrlParityFuzzSpec pins byte equality) and as
    * the executable documentation of what the DuckDB twin restates.
    */
  private[graft] def hostOfRef(url: Column): Column = {
    // userinfo = everything up to the LAST '@' before the path/query
    // (the browser rule — RFC 3986 forbids raw '@' in userinfo but
    // fetchers resolve 'x@y@host' with host after the last '@', and a
    // first-@ split would put 'y@host' in the host and bypass the
    // blocklist); the host class excludes '@' outright so no parse
    // can leak userinfo into it
    // bracketed IPv6 authorities ([2001:db8::1], RFC 3986 §3.2.2) are
    // matched as a whole BEFORE the generic class — the ':'-stopping
    // host class would otherwise truncate them to garbage ('[2001')
    // and fabricate a blockable "domain" that matches nothing real
    val h = regexp_replace(
      regexp_extract(url,
        "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(\\[[^\\]/?#@]*\\]|[^/:?#@]+)", 1),
      "\\.+$", "")
    lower(when(h === "", null).otherwise(h))
  }

  /** DuckDB twin of [[hostOf]] over expression `e`. */
  def duckHostOf(e: String): String =
    s"lower(nullif(regexp_replace(regexp_extract($e, " +
      s"'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(\\[[^\\]/?#@]*\\]|[^/:?#@]+)', 1), " +
      s"'\\.+$$', '', 'g'), ''))"

  /** Registrable domain (eTLD+1) under the public-suffix list — full
    * rule semantics incl. wildcard (`*.ck`) and exception (`!www.ck`)
    * rules and the private hosting section (`x.blogspot.com` →
    * `x.blogspot.com`, not `blogspot.com`: blocking one tenant must
    * not block the platform). NULL (→ `invalid`) for hosts that ARE
    * a public suffix; IP literals and rule-less bare hosts pass
    * through whole. See [[Psl]] for the algorithm and snapshot.
    */
  def registrableDomain(host: Column): Column = Psl.registrableDomain(host)

  /** DuckDB twin of [[registrableDomain]] over host expression `e`. */
  def duckRegistrableDomain(e: String): String = Psl.duckRegistrableDomain(e)

  /** Canonical URL for dedup/grouping — the normalization a crawl
    * pipeline applies BEFORE url-keyed dedup (mirrors differing only
    * in tracking params, fragments, default ports, case, or userinfo
    * are the same resource): scheme and host lowercased (host also
    * FQDN-dot-stripped), userinfo dropped, default ports removed
    * (http:80 / https:443), fragment dropped, tracking params
    * removed (utm_*, gclid, fbclid), remaining query params SORTED
    * (param order is transport noise), empty path → '/'. Pure
    * columnar string work; engine-neutral (RE2-safe, list_sort ==
    * sort_array on strings). NULL for values with no scheme:// frame.
    */
  def canonicalUrl(url: Column): Column =
    graft.functions.GraftExpressions.canonicalUrl(url)

  /** Columnar formulation of [[canonicalUrl]] — the X22 parity
    * reference (see [[hostOfRef]]; round 16 moved the hot path to
    * one-node codegen expressions after measuring the optimizer
    * inlining this chain into 22k-node trees and 39.8 MiB crawl task
    * binaries).
    */
  private[graft] def canonicalUrlRef(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = hostOfRef(url)
    // port: last-@ userinfo rule as in hostOf, host class excludes
    // '@' and the digits must be FOLLOWED by /?#/end — without the
    // terminator, 'u:12345pw@h/x' backtracks out of the userinfo
    // group and fabricates port 12345 from the password
    val port = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(?:\\[[^\\]/?#@]*\\]|[^/:?#@]+):([0-9]+)(?:[/?#]|$)", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", "/").otherwise(path0)
    // query anchored to the PRE-fragment half ('#/search?q=x' is all
    // fragment) AND to the FIRST '?' (RFC 3986: the query starts at
    // the first '?'; a greedy prefix would anchor on the LAST one and
    // silently drop 'a=1?' from '/p?a=1?b=2', canonicalizing distinct
    // URLs together — a literal '?' inside a param survives as part
    // of that param)
    val query = array_join(
      sort_array(filter(split(regexp_extract(url, "^[^#?]*\\?([^#]*)", 1), "&"),
        x => x =!= "" && !x.rlike("^(utm_[^=]*|gclid|fbclid)(=.*)?$"))), "&")
    when(host.isNull, null).otherwise(concat(
      scheme, lit("://"), host, portPart, path,
      when(query === "", "").otherwise(concat(lit("?"), query))))
  }

  /** [[canonicalUrl]] over a named column — adds `canonical_url`. */
  def withCanonicalUrl(df: DataFrame, urlCol: String = "url"): DataFrame = {
    require(!df.columns.contains("canonical_url"),
      "withCanonicalUrl: input already has a 'canonical_url' column — rename it first")
    df.withColumn("canonical_url", canonicalUrl(col(urlCol)))
  }

  /** DuckDB twin of [[canonicalUrl]] over expression `e`. */
  def duckCanonicalUrl(e: String): String = {
    val scheme = s"lower(regexp_extract($e, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val host = duckHostOf(e)
    val port = s"regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(?:\\[[^\\]/?#@]*\\]|[^/:?#@]+):([0-9]+)(?:[/?#]|$$)', 1)"
    val portPart = s"CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443') THEN '' ELSE ':' || $port END"
    val path = s"CASE WHEN regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = '' THEN '/' " +
      s"ELSE regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END"
    // COALESCE: DuckDB's array_to_string over an EMPTY list is NULL
    // (Spark's array_join is '') — without it a url whose params all
    // filter away would NULL the whole concatenation
    val query = s"COALESCE(array_to_string(list_sort(list_filter(string_split(" +
      s"regexp_extract($e, '^[^#?]*\\?([^#]*)', 1), '&'), " +
      s"x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid)(=.*)?$$'))), '&'), '')"
    s"CASE WHEN $host IS NULL THEN NULL ELSE " +
      s"$scheme || '://' || $host || $portPart || $path || " +
      s"CASE WHEN $query = '' THEN '' ELSE '?' || $query END END"
  }

  /** Per-URL verdict columns: (input cols) + host, domain, verdict —
    * `blocked` (blocklist wins), `allowed`, or `neutral`. List
    * membership is a literal isin (dictionary-sized lists inline into
    * codegen; a full production blocklist becomes a broadcast
    * left_semi with identical semantics).
    */
  def urlVerdicts(
      df: DataFrame,
      urlCol: String = "url",
      allow: Seq[String] = Nil,
      block: Seq[String] = Nil): DataFrame = {
    Seq("host", "domain", "verdict").foreach(c =>
      require(!df.columns.contains(c),
        s"urlVerdicts: input already has a '$c' column — rename it first"))
    val withHost = df.withColumn("host", hostOf(col(urlCol)))
      .withColumn("domain", registrableDomain(col("host")))
    val verdict =
      when(col("domain").isNull, "invalid")
        .when(if (block.isEmpty) lit(false) else col("domain").isin(block: _*), "blocked")
        .when(if (allow.isEmpty) lit(false) else col("domain").isin(allow: _*), "allowed")
        .otherwise("neutral")
    withHost.withColumn("verdict", verdict)
  }

  /** Per-domain stats over [[urlVerdicts]] output: one combinable
    * groupBy — (domain, verdict, n_docs, n_hosts).
    */
  def domainStats(verdicts: DataFrame): DataFrame =
    verdicts.where(col("domain").isNotNull)
      .groupBy(col("domain"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"))

  // -----------------------------------------------------------------
  // t35: the canned query — deterministic synthetic URLs over the
  // documents table (the videoPayloads discipline: the corpus has no
  // URL column, so a format-true one is built by the SAME expression
  // in both engines — www prefixes, userinfo, mixed case, ports,
  // query strings, ccSLD suffixes), then host → registrable domain →
  // verdict → per-domain stats, end-to-end oracle-gated.
  // -----------------------------------------------------------------

  // Round 16: the synthetic hosts walk the PSL rule lattice — plain
  // gTLD/ccSLD suffixes, a private hosting suffix (blogspot/github —
  // the registrable domain is the TENANT), a wildcard family (.ck:
  // bare srcN.ck IS a public suffix → invalid; www.srcN.ck reduces
  // to srcN.ck), the *.kawasaki.jp family, and the two exception-rule
  // hosts (www.ck blocked, city.kawasaki.jp neutral).
  private val AllowList = Seq("src10.com", "src22.co.uk", "src33.blogspot.com")
  private val BlockList = Seq("src00.com", "src41.co.uk", "src112.org", "www.ck")

  private[operators] def syntheticUrls(docs: DataFrame): DataFrame = {
    val cls = (col("doc_id") % 9).cast("int")
    val suffix = element_at(array(lit(".com"), lit(".co.uk"), lit(".org"),
      lit(".blogspot.com"), lit(".ck"), lit(".kawasaki.jp"), lit(".github.io"),
      lit(""), lit("")), cls + 1)
    val srcHost = concat(
      when(col("doc_id") % 5 === 0, "www.").otherwise(""),
      when(col("doc_id") % 13 === 0, upper(col("source"))).otherwise(col("source")),
      (col("doc_id") % 7).cast("string"), suffix)
    val host = when(cls === 7, "www.ck")
      .when(cls === 8, "city.kawasaki.jp")
      .otherwise(srcHost)
    docs.select(col("doc_id"), concat(
      lit("https://"),
      when(col("doc_id") % 11 === 0, "user:pw@").otherwise(""),
      host,
      when(col("doc_id") % 4 === 0, ":8080").otherwise(""),
      lit("/p/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0, "?ref=rss#frag").otherwise("")).as("url"))
  }

  private val duckSyntheticUrls: String =
    "'https://' || CASE WHEN doc_id % 11 = 0 THEN 'user:pw@' ELSE '' END" +
      " || CASE CAST(doc_id % 9 AS INT) WHEN 7 THEN 'www.ck' WHEN 8 THEN 'city.kawasaki.jp'" +
      " ELSE CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END" +
      " || CASE WHEN doc_id % 13 = 0 THEN upper(source) ELSE source END" +
      " || CAST(doc_id % 7 AS VARCHAR)" +
      " || CASE CAST(doc_id % 9 AS INT) WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'" +
      " WHEN 2 THEN '.org' WHEN 3 THEN '.blogspot.com' WHEN 4 THEN '.ck'" +
      " WHEN 5 THEN '.kawasaki.jp' ELSE '.github.io' END END" +
      " || CASE WHEN doc_id % 4 = 0 THEN ':8080' ELSE '' END" +
      " || '/p/' || doc_id" +
      " || CASE WHEN doc_id % 2 = 0 THEN '?ref=rss#frag' ELSE '' END"

  // -----------------------------------------------------------------
  // t36: canonicalization — deterministic messy-URL variants over the
  // documents table (uppercase schemes, tracking params, unsorted
  // queries, default ports, userinfo, fragments, FQDN dots), grouped
  // by canonical form: the url-keyed dedup a mirror-heavy crawl runs.
  // -----------------------------------------------------------------

  private[operators] def messyUrls(docs: DataFrame): DataFrame = {
    val variant = (col("doc_id") % 4 + 1).cast("int")
    docs.select(col("doc_id"), concat(
      element_at(array(lit("https://"), lit("HTTPS://"), lit("https://user:pw@"),
        lit("https://")), variant),
      lit("src"), (col("doc_id") % 5).cast("string"), lit(".example.com"),
      element_at(array(lit(""), lit(":443"), lit(""), lit("")), variant),
      lit("/p/"), (col("doc_id") % 50).cast("string"),
      element_at(array(
        lit(""), lit("?utm_source=feed&utm_campaign=x"),
        lit("?b=2&a=1#frag"), lit("?a=1&fbclid=9&gclid=3")),
        variant)).as("url"))
  }

  private val duckMessyUrls: String =
    "CASE doc_id % 4 WHEN 0 THEN 'https://' WHEN 1 THEN 'HTTPS://' " +
      "WHEN 2 THEN 'https://user:pw@' ELSE 'https://' END" +
      " || 'src' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'" +
      " || CASE WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END" +
      " || '/p/' || CAST(doc_id % 50 AS VARCHAR)" +
      " || CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '?utm_source=feed&utm_campaign=x' " +
      "WHEN 2 THEN '?b=2&a=1#frag' ELSE '?a=1&fbclid=9&gclid=3' END"

  val all: Seq[Q] = Seq(
    Q(
      "t36_url_normalize",
      "URL canonicalization for crawl dedup: case/userinfo/default-port/tracking-param/fragment noise collapsed, query params sorted",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        withCanonicalUrl(messyUrls(docs), "url")
          .groupBy(col("canonical_url"))
          .agg(count(lit(1)).as("n_urls"),
            countDistinct(col("url")).as("n_raw_forms"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("canonical_url"))
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckMessyUrls AS url FROM documents),
        c AS (SELECT doc_id, url, ${duckCanonicalUrl("url")} AS canonical_url FROM u)
        SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
          CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
          MIN(doc_id) AS first_doc
        FROM c GROUP BY canonical_url ORDER BY canonical_url""")
    ),
    Q(
      "t35_url_domain",
      "URL → host → registrable domain → allow/block verdict → per-domain stats",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        domainStats(urlVerdicts(syntheticUrls(docs), "url", AllowList, BlockList))
          .orderBy(col("domain"), col("verdict"))
      },
      Some {
        val allowIn = AllowList.map(s => s"'$s'").mkString("(", ", ", ")")
        val blockIn = BlockList.map(s => s"'$s'").mkString("(", ", ", ")")
        s"""WITH u AS (SELECT doc_id, $duckSyntheticUrls AS url FROM documents),
        h AS (SELECT doc_id, ${duckHostOf("url")} AS host FROM u),
        d AS (SELECT doc_id, host, ${duckRegistrableDomain("host")} AS domain FROM h),
        v AS (SELECT doc_id, host, domain,
            CASE WHEN domain IS NULL THEN 'invalid'
                 WHEN domain IN $blockIn THEN 'blocked'
                 WHEN domain IN $allowIn THEN 'allowed'
                 ELSE 'neutral' END AS verdict
          FROM d)
        SELECT domain, verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
        FROM v WHERE domain IS NOT NULL
        GROUP BY domain, verdict ORDER BY domain, verdict"""
      }
    )
  )
}
