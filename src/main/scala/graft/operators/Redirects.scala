package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** Redirect-chain resolution (O61, t40): from a fetch table (url,
  * status, Location header) to the final destination of every URL —
  * the step a crawl runs between fetching and admission so that
  * `/old → /new → /newer` collapses onto one canonical target and
  * redirect loops / dead ends are classified instead of re-fetched
  * forever.
  *
  * Semantics: a 3xx fetch row with a Location header is one directed
  * edge `url → resolve_url(url, location)` (X25 — RFC 7231 allows
  * relative Locations). Chains are walked at most `maxHops` steps
  * with exact path-local loop detection (the visited set rides along
  * as a bounded array column). Verdicts:
  *   - `ok`: the walk ended on a URL with no outgoing redirect that
  *     IS in the fetch set (a terminal capture — 3xx rows without a
  *     usable Location are terminals too);
  *   - `dangling`: ended on a URL never fetched (frontier work);
  *   - `loop`: the next hop would revisit a URL already on this
  *     chain's path;
  *   - `capped`: still redirecting after `maxHops` hops.
  * When several captures of one URL disagree (recrawls), the edge is
  * deduped per source — by latest `tsCol` when given, else by the
  * lexicographically smallest target (deterministic either way).
  *
  * Scale: `maxHops` keyed equi-joins (plus two classification
  * joins), each shuffle-partitioned on the url key; per-row state is
  * bounded by `maxHops + 1` strings. Real redirect chains are short
  * (browsers cap ~20, crawlers 4–8), so the bounded unroll IS the
  * production shape — no unbounded iterate-to-fixpoint needed.
  */
object Redirects {

  def chains(
      fetches: DataFrame,
      urlCol: String = "url",
      statusCol: String = "status",
      locationCol: String = "location",
      maxHops: Int = 4,
      tsCol: Option[String] = None): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16, "chains: maxHops must be in [1, 16]")
    val redirecting = fetches
      .where(col(statusCol) >= 300 && col(statusCol) <= 399 &&
        col(locationCol).isNotNull)
      .select(col(urlCol).as("_src"),
        GraftExpressions.resolveUrl(col(urlCol), col(locationCol)).as("_dst"),
        tsCol.map(col).getOrElse(lit(0)).as("_ts"))
      .where(col("_dst").isNotNull)
    // lineage cut (O36): the walk references `edges` maxHops + 1
    // times and `fetches` twice more — without the cut every join
    // re-executes the caller's whole upstream plan (measured at
    // sf0.01: 3 broadcasts re-materializing the fetch plan, 100 MB
    // of broadcast bytes for a 150-row edge set)
    val edges = (tsCol match {
      case Some(_) => redirecting.groupBy(col("_src"))
        .agg(max(struct(col("_ts"), col("_dst"))).getField("_dst").as("_dst"))
      case None => redirecting.groupBy(col("_src")).agg(min(col("_dst")).as("_dst"))
    }).graftCheckpointLazy
    val fetched = fetches.select(col(urlCol).as("_f")).distinct().graftCheckpointLazy

    var state = fetches.select(col(urlCol).as("url")).distinct()
      .select(col("url"), col("url").as("cur"),
        array(col("url")).as("visited"),
        lit(0L).as("n_hops"), lit(false).as("looped"))
    for (i <- 1 to maxHops) {
      val e = edges.select(col("_src").as(s"_s$i"), col("_dst").as(s"_d$i"))
      val dst = col(s"_d$i")
      val moved = dst.isNotNull && !array_contains(col("visited"), dst) && !col("looped")
      state = state.join(e, col("cur") === col(s"_s$i"), "left_outer")
        .select(
          col("url"),
          when(moved, dst).otherwise(col("cur")).as("cur"),
          when(moved, array_union(col("visited"), array(dst)))
            .otherwise(col("visited")).as("visited"),
          (col("n_hops") + when(moved, 1L).otherwise(0L)).as("n_hops"),
          (col("looped") ||
            (dst.isNotNull && array_contains(col("visited"), dst))).as("looped"))
    }
    val eo = edges.select(col("_src").as("_so"))
    state
      .join(eo, col("cur") === col("_so"), "left_outer")
      .join(fetched, col("cur") === col("_f"), "left_outer")
      .select(
        col("url"),
        col("cur").as("final_url"),
        col("n_hops"),
        when(col("looped"), "loop")
          .when(col("_so").isNotNull, "capped")
          .when(col("_f").isNotNull, "ok")
          .otherwise("dangling").as("verdict"))
  }

  // -----------------------------------------------------------------
  // t40: the canned query — a deterministic fetch table over the
  // documents table, families of 12 ids covering every verdict:
  // terminals (0–2), chains of 1–4 hops (3–6), a 5-hop chain that
  // caps at maxHops=4 (7), an external dangling 302 (8), a 2-cycle
  // (9↔10), and a RELATIVE Location that dot-normalizes to an
  // unfetched path (11). Truncated families at the corpus edge stay
  // well-defined: a missing target is simply 'dangling' — in both
  // engines identically.
  // -----------------------------------------------------------------

  private val Host = "https://r.example.com"

  private[operators] def syntheticFetches(docs: DataFrame): DataFrame = {
    val i = col("doc_id")
    val fam = i % 12
    val b = i - fam
    val u = (idExpr: org.apache.spark.sql.Column) =>
      concat(lit(s"$Host/u/"), idExpr.cast("string"))
    val status = when(fam.isin(3, 4, 5, 6, 7), 301)
      .when(fam === 8, 302)
      .when(fam.isin(9, 10), 307)
      .when(fam === 11, 302)
      .otherwise(200)
    val location = when(fam === 3, concat(lit("/u/"), b.cast("string")))
      .when(fam === 4, concat(lit("/u/"), (b + 3).cast("string")))
      .when(fam === 5, concat(lit("/u/"), (b + 4).cast("string")))
      .when(fam === 6, concat(lit("/u/"), (b + 5).cast("string")))
      .when(fam === 7, concat(lit("/u/"), (b + 6).cast("string")))
      .when(fam === 8, concat(lit("https://gone.example.net/g/"), i.cast("string")))
      .when(fam === 9, concat(lit("/u/"), (b + 10).cast("string")))
      .when(fam === 10, concat(lit("/u/"), (b + 9).cast("string")))
      .when(fam === 11, concat(lit("../w/"), i.cast("string")))
      .otherwise(lit(null).cast("string"))
    docs.select(u(i).as("url"), status.cast("int").as("status"), location.as("location"))
  }

  private val duckSyntheticFetches: String =
    s"""SELECT '$Host/u/' || CAST(doc_id AS VARCHAR) AS url,
      CAST(CASE WHEN doc_id % 12 IN (3,4,5,6,7) THEN 301
           WHEN doc_id % 12 = 8 THEN 302
           WHEN doc_id % 12 IN (9,10) THEN 307
           WHEN doc_id % 12 = 11 THEN 302
           ELSE 200 END AS INT) AS status,
      CASE WHEN doc_id % 12 = 3 THEN '/u/' || CAST(doc_id - doc_id % 12 AS VARCHAR)
           WHEN doc_id % 12 = 4 THEN '/u/' || CAST(doc_id - doc_id % 12 + 3 AS VARCHAR)
           WHEN doc_id % 12 = 5 THEN '/u/' || CAST(doc_id - doc_id % 12 + 4 AS VARCHAR)
           WHEN doc_id % 12 = 6 THEN '/u/' || CAST(doc_id - doc_id % 12 + 5 AS VARCHAR)
           WHEN doc_id % 12 = 7 THEN '/u/' || CAST(doc_id - doc_id % 12 + 6 AS VARCHAR)
           WHEN doc_id % 12 = 8 THEN 'https://gone.example.net/g/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 12 = 9 THEN '/u/' || CAST(doc_id - doc_id % 12 + 10 AS VARCHAR)
           WHEN doc_id % 12 = 10 THEN '/u/' || CAST(doc_id - doc_id % 12 + 9 AS VARCHAR)
           WHEN doc_id % 12 = 11 THEN '../w/' || CAST(doc_id AS VARCHAR)
           END AS location
    FROM documents"""

  private def t40Oracle(maxHops: Int): String = {
    // X25 restated for the three Location shapes the synthetic emits
    // (root-relative, absolute, relative-with-..) — one dot-segment
    // pass suffices for the ../w shape.
    val resolve =
      s"""CASE WHEN location LIKE 'https://%' THEN location
           WHEN location LIKE '/%' THEN '$Host' || location
           ELSE regexp_replace(regexp_replace(url, '[^/]*$$', '', 'g') || location,
             '/[^/]*[^/.][^/]*/\\.\\.(/|$$)', '/', 'g') END"""
    val iters = (1 to maxHops).map { k =>
      s"""it$k AS (SELECT s.url,
          CASE WHEN e.dst IS NOT NULL AND NOT list_contains(s.visited, e.dst)
                    AND NOT s.looped
               THEN e.dst ELSE s.cur END AS cur,
          CASE WHEN e.dst IS NOT NULL AND NOT list_contains(s.visited, e.dst)
                    AND NOT s.looped
               THEN list_append(s.visited, e.dst) ELSE s.visited END AS visited,
          s.n_hops + CASE WHEN e.dst IS NOT NULL
                    AND NOT list_contains(s.visited, e.dst) AND NOT s.looped
               THEN 1 ELSE 0 END AS n_hops,
          s.looped OR (e.dst IS NOT NULL AND list_contains(s.visited, e.dst)) AS looped
        FROM it${k - 1} s LEFT JOIN edges e ON e.src = s.cur)"""
    }.mkString(",\n      ")
    s"""WITH f AS ($duckSyntheticFetches),
      edges AS MATERIALIZED (SELECT url AS src, MIN($resolve) AS dst FROM f
        WHERE status BETWEEN 300 AND 399 AND location IS NOT NULL
        GROUP BY url),
      it0 AS (SELECT url, url AS cur, [url] AS visited,
          CAST(0 AS BIGINT) AS n_hops, FALSE AS looped FROM f),
      $iters
      SELECT s.url AS url, s.cur AS final_url, CAST(s.n_hops AS BIGINT) AS n_hops,
        CASE WHEN s.looped THEN 'loop'
             WHEN eo.src IS NOT NULL THEN 'capped'
             WHEN fo.url IS NOT NULL THEN 'ok'
             ELSE 'dangling' END AS verdict
      FROM it$maxHops s
      LEFT JOIN edges eo ON eo.src = s.cur
      LEFT JOIN (SELECT DISTINCT url FROM f) fo ON fo.url = s.cur
      ORDER BY url"""
  }

  val all: Seq[Q] = Seq(
    Q(
      "t40_redirects",
      "Redirect-chain resolution: 3xx Location edges (X25-resolved) walked maxHops with loop/dangling/capped verdicts",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        chains(syntheticFetches(docs), maxHops = 4)
          .orderBy(col("url"))
      },
      Some(t40Oracle(4))
    )
  )
}
