package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** g12: domain-graph PageRank over EXTRACTED outlinks — the full
  * crawl-to-ranking composition: t38's anchor extraction + X25
  * resolution build the registrable-domain link graph, and the g01
  * integer PageRank ranks it (the signal crawl frontiers use to
  * prioritize domains). Unlike g01/g04 (synthetic event graphs), the
  * edges here come out of HTML — so this query gates the whole chain
  * end-to-end: a regression in href parsing, resolution, PSL
  * reduction, or the rank recurrence all fail the one oracle.
  *
  * The domain graph keeps self-loops (a domain's internal links are
  * most of its outlinks — they dilute what it passes outward, which
  * is faithful: link-farms self-linking shouldn't export rank) and
  * has genuine dangling mass (example.org/.net never link out), so
  * the g04 dangling path is exercised on organic edges.
  *
  * Scale: edge building is t38 (map-only + one combinable groupBy);
  * the rank loop is [[Graph.pageRankWeighted]]'s shape — one
  * src-keyed join + one dst-keyed agg per iteration over the
  * checkpointed edge frame.
  */
object HostRank {

  private val Iters = 4

  private def t38EdgesCtes: String =
    s"""${Links.duckResolvedLinks},
      eh AS MATERIALIZED (SELECT ${UrlCuration.duckHostOf("base")} AS src_host,
          ${UrlCuration.duckHostOf("target")} AS dst_host
        FROM res),
      ed AS MATERIALIZED (SELECT ${UrlCuration.duckRegistrableDomain("src_host")} AS src,
          ${UrlCuration.duckRegistrableDomain("dst_host")} AS dst
        FROM eh),
      edges AS MATERIALIZED (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM ed
        WHERE src IS NOT NULL AND dst IS NOT NULL GROUP BY src, dst)"""

  private def g12Oracle: String = {
    // the g01/g04 integer recurrence verbatim: full node universe,
    // LEFT JOIN on received mass, dangling mass D // n on every node;
    // each it{t-1} referenced twice -> AS MATERIALIZED
    val iterCtes = (1 to Iters).map { t =>
      s"""it$t AS MATERIALIZED (SELECT nd.node,
          CAST(150000000000 + (17 * (COALESCE(rc.s, 0) + dg.d // nc.n)) // 20 AS BIGINT) AS r
        FROM nodes nd
        LEFT JOIN (SELECT e.dst AS node, CAST(SUM((p.r * e.w) // d.w_out) AS BIGINT) AS s
          FROM it${t - 1} p
          JOIN edges e ON e.src = p.node
          JOIN deg d ON d.node = p.node
          GROUP BY e.dst) rc ON rc.node = nd.node
        CROSS JOIN (SELECT CAST(COALESCE(SUM(p.r), 0) AS BIGINT) AS d FROM it${t - 1} p
          WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.node = p.node)) dg
        CROSS JOIN nc)"""
    }.mkString(",\n      ")
    s"""WITH $t38EdgesCtes,
      deg AS MATERIALIZED (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS w_out
        FROM edges GROUP BY src),
      nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      nc AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      it0 AS MATERIALIZED (SELECT node, CAST(${Graph.Scale} AS BIGINT) AS r FROM nodes),
      $iterCtes
      SELECT node, r AS rank_fp, ROUND(CAST(r AS DOUBLE) / ${Graph.Scale}, 9) AS rank
      FROM it$Iters ORDER BY rank_fp DESC, node"""
  }

  val all: Seq[Q] = Seq(
    Q(
      "g12_host_rank",
      "Domain PageRank over EXTRACTED outlinks: t38 edges (href parse + X25 + PSL) through the g01 integer rank",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val links = Links.outlinks(Links.syntheticPages(docs))
        val edges = links.select(
            GraftExpressions.registrableDomain(
              GraftExpressions.urlHost(col("url"))).as("src"),
            GraftExpressions.registrableDomain(
              GraftExpressions.urlHost(col("target"))).as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        Graph.pageRankWeighted(edges, iters = Iters)
          .select(col("node"), col("r").as("rank_fp"),
            round(col("r").cast("double") / Graph.Scale, 9).as("rank"))
          .orderBy(col("rank_fp").desc, col("node"))
      },
      Some(g12Oracle)
    )
  )
}
