package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Graph-analytics operators over interaction data (SURVEY.md §2.3).
  *
  * A training-data pipeline ranks ENTITIES, not just documents: crawl
  * pipelines weight domains by link-graph importance before sampling,
  * and interaction graphs (user x item, doc x cluster) need the same
  * machinery. d06/d08 already cover connected components; g01 adds the
  * other classic — PageRank — in a fully deterministic fixed-point
  * integer formulation so it carries a value-level DuckDB oracle
  * (floating-point PageRank cannot: per-iteration double summation
  * order differs between engines and the drift compounds).
  */
object Graph {

  /** Rank scale: 1.0 == 1e12 micro-units. All arithmetic is int64. */
  private val Scale = 1000000000000L

  /** Weighted PageRank over an edge list, `iters` synchronous
    * iterations, damping 0.85 held EXACT as the integer form
    * r' = 0.15*Scale + (17 * sum(contrib)) div 20 with
    * contrib = (r * w) div w_out — floor division on non-negative
    * int64 is identical in Spark (`div`) and DuckDB (`//`), so every
    * iteration is bit-reproducible across engines.
    *
    * Scale shape (the d06/d08 iterative-plan discipline): `edges` and
    * the out-weight frame are computed once, cached and reused across
    * iterations; each iteration is ONE join keyed on src (ranks are
    * node-keyed, co-partitioned with the out-weights) and ONE dst-keyed
    * aggregation — the canonical Spark PageRank shuffle pattern. Rank
    * state is 16 bytes/node. Overflow bound: r*w needs
    * max_r * max_w < 2^63; with max_r ~ n*Scale mass concentration
    * impossible below ~9e6 total weight per edge — for heavier graphs
    * pre-scale weights (divide by their gcd or bucket them), or drop
    * Scale; documented rather than auto-rescaled so the oracle stays
    * a literal transcription.
    *
    * Plans grow linearly with `iters` (5 here); for big graphs
    * checkpoint every few iterations like Ops.connectedComponents —
    * at iters=5 the plan is small enough that lineage is cheaper.
    */
  def pageRankWeighted(
      edges: DataFrame, // src, dst, w (directed; pass both directions for undirected)
      iters: Int
  ): DataFrame = {
    // out-weights are folded into the edge frame ONCE, so each
    // iteration is a single src-keyed join + one dst-keyed agg (the
    // naive form joins ranks->outW->edges: 2 joins and 2 broadcast
    // builds per iteration — measurably half the wall cost here was
    // that second build x 5 iterations).
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val ew = e.join(outW, "src").localCheckpoint(eager = false)
    var ranks = outW.select(col("src").as("node"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(ew, col("node") === col("src"))
        .select(col("dst"), expr("(r * w) div w_out").as("_c"))
      ranks = contrib.groupBy(col("dst").as("node"))
        .agg((lit(3L * Scale / 20L) + expr("(17 * sum(_c)) div 20")).as("r"))
        // lazy checkpoint per iteration (the d06/d08 discipline): the
        // broadcast build of iteration k+1 otherwise RE-EXECUTES
        // iterations 1..k — O(iters^2) work and most of the wall cost
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Exact triangle counting via degree orientation.
    *
    * `edges` is the DISTINCT undirected edge set with u < v. Each edge
    * is oriented from its lower-(degree, id) endpoint to its higher
    * one; that total order makes every triangle an acyclic tournament
    * with exactly ONE node owning two out-edges, so enumerating wedges
    * (a→b, a→c) and closing them against the undirected set counts
    * each triangle exactly once — no /3 or /6 correction, and no
    * dependence on id distribution.
    *
    * Scale shape: orientation is THE classical skew bound — a node's
    * oriented out-degree is O(sqrt(m)) regardless of its raw degree,
    * so the wedge self-join cannot explode on celebrity nodes the way
    * an id-ordered (a<b<c) join does when low ids happen to be hubs.
    * Three shuffles total: the degree agg, the wedge self-join keyed
    * on the wedge apex, and the closing equi-join keyed on the
    * (lo, hi) pair. Everything else is map-side.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v"))
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
    val tri = wedges
      .join(und, least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  val all: Seq[Q] = Seq(
    Q(
      "g01_pagerank_weighted",
      "Deterministic integer PageRank over the bipartite user<->event_type interaction graph",
      (spark, dir) => {
        import spark.implicits._
        // The domain-ranking shape crawl curation runs before
        // sampling: project events into a weighted bipartite graph
        // (edge weight = interaction count), walk 5 damped iterations,
        // rank every node. Node ids are namespaced strings so the two
        // partitions share one id space. All-integer: see
        // [[pageRankWeighted]].
        val ue = Tables.load(spark, dir, "events")
          .groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("w"))
          .select(concat(lit("u"), $"user_id".cast("string")).as("u"),
            concat(lit("t"), $"event_type").as("t"), $"w")
        val edges = ue.select($"u".as("src"), $"t".as("dst"), $"w")
          .unionAll(ue.select($"t".as("src"), $"u".as("dst"), $"w"))
        pageRankWeighted(edges, iters = 5)
          .select($"node", $"r".as("rank_fp"),
            round($"r".cast("double") / Scale, 9).as("rank"))
          .orderBy($"rank_fp".desc, $"node")
      },
      Some {
        val iterCtes = (1 to 5).map { t =>
          s"""it$t AS (SELECT e.dst AS node,
            CAST(150000000000 + (17 * SUM((p.r * e.w) // d.w_out)) // 20 AS BIGINT) AS r
          FROM it${t - 1} p
          JOIN edges e ON e.src = p.node
          JOIN deg d ON d.node = p.node
          GROUP BY e.dst)"""
        }.mkString(",\n        ")
        s"""WITH ue AS (SELECT 'u' || CAST(user_id AS VARCHAR) AS u,
            't' || event_type AS t, CAST(COUNT(*) AS BIGINT) AS w
          FROM events GROUP BY user_id, event_type),
        edges AS (SELECT u AS src, t AS dst, w FROM ue
          UNION ALL SELECT t AS src, u AS dst, w FROM ue),
        deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS w_out FROM edges GROUP BY src),
        it0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
        $iterCtes
        SELECT node, r AS rank_fp, ROUND(CAST(r AS DOUBLE) / 1000000000000, 9) AS rank
        FROM it5 ORDER BY rank_fp DESC, node"""
      }
    ),

    Q(
      "g02_triangle_count",
      "Per-node exact triangle counts on the part co-purchase graph, degree-oriented",
      (spark, dir) => {
        import spark.implicits._
        // Co-occurrence graphs (parts bought together, domains linked
        // together, docs sharing a cluster) get triangle counts as the
        // standard cohesion signal — clustering coefficient numerators,
        // community seeds. Graph: parts co-purchased in the same order
        // with l_quantity >= 30 (degree ~28 at any sf: orders AND parts
        // both scale linearly, so the graph grows linearly and the
        // per-node neighborhood stays bounded). The Spark side orients
        // by degree for the skew bound; the oracle enumerates a<b<c —
        // deliberately different formulations, identical triangles.
        val ip = Tables.load(spark, dir, "lineitem")
          .filter($"l_quantity" >= 30)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
        val edges = ip.as("a").join(ip.as("b"), "ok")
          .where($"a.p" < $"b.p")
          .select($"a.p".as("u"), $"b.p".as("v")).distinct()
        triangleCounts(edges)
          .orderBy($"n_tri".desc, $"node")
      },
      Some("""WITH ip AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
          FROM lineitem WHERE l_quantity >= 30),
        und AS (SELECT DISTINCT a.p AS u, b.p AS v
          FROM ip a JOIN ip b ON a.ok = b.ok AND a.p < b.p),
        tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1 JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        corners AS (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM corners GROUP BY node ORDER BY n_tri DESC, node""")
    ),

    Q(
      "g03_kcore_peel",
      "3-core peeling, 5 synchronous rounds: surviving nodes + their residual degree",
      (spark, dir) => {
        import spark.implicits._
        // The densest-region filter community detection starts from:
        // repeatedly remove nodes with degree < k. Five SYNCHRONOUS
        // peel rounds (fixed count, like g01's iterations, so the
        // oracle is a literal 5-stage CTE unroll — a data-dependent
        // fixpoint would leave the oracle unable to know when to
        // stop). Each round is ONE degree agg + two semi-joins
        // restricting the edge list; per-round lazy checkpoints keep
        // the plan linear in rounds (the g01/d06 discipline). At
        // 100 TB: degree aggs shuffle on node, semi-joins broadcast
        // the shrinking keep-list once it fits, all linear in edges.
        val ip = Tables.load(spark, dir, "lineitem")
          .filter($"l_quantity" >= 30)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
        val und = ip.as("a").join(ip.as("b"), "ok")
          .where($"a.p" < $"b.p")
          .select($"a.p".as("u"), $"b.p".as("v")).distinct()
        var e = und.select($"u".as("src"), $"v".as("dst"))
          .unionAll(und.select($"v".as("src"), $"u".as("dst")))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 5) {
          val keep = e.groupBy($"src").agg(count(lit(1)).as("d"))
            .where($"d" >= 3).select($"src".as("_k"))
          e = e.join(keep.select($"_k".as("src")), Seq("src"), "left_semi")
            .join(keep.select($"_k".as("dst")), Seq("dst"), "left_semi")
            .select($"src", $"dst")
            .localCheckpoint(eager = false)
        }
        e.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
          .orderBy($"node")
      },
      Some {
        // every e{r-1} is referenced TWICE per stage (degree agg +
        // edge restriction): if DuckDB INLINES the CTEs the plan tree
        // doubles per stage — 2^5 copies of the und self-join
        // (measured: 58 s vs 0.9 s at sf0.1; disk-spill death at
        // sf1). AS MATERIALIZED pins each stage to evaluate once.
        val peels = (1 to 5).map { r =>
          s"""k$r AS MATERIALIZED (SELECT src AS node FROM e${r - 1} GROUP BY src HAVING COUNT(*) >= 3),
          e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
            JOIN k$r a ON e.src = a.node JOIN k$r b ON e.dst = b.node)"""
        }.mkString(",\n        ")
        s"""WITH ip AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
          FROM lineitem WHERE l_quantity >= 30),
        und AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
          FROM ip a JOIN ip b ON a.ok = b.ok AND a.p < b.p),
        e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und
          UNION ALL SELECT v, u FROM und),
        $peels
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e5 GROUP BY src ORDER BY node"""
      }
    )
  )
}
