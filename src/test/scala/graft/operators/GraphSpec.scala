package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the graph operators (g01 / Graph.pageRankWeighted).
  *
  * The strongest check is the q52-style driver replay: the exact
  * integer recurrence is tiny to express sequentially, so the spec
  * replays all 5 iterations over the collected edge list in pure
  * Scala and demands BIT-EQUALITY with the distributed result — if
  * the Spark plan reorders, re-partitions, or AQE re-plans in a way
  * that changes any value, integer arithmetic can't hide it.
  */
class GraphSpec extends SparkTestBase {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("g01 pagerank matches an exact sequential replay of the integer recurrence") {
    val got = q("g01_pagerank_weighted").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent driver-side replay from the raw events table
    val ue = graft.tables.Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("w"))
      .collect()
      .map(r => (s"u${r.getLong(0)}", s"t${r.getString(1)}", r.getLong(2)))
    val edges = ue.map { case (u, t, w) => (u, t, w) } ++
      ue.map { case (u, t, w) => (t, u, w) }
    val wOut = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val scale = 1000000000000L
    var r = wOut.map { case (n, _) => n -> scale }
    for (_ <- 1 to 5) {
      val in = edges
        .map { case (s, d, w) => d -> (r(s) * w) / wOut(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = in.map { case (d, s) => d -> (3L * scale / 20L + (17L * s) / 20L) }
    }
    assert(got.size == r.size, s"node count ${got.size} != ${r.size}")
    r.foreach { case (n, v) =>
      assert(got(n) == v, s"node $n: distributed ${got(n)} != replay $v")
    }
  }

  test("g01 rank mass is conserved up to floor-truncation loss") {
    // on a strongly connected graph damped PageRank preserves total
    // mass exactly; integer floors only ever LOSE mass, bounded by
    // (edges + nodes) per iteration — far under 1% here
    val df = q("g01_pagerank_weighted").cache()
    val n = df.count()
    val total = df.agg(sum(col("rank_fp"))).head.getLong(0)
    val ideal = n * 1000000000000L
    assert(total <= ideal, s"mass created: $total > $ideal")
    assert(total > (ideal * 0.99).toLong, s"mass lost >1%: $total vs $ideal")
  }

  test("pageRankWeighted on a weighted star concentrates rank in the hub") {
    import spark.implicits._
    // hub h neighbors a,b,c; undirected; uniform weights
    val pairs = Seq(("h", "a", 1L), ("h", "b", 1L), ("h", "c", 1L))
    val edges = pairs.toDF("src", "dst", "w")
      .unionAll(pairs.map { case (s, d, w) => (d, s, w) }.toDF("src", "dst", "w"))
    val r = Graph.pageRankWeighted(edges, iters = 5).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("h") > r("a") && r("a") == r("b") && r("b") == r("c"),
      s"star ranks: $r")
    spark.catalog.clearCache()
  }
}
