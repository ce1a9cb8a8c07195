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
    val r = replay(edges, iters = 5)
    assert(got.size == r.size, s"node count ${got.size} != ${r.size}")
    r.foreach { case (n, v) =>
      assert(got(n) == v, s"node $n: distributed ${got(n)} != replay $v")
    }
  }

  /** Sequential replica of the FULL pageRankWeighted recurrence:
    * node universe = src ∪ dst, dangling mass D div n redistributed,
    * damped integer combine 0.15*Scale + 17*(recv + share) div 20.
    */
  private def replay(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val scale = 1000000000000L
    val wOut = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val allNodes = edges.flatMap { case (s, d, _) => Seq(s, d) }.toSet
    val n = allNodes.size.toLong
    var r = allNodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges
        .map { case (s, d, w) => d -> (r(s) * w) / wOut(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      val share = allNodes.filterNot(wOut.contains).toSeq.map(r).sum / n
      r = allNodes.map { nd =>
        nd -> (3L * scale / 20L + (17L * (in.getOrElse(nd, 0L) + share)) / 20L)
      }.toMap
    }
    r
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

  test("pageRankWeighted redistributes dangling mass: sink-bearing graph matches replay") {
    import spark.implicits._
    // c is a SINK (no out-edges) and a is never a dst: both must stay
    // in the frame, and c's damped mass must flow back uniformly
    // instead of leaking (pre-fix, c's rank vanished from the output
    // and total mass decayed toward the 0.15 floor).
    val pairs = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 3L))
    val got = Graph.pageRankWeighted(pairs.toDF("src", "dst", "w"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = replay(pairs, iters = 5)
    assert(got.keySet == Set("a", "b", "c"), s"node universe wrong: ${got.keySet}")
    assert(got == exp, s"distributed $got != replay $exp")
    // dangling redistribution conserves mass up to integer floors
    val ideal = 3L * 1000000000000L
    assert(got.values.sum <= ideal && got.values.sum > (ideal * 0.99).toLong,
      s"mass not conserved: ${got.values.sum} vs $ideal")
  }

  test("pageRankWeighted raises on int64 overflow / non-positive weights") {
    import spark.implicits._
    def rootMessages(t: Throwable): String = {
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    }
    // r0 = 1e12, w = 1e8 → r*w = 1e20 > int64 max: must raise, not wrap
    val big = Seq(("a", "b", 100000000L), ("b", "a", 100000000L))
    val e1 = intercept[Throwable] {
      Graph.pageRankWeighted(big.toDF("src", "dst", "w"), iters = 1).collect()
    }
    assert(rootMessages(e1).contains("overflows int64"), rootMessages(e1))
    val e2 = intercept[Throwable] {
      Graph.pageRankWeighted(Seq(("a", "b", 0L)).toDF("src", "dst", "w"), iters = 1).collect()
    }
    assert(rootMessages(e2).contains("must be positive"), rootMessages(e2))
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
