package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-9: the convergence-stop variant of LPA (the O34 treatment
  * kCore and pageRankConverged already have) and the g05 plan fix.
  *
  * g05 keeps 3 fixed rounds so its DuckDB oracle is a literal CTE
  * unroll; Graph.labelPropagationConverged is what a user calls. The
  * contract pinned here: fixpoint == fixed-round output where the
  * fixed rounds already converged, and maxRounds RAISES on a graph
  * synchronous LPA can never converge on (bipartite 2-cycle) instead
  * of silently returning a mid-oscillation frame.
  */
class Round9GraphSpec extends SparkTestBase {

  import spark.implicits._

  private def lblMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("LPA fixpoint equals 3 fixed rounds on a graph where 3 rounds converge") {
    // two disjoint triangles: min-tie-break sync LPA floods each to
    // its minimum id within 2 rounds (hand-traced), so round 3 is a
    // no-change round and both variants agree
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("u", "v")
    val fixed = lblMap(Graph.labelPropagation(und, rounds = 3))
    val fix = lblMap(Graph.labelPropagationConverged(und))
    assert(fix == fixed, s"fixpoint $fix != 3-round $fixed")
    assert(fix == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
    spark.catalog.clearCache()
  }

  test("LPA maxRounds raises on a bipartite 2-cycle (labels swap forever)") {
    // a single edge: each round the two nodes adopt EACH OTHER's
    // label — the canonical sync-LPA oscillation; a fixed-round run
    // returns whichever phase round n lands on, the converged variant
    // must refuse
    val und = Seq((1L, 2L)).toDF("u", "v")
    val err = intercept[IllegalArgumentException] {
      Graph.labelPropagationConverged(und, maxRounds = 6)
    }
    assert(err.getMessage.contains("still changing"), err.getMessage)
    spark.catalog.clearCache()
  }

  test("g05 member counts come from an agg + join-back, not a window") {
    // the round-8 verdict flagged count() over (partition by l): it
    // ships every member of a community to one task — unbounded
    // partition on a corpus-scale community. The fix aggregates
    // (map-side combinable) and joins back; no Window node may
    // reappear in g05's optimized plan.
    val df = graft.SparkEntry.queries("g05_label_propagation")(spark, sfDir)
    val hasWindow = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty
    assert(!hasWindow, "g05 plan contains a Window node — the straggler shape is back")
    // and the values still match the windowed form's semantics
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getLong(1)).map { case (l, rs) => l -> rs.length }
    rows.foreach { r =>
      assert(r.getLong(2) == byLabel(r.getLong(1)).toLong,
        s"n_members mismatch for node ${r.getLong(0)}")
    }
    spark.catalog.clearCache()
  }

  test("g05 sizes join-back is not force-broadcast (one row per label is unbounded)") {
    // round-9 verdict: `broadcast(sizes)` is one row per SURVIVING
    // label — up to one per node on a fragmented graph, a
    // driver-killer at 10^9 nodes. The hint must be gone from the
    // LOGICAL plan (no ResolvedHint over the sizes agg); AQE may
    // still CHOOSE a broadcast at this scale — that's the point.
    val df = graft.SparkEntry.queries("g05_label_propagation")(spark, sfDir)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // the LPA loop itself broadcasts nothing; no hint anywhere in g05
    assert(hints.isEmpty,
      s"g05 carries ${hints.size} join hint(s) — the unbounded sizes broadcast is back")
    spark.catalog.clearCache()
  }
}
