package graft.tools

import graft.SparkTestBase

/** Pins that the runtime metrics are real (nonzero where data moved)
  * and that the "narrow" queries truly are: t01's only shuffle at
  * runtime is the final deterministic sort — every record written to
  * a shuffle is an OUTPUT row, not input churn.
  */
class RuntimeAuditSpec extends SparkTestBase {

  test("t01 runtime shuffle is sort-only: shuffle records == output rows") {
    val a = RuntimeAudit.runQuery(spark, "t01_lang_id", sfDir)
    assert(a.rows == 500)
    assert(a.shuffles == 1, s"expected only the sort exchange, got ${a.shuffles}")
    assert(a.shuffleRecords == a.rows,
      s"shuffled ${a.shuffleRecords} records for ${a.rows} output rows")
    assert(a.shuffleBytes > 0)
  }

  test("q05 runtime plan broadcasts the dimensions and measures bytes") {
    val a = RuntimeAudit.runQuery(spark, "q05_multi_join", sfDir)
    assert(a.rows > 0)
    assert(a.broadcasts >= 3, s"dims should broadcast, got ${a.broadcasts}")
    assert(a.broadcastBytes > 0)
    assert(a.scanRows > 0)
  }

  test("q01 shuffles only aggregated partials, far fewer records than scanned") {
    val a = RuntimeAudit.runQuery(spark, "q01_pricing_agg", sfDir)
    assert(a.rows > 0 && a.scanRows > 0)
    // map-side combine: the shuffle carries per-partition partials,
    // orders of magnitude below the scan row count
    assert(a.shuffleRecords < a.scanRows / 10,
      s"partial agg not map-side combined: ${a.shuffleRecords} vs scan ${a.scanRows}")
  }
}
