package graft.operators

import graft.SparkTestBase
import graft.SparkEntry

class RelationalSpec extends SparkTestBase {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Round 2 closed every hole except the HLL sketch itself (its
    // hash sequence is legitimately engine-specific; the error-bound
    // test below covers it).
    assert(noOracle == Set("q30_approx_distinct"), s"missing oracles: $noOracle")
  }

  test("q30 approximation error bounded vs exact") {
    val rows = SparkEntry.queries("q30_approx_distinct")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"HLL error too large: $approx vs $exact")
    }
  }

  // Every relational operator runs at sf0.001 and yields a sane result.
  for (q <- Relational.all) {
    test(s"${q.name} executes") {
      val df = q.build(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty even at the smallest sf
      if (!Set("q07_anti_join").contains(q.name)) {
        assert(n > 0, s"${q.name} returned 0 rows at sf0.001")
      }
    }
  }

  test("q01 aggregates match hand-computed values") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q01_pricing_agg").get.build(spark, sfDir)
    val row = df.filter(col("l_returnflag") === "A" && col("l_linestatus") === "F").head()
    // cross-check: sum_qty equals the raw double sum within float noise
    val li = graft.tables.Tables.load(spark, sfDir, "lineitem")
    val expected = li
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .agg(sum("l_quantity"))
      .head()
      .getDouble(0)
    assert(math.abs(row.getAs[Double]("sum_qty") - expected) < 1e-6)
  }

  test("q22 session counts sum to event count") {
    val df = Relational.all.find(_.name == "q22_sessionize").get.build(spark, sfDir)
    import org.apache.spark.sql.functions._
    val total = df.agg(sum("n_events")).head().getLong(0)
    val events = graft.tables.Tables.load(spark, sfDir, "events").count()
    assert(total == events)
  }
}
