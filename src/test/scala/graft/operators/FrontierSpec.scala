package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** O62: frontier planning — per-host wave caps, priority order,
  * deterministic ties, horizon deferral, invalid-url drop.
  */
class FrontierSpec extends SparkTestBase {

  test("per-host cap, priority-first, url tie-break") {
    val df = spark.createDataFrame(Seq(
      ("https://a.com/1", 5), ("https://a.com/2", 9), ("https://a.com/3", 9),
      ("https://a.com/4", 1), ("https://b.com/1", 3),
      ("not-a-url", 99))).toDF("url", "priority")
    val out = Frontier.plan(df, perWave = 2).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("wave"), r.getAs[Long]("slot")))).toMap
    assert(!out.contains("not-a-url")) // host unparseable -> dropped
    // a.com by priority desc, url asc: /2(9), /3(9), /1(5), /4(1)
    assert(out("https://a.com/2") == ((0L, 0L)))
    assert(out("https://a.com/3") == ((0L, 1L)))
    assert(out("https://a.com/1") == ((1L, 0L)))
    assert(out("https://a.com/4") == ((1L, 1L)))
    assert(out("https://b.com/1") == ((0L, 0L))) // hosts plan independently
  }

  test("maxWaves horizon marks the tail deferred") {
    val rows = (0 until 10).map(i => (s"https://a.com/$i", 10 - i))
    val df = spark.createDataFrame(rows).toDF("url", "priority")
    val out = Frontier.plan(df, perWave = 2, maxWaves = Some(3)).collect()
    val deferred = out.filter(_.getAs[Boolean]("deferred"))
      .map(_.getAs[String]("url")).toSet
    // waves 0..2 hold the 6 best-priority urls; /6../9 defer
    assert(deferred == Set("https://a.com/6", "https://a.com/7",
      "https://a.com/8", "https://a.com/9"))
  }

  test("t41: no host exceeds perWave in any wave; deferral == horizon") {
    val out = graft.SparkEntry.queries("t41_frontier")(spark, sfDir).cache()
    val over = out.groupBy(col("host"), col("wave"))
      .agg(count(lit(1)).as("n")).where(col("n") > 2).count()
    assert(over == 0L)
    // deferred is exactly wave >= 40 (the hot host crosses it at the
    // oracle scale sf0.01; at this spec's sf0.001 nothing does)
    assert(out.where(col("deferred") =!= (col("wave") >= 40L)).count() == 0L)
    // the hot host fills every wave up to its horizon: waves 0..ceil(n/2)-1
    val hot = out.where(col("host") === "big.example.com")
    val n = hot.count()
    assert(hot.select(countDistinct(col("wave"))).head().getLong(0) == (n + 1) / 2)
    out.unpersist()
  }
}
