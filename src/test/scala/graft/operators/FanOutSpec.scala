package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Ops.fanOutSmallScan]]'s contract (round-16 optimization):
  * a scan NARROWER than the session parallelism is spread to session
  * width, one at-or-above it passes through UNCHANGED (the condition
  * is what makes the helper a no-op on many-split production scans —
  * no shuffle is ever added at scale), and values are preserved
  * either way.
  */
class FanOutSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("fanout-spec")
    .getOrCreate()

  test("a 1-partition frame is spread to session width; values intact") {
    import spark.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val out = Ops.fanOutSmallScan(df)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.agg(org.apache.spark.sql.functions.sum($"x")).head.getLong(0) == 5050L)
    assert(out.count() == 100L)
  }

  test("a frame at session width or wider passes through unchanged") {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(cores + 3)
    val out = Ops.fanOutSmallScan(wide)
    // SAME object — no repartition node was added
    assert(out eq wide)
  }
}
