package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the ScaleProbeR9 events-corpus interval shape (fine-
  * grained keys — SMJ's best case), measured properly: N alternating
  * rounds per side, best-of reported, so one-shot JIT/order bias
  * can't decide the comparison. Usage:
  *   sbt "runMain graft.tools.IntervalHeadToHead [sfDir] [factor] [rounds]"
  */
object IntervalHeadToHead {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val rounds = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$base/events.parquet")
    val reps = spark.range(factor.toLong).select(col("id").as("rep"))
    val evx = ev.crossJoin(reps)
      .select((col("event_id") + col("rep") * 10000000L).as("event_id"),
        (col("user_id") + col("rep") * 10000000L).as("user_id"),
        col("ts"), col("event_type")).cache()
    evx.count()
    // EXACTLY ScaleProbeR9 probe 2's shape: left join + follow-count agg
    val signups = evx.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 1 HOUR")).as("s_hi"))
    val others = evx.select(col("user_id").as("e_user"), col("ts").as("e_ts"),
      col("event_id").as("e_id"))
    def agg(j: DataFrame): Long =
      j.groupBy(col("s_id")).agg(count(col("e_id")).as("n_follow"))
        .agg(count(lit(1)), bit_xor(xxhash64(col("s_id"), col("n_follow"))))
        .head().getLong(0)
    def native() = agg(graft.operators.Ops.intervalJoinNative(
      signups, others, "s_user", "e_user", "s_ts", "s_hi", "e_ts", joinType = "left"))
    def composed() = agg(signups.join(others,
      col("e_user") === col("s_user") && col("e_ts") > col("s_ts") &&
        col("e_ts") <= col("s_hi"), "left"))
    def timed(f: () => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val v = f(); (v, (System.nanoTime() - t0) / 1e9)
    }
    val ns = collection.mutable.ArrayBuffer[Double]()
    val cs = collection.mutable.ArrayBuffer[Double]()
    var v0 = -1L
    (1 to rounds).foreach { i =>
      val (vn, tn) = timed(native)
      val (vc, tc) = timed(composed)
      require(vn == vc, s"value mismatch round $i")
      if (v0 == -1L) v0 = vn else require(vn == v0, "cross-round drift")
      ns += tn; cs += tc
      println(f"round $i: native=$tn%.2fs composed=$tc%.2fs")
    }
    println(f"best: native=${ns.min}%.2fs composed=${cs.min}%.2fs " +
      f"ratio=${ns.min / cs.min}%.2f (values equal)")
    spark.stop()
  }
}
