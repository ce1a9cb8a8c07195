package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for q64: measures the ACTUAL rank error of
  * approx_percentile's GK summary against a driver-side exact sort,
  * per group x percentile, at a given sf and accuracy — used to size
  * the oracle-gated bound window with evidence rather than the
  * nominal eps (Spark's partial-summary MERGE can exceed the
  * single-summary eps*n guarantee).
  */
object GkErrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val acc = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_returnflag".as("flag"), $"l_extendedprice".as("x"))
    val ap = li.groupBy($"flag")
      .agg(expr(s"approx_percentile(x, array(0.5D,0.9D,0.99D), $acc)").as("ap"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val byFlag = li.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sorted) }
    for ((flag, aps) <- ap.toSeq.sortBy(_._1); (p, v) <- Seq(0.5, 0.9, 0.99).zip(aps)) {
      val xs = byFlag(flag); val n = xs.length
      val rLo = xs.count(_ < v) + 1
      val rHi = xs.count(_ <= v)
      val target = p * n
      val err =
        if (target >= rLo && target <= rHi) 0.0
        else math.min(math.abs(rLo - target), math.abs(rHi - target))
      println(f"$flag p=$p n=$n target=$target%.1f rankRange=[$rLo,$rHi] err=$err%.2f errOverEpsN=${err / (n.toDouble / acc)}%.2f")
    }
    spark.stop()
  }
}
