package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch-3 scale probes: g05 label propagation and q59 funnel
  * at 10×, each with a value-level invariance assert the replication
  * math predicts (the ScaleProbeR8b methodology).
  *
  * - lineitem replicates with l_orderkey AND l_partkey shifted: the
  *   co-purchase graph becomes `factor` DISJOINT copies of the base
  *   graph, so g05's labels must be exactly (base label + k·step) per
  *   copy with identical community sizes — label propagation provably
  *   doesn't couple across the growth axis, while edges scale ×10.
  * - events replicate with event_id AND user_id shifted: independent
  *   user populations with identical histories — every replica user's
  *   funnel stage timestamps must EQUAL the base user's.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR8c [baseSfDir] [factor]"
  */
object ScaleProbeR8c {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory(s"graft_r8c_x$factor").toString
    def stage(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    val step = 100000000L
    stage("lineitem", ProbeReplicate(
      spark.read.parquet(s"$base/lineitem.parquet"),
      Seq("l_orderkey", "l_partkey"), factor, step))
    stage("events", ProbeReplicate(
      spark.read.parquet(s"$base/events.parquet"),
      Seq("event_id", "user_id"), factor, step))
    println(s"staged x$factor of $base at $dir")

    def audit(label: String, name: String): Unit = {
      spark.catalog.clearCache()
      println(RuntimeAudit.runQuery(spark, name, dir).line(label))
      spark.catalog.clearCache()
    }

    // ---- g05: disjoint copies → shifted labels, same communities --
    audit(s"g05 label prop x$factor", "g05_label_propagation")
    val baseG05 = graft.SparkEntry.queries("g05_label_propagation")(spark, base)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val repG05 = graft.SparkEntry.queries("g05_label_propagation")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val g05Drift = repG05.count { case (node, lbl, n) =>
      val k = node / step
      baseG05(node - k * step) != ((lbl - k * step, n))
    }
    println(s"g05 invariance x$factor: ${repG05.length} nodes " +
      s"(${factor}x base ${baseG05.size}), $g05Drift drifted (expect 0)")

    // ---- q57 vs q58: window encoding vs native operator at 10× ---
    audit(s"q57 window-form x$factor", "q57_asof_join")
    audit(s"q58 native-form x$factor", "q58_asof_native")
    val nat = graft.SparkEntry.queries("q58_asof_native")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val win = graft.SparkEntry.queries("q57_asof_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    println(s"q57==q58 x$factor: ${nat.length} rows, " +
      s"${nat.toSet == win.toSet} (expect true)")

    // ---- q59: independent populations → identical funnels ---------
    audit(s"q59 funnel x$factor", "q59_funnel")
    val baseQ59 = graft.SparkEntry.queries("q59_funnel")(spark, base)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val repQ59 = graft.SparkEntry.queries("q59_funnel")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val q59Drift = repQ59.count { case (u, v) => baseQ59(u % step) != v }
    println(s"q59 invariance x$factor: ${repQ59.length} signup users " +
      s"(${factor}x base ${baseQ59.size}), $q59Drift drifted (expect 0)")

    spark.stop()
  }
}
