package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 scale probes: the new operators (d14 fuzzy edit-distance,
  * e04 dim covariance, g01 integer PageRank, q56 salted join, s08
  * range search, e05 inference, m07 histogram) measured on a
  * replicated corpus — same methodology as the R4/R5 probes
  * (docs/SCALING.md): every claim is a measured RuntimeAudit number
  * on factor-replicated tables, not an argument.
  *
  * Replication shifts ids, so documents replicate as BYTE duplicates:
  * dup groups grow to `factor` members — deliberately the adversarial
  * shape for d14 (band buckets of size factor emit factor² candidate
  * pairs per base group). The probe measures that blowup AND the
  * capped path that removes it.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR7 [baseSfDir] [factor]"
  */
object ScaleProbeR7 {

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
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory(s"graft_r7_x$factor").toString
    def stage(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    stage("documents", ProbeReplicate(
      spark.read.parquet(s"$base/documents.parquet"), Seq("doc_id"), factor, 10000000L))
    stage("embeddings", ProbeReplicate(
      spark.read.parquet(s"$base/embeddings.parquet"), Seq("vec_id"), factor, 10000000L))
    // events replicate with shifted user_ids: MORE users, same five
    // event types — the graph grows linearly in nodes and edges.
    // Tables.load handles the ts encoding (µs or NANOS, per driver
    // round); the replica is written back as TIMESTAMP(MICROS).
    stage("events", ProbeReplicate(
      graft.tables.Tables.load(spark, base, "events"),
      Seq("event_id", "user_id"), factor, 10000000L))
    stage("customer", ProbeReplicate(
      spark.read.parquet(s"$base/customer.parquet"), Seq("c_custkey"), factor, 10000000L))
    println(s"staged x$factor of $base at $dir")

    def audit(label: String, name: String): Unit = {
      spark.catalog.clearCache()
      println(RuntimeAudit.runQuery(spark, name, dir).line(label))
      spark.catalog.clearCache()
    }

    // per-row / keyed-agg shapes: must scale linearly in wall and
    // shuffle records
    audit(s"e05 inference x$factor", "e05_classifier_score")
    audit(s"m07 histogram x$factor", "m07_byte_histogram")
    audit(s"e04 covariance x$factor", "e04_dim_covariance")
    audit(s"q56 salted join x$factor", "q56_salted_skew_join")
    audit(s"g01 pagerank x$factor", "g01_pagerank_weighted")
    audit(s"s08 range search x$factor", "s08_range_search")

    // d14 on byte-duplicate replication: factor-sized dup groups make
    // the uncapped candidate join emit ~factor^2 pairs per base group
    audit(s"d14 fuzzy verify x$factor UNCAPPED", "d14_fuzzy_edit_distance")
    // the capped path (Ops.jaccardPairs maxPosting) bounds the
    // candidate fanout exactly like d04's scale posture; survivors
    // keep exact values
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // cap BELOW the replica-group size so the knob actually binds:
    // groups of `factor` byte-duplicates collapse to 5-member buckets
    val t0 = System.nanoTime()
    val capped = graft.operators.Dedup.fuzzyEditAtScale(docs, maxBucket = 5)
    val nCapped = capped.count()
    println(f"d14 capped(maxBucket=5) x$factor: $nCapped pairs, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    spark.stop()
  }
}
