package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch-2 scale probes: g02 triangle counting, d15
  * containment, t19 shard divergence, e06 power iteration measured on
  * a replicated corpus (same methodology as ScaleProbeR5/R7 — every
  * scale claim is a RuntimeAudit number, not an argument).
  *
  * Replication shapes:
  * - lineitem replicates with BOTH l_orderkey and l_partkey shifted,
  *   so the co-purchase graph grows linearly in nodes and edges with
  *   CONSTANT degree — the claim g02's plan depends on.
  * - documents/embeddings replicate as byte duplicates (dup groups of
  *   `factor`) — deliberately adversarial for d15: every shingle's
  *   posting length multiplies by `factor`, so the candidate join
  *   emits factor² rows per base pair. The probe measures that AND
  *   the pairwise-verify knob (Ops.containmentPairs) that trims it.
  * - t19 is INVARIANT under byte-duplication (per-shard unigram
  *   distributions are unchanged) — the probe asserts the values.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR7b [baseSfDir] [factor]"
  */
object ScaleProbeR7b {

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

    val dir = java.nio.file.Files.createTempDirectory(s"graft_r7b_x$factor").toString
    def stage(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    stage("lineitem", ProbeReplicate(
      spark.read.parquet(s"$base/lineitem.parquet"),
      Seq("l_orderkey", "l_partkey"), factor, 100000000L))
    stage("documents", ProbeReplicate(
      spark.read.parquet(s"$base/documents.parquet"), Seq("doc_id"), factor, 10000000L))
    stage("embeddings", ProbeReplicate(
      spark.read.parquet(s"$base/embeddings.parquet"), Seq("vec_id"), factor, 10000000L))
    println(s"staged x$factor of $base at $dir")

    def audit(label: String, name: String): Unit = {
      spark.catalog.clearCache()
      println(RuntimeAudit.runQuery(spark, name, dir).line(label))
      spark.catalog.clearCache()
    }

    // constant-degree graph: wall and shuffle records must scale ~linearly
    audit(s"g02 triangles x$factor", "g02_triangle_count")
    // corpus-sized agg + shard-pair-sized tail
    audit(s"t19 divergence x$factor", "t19_shard_divergence")
    // the t19 invariance check: byte-duplication cannot move a
    // distribution, so values must equal the base corpus's exactly
    val baseT19 = graft.SparkEntry.queries("t19_shard_divergence")(spark, base)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val repT19 = graft.SparkEntry.queries("t19_shard_divergence")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val drift = repT19.count { case (k, v) => baseT19(k) != v }
    println(s"t19 invariance x$factor: ${repT19.size} pairs, $drift drifted (expect 0)")
    // e04-shaped corpus pass + d²-bounded iteration
    audit(s"e06 power iteration x$factor", "e06_power_iteration")

    // d15 on byte-duplicate replication: factor-sized dup groups make
    // every posting factor× longer — candidate volume ×factor² per
    // base pair. Measure the canned form, then the pairwise-verify
    // knob (candidates distinct → array_intersect per pair).
    audit(s"d15 containment x$factor CANNED", "d15_containment")
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val trimmed = graft.operators.Dedup.containmentAtScale(docs, 0.8,
      maxPostingsPerToken = Some(4 * factor), pairwiseVerify = true)
    val nTrimmed = trimmed.count()
    println(f"d15 pairwise(cap=${4 * factor}) x$factor: $nTrimmed pairs, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    spark.stop()
  }
}
