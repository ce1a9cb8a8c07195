package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch-2 scale probes: q57 as-of join, d16 decontamination,
  * d17 dup-span intervals, e08 cluster sampling on a byte-replicated
  * corpus (ScaleProbeR7b methodology — every scale claim is a
  * RuntimeAudit number plus, where the math allows it, a value-level
  * invariance assert against the base corpus).
  *
  * Replication shapes and what they prove:
  * - events replicate with event_id AND user_id shifted: each replica
  *   is an independent user population with identical per-user
  *   history, so q57's per-replica lag values must EQUAL the base
  *   corpus's (keyed by base event_id) while volume scales ×factor —
  *   the window's per-user state provably doesn't couple across the
  *   growth axis.
  * - documents replicate as byte duplicates with a doc_id step
  *   divisible by 10, so the eval shard (doc_id % 10 == 0) replicates
  *   consistently and the eval shingle UNIVERSE is unchanged — d16's
  *   per-replica (n_spans, n_hit) must equal the base doc's exactly.
  *   The corpus-sized side grows ×factor; the broadcast side doesn't
  *   grow at all — the asymmetry the design claims.
  * - d17 under byte duplication is the designed-in worst case: EVERY
  *   window is now cross-doc duplicated, so the dup-window set is the
  *   corpus's full distinct-window vocabulary and every doc collapses
  *   to ONE maximal island [1, n_words] covering all its positions —
  *   asserted, plus the measured cost of that maximal broadcast.
  * - embeddings replicate as byte duplicates: Lloyd means are
  *   invariant (sums and counts both scale ×factor) and the seed
  *   centroids (lowest 8 vec_ids) are base vectors, so cells are
  *   stable while the assignment pass scales linearly; e08's output
  *   stays exactly 4·k rows regardless of corpus size.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR8b [baseSfDir] [factor]"
  */
object ScaleProbeR8b {

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

    val dir = java.nio.file.Files.createTempDirectory(s"graft_r8b_x$factor").toString
    def stage(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    val docStep = 10000000L // % 10 == 0: keeps the eval-shard split
    stage("events", ProbeReplicate(
      spark.read.parquet(s"$base/events.parquet"),
      Seq("event_id", "user_id"), factor, 100000000L))
    stage("documents", ProbeReplicate(
      spark.read.parquet(s"$base/documents.parquet"), Seq("doc_id"), factor, docStep))
    stage("embeddings", ProbeReplicate(
      spark.read.parquet(s"$base/embeddings.parquet"), Seq("vec_id"), factor, docStep))
    println(s"staged x$factor of $base at $dir")

    def audit(label: String, name: String): Unit = {
      spark.catalog.clearCache()
      println(RuntimeAudit.runQuery(spark, name, dir).line(label))
      spark.catalog.clearCache()
    }

    // ---- q57: linear volume, invariant per-replica values --------
    audit(s"q57 asof x$factor", "q57_asof_join")
    val baseQ57 = graft.SparkEntry.queries("q57_asof_join")(spark, base)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val repQ57 = graft.SparkEntry.queries("q57_asof_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val q57Drift = repQ57.count { case (id, lag) => baseQ57(id % 100000000L) != lag }
    println(s"q57 invariance x$factor: ${repQ57.length} purchases " +
      s"(${factor}x base ${baseQ57.size}), $q57Drift drifted (expect 0)")

    // ---- d16: corpus side grows, broadcast side doesn't ----------
    audit(s"d16 decontaminate x$factor", "d16_decontaminate")
    val baseD16 = graft.SparkEntry.queries("d16_decontaminate")(spark, base)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val repD16 = graft.SparkEntry.queries("d16_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    val d16Drift = repD16.count { case (id, v) => baseD16(id % docStep) != v }
    println(s"d16 invariance x$factor: ${repD16.length} train docs, " +
      s"$d16Drift drifted (expect 0)")

    // ---- d17: the everything-is-duplicated worst case ------------
    audit(s"d17 dup spans x$factor", "d17_dup_span_intervals")
    val d17 = graft.SparkEntry.queries("d17_dup_span_intervals")(spark, dir)
    val rows = d17.count()
    val collapsed = d17.filter(col("span_start") === 1 &&
      col("n_windows") === col("span_end") - lit(7)).count()
    println(s"d17 worst case x$factor: $rows islands, $collapsed full-doc " +
      s"(expect equal: every window duplicated => one island per doc)")

    // ---- e08: linear Lloyd, constant output ----------------------
    audit(s"e08 cluster sample x$factor", "e08_cluster_sample")
    val e08 = graft.SparkEntry.queries("e08_cluster_sample")(spark, dir).collect()
    println(s"e08 output x$factor: ${e08.length} rows " +
      s"(expect <= 32 = 4 per cell x 8 cells at any corpus size)")

    spark.stop()
  }
}
