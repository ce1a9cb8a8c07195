package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 third-batch scale probes (sf1 ×`factor` replication,
  * token-salted so replicas are INDEPENDENT content):
  *
  * 1. **O52 takedown lifecycle** — the negative-count delta design's
  *    scale claims, measured: the takedown itself is BATCH work (the
  *    deleted docs' grams, staged and moved — never a corpus pass),
  *    probes stay in the probe regime before and after (net-count
  *    sums only touch batch-restricted survivors), and the compaction
  *    that applies deletions permanently is the amortized corpus-pass
  *    half.
  * 2. **O56 curateBatch serving** — a 1,000-doc batch's admission
  *    verdicts against the ×factor corpus via the stored gram counts:
  *    the wall must be batch-bounded (quality columns are per-row
  *    batch work; the novelty leg is the O55 probe shape).
  * 3. **t32 schedule at ×factor** — the one deliberately corpus-linear
  *    new surface (the output IS the corpus reordered): wall should
  *    grow ~linearly with the two range-partitioned rankGlobal
  *    orders, not quadratically.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR14c [sf1Dir] [factor]"
  */
object ScaleProbeR14c {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Curation, GramIndex}

    val base = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text", $"source").cache()
    val nBase = base.count()

    // independent-content replication: suffix every token per replica
    val salted = (0 until factor).map { i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"),
        $"source")
    }.reduce(_ unionByName _)

    // ---- 1. O52 takedown lifecycle at xfactor ----
    val gramPath = java.nio.file.Files.createTempDirectory("graft-r14cg").toString
    val (_, tBuild) = timed(GramIndex.writeGramIndex(
      salted.select($"doc_id", $"text"), gramPath, gram = 8))
    val idx0 = GramIndex.readGramIndex(spark, gramPath)
    // the probe batch must OVERLAP the takedown victims (replica-0
    // docs 0..999) or the masked/after walls measure nothing — an
    // unordered limit(1000) picks arbitrary rows
    val probeBatch = base.orderBy($"doc_id").limit(1000)
      .select(($"doc_id" + lit(900000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", "$1_r0").as("text"))
    GramIndex.probeGramIndex(probeBatch, idx0).count() // warm
    val (pr0, tP0) = timed(GramIndex.probeGramIndex(probeBatch, idx0).count())
    // take down 1,000 docs of replica 0 (their rows, as the retention
    // pipeline holds them)
    val victims = salted.where($"doc_id" < 1000).select($"doc_id", $"text")
    val (_, tTake) = timed(GramIndex.takedownGramIndex(victims, gramPath, takedownId = 1L))
    val idx1 = GramIndex.readGramIndex(spark, gramPath)
    val (pr1, tP1) = timed(GramIndex.probeGramIndex(probeBatch, idx1).count())
    val (_, tCompact) = timed(GramIndex.compactGramIndex(spark, gramPath))
    val idx2 = GramIndex.readGramIndex(spark, gramPath)
    val (pr2, tP2) = timed(GramIndex.probeGramIndex(probeBatch, idx2).count())
    println(f"r14c.gramtomb_x$factor: docs=${nBase * factor} build=$tBuild%.1fs " +
      f"probeClean=$tP0%.2fs/$pr0 takedown(1000 docs)=$tTake%.2fs " +
      f"probeMasked=$tP1%.2fs/$pr1 compact=$tCompact%.1fs probeAfter=$tP2%.2fs/$pr2 " +
      f"(nBuckets=${idx0.nBuckets})")

    // ---- 2. O56 curateBatch serving at xfactor ----
    val newBatch = base.limit(1000)
      .select(($"doc_id" + lit(950000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", "$1_fresh").as("text"))
    Curation.curateBatch(newBatch, idx2).count() // warm
    val (cr, tCur) = timed(Curation.curateBatch(newBatch, idx2).count())
    println(f"r14c.curate_x$factor: indexed=${nBase * factor} batch=1000 " +
      f"verdicts=$tCur%.2fs rows=$cr")

    // ---- 3. t32 schedule at 1x vs xfactor ----
    def schedule(docs: org.apache.spark.sql.DataFrame): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-r14ct32").toString
      docs.write.parquet(s"$dir/documents.parquet")
      val (_, t) = timed(
        graft.SparkEntry.queries("t32_curriculum_order")(spark, dir).count())
      t
    }
    val t1x = schedule(base)
    val t10x = schedule(salted)
    println(f"r14c.t32_x$factor: 1x(${nBase})=$t1x%.1fs " +
      f"x$factor(${nBase * factor})=$t10x%.1fs ratio=${t10x / t1x}%.1f")
    spark.stop()
  }
}
