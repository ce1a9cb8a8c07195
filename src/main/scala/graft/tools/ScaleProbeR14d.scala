package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 continuation: the END-TO-END ST27 trigger wall at scale —
  * not the pieces (curateBatch 0.27 s, append ~2 s were measured
  * separately in R14c/R13b) but the composed per-trigger cost a live
  * ingestion pipeline actually pays: verdicts from the stored counts
  * + batch-keyed audit write + admitted-only gram append + two ledger
  * markers. Plus the two replay costs the exactly-once design
  * promises are ~free: a full replay (batch marker present — one
  * ledger stat) and a crash-window replay (outdone present, batch
  * marker gone — skips the probe, re-drives only the append).
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR14d [sf1Dir] [factor]"
  */
object ScaleProbeR14d {
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
    import graft.operators.{GramIndex, IndexLayout => IL}

    val base = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text").cache()
    val nBase = base.count()
    val salted = (0 until factor).map { i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"))
    }.reduce(_ unionByName _)

    val dir = java.nio.file.Files.createTempDirectory("graft-r14d").toString
    GramIndex.writeGramIndex(salted, s"$dir/idx", gram = 8)
    // a fresh 1,000-doc batch: half novel content, half restated
    val batch = base.orderBy($"doc_id").limit(1000)
      .select(($"doc_id" + lit(900000000L)).as("doc_id"),
        when($"doc_id" % 2 === 0,
          regexp_replace($"text", "(\\S+)", "$1_r0"))       // restated vs replica 0
          .otherwise(regexp_replace($"text", "(\\S+)", "$1_new")) // novel
          .as("text"))
      .cache()
    batch.count()

    val (_, tTrig) = timed(graft.streaming.Streams.curateTrigger(
      batch, 0L, s"$dir/idx", s"$dir/out", 5L, 350000L, 100000L))
    val verdictRows = spark.read.parquet(s"$dir/out").count()
    // full replay: batch marker present -> whole trigger skipped
    val (_, tReplay) = timed(graft.streaming.Streams.curateTrigger(
      batch, 0L, s"$dir/idx", s"$dir/out", 5L, 350000L, 100000L))
    // crash-window replay: erase the batch marker (files stay moved),
    // the trigger must skip the probe and re-drive only the append
    val epoch = IL.resolveDir(spark, s"$dir/idx/grams")
    val marker = new org.apache.hadoop.fs.Path(s"$epoch/_appends", f"batch-${0L}%020d")
    org.apache.hadoop.fs.FileSystem
      .get(marker.toUri, spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
    val (_, tWindow) = timed(graft.streaming.Streams.curateTrigger(
      batch, 0L, s"$dir/idx", s"$dir/out", 5L, 350000L, 100000L))
    println(f"r14d.curate_trigger_x$factor: indexed=${nBase * factor} batch=1000 " +
      f"trigger=$tTrig%.2fs verdicts=$verdictRows replaySkip=$tReplay%.3fs " +
      f"windowReplay=$tWindow%.2fs")
    spark.stop()
  }
}
