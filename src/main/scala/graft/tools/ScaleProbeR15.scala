package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15: the m10 scale path under adversarial boilerplate, and
  * the O57 frame-index day-2 probe wall.
  *
  * 1. The hot-frame wall the round-14 verdict flagged: ONE frame
  *    (a black frame / color bars) shared by `hot` videos costs
  *    hot^2/2 pairs uncapped — measure the capped m10 (frameDupPairs)
  *    vs the uncapped exact form on a corpus with a 1,000-holder
  *    boilerplate frame injected into sf0.1's videos.
  * 2. The O57 probe wall ×1 vs ×10: a 1,000-video batch probed
  *    against a frame index of n and 10n videos — day-2 cost must
  *    track the batch, not the corpus.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR15 [sfDir] [hot] [factor]"
  */
object ScaleProbeR15 {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hot = args.lift(1).map(_.toInt).getOrElse(1000)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Multimodal

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")

    // ---- 1. adversarial boilerplate frame: `hot` videos share one
    // 50-byte frame (same text prefix), unique tails beyond it ----
    // first 50 bytes FIXED (the shared boilerplate frame); unique tail
    val boiler = spark.range(hot).select(
      ($"id" + 10000000L).as("doc_id"),
      concat(lit("BOILERPLATE_BLACK_FRAME_PADDING_TO_EXACTLY_50BYTES"),
        lit("_tail_"), md5($"id".cast("string"))).as("text"))
    val adversarial = Multimodal.videoPayloadsOf(docs.unionByName(boiler)).cache()
    val nVids = adversarial.count()

    val keyed = Multimodal.frameKeys(adversarial).cache()
    keyed.count()
    val (nCapped, tCapped) = timed(Multimodal.frameDupPairs(keyed).count())
    // the uncapped exact form (the pre-round-15 m10 shape, minus the
    // df >= 2 optimization which is correctness-neutral)
    val (nUncapped, tUncapped) = timed {
      val k = keyed
      k.select($"doc_id".as("vid_a"), $"fk")
        .join(k.select($"doc_id".as("vid_b"), $"fk"), Seq("fk"))
        .where($"vid_a" < $"vid_b")
        .groupBy($"vid_a", $"vid_b").agg(count(lit(1)).as("n_shared"))
        .count()
    }
    println(f"r15.m10_hotframe: vids=$nVids hot=$hot capped=$nCapped pairs in $tCapped%.2fs " +
      f"uncapped=$nUncapped pairs in $tUncapped%.2fs")
    keyed.unpersist()

    // ---- 2. O57 probe wall: 1,000-video batch vs n and 10n ----
    val base = Multimodal.videoPayloadsOf(docs).cache()
    val n1 = base.count()
    val salted = Multimodal.videoPayloadsOf(
      (0 until factor).map { i =>
        docs.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
          regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"))
      }.reduce(_ unionByName _)).cache()
    val n10 = salted.count()
    // the batches: 1,000 re-muxes of indexed content (guaranteed
    // hits) — original text vs the ×1 index, replica-0 text vs ×10
    def remux(suffix: String) = Multimodal.videoPayloadsOf(
      docs.orderBy($"doc_id").limit(1000)
        .select(($"doc_id" + 900000000L).as("doc_id"),
          (if (suffix.isEmpty) $"text"
           else regexp_replace($"text", "(\\S+)", s"$$1$suffix")).as("text"))).cache()
    val batch1 = remux("")
    val batch10 = remux("_r0")
    batch1.count(); batch10.count()

    val d1 = java.nio.file.Files.createTempDirectory("graft-r15-f1").toString
    val d10 = java.nio.file.Files.createTempDirectory("graft-r15-f10").toString
    val (_, tb1) = timed(Multimodal.writeFrameIndex(base, d1))
    val (_, tb10) = timed(Multimodal.writeFrameIndex(salted, d10))
    val (p1, tp1) = timed(Multimodal.probeFrameIndex(batch1,
      Multimodal.readFrameIndex(spark, d1)).count())
    val (p10, tp10) = timed(Multimodal.probeFrameIndex(batch10,
      Multimodal.readFrameIndex(spark, d10)).count())
    println(f"r15.frameidx_probe: batch=1000 build(x1 $n1%d)=$tb1%.1fs build(x$factor $n10%d)=$tb10%.1fs " +
      f"probe(x1)=$tp1%.2fs/$p1 pairs probe(x$factor)=$tp10%.2fs/$p10 pairs ratio=${tp10 / tp1}%.2f")
    spark.stop()
  }
}
