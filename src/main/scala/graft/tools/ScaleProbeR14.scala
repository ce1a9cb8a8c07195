package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scale probes — one run measures this round's four scale
  * claims (methodology: sf1 replicated ×`factor`, the ScaleProbeR13
  * pattern; every number lands in docs/SCALING.md):
  *
  * 1. **O51 auto-buckets** — build with nBuckets=0 at sf0.1, sf1 and
  *    salted sf1×10 (independent-vocabulary regime): the derived
  *    bucket count must grow with the corpus so PER-BUCKET posting
  *    volume stays ≤ the 2^20-token target (the flat-probe-read
  *    claim), while probe wall stays ~flat.
  * 2. **O51 append vs rewrite** — day-2 cost: appending a 5k-doc
  *    batch must cost a small constant (one batch pass + file moves),
  *    vs the full-corpus rewrite it replaces.
  * 3. **O54 perceptual probe** — 100-asset batch against a ×10 asset
  *    index: probe wall is batch-bounded (broadcast band keys + DPP),
  *    hits = batch × replicas (output-bounded).
  * 4. **t29 BPE training** — sf0.1 vs sf1: the corpus pass scales,
  *    the 8 iterations are vocabulary-bounded (sublinear), so total
  *    wall grows far slower than 10×.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR14 [sf01Dir] [sf1Dir] [factor]"
  */
object ScaleProbeR14 {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/sf1")
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
    import graft.operators.{LexIndex, Multimodal, Similarity, BpeTrain}

    val queries = Similarity.bm25Queries.toDF("q_id", "term")

    // ---- 1. O51 auto-buckets across three scales ----
    val big = {
      val base = spark.read.parquet(s"$sf1/documents.parquet")
        .select($"doc_id", $"text")
      (0 until factor).map { i =>
        base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
          regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"))
      }.reduce(_ unionByName _)
    }
    Seq(
      ("sf0.1", spark.read.parquet(s"$sf01/documents.parquet").select($"doc_id", $"text"),
        queries),
      ("sf1", spark.read.parquet(s"$sf1/documents.parquet").select($"doc_id", $"text"),
        queries),
      (s"sf1x$factor", big,
        Similarity.bm25Queries.map { case (q, t) => (q, t + "_r0") }.toDF("q_id", "term"))
    ).foreach { case (tag, docs, q) =>
      val path = java.nio.file.Files.createTempDirectory("graft-r14lex").toString
      val (_, tBuild) = timed(LexIndex.writeLexIndex(docs, path)) // auto buckets
      val idx = LexIndex.readLexIndex(spark, path)
      val postings = spark.read.parquet(
        graft.operators.IndexLayout.resolveDir(spark, s"$path/store") + "/postings").count()
      LexIndex.probeLexIndex(q, idx).count() // warm
      val probeT = (1 to 2).map(_ => timed(LexIndex.probeLexIndex(q, idx).count())._2).min
      println(f"r14.autobuckets.$tag: ndocs=${idx.ndocs} ntok=${idx.ntok} " +
        f"nBuckets=${idx.nBuckets} postPerBucket=${postings / idx.nBuckets} " +
        f"build=$tBuild%.1fs probe=$probeT%.2fs")

      // ---- 2. append vs rewrite, measured at the big scale ----
      if (tag == s"sf1x$factor") {
        val batch = spark.read.parquet(s"$sf1/documents.parquet")
          .select(($"doc_id" + lit(900000000L)).as("doc_id"),
            regexp_replace($"text", "(\\S+)", "$1_r0").as("text"))
          .limit(5000)
        val (_, tAppend) = timed(LexIndex.appendLexIndex(batch, path, batchId = 1L))
        val i2 = LexIndex.readLexIndex(spark, path)
        val (_, tProbe2) = timed(LexIndex.probeLexIndex(q, i2).count())
        val rewritePath = java.nio.file.Files.createTempDirectory("graft-r14rw").toString
        val (_, tRewrite) = timed(
          LexIndex.writeLexIndex(docs.unionByName(batch), rewritePath))
        println(f"r14.append_vs_rewrite: batch=5000 append=$tAppend%.1fs " +
          f"probeAfter=$tProbe2%.2fs fullRewrite=$tRewrite%.1fs " +
          f"(ndocs ${idx.ndocs} -> ${i2.ndocs})")
      }
    }

    // ---- 3. O54 perceptual probe at x10 assets ----
    {
      val assets = (0 until factor).map { i =>
        Multimodal.imagePayloads(spark, sf1)
          .select(($"doc_id" + lit(i * 10000000L)).as("doc_id"), $"payload")
      }.reduce(_ unionByName _)
      val path = java.nio.file.Files.createTempDirectory("graft-r14pidx").toString
      val (_, tBuild) = timed(
        Multimodal.writePerceptualIndex(assets, "doc_id", "payload", path))
      val nAssets = assets.count()
      val batch = Multimodal.payloadsWithContainer(spark, sf1,
        containerShift = 1, idOffset = 2000000000L)
        .where($"doc_id" - 2000000000L < 100)
      val idx = Multimodal.readPerceptualIndex(spark, path)
      Multimodal.probePerceptualIndex(batch, "doc_id", "payload", idx).count() // warm
      val (hits, tProbe) = timed(
        Multimodal.probePerceptualIndex(batch, "doc_id", "payload", idx).count())
      println(f"r14.perceptual_x$factor: indexed=$nAssets build=$tBuild%.1fs " +
        f"batch=100 probe=$tProbe%.2fs hits=$hits")
    }

    // ---- 4. t29 BPE training across scales ----
    Seq("sf0.1" -> sf01, "sf1" -> sf1).foreach { case (tag, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // warm scan
      val (m, t) = timed(BpeTrain.trainBpeMerges(docs, 8))
      println(f"r14.bpetrain.$tag: docs=${docs.count()} wall=$t%.1fs " +
        f"top=${m.head._1}+${m.head._2}(${m.head._3})")
    }
    spark.stop()
  }
}
