package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16: the composed ST29 crawl-ingestion trigger at ×100 —
  * one more decade past ScaleProbeR15b's ×10, pinning the claim that
  * the per-batch trigger cost is FLAT in standing-index size (the
  * probe is bucket-pruned; only the batch's own grams' buckets are
  * read). Same batch shape as r15b: 1,000 response records, half
  * restating corpus content, half novel, a tenth blocked, utm noise
  * on every url — now including the round-16 front-door additions
  * (charset-aware decode, intra-batch near-dup pass) in the prep
  * wall.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR16 [sf1Dir] [nRecords] [copies]"
  */
object ScaleProbeR16 {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(1000)
    val copies = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{CrawlIngest, GramIndex}

    // ×copies standing index (the R14d recipe: token-salted replicas)
    val base = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text").cache()
    base.count()
    val salted = (0 until copies).map { i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"))
    }.reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("graft-r16").toString
    val (_, tIdx) = timed(GramIndex.writeGramIndex(salted, s"$dir/idx", gram = 8))
    val idxDocs = base.count() * copies

    // one archive of n response records (r15b shape)
    val docs = base.orderBy($"doc_id").limit(n)
      .select($"doc_id",
        when($"doc_id" % 2 === 0, regexp_replace($"text", "(\\S+)", "$1_r0"))
          .otherwise(regexp_replace($"text", "(\\S+)", "$1_new")).as("body"))
      .collect()
    val bo = new java.io.ByteArrayOutputStream()
    docs.foreach { r =>
      val id = r.getLong(0)
      val host = if (id % 10 == 0) "blocked-farm.net" else s"site$id.example.org"
      val html = s"<html><body><p>${r.getString(1)}</p><div>nav</div></body></html>"
      val payload = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      bo.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://$host/p/$id?utm_source=probe\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8"))
      bo.write(payload); bo.write("\r\n\r\n".getBytes("UTF-8"))
    }
    val archives = Seq(("a1.warc", bo.toByteArray)).toDF("path", "content").cache()
    archives.count()

    // prep wall alone (parse + gate + canonicalize + charset decode +
    // extract + exact AND near-dup intra-batch dedup — round 16 path)
    val (nDocs, tPrep) = timed(CrawlIngest.crawlDocs(
      graft.sources.Warc.records(archives).toDF(),
      block = Seq("blocked-farm.net")).count())
    // the composed trigger (prep + ST27 admission + append, 2-phase)
    val (_, tTrig) = timed(graft.streaming.Streams.crawlIngestTrigger(
      archives, 0L, s"$dir/idx", s"$dir/out",
      Nil, Seq("blocked-farm.net"), 5L, 350000L, 100000L))
    val verdicts = spark.read.parquet(s"$dir/out")
      .groupBy($"verdict").count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(",")
    // full replay: one ledger stat
    val (_, tReplay) = timed(graft.streaming.Streams.crawlIngestTrigger(
      archives, 0L, s"$dir/idx", s"$dir/out",
      Nil, Seq("blocked-farm.net"), 5L, 350000L, 100000L))
    println(f"r16.crawl_trigger_x$copies%d: indexed=$idxDocs build=$tIdx%.1fs records=$n " +
      f"prep=$tPrep%.2fs/$nDocs docs trigger=$tTrig%.2fs verdicts=[$verdicts] replay=$tReplay%.3fs")
    spark.stop()
  }
}
