package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 late-surface scale probes (sf1 ×`factor` replication):
  *
  * 1. **O55 noveltyFromIndex** — a 1,000-doc batch scored against a
  *    500k-doc gram index: the claim is batch-bounded probe wall
  *    (broadcast gram set + DPP), corpus appears only via pruned
  *    index files.
  * 2. **O51 tombstone lifecycle** — mask cost on the probe (pending
  *    tombstones anti-join the MATCHED postings, so the wall must
  *    stay in the probe regime) and the compaction that applies them
  *    (a rewrite pass — the amortized half).
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR14b [sf1Dir] [factor]"
  */
object ScaleProbeR14b {
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
    import graft.operators.{GramIndex, LexIndex, Similarity}

    val base = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text").cache()
    val nBase = base.count()

    // ---- 1. O55 novelty at x10 (verbatim replication — dup-heavy) ----
    val big = ProbeReplicate(base, Seq("doc_id"), factor, 10000000L)
    val gramPath = java.nio.file.Files.createTempDirectory("graft-r14bg").toString
    GramIndex.writeGramIndex(big, gramPath, gram = 8)
    val gidx = GramIndex.readGramIndex(spark, gramPath)
    val batch = base.limit(1000)
      .select(($"doc_id" + lit(900000000L)).as("doc_id"), $"text")
    GramIndex.noveltyFromIndex(batch, gidx).count() // warm
    val (nRows, tNov) = timed(GramIndex.noveltyFromIndex(batch, gidx).count())
    println(f"r14b.novelty_x$factor: indexed=${nBase * factor} batch=1000 " +
      f"probe=$tNov%.2fs rows=$nRows (nBuckets=${gidx.nBuckets})")

    // ---- 2. O51 tombstones at x10 (independent regime) ----
    val salted = (0 until factor).map { i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"))
    }.reduce(_ unionByName _)
    val lexPath = java.nio.file.Files.createTempDirectory("graft-r14bl").toString
    LexIndex.writeLexIndex(salted, lexPath)
    val q = Similarity.bm25Queries.map { case (qid, t) => (qid, t + "_r0") }
      .toDF("q_id", "term")
    val i0 = LexIndex.readLexIndex(spark, lexPath)
    LexIndex.probeLexIndex(q, i0).count() // warm
    val (_, tClean) = timed(LexIndex.probeLexIndex(q, i0).count())
    // take down the current top-1 docs, probe with the pending mask
    val victims = LexIndex.probeLexIndex(q, i0).where($"rn" === 1)
      .select($"doc_id").distinct()
    LexIndex.tombstoneLexIndex(victims, "doc_id", lexPath)
    val i1 = LexIndex.readLexIndex(spark, lexPath)
    LexIndex.probeLexIndex(q, i1).count() // warm
    val (_, tMasked) = timed(LexIndex.probeLexIndex(q, i1).count())
    val (_, tCompact) = timed(LexIndex.compactLexIndex(spark, lexPath))
    val i2 = LexIndex.readLexIndex(spark, lexPath)
    val (_, tAfter) = timed(LexIndex.probeLexIndex(q, i2).count())
    println(f"r14b.lextomb_x$factor: docs=${nBase * factor} probeClean=$tClean%.2fs " +
      f"probeMasked=$tMasked%.2fs compact=$tCompact%.1fs probeAfter=$tAfter%.2fs " +
      f"(ndocs ${i0.ndocs} -> ${i2.ndocs})")
    spark.stop()
  }
}
