package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 index probes at 100× of bench scale (sf1 ×10 = 500k docs,
  * the ScaleProbeR13 replication methodology):
  *
  * 1. **O51 lexical index** — independent regime (per-word replica
  *    salt, so the vocabulary grows 10× and no posting couples
  *    replicas): build wall vs corpus size, then probe wall — the
  *    claim under test is that probe cost tracks the QUERY-TERM
  *    postings (one replica's worth, since salted terms are queried
  *    per-replica), not the corpus.
  * 2. **O52 gram index** — verbatim ×10 (the dup-heavy worst case):
  *    index 500k docs, probe a 1,000-doc NEW batch — the claim is
  *    probe wall is BATCH-bounded (broadcast gram set + DPP-pruned
  *    stored buckets), not corpus-bounded.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR13b [sf1Dir] [factor]"
  */
object ScaleProbeR13b {
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

    // ---- O51 at 100x, independent regime ----
    val salted = (0 until factor).map { i =>
      base.select(
        ($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", s"$$1_r$i").as("text"))
    }.reduce(_ unionByName _)
    val lexPath = java.nio.file.Files.createTempDirectory("graft-lex100").toString
    val (_, tLexBuild) = timed(LexIndex.writeLexIndex(salted, lexPath, nBuckets = 64))
    val idx = LexIndex.readLexIndex(spark, lexPath)
    // replica-0's query terms (the salted corpus's real vocabulary)
    val q = Similarity.bm25Queries.map { case (qid, t) => (qid, t + "_r0") }
      .toDF("q_id", "term")
    LexIndex.probeLexIndex(q, idx).count() // warm
    val probeT = (1 to 2).map(_ =>
      timed(LexIndex.probeLexIndex(q, idx).count())._2).min
    println(f"probe51.independent_x$factor: docs=${nBase * factor} " +
      f"build=$tLexBuild%.1fs probe=$probeT%.2fs " +
      f"(ndocs=${idx.ndocs} ntok=${idx.ntok})")

    // ---- O52 at 100x, dup-heavy regime ----
    val dupheavy = ProbeReplicate(base, Seq("doc_id"), factor, 10000000L)
    val gramPath = java.nio.file.Files.createTempDirectory("graft-gram100").toString
    val (_, tGramBuild) = timed(
      GramIndex.writeGramIndex(dupheavy, gramPath, gram = 8, nBuckets = 64))
    val gidx = GramIndex.readGramIndex(spark, gramPath)
    // a NEW 1000-doc batch duplicating base content (ids disjoint)
    val batch = base.limit(1000)
      .select(($"doc_id" + lit(900000000L)).as("doc_id"), $"text")
    GramIndex.probeGramIndex(batch, gidx).count() // warm
    val (nIv, tProbe) = timed(GramIndex.probeGramIndex(batch, gidx).count())
    println(f"probe52.dupheavy_x$factor: indexed=${nBase * factor} " +
      f"build=$tGramBuild%.1fs batch=1000 probe=$tProbe%.2fs intervals=$nIv")
    spark.stop()
  }
}
