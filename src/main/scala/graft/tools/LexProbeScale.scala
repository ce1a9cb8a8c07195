package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 O51 scale probe: build the lexical index at two corpus
  * scales and measure (a) build wall, (b) stored-probe wall vs the
  * corpus-rescan BM25 wall at each scale — the point of the index is
  * that probe cost tracks the QUERY-TERM postings, not the corpus.
  * Run: sbt "runMain graft.tools.LexProbeScale [sf01Dir] [sf1Dir]"
  */
object LexProbeScale {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{LexIndex, Similarity}

    val queries = Similarity.bm25Queries.toDF("q_id", "term")
    Seq("sf0.1" -> sf01, "sf1" -> sf1).foreach { case (tag, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val path = java.nio.file.Files.createTempDirectory(s"graft-lexscale").toString
      // warm the scan
      docs.count()
      val (_, tBuild) = timed(LexIndex.writeLexIndex(docs, path, nBuckets = 64))
      val idx = LexIndex.readLexIndex(spark, path)
      // warm both probe paths once, then best of 2
      LexIndex.probeLexIndex(queries, idx).count()
      Similarity.bm25TopK(docs, queries).count()
      val probeT = (1 to 2).map(_ =>
        timed(LexIndex.probeLexIndex(queries, idx).count())._2).min
      val rescanT = (1 to 2).map(_ =>
        timed(Similarity.bm25TopK(docs, queries).count())._2).min
      println(f"lexscale.$tag: docs=${docs.count()} build=$tBuild%.2fs " +
        f"probe=$probeT%.2fs rescan=$rescanT%.2fs " +
        f"(ndocs=${idx.ndocs} ntok=${idx.ntok})")
    }
    spark.stop()
  }
}
