package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment driver: runs the capped/parameterized variants of
  * the dedup operators against an (optionally 10x-replicated) corpus
  * dir and prints timings + output volumes, demonstrating the knobs
  * the canned oracle-gated queries document for 100 TB
  * (hot-shingle cap; hyperplane count scaling with log2 n).
  * Usage: sbt "runMain graft.tools.ScaleProbe [dir] [cap] [planes]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt).getOrElse(200)
    val planes = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    docs.count(); emb.count()

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-40s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }

    t(s"ngramJaccard UNCAPPED") {
      graft.operators.Dedup.ngramJaccardAtScale(docs, 0.4, Int.MaxValue).count()
    }
    t(s"ngramJaccard cap=$cap") {
      graft.operators.Dedup.ngramJaccardAtScale(docs, 0.4, cap).count()
    }
    t(s"ngramJaccard cap=$cap pairwise-verify") {
      graft.operators.Dedup.ngramJaccardAtScale(docs, 0.4, cap, pairwiseVerify = true).count()
    }
    t(s"minhashLshAtScale (pairwise verify)") {
      graft.operators.Dedup.minhashLshAtScale(docs).count()
    }
    t(s"embeddingCandidates 8 planes (canned)") {
      graft.operators.Ops.embeddingCandidates(emb, "vec_id", "embedding", 8).count()
    }
    t(s"embeddingCandidates $planes planes (scaled)") {
      graft.operators.Ops.embeddingCandidates(emb, "vec_id", "embedding", planes).count()
    }
    spark.stop()
  }
}
