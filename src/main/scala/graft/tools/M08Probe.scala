package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable stage-timing probe for the round-11 m08 rework: times
  * (a) the X12 gram extraction, (b) the X8 banding + candidate join,
  * (c) the pairwise verify, separately, to locate the residual cost.
  */
object M08Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m08probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (round <- 1 to 2) {
      println(s"[m08probe] --- round $round ---")
      val rb = graft.operators.Multimodal.imagePayloads(spark, sfDir)
        .select($"doc_id",
          graft.functions.GraftExpressions.rasterBodyGrams($"payload", 8).as("rb"))
        .where($"rb".isNotNull)
        .select($"doc_id", $"rb.format".as("format"), $"rb.grams".as("sh"),
          $"rb.sketch".as("sk"))
        .cache()
      t("grams (cache+count)") {
        println("  docs=" + rb.count() +
          " totalGrams=" + rb.select(sum(size($"sh"))).first().getLong(0) +
          " sketchGrams=" + rb.select(sum(size($"sk"))).first().getLong(0))
      }
      val bands = graft.operators.Dedup
        .bandKeysFromShingles(
          rb.where(size($"sk") > 0).select($"doc_id", $"sk".as("sh")),
          "doc_id", "sh").cache()
      t("bandKeys") { println("  bandRows=" + bands.count()) }
      val cands = graft.operators.Dedup
        .minhashCandidates(
          rb.where(size($"sk") > 0).select($"doc_id", $"sk".as("sh")))
        .distinct().cache()
      t("cands") { println("  cands=" + cands.count()) }
      t("verify") {
        val n = cands
          .join(rb.select($"doc_id".as("id_a"), $"sh".as("_ga")), "id_a")
          .join(rb.select($"doc_id".as("id_b"), $"sh".as("_gb")), "id_b")
          .withColumn("c", size(array_intersect($"_ga", $"_gb")).cast("long"))
          .withColumn("jac", $"c".cast("double") / (size($"_ga") + size($"_gb") - $"c"))
          .where($"jac" >= 0.4)
          .count()
        println("  verified=" + n)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
