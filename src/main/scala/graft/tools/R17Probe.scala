package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only (round 17): A/B the two value-identical bm25TopK plans —
  * multi-pass (three tokenizes, vocabulary-wide distinct) vs
  * single-pass (one tokenize into the tf aggregate) — on a given
  * corpus dir, plus the default the size condition would pick.
  * Usage: sbt "runMain graft.tools.R17Probe <sfDir> [runs]"
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfbig")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val q = graft.operators.Similarity.bm25Queries.toDF("q_id", "term")
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[r17probe] $sfDir docs sizeInBytes=$bytes")
    docs.count() // IO warmup
    def time(label: String, single: Boolean): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.operators.Similarity
          .bm25TopK(docs, q, singlePass = Some(single)).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        f"$dt%.2f(n=$n)"
      }
      println(s"[r17probe] $label: ${ts.mkString(" ")}")
    }
    time("multi-pass ", single = false)
    time("single-pass", single = true)
    time("multi-pass ", single = false)
    time("single-pass", single = true)
    spark.stop()
  }
}
