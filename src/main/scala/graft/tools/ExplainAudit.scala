package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan auditor: prints per-query plan health — PushedFilters reaching
  * the parquet scan, scan column width (pruning), broadcast vs shuffle
  * join counts, and whole-stage-codegen coverage. Run:
  *   sbt "runMain graft.tools.ExplainAudit [sfDir] [queryName...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // AQE hides the real tree behind AdaptiveSparkPlanExec, so audit
      // the formatted explain text (same thing a human would read).
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      def count(token: String): Int = token.r.findAllMatchIn(formatted).size
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(formatted).map(_.group(1)).filter(_.nonEmpty).size
      val scans = count("Scan parquet")
      val bhj = count("BroadcastHashJoin")
      val smj = count("SortMergeJoin")
      val shj = count("ShuffledHashJoin")
      val exch = count("\\bExchange hashpartitioning")
      val wsc = count("WholeStageCodegen")
      println(
        f"$name%-28s scans=$scans pushedF=$pushed bhj=$bhj smj=$smj shj=$shj shuffles=$exch codegen=$wsc"
      )
    }
    spark.stop()
  }
}
