package graft.sources

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Scan-health checks: partition pruning on hive-layout writes and
  * filter/column pushdown into parquet — what keeps a 100 TB scan
  * from reading 100 TB.
  */
class PruningSpec extends SparkTestBase {

  test("partition pruning: filter on partition column prunes directories") {
    val base = java.nio.file.Files.createTempDirectory("graft-prune").toString
    Tables.load(spark, sfDir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(s"$base/ev")
    val df = spark.read.parquet(s"$base/ev").filter(col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      s"no partition filter in plan:\n$plan")
    // pruned read returns exactly the partition's rows
    val expected = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == expected)
  }

  test("predicate and projection reach the parquet scan") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"),
      s"projection not pruned:\n$plan")
  }
}
