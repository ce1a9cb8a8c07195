package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * On a real cluster these would be external catalog tables; the same
  * parquet reads apply — schema discovery from footers, predicate
  * pushdown and column pruning handled by the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
      // default; read nanos as long and convert to a µs timestamp
      // (the data is µs-grained, so the floor-div is lossless — and
      // matches DuckDB's epoch_us truncation used in the oracles).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Dimension tables small enough (TPC-H ratios) to broadcast at any
    * scale factor: region 5 rows, nation 25, supplier SF*10k — all
    * far below a 1000-executor broadcast threshold.
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  /** Wire all tables into a workflow as `table.{name}` routes. */
  def provideAll(wkf: graft.core.Workflow, spark: SparkSession, dir: String): Unit =
    wkf.provide("table.{name}") { ctx => load(spark, dir, ctx.str("name")) }
}
