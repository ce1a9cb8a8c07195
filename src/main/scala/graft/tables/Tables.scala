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

  import org.apache.spark.sql.types._

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. An explicit LongType for the column makes the scan read
    * the raw nanos — scoped to THIS read, unlike the session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` conf mutation it replaces,
    * which changed nano-timestamp behavior for every later read on the
    * session.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val raw = spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      // the data is µs-grained, so the nanos floor-div is lossless —
      // and matches DuckDB's epoch_us truncation used in the oracles
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
