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

  /** The driver has generated events.ts as parquet TIMESTAMP(NANOS)
    * in some rounds and TIMESTAMP(MICROS) in others, so the loader
    * detects the encoding instead of assuming one: a µs/ms column
    * infers as TimestampType and is used as-is; NANOS makes Spark 4's
    * schema inference refuse the file (and a replica written as plain
    * INT64 infers as LongType), so both fall back to a raw-long read
    * with a floor-div to micros. The data is µs-grained, so the div is
    * lossless and matches DuckDB's epoch_us truncation in the oracles.
    * The explicit LongType schema is scoped to THIS read, unlike the
    * session-wide `spark.sql.legacy.parquet.nanosAsLong` conf.
    */
  private val eventsNanosSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val native =
      try {
        val df = spark.read.parquet(path)
        df.schema("ts").dataType match {
          case TimestampType => Some(df)
          // no-timezone µs parquet infers as NTZ; sessions run UTC, so
          // the cast is value-identical to the nanos path's output type
          case TimestampNTZType =>
            Some(df.withColumn("ts", col("ts").cast(TimestampType)))
          case _ => None // raw int64 replica → nanos fallback below
        }
      } catch {
        // ONLY Spark 4's TIMESTAMP(NANOS) inference refusal may fall
        // through to the raw-long replica read. Anything else (missing
        // file, corrupt footer, permissions) propagates — a catch-all
        // here would mask the real error behind a misleading secondary
        // failure, or worse, silently div-by-1000 an unexpected file.
        case e: Exception
            if Option(e.getMessage).exists(m =>
              m.contains("NANOS") || m.contains("Illegal Parquet type")) =>
          None
      }
    native.getOrElse {
      // The div-by-1000 assumes int64 ts == NANOS, which holds for the
      // two writers that produce this shape: Spark's NANOS refusal
      // (physical INT64 nanos read via the explicit LongType schema)
      // and the driver's plain-int64 nanos replica (TESTDATA.md). An
      // int64 file that's already micros would land ~1970 after the
      // div — sanity-pinned by TablesSpec's event-year check.
      val raw = spark.read.schema(eventsNanosSchema).parquet(path)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Dimension tables small enough (TPC-H ratios) to broadcast at any
    * scale factor: region 5 rows, nation 25, supplier SF*10k — all
    * far below a 1000-executor broadcast threshold.
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  /** Wire all tables into a workflow as `table.{name}` routes. */
  def provideAll(wkf: graft.core.Workflow, spark: SparkSession, dir: String): Unit =
    wkf.provide("table.{name}") { ctx => load(spark, dir, ctx.str("name")) }
}
