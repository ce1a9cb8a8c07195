package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md §2.4): schema-explicit parquet/csv/json.
  * Explicit schemas keep scans deterministic and skip the inference
  * pass (an extra full read on csv/json — fatal at 100 TB).
  */
object Sources {

  def parquet(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).parquet(path)
  }

  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def orc(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).orc(path)
  }

  /** Raw-asset ingestion for multimodal corpora: each file becomes a
    * row (path, modificationTime, length, content: binary) — the
    * entry point that feeds the Multimodal decode pipeline. `glob`
    * filters by pattern (e.g. "*.jpg"); `maxBytes` guards the row
    * size (a 100 TB ingest caps per-row payloads and routes oversized
    * assets to a side channel instead of OOMing an executor).
    */
  def binaryFiles(
      spark: SparkSession,
      path: String,
      glob: Option[String] = None,
      maxBytes: Option[Long] = None
  ): DataFrame = {
    val r = spark.read.format("binaryFile")
    val withGlob = glob.fold(r)(g => r.option("pathGlobFilter", g))
    val df = withGlob.load(path)
    maxBytes.fold(df)(m => df.filter(org.apache.spark.sql.functions.col("length") <= m))
  }

  /** Line-oriented text ingestion: one row per line (`value:
    * string`) — the raw-corpus entry point (jsonl preprocessing,
    * plain-text crawls). Splittable, so a 100 TB text dump
    * parallelizes by HDFS block like any other file scan.
    */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Whole-file text ingestion: one row per FILE — for small-document
    * corpora stored file-per-doc. NOT splittable (a row spans the
    * file): cap file sizes like binaryFiles' maxBytes guard, and
    * prefer consolidated formats once docs are large.
    */
  def wholeText(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)

  /** XML ingestion (S6) via Spark 4's NATIVE xml data source — no
    * external connector. `rowTag` names the repeated element that
    * becomes a row; schema explicit for the same
    * no-inference-pass reason as csv/json. XML at scale is splittable
    * only between rowTag boundaries, so keep documents
    * element-per-record (exports, feeds, sitemaps) rather than one
    * giant root.
    */
  def xml(
      spark: SparkSession,
      path: String,
      rowTag: String,
      schema: Option[StructType] = None
  ): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).format("xml").load(path)
  }

  /** WARC/web-archive ingestion (S8): record-framed raw-crawl files →
    * one row per WARC record (see [[Warc]] for framing, truncation
    * handling and the file-level parallelism contract). `.gz`
    * archives (incl. record-level multi-member gzip) decompress
    * in-task.
    */
  def warc(
      spark: SparkSession,
      path: String,
      glob: Option[String] = Some("*.warc*")
  ): DataFrame =
    Warc.records(binaryFiles(spark, path, glob)).toDF()

  /** Streaming variants (file sources need explicit schemas). */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Streaming S8: archives landing in a directory become micro-batch
    * rows of (path, modificationTime, length, content) — the ST29
    * crawl-ingestion source (the binaryFile format's schema is fixed;
    * stated explicitly because file stream sources require one).
    */
  def warcStream(
      spark: SparkSession,
      path: String,
      glob: Option[String] = Some("*.warc*"),
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val r0 = spark.readStream.format("binaryFile")
    val r1 = glob.fold(r0)(g => r0.option("pathGlobFilter", g))
    val r2 = maxFilesPerTrigger.fold(r1)(n => r1.option("maxFilesPerTrigger", n.toString))
    r2.schema(schema).load(path)
  }
}
