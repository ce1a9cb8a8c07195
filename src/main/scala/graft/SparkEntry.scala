package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Workflow
import graft.operators.{Dedup, Embeddings, Frontier, Graph, HostRank, Html, HttpPayload, LineDedup, Links, Multimodal, Q, Redirects, Relational, Similarity, Sitemaps, Sniff, TextAnalysis, Typed, UrlCuration}
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All engine operators exposed through the driver contract. */
  def allQ: Seq[Q] =
    Relational.all ++ TextAnalysis.all ++ Html.all ++ UrlCuration.all ++
      HttpPayload.all ++ Links.all ++ Sitemaps.all ++ Redirects.all ++
      Frontier.all ++ LineDedup.all ++
      Dedup.all ++ Similarity.all ++
      Embeddings.all ++ Multimodal.all ++ Sniff.all ++ Typed.all ++ Graph.all ++
      HostRank.all

  /** Flagship: the workflow engine wiring tables through a routed DAG
    * (the reference's provide/depend shape driving Spark plans), run
    * on sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val wkf = new Workflow("") // anonymous: not registered, re-runnable
    Tables.provideAll(wkf, spark, dir)
    wkf
      .provide("q03.{segment}") { ctx =>
        import org.apache.spark.sql.functions._
        val cust = ctx.as[DataFrame]("customer")
          .filter(col("c_mktsegment") === ctx.str("segment").toUpperCase)
        val ord = ctx.as[DataFrame]("orders")
        val li = ctx.as[DataFrame]("lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice")).as("revenue"))
      }
      .depend(
        "customer" -> "table.customer",
        "orders" -> "table.orders",
        "lineitem" -> "table.lineitem"
      )
    wkf.run("q03.building").asInstanceOf[DataFrame]
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
