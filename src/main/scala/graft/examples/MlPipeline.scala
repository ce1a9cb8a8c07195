package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Workflow
import graft.tables.Tables

/** Re-expression of the reference's ml-flow example
  * (/root/reference/examples/ml-flow.py): parameterized
  * dataset-{name} / train-{name} / infer-{name} routes with config
  * injection — here the "model" is a deterministic per-event-type
  * mean-value table learned with Spark aggregation (no ML libs in the
  * container; the workflow shape is the point).
  *
  * Run: sbt "runMain graft.examples.MlPipeline"
  */
object MlPipeline {

  def build(spark: SparkSession, dir: String): Workflow = {
    val wkf = new Workflow("")

    wkf.provide("dataset-{name}") { ctx =>
      val cut = ctx.str("cutoff", "2024-01-20 00:00:00")
      val base = Tables.load(spark, dir, "events")
      if (ctx.str("name") == "train")
        base.filter(col("ts") < lit(java.sql.Timestamp.valueOf(cut)))
      else base.filter(col("ts") >= lit(java.sql.Timestamp.valueOf(cut)))
    }

    // "model": per-event-type mean value from the train split
    wkf
      .provide("train-{name}") { ctx =>
        ctx.as[DataFrame]("dataset")
          .groupBy(col("event_type"))
          .agg(avg(col("value")).as("predicted_value"))
      }
      .depend("dataset" -> "dataset-train")

    // inference: join the learned table onto the target dataset
    wkf
      .provide("infer-{name}") { ctx =>
        val scored = ctx.as[DataFrame]("dataset")
          .join(broadcast(ctx.as[DataFrame]("model")), Seq("event_type"), "left")
        scored.withColumn("abs_err", abs(col("value") - col("predicted_value")))
      }
      .depend("dataset" -> "dataset-{name}", "model" -> "train-{name}")

    wkf
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wkf = build(spark, "/root/testdata/sf0.001")
      .config(Map("dataset-{name}" -> Map("cutoff" -> "2024-01-15 00:00:00")))
    val scored = wkf.run("infer-holdout").asInstanceOf[DataFrame]
    val mae = scored.agg(avg(col("abs_err"))).head().getDouble(0)
    println(f"infer-holdout rows=${scored.count()} mae=$mae%.4f")
  }
}
