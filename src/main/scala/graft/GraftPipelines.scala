package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Workflow
import graft.sinks.RoutedSink
import graft.tables.Tables

/** The standard registered workflow ("default"): tables, every
  * SparkEntry operator, counts, and routed exports, wired through the
  * graft.core engine — the whole library as one routed DAG.
  *
  * CLI examples (see graft.core.Cli):
  *   Cli graft.GraftPipelines validate -n default
  *   Cli graft.GraftPipelines run -n default -s count.q01_pricing_agg
  *   Cli graft.GraftPipelines run -n default export.q09_distinct
  *
  * `dir` defaults to sf0.001 and is overridable via kw/config —
  * the reference's config-injection pattern.
  */
object GraftPipelines {

  val default: Workflow = {
    val wkf = new Workflow("default")

    wkf.provide("spark") { _ =>
      val s = SparkSession
        .builder()
        .master("local[8]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    wkf
      .provide("table.{name}") { ctx =>
        Tables.load(
          ctx.as[SparkSession]("spark"),
          ctx.str("dir", "/root/testdata/sf0.001"),
          ctx.str("name")
        )
      }
      .depend("spark" -> "spark")

    wkf
      .provide("query.{name}") { ctx =>
        val name = ctx.str("name")
        val build = SparkEntry.queries.getOrElse(
          name,
          throw new graft.core.RouteNotFound(
            s"No query '$name' in SparkEntry (known: ${SparkEntry.queries.keys.toSeq.sorted.take(5).mkString(", ")}...)"
          )
        )
        build(ctx.as[SparkSession]("spark"), ctx.str("dir", "/root/testdata/sf0.001"))
      }
      .depend("spark" -> "spark")

    wkf
      .provide("count.{name}") { ctx => ctx.as[DataFrame]("df").count() }
      .depend("df" -> "query.{name}")

    // export.<query> writes through the routed sink; `sink` defaults
    // to noop and is overridable via kw/config (e.g. parquet:/out/x).
    wkf
      .provide("export.{name}") { ctx =>
        val df = ctx.as[DataFrame]("df")
        val target = ctx.str("sink", s"noop:${ctx.str("name")}")
        RoutedSink.standard().write(target, df)
        target
      }
      .depend("df" -> "query.{name}")

    wkf
  }
}
