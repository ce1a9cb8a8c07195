package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Dev-only round-16 phase profiler: times the building blocks of the
  * dup-cluster chain (shingle/pairs/CC) separately so the optimization
  * round attacks the right phase. Usage:
  *   sbt "runMain graft.tools.R16Probe [sfDir]"
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      val docs = graft.tables.Tables.load(spark, sfDir, "documents")
      val pairs = t("pairs(minhashLshAtScale)") {
        val p = graft.operators.Dedup.minhashLshAtScale(docs)
          .select($"id_a", $"id_b").graftCheckpointEager
        p.count(); p
      }
      t("starCC") {
        val (labels, rounds) = graft.operators.Ops.connectedComponentsStar(
          pairs, "id_a", "id_b")
        val n = labels.count()
        println(s"[probe]   star rounds=$rounds labels=$n")
      }
      t("minlabelCC") {
        val l = graft.operators.Ops.connectedComponents(pairs, "id_a", "id_b")
        println(s"[probe]   minlabel labels=${l.count()}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
