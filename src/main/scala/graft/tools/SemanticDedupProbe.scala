package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the SemDeDup scale knob (docs/SCALING.md round 6): the
  * canned d10 pins 8 cells, so 10× corpus → 100× within-cell pair
  * volume; Ops.semanticDedupAtScale derives cells from corpus size,
  * keeping occupancy — and pair volume per cell — constant. This
  * probe times both at the same corpus and reports cells, candidate
  * pair volume (minCosine = -1) and survivors.
  *
  * Run: sbt "runMain graft.tools.SemanticDedupProbe <sfDir> [targetCellSize]"
  */
object SemanticDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val emb = graft.tables.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm the JVM + file cache once
    graft.operators.Ops.semanticDedupAtScale(emb, "vec_id", "embedding", target).count()

    val (tracked, tTracked) = timed {
      val out = graft.operators.Ops
        .semanticDedupAtScale(emb, "vec_id", "embedding", target, minCosine = -1.0)
      out.count()
    }
    val (pinned, tPinned) = timed {
      // targetCellSize = n/8 pins k at 8 — d10's canned configuration
      val out = graft.operators.Ops
        .semanticDedupAtScale(emb, "vec_id", "embedding", (n / 8).toInt, minCosine = -1.0)
      out.count()
    }
    // round 12: the brute n×k assignment the routed default replaced
    // (exactAssign escape) — same knob, same output contract
    val (brute, tBrute) = timed {
      val out = graft.operators.Ops
        .semanticDedupAtScale(emb, "vec_id", "embedding", target,
          minCosine = -1.0, exactAssign = true)
      out.count()
    }
    val k = math.max(8L, n / target)
    println(s"""{"n":$n,"targetCellSize":$target,"cells_tracked":$k,""" +
      s""""pairs_tracked":$tracked,"sec_tracked":$tTracked,""" +
      s""""cells_pinned":8,"pairs_pinned":$pinned,"sec_pinned":$tPinned,""" +
      s""""pairs_brute_assign":$brute,"sec_brute_assign":$tBrute}""")
    spark.stop()
  }
}
