package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: one JSON line with per-query best-of-3 seconds.
  *
  * Failure-honest: a query that throws is reported with ok=false and
  * excluded from the total (round 1 swallowed exceptions, scoring a
  * crash as its near-zero time-to-failure), and the process exits
  * nonzero. Per-query min/max spread is emitted so round-over-round
  * comparisons can be read against host noise (BenchSpec pins both).
  */
object Bench {

  final case class QueryResult(
      name: String,
      times: Seq[Double],
      error: Option[String],
      retries: Int = 0
  ) {
    def ok: Boolean = error.isEmpty
    def best: Double = times.min
  }

  /** A sample set needs another run when its spread says the host was
    * interfering: best-of-N is only trustworthy if at least one run
    * was clean, and a min/max ratio past `spreadLimit` under real
    * load says none was. Pure so it's unit-testable.
    */
  def needsRetry(
      times: Seq[Double],
      load: Double,
      noiseLoad: Double = 8.0,
      spreadLimit: Double = 3.0
  ): Boolean =
    times.nonEmpty && times.max / times.min > spreadLimit && load > noiseLoad

  /** Run each query `runs` times (best-of wins); first failure aborts
    * that query's loop and records the error instead of a time.
    * `maxExtra` > 0 enables loadavg-gated retry: a query whose
    * min/max spread exceeds 3x while the 1-minute loadavg is above
    * `noiseLoad` gets up to that many extra samples — the committed
    * artifact converges toward the quiet-host number instead of
    * whatever the driver's co-tenants left of it.
    */
  def run(
      spark: SparkSession,
      sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      runs: Int,
      maxExtra: Int = 0,
      noiseLoad: Double = 8.0
  ): Seq[QueryResult] =
    queries.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      def sample(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            err = Some(
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
            None
        } finally spark.catalog.clearCache()
      }
      var times = (1 to runs).flatMap { _ =>
        if (err.nonEmpty) None else sample()
      }
      var extra = 0
      while (err.isEmpty && extra < maxExtra &&
          needsRetry(times, loadAvg(), noiseLoad)) {
        sample().foreach(t => times = times :+ t)
        extra += 1
      }
      QueryResult(name, times, err, retries = extra)
    }

  /** 1-minute loadavg (host-noise marker; -1.0 if unavailable). */
  def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** The single-line bench JSON the driver parses. */
  def toJson(
      results: Seq[QueryResult],
      sfDir: String,
      runs: Int,
      loadBefore: Double = -1.0,
      loadAfter: Double = -1.0
  ): String = {
    def j(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map {
      case r if r.ok => s"${j(r.name)}:${r.best}"
      case r => s"${j(r.name)}:null"
    }.mkString("{", ",", "}")
    val spread = results.collect { case r if r.ok =>
      s"${j(r.name)}:[${r.times.min},${r.times.max}]"
    }.mkString("{", ",", "}")
    val failed = results.collect { case r if !r.ok =>
      s"${j(r.name)}:${j(r.error.get)}"
    }.mkString("{", ",", "}")
    val retried = results.collect { case r if r.retries > 0 =>
      s"${j(r.name)}:${r.retries}"
    }.mkString("{", ",", "}")
    val total = results.filter(_.ok).map(_.best).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"${sfDir}",""" +
      s""""runs":$runs,"spread":$spread,"failed":$failed,"retried":$retried,""" +
      s""""loadavg_before":$loadBefore,"loadavg_after":$loadAfter,""" +
      s""""ok":${results.forall(_.ok)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/IO spin-up paid once, not by the first query
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val loadBefore = loadAvg()
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
    val results = run(spark, sfDir, SparkEntry.queries.toSeq, runs, maxExtra = maxExtra)
    val json = toJson(results, sfDir, runs, loadBefore, loadAvg())
    println(json)
    // the committed artifact must never be a truncated log tail: write
    // the complete JSON (including its own total) to a file as well
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    spark.stop()
    if (!results.forall(_.ok)) sys.exit(1)
  }
}
