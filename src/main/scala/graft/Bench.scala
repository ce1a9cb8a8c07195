package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Benchmark main: one JSON line with per-query best-of-N seconds.
  *
  * Failure-honest: a query that throws is reported with ok=false and
  * excluded from the total (round 1 swallowed exceptions, scoring a
  * crash as its near-zero time-to-failure), and the process exits
  * nonzero. Per-query min/max spread AND median are emitted so
  * round-over-round comparisons can be read against host noise, and
  * per-sample JVM GC / executor-run task-metric deltas make a noisy
  * artifact diagnosable post-hoc (a slow sample with flat GC and flat
  * executor time is host contention, not the query).
  */
object Bench {

  final case class QueryResult(
      name: String,
      times: Seq[Double],
      error: Option[String],
      retries: Int = 0,
      gcMs: Seq[Long] = Nil,
      execMs: Seq[Long] = Nil,
      warmup: Option[Double] = None
  ) {
    def ok: Boolean = error.isEmpty
    def best: Double = times.min
    def median: Double = {
      val s = times.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
  }

  /** A sample set needs another run when its min/max spread says no
    * two samples agree: best-of-N is only trustworthy if at least one
    * run was clean, and a spread past `spreadLimit` says the set never
    * converged. Spread ALONE triggers (round 4's `loadavg > 8`
    * conjunct was blind to a slow-but-idle host — the exact failure
    * mode that let d08 commit a [28.6, 90.7] s sample set with
    * loadavg ~2); host load now only widens the retry budget in
    * `run`. Pure so it's unit-testable.
    */
  def needsRetry(times: Seq[Double], spreadLimit: Double = 3.0): Boolean =
    times.nonEmpty && times.max / times.min > spreadLimit

  /** Accumulates jvmGCTime / executorRunTime across all tasks; Bench
    * reads deltas around each sample (queries run sequentially and the
    * listener bus is flushed first, so deltas attribute cleanly).
    */
  final class TaskMetricsListener extends SparkListener {
    private val gc = new AtomicLong(0L)
    private val exec = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) { gc.addAndGet(m.jvmGCTime); exec.addAndGet(m.executorRunTime) }
    }
    def snapshot: (Long, Long) = (gc.get, exec.get)
  }

  /** Run each query `runs` times (best-of wins); first failure aborts
    * that query's loop and records the error instead of a time.
    * `maxExtra` > 0 enables spread-gated retry: a query whose min/max
    * spread exceeds 3x gets extra samples until the set converges or
    * the budget runs out — the committed artifact converges toward
    * the quiet-host number instead of whatever the host's co-tenants
    * left of it. A loaded host (1-min loadavg > `noiseLoad`) doubles
    * the budget rather than gating the trigger.
    */
  def run(
      spark: SparkSession,
      sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      runs: Int,
      maxExtra: Int = 0,
      noiseLoad: Double = 8.0,
      warmups: Int = 0
  ): Seq[QueryResult] = {
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    def flush(): Unit =
      try org.apache.spark.graftbridge.SparkCoreBridge.flushListenerBus(spark.sparkContext)
      catch { case _: Throwable => () }
    try queries.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      var gcs = Vector.empty[Long]
      var execs = Vector.empty[Long]
      def sample(): Option[Double] = {
        flush()
        val (gc0, ex0) = listener.snapshot
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          flush()
          val (gc1, ex1) = listener.snapshot
          gcs :+= (gc1 - gc0); execs :+= (ex1 - ex0)
          Some(t)
        } catch {
          case e: Throwable =>
            err = Some(
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
            None
        } finally spark.catalog.clearCache()
      }
      // Optional per-query warmup sample, RECORDED in the artifact but
      // excluded from best/median (and from the per-sample gc/exec
      // series): round-5 diagnosis showed first-sample times up to 10x
      // the converged run on some queries (d01: 3.17 s then 0.32 s —
      // Janino codegen compile + first-touch IO, not the query), which
      // skewed medians and burned spread-retry budget. Excluding an
      // honest, visible warmup is the standard steady-state bench
      // protocol; the warmup_s field keeps the artifact auditable.
      val warm = (1 to warmups).flatMap(_ => if (err.nonEmpty) None else sample())
      gcs = Vector.empty; execs = Vector.empty
      var times = (1 to runs).flatMap { _ =>
        if (err.nonEmpty) None else sample()
      }
      val budget = if (loadAvg() > noiseLoad) maxExtra * 2 else maxExtra
      var extra = 0
      while (err.isEmpty && extra < budget && needsRetry(times)) {
        sample().foreach(t => times = times :+ t)
        extra += 1
      }
      QueryResult(name, times, err, retries = extra, gcMs = gcs, execMs = execs,
        warmup = warm.headOption)
    } finally spark.sparkContext.removeSparkListener(listener)
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
      loadAfter: Double = -1.0,
      only: Option[Seq[String]] = None
  ): String = {
    def j(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def obj(parts: Seq[String]): String = parts.mkString("{", ",", "}")
    val qs = obj(results.map {
      case r if r.ok => s"${j(r.name)}:${r.best}"
      case r => s"${j(r.name)}:null"
    })
    val medians = obj(results.collect { case r if r.ok =>
      s"${j(r.name)}:${r.median}"
    })
    val spread = obj(results.collect { case r if r.ok =>
      s"${j(r.name)}:[${r.times.min},${r.times.max}]"
    })
    val gc = obj(results.collect { case r if r.ok && r.gcMs.nonEmpty =>
      s"${j(r.name)}:[${r.gcMs.mkString(",")}]"
    })
    val exec = obj(results.collect { case r if r.ok && r.execMs.nonEmpty =>
      s"${j(r.name)}:[${r.execMs.mkString(",")}]"
    })
    val failed = obj(results.collect { case r if !r.ok =>
      s"${j(r.name)}:${j(r.error.get)}"
    })
    val retried = obj(results.collect { case r if r.retries > 0 =>
      s"${j(r.name)}:${r.retries}"
    })
    val warm = obj(results.collect { case r if r.warmup.nonEmpty =>
      s"${j(r.name)}:${r.warmup.get}"
    })
    val total = results.filter(_.ok).map(_.best).sum
    val totalMedian = results.filter(_.ok).map(_.median).sum
    // a filtered (diagnostic) run must be self-identifying: its small
    // "total" is otherwise indistinguishable from a full-suite number
    // — the exact class of silently-misleading artifact the round-1
    // fix targeted. n_queries makes the same check mechanical.
    val onlyField = only.map(o => s""""only":[${o.sorted.map(j).mkString(",")}],""").getOrElse("")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"${sfDir}",""" +
      s""""runs":$runs,"n_queries":${results.size},$onlyField""" +
      s""""total_median":$totalMedian,"median":$medians,"spread":$spread,""" +
      s""""gc_ms":$gc,"exec_ms":$exec,"failed":$failed,"retried":$retried,""" +
      s""""warmup_s":$warm,""" +
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
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/IO spin-up paid once, not by the first query
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val loadBefore = loadAvg()
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
    // optional comma-separated name filter for isolating one query's
    // timing (diagnosis only — committed artifacts run the full set)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val qset = SparkEntry.queries.toSeq.filter(q => only.forall(_.contains(q._1)))
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt
    val results = run(spark, sfDir, qset, runs, maxExtra = maxExtra, warmups = warmups)
    val json = toJson(results, sfDir, runs, loadBefore, loadAvg(),
      only = only.map(_.toSeq))
    println(json)
    // the committed artifact must never be a truncated log tail: write
    // the complete JSON (including its own total) to a file as well.
    // A name-filtered diagnostic run only writes a file when the
    // caller EXPLICITLY names one — the default artifact path must
    // never be silently overwritten by a partial total (the JSON
    // itself also carries "only"/"n_queries" either way).
    val outFileOpt =
      if (only.isEmpty) Some(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out.json"))
      else sys.env.get("SPARK_GRAFT_BENCH_OUT")
    outFileOpt.foreach { outFile =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    }
    // The LAST stdout line must be a complete JSON object that fits in
    // a ~2 KB log tail: the full artifact above is ~5 KB at 146
    // queries, so a tail capture truncates it mid-line and archives
    // `parsed: null` (rounds 9–10 did exactly that). This summary
    // carries the suite total plus a fixed headline subset; the full
    // per-query map lives in the file named by "full".
    val headliners = Seq(
      "q01_pricing_agg", "q05_multi_join", "q11_window_rank",
      "q23_asof_join", "q24_range_join", "q58_asof_native",
      "q61_interval_join_native", "q64_quantile_sketch",
      "d02_dedup_minhash_lsh", "d04_dedup_ngram_jaccard",
      "d08_dup_clusters_star", "d11_incremental_dedup",
      "s01_sim_bruteforce_topk", "s06_ivf_pq_topk",
      "e02_rand_projection", "g01_pagerank_weighted",
      "t01_lang_id", "t16_bigram_lm", "m07_byte_histogram",
      "m08_container_invariant_dup"
    )
    val byName = results.map(r => r.name -> r).toMap
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    def entry(r: QueryResult): String =
      if (r.ok) s""""${r.name}":${r3(r.best)}""" else s""""${r.name}":null"""
    // Tail-survivable per-query coverage (round-17 fix: the driver's
    // stdout tail is ~2-4 KB, so the ~8 KB artifact line above never
    // parses and a single complete 187-query map (~4.7 KB even at
    // 2-decimal precision) cannot fit either). Two complementary
    // surfaces, both plain one-line JSON:
    //  1. "bench_part" chunk lines — the COMPLETE per-query best-of-N
    //     map split over self-identifying parts (part i of k), each
    //     well under 1 KB, for any consumer that scans all lines;
    //  2. the final "total" line — the suite total plus as many
    //     per-query entries as fit a fixed byte budget: the 20 fixed
    //     headliners first (never removed — round-over-round
    //     comparability), then the remaining queries by descending
    //     best time (the expensive ones are the ones a perf diff
    //     needs). The budget keeps the ENTIRE line safely inside a
    //     2 KB tail next to sbt's trailing "[success]" line.
    val chunkBudget = 900
    val allEntries = results.map(entry)
    val chunks = {
      val bufs = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[String])
      allEntries.foreach { e =>
        if (bufs.last.nonEmpty && bufs.last.map(_.length + 1).sum + e.length > chunkBudget)
          bufs += scala.collection.mutable.ArrayBuffer.empty[String]
        bufs.last += e
      }
      bufs.toSeq.map(_.mkString("{", ",", "}"))
    }
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"metric":"bench_part","part":${i + 1},"of":${chunks.size},"sf":"$sfDir","queries":$c}""")
    }
    val headSet = headliners.toSet
    val extras = results
      .filter(r => r.ok && !headSet.contains(r.name))
      .sortBy(r => (-r.best, r.name))
      .map(entry)
    val headEntries = headliners.flatMap(n => byName.get(n)).map(entry)
    val lineBudget = 1700 // whole final line stays < 1.8 KB
    val fixedCost = 220 // wrapper fields outside the queries map
    var used = headEntries.map(_.length + 1).sum
    val kept = headEntries ++ extras.takeWhile { e =>
      val fits = used + e.length + 1 <= lineBudget - fixedCost
      if (fits) used += e.length + 1
      fits
    }
    val hq = kept.mkString("{", ",", "}")
    val total = r3(results.filter(_.ok).map(_.best).sum)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$hq,""" +
        s""""sf":"$sfDir","runs":$runs,"n_queries":${results.size},""" +
        s""""full":"${outFileOpt.getOrElse("")}","ok":${results.forall(_.ok)}}""")
    spark.stop()
    if (!results.forall(_.ok)) sys.exit(1)
  }
}
