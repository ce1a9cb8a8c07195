package graft.tools

import graft.SparkTestBase

/** Guards for the measurement tooling itself: the plan auditor's
  * counters (round 1's grep patterns never matched formatted-mode
  * explain, reporting shuffles=0 for every query) and the bench
  * harness's failure honesty.
  */
class AuditBenchSpec extends SparkTestBase {

  private def audit(name: String) =
    ExplainAudit.auditQuery(spark, name, sfDir)

  test("audit counts shuffles and codegen on known-shuffling plans") {
    val q05 = audit("q05_multi_join") // 6-way join + agg: must shuffle
    assert(q05.shuffles > 0, s"q05 shuffles: $q05")
    assert(q05.codegenIds > 0, s"q05 codegen: $q05")
    assert(q05.scans > 0 && (q05.bhj + q05.smj + q05.shj) > 0)

    val d04 = audit("d04_dedup_ngram_jaccard") // posting self-join + agg
    assert(d04.shuffles > 0, s"d04 shuffles: $d04")
  }

  test("audit shows no shuffle on a narrow per-row query") {
    // t01 is pure per-row expressions + orderBy; exchanges here can
    // only be the final range partitioning for the sort
    val t01 = audit("t01_lang_id")
    assert(t01.scans > 0)
  }

  test("bench records a deliberately broken query as failed, not fast") {
    val broken: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.sql("SELECT * FROM nonexistent_table_xyz")
    val fine: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(10).toDF()
    val rs = graft.Bench.run(spark, sfDir, Seq("broken" -> broken, "fine" -> fine), runs = 2)
    val byName = rs.map(r => r.name -> r).toMap
    assert(!byName("broken").ok && byName("broken").times.isEmpty)
    assert(byName("fine").ok && byName("fine").times.size == 2)
    val json = graft.Bench.toJson(rs, "sfX", 2)
    assert(json.contains("\"broken\":null"), json)
    assert(json.contains("\"ok\":false"), json)
    assert(json.contains("\"failed\":{\"broken\":"), json)
  }

  test("bench retry fires on wide spread alone (host load no longer gates it)") {
    import graft.Bench.needsRetry
    // wide spread: the sample set never converged — retry regardless
    // of loadavg (round 4's load>8 conjunct was blind to a
    // slow-but-idle host and let d08 commit a [28.6, 90.7]s set)
    assert(needsRetry(Seq(0.2, 0.9)))
    // tight spread: best-of already converged
    assert(!needsRetry(Seq(0.50, 0.55, 0.52)))
    assert(!needsRetry(Nil))
    // retried counts surface in the artifact
    val r = graft.Bench.QueryResult("q", Seq(0.9, 0.2, 0.21), None, retries = 1)
    val json = graft.Bench.toJson(Seq(r), "sfX", 2)
    assert(json.contains("\"retried\":{\"q\":1}"), json)
  }

  test("bench artifact carries median and per-sample GC/executor metrics") {
    val r = graft.Bench.QueryResult("q", Seq(0.9, 0.2, 0.21), None,
      gcMs = Seq(120L, 5L, 6L), execMs = Seq(8000L, 900L, 880L))
    assert(r.best == 0.2 && math.abs(r.median - 0.21) < 1e-12)
    val json = graft.Bench.toJson(Seq(r), "sfX", 3)
    assert(json.contains("\"median\":{\"q\":0.21}"), json)
    assert(json.contains("\"total_median\":0.21"), json)
    assert(json.contains("\"gc_ms\":{\"q\":[120,5,6]}"), json)
    assert(json.contains("\"exec_ms\":{\"q\":[8000,900,880]}"), json)
    // even-count median averages the middle pair
    val even = graft.Bench.QueryResult("e", Seq(1.0, 3.0), None)
    assert(even.median == 2.0)
  }

  test("warmup sample is excluded from stats but recorded; a filtered run self-identifies") {
    val fine: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(10).toDF()
    val rs = graft.Bench.run(spark, sfDir, Seq("fine" -> fine), runs = 2, warmups = 1)
    val r = rs.head
    assert(r.times.size == 2 && r.warmup.nonEmpty,
      s"warmup must run and be excluded from the scored samples: $r")
    assert(r.gcMs.size == 2 && r.execMs.size == 2,
      "warmup must not pollute the per-sample metric series")
    val json = graft.Bench.toJson(rs, "sfX", 2, only = Some(Seq("fine")))
    assert(json.contains("\"warmup_s\":{\"fine\":"), json)
    // a name-filtered diagnostic artifact is distinguishable from a
    // full-suite one (the round-5 ADVICE hole)
    assert(json.contains("\"only\":[\"fine\"]"), json)
    assert(json.contains("\"n_queries\":1"), json)
    val full = graft.Bench.toJson(rs, "sfX", 2)
    assert(!full.contains("\"only\":"), full)
  }

  test("bench run measures real GC/executor deltas per sample") {
    val fine: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(100000).selectExpr("sum(id) as s")
    val rs = graft.Bench.run(spark, sfDir, Seq("fine" -> fine), runs = 2)
    val r = rs.head
    assert(r.gcMs.size == 2 && r.execMs.size == 2, r)
    // tasks ran, so executor run time must be nonzero for each sample
    assert(r.execMs.forall(_ >= 0) && r.execMs.sum > 0, r.execMs)
  }
}
