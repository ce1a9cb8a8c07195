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

  test("bench retry fires only on wide spread under real load") {
    import graft.Bench.needsRetry
    // wide spread + loaded host: the sample set is untrustworthy
    assert(needsRetry(Seq(0.2, 0.9), load = 12.0))
    // wide spread but quiet host: spread is the query's own variance
    assert(!needsRetry(Seq(0.2, 0.9), load = 1.0))
    // tight spread under load: best-of already converged
    assert(!needsRetry(Seq(0.50, 0.55, 0.52), load = 12.0))
    assert(!needsRetry(Nil, load = 12.0))
    // retried counts surface in the artifact
    val r = graft.Bench.QueryResult("q", Seq(0.9, 0.2, 0.21), None, retries = 1)
    val json = graft.Bench.toJson(Seq(r), "sfX", 2)
    assert(json.contains("\"retried\":{\"q\":1}"), json)
  }
}
