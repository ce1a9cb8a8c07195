package graft.tools

import graft.SparkTestBase

/** The scale rule behind every `WindowExec` "No Partition Defined"
  * warning the suite emits: an unpartitioned window is only legal
  * over a BOUNDED relation (subtree contains an Aggregate or Limit).
  * This spec sweeps EVERY registered query's optimized plan — a new
  * query that puts a global window over a corpus-sized relation
  * fails here before it ever runs at scale.
  */
class WindowAuditSpec extends SparkTestBase {

  test("no query plans an unpartitioned window over an unbounded relation") {
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val g = WindowAudit.auditQuery(spark, name, sfDir)
      if (g.unbounded > 0) Some(s"$name (${g.unbounded} of ${g.total})") else None
    }
    assert(offenders.isEmpty,
      s"global windows over unbounded input: ${offenders.mkString(", ")}")
  }

  test("the auditor itself flags a deliberately unbounded global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("rn", row_number().over(Window.orderBy(col("l_orderkey"))))
    val g = WindowAudit.audit(df)
    assert(g.total == 1 && g.unbounded == 1, s"got $g")
  }
}
