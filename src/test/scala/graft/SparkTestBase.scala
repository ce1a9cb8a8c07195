package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for Spark-backed suites (one per JVM).
  *
  * Suites now run CONCURRENTLY in the forked test JVM
  * (`Test / testForkedParallel := true` — the round-17 fix for the
  * suite's wall clock, which had grown past the driver's test budget;
  * in-test time is ~26 min sequential and the shared-session jobs
  * overlap cleanly, guide §2.6). A suite that mutates SESSION state
  * (spark.conf.set, time-scoped toggles like AQE/codegen/broadcast
  * thresholds) MUST NOT do so on the shared session — it would flip
  * the conf under every concurrently running suite. Such suites
  * override `spark` with [[SparkTestBase.isolatedSession]]: same
  * SparkContext (no second scheduler/UI), own SQLConf.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  /** Isolated SQLConf over the shared context — for suites that flip
    * session confs (see trait doc). Inherits the builder confs (they
    * live on the SparkConf) but not later conf.set mutations.
    */
  def isolatedSession: SparkSession = session.newSession()

  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
