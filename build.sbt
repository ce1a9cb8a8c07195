ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "interlinkedspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Round-17: run suites CONCURRENTLY inside the forked test JVM. The
// suite's in-test time is ~26 min sequential — past the CI/driver test
// budget (round 16's run was killed mid-suite) — and almost all of it
// is small Spark jobs on the shared local[8] session, which overlap
// cleanly (guide §2.6: independent jobs back-fill each other's
// stragglers). Conf-mutating suites are isolated on newSession()
// (see SparkTestBase.isolatedSession) so no suite flips AQE/codegen/
// broadcast toggles under a concurrent one.
Test / testForkedParallel := true
// concurrent suites share one driver JVM: give it headroom over the
// single-suite 8g default
Test / javaOptions += "-Xmx16g"
// Two suites assert on RUNTIME EXECUTION METRICS that concurrent
// tenants can perturb (AnnIndexSpec: DPP partition-pruning counts on
// the lists scan; DedupScaleSpec: a cache-backed reference formulation
// that proved sensitive to concurrent clearCache/unpersist traffic).
// They run in their own forked JVMs — own SparkSession, zero shared
// state — concurrently WITH the main group, so the quarantine costs
// two JVM startups, not wall-clock serialization.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val quarantined = Set(
    "graft.operators.DedupScaleSpec",
    "graft.operators.AnnIndexSpec",
    "graft.operators.Round9bOpsSpec")
  val (q, rest) = tests.partition(t => quarantined(t.name))
  Tests.Group("main", rest, Tests.SubProcess(opts)) +:
    q.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(opts)))
}
// sbt's default restrictions cap forked test groups at ONE concurrent
// JVM, which would serialize the quarantined suites AFTER the main
// group (measured: 17.6 min vs 10.3 single-group). Let the three
// groups overlap; limitAll(8) keeps overall task parallelism sane.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8),
  Tags.limit(Tags.ForkedTestGroup, 4))
run / fork := true
// Forked `run` output must reach stdout RAW: sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks any consumer that
// parses the bench's one-line JSON from the process stdout (a line
// starting with "[info] {" is not JSON). StdoutOutput inherits the
// forked JVM's stdout/stderr, so graft.Bench's JSON lines land
// unprefixed and machine-parseable.
// Unscoped so every forked task (run, runMain, test) delegates to it.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
