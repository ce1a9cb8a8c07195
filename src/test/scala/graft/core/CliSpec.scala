package graft.core

import graft.SparkTestBase
import scala.collection.mutable.ArrayBuffer

/** CLI behavior mirroring /root/reference/interlinked/cli.py:
  * version / validate / deps / run (+ json config).
  */
class CliSpec extends SparkTestBase {

  private def cli(args: String*): Seq[String] = {
    val out = ArrayBuffer[String]()
    Cli.run(args.toArray, out += _)
    out.toSeq
  }

  test("version") {
    assert(cli("graft.GraftPipelines", "version") == Seq(Cli.version))
  }

  test("validate default workflow") {
    assert(cli("graft.GraftPipelines", "validate", "-n", "default") == Seq("ok"))
  }

  test("deps prints the dependency tree") {
    val out = cli("graft.GraftPipelines", "deps", "-n", "default")
    assert(out.exists(_.contains("spark")))
    assert(out.exists(_.trim == "table.{name}"))
    assert(out.exists(_.trim == "count.{name}"))
  }

  test("run a count target with -s prints the count") {
    // ensure the shared test session is the active one getOrCreate finds
    spark.sparkContext.setLogLevel("WARN")
    val out = cli("graft.GraftPipelines", "run", "-n", "default", "-s", "count.q09_distinct")
    assert(out.nonEmpty && out.last.forall(_.isDigit) && out.last.toLong > 0)
  }

  test("sql subcommand runs a query THROUGH a graft custom function (X4 last mile)") {
    // force the shared test session so getOrCreate joins it — the
    // explicit register() in the sql path must make cosine_sim
    // available even though the extensions config is ignored here
    spark.sparkContext.setLogLevel("WARN")
    val out = cli("graft.GraftPipelines", "sql", "-d", sfDir, "--limit", "3",
      "SELECT vec_id, cosine_sim(embedding, embedding) AS c FROM embeddings ORDER BY vec_id")
    assert(out.head == "vec_id\tc", out.mkString("|"))
    assert(out.length == 4, s"header + 3 rows expected, got ${out.length}")
    assert(out.tail.forall(l => math.abs(l.split("\t")(1).toDouble - 1.0) < 1e-9),
      out.mkString("|"))
  }

  test("sql subcommand prints NULL and array cells readably") {
    val out = cli("graft.GraftPipelines", "sql",
      "SELECT CAST(NULL AS INT) AS a, array(1, 2) AS b")
    assert(out == Seq("a\tb", "NULL\t[1,2]"), out.mkString("|"))
  }

  test("run with json config overrides route params") {
    val cfg = java.nio.file.Files.createTempFile("graft-cfg", ".json")
    java.nio.file.Files.writeString(cfg,
      """{"query.{name}": {"dir": "/root/testdata/sf0.001"}}""")
    val out = cli("graft.GraftPipelines", "run", "-n", "default",
      "-c", cfg.toString, "-s", "count.q10_union")
    assert(out.nonEmpty && out.last.toLong > 0)
  }

  test("run with toml config (reference ml-flow-params shape)") {
    val cfg = java.nio.file.Files.createTempFile("graft-cfg", ".toml")
    java.nio.file.Files.writeString(cfg,
      """# Override params for query route
        |[query.{name}]
        |dir = "/root/testdata/sf0.001"
        |""".stripMargin)
    val out = cli("graft.GraftPipelines", "run", "-n", "default",
      "-c", cfg.toString, "-s", "count.q09_distinct")
    assert(out.nonEmpty && out.last.toLong > 0)
  }

  test("toml parser handles scalars and comments") {
    val cfg = java.nio.file.Files.createTempFile("graft-toml", ".toml")
    java.nio.file.Files.writeString(cfg,
      """[dataset-first]
        |n_features = 5  # comment
        |rate = 0.25
        |label = "spam"
        |flag = true
        |""".stripMargin)
    val m = Cli.loadConfig(cfg.toString)
    val sec = m("dataset-first").asInstanceOf[Map[String, Any]]
    assert(sec == Map("n_features" -> 5L, "rate" -> 0.25, "label" -> "spam", "flag" -> true))
  }

  test("unknown workflow reports error") {
    val out = cli("graft.GraftPipelines", "validate", "-n", "nope")
    assert(out.exists(_.startsWith("Error: workflow 'nope' not found")))
  }

  test("-v raises log level to INFO, -vv to DEBUG (cli.py:136-138)") {
    val logs = ArrayBuffer[String]()
    val (oldLevel, oldSink) = (Log.level, Log.sink)
    try {
      Log.sink = logs += _
      cli("graft.GraftPipelines", "version")
      assert(Log.level == 0 && logs.isEmpty)
      cli("graft.GraftPipelines", "version", "-v")
      assert(Log.level == 1 && logs.exists(_.startsWith("INFO cli:")))
      logs.clear()
      cli("graft.GraftPipelines", "version", "-vv")
      assert(Log.level == 2)
      cli("graft.GraftPipelines", "version", "-v", "--verbose")
      assert(Log.level == 2)
    } finally { Log.level = oldLevel; Log.sink = oldSink }
  }

  test("a run target equal to a flag value is not dropped") {
    // `run -n default default.echo` used to drop the target when its
    // string appeared as any flag's value; positional parsing keeps it
    Workflow.get("cli-echo").getOrElse {
      val w = new Workflow("cli-echo")
      w.provide("cli-echo") { _ => "it-ran" }
      w
    }
    val out = cli("graft.GraftPipelines", "run", "-n", "cli-echo", "-s", "cli-echo")
    assert(out.lastOption.contains("it-ran"))
  }
}
