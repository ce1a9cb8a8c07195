package graft.core

import scala.jdk.CollectionConverters._

/** Command-line equivalent of the reference CLI
  * (/root/reference/interlinked/cli.py): run / validate / deps /
  * version against a registered workflow.
  *
  * Usage:
  *   Cli <loaderClass> version
  *   Cli <loaderClass> validate -n <workflow>
  *   Cli <loaderClass> deps -n <workflow>
  *   Cli <loaderClass> run -n <workflow> [-c config.json] [-s] target...
  *   Cli <loaderClass> sql [-d dataDir] [--limit N] query...
  *
  * `sql` is the last mile of the X4 registration: it opens (or joins)
  * a Spark session with ALL graft custom expressions registered
  * (cosine_sim, poly_hash, word_shingles, minhash_hex, bpe_count,
  * nibble_histogram — graft.functions.GraftExtensions), registers
  * each parquet table under `dataDir` as a temp view, and prints each
  * query's result as TSV (header + at most N rows, default 20).
  *
  * `loaderClass` is a Scala object (e.g. `graft.GraftPipelines$`)
  * whose static init registers workflows — the analogue of the
  * reference's SourceFileLoader import side effects.
  */
object Cli {
  val version = "0.1.0"

  def main(args: Array[String]): Unit = run(args, println(_))

  def run(args: Array[String], out: String => Unit): Unit = {
    if (args.length < 2) {
      out("usage: Cli <loaderClass> <version|validate|deps|run> " +
        "[-v|-vv] [-n wkf] [-c cfg.json] [-s] targets...")
      return
    }
    val loader = args(0)
    val command = args(1)
    val rest = args.drop(2)

    // Force object initialization so its workflows register. A Scala
    // object's registration code lives in the '$' module class static
    // init — loading only the mirror class would not run it.
    val loaded = Seq(loader + "$", loader).exists { cn =>
      try { Class.forName(cn, true, getClass.getClassLoader); true }
      catch { case _: ClassNotFoundException => false }
    }
    if (!loaded) out(s"warning: loader class '$loader' not found")

    // Left-to-right parse consuming flag+value pairs — a positional
    // target that happens to EQUAL a flag's value (`run -n foo foo`)
    // stays a target (the old value-membership filter dropped it).
    var wkfName = "default"
    var cfgPath: Option[String] = None
    var dataDir: Option[String] = None
    var limit = 20
    var show = false
    var verbose = 0
    val targets = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < rest.length) {
      rest(i) match {
        case "-n" | "--name" if i + 1 < rest.length => wkfName = rest(i + 1); i += 2
        case "-c" | "--config" if i + 1 < rest.length => cfgPath = Some(rest(i + 1)); i += 2
        case "-d" | "--data" if i + 1 < rest.length => dataDir = Some(rest(i + 1)); i += 2
        case "--limit" if i + 1 < rest.length => limit = rest(i + 1).toInt; i += 2
        case "-s" | "--show" => show = true; i += 1
        case "-v" | "--verbose" => verbose += 1; i += 1
        case "-vv" => verbose += 2; i += 1
        case t => targets += t; i += 1
      }
    }
    // -v => INFO, -vv => DEBUG (reference cli.py:108-110,136-138)
    Log.level = verbose
    Log.info(s"cli: loader=$loader command=$command workflow=$wkfName")

    def wkf: Workflow = Workflow.get(wkfName).getOrElse {
      out(s"Error: workflow '$wkfName' not found"); throw new RouteNotFound(wkfName)
    }

    command match {
      case "version" => out(version)

      case "validate" =>
        try { wkf.validate(); out("ok") }
        catch { case e: GraftException => out("Error: " + e.getMessage) }

      case "deps" =>
        val d = wkf.deps()
        val children = d.values.flatten.toSet
        val roots = d.keySet -- children
        def walk(node: String, indent: String): Unit = {
          out(indent + node)
          d.getOrElse(node, Seq.empty).sorted.foreach(walk(_, indent + "  "))
        }
        roots.toSeq.sorted.foreach(walk(_, ""))

      case "run" =>
        // anonymous (unregistered) clone: repeated CLI runs with -c
        // must not collide in the workflow registry
        val base = cfgPath.map(loadConfig)
          .fold(wkf)(cfg => wkf.cloneWorkflow(name = "", config = Some(cfg)))
        targets.foreach { t =>
          Log.debug(s"cli: running target '$t'")
          val res = base.run(t)
          if (show) out(String.valueOf(res))
        }

      case "sql" =>
        // getOrCreate: inside an existing session (tests, notebooks)
        // the extensions config is ignored, so the function surface is
        // ALSO registered explicitly — register() is idempotent
        val spark = org.apache.spark.sql.SparkSession.builder()
          .appName("graft-sql")
          .master(sys.props.getOrElse("spark.master", "local[*]"))
          .config("spark.sql.extensions", "graft.functions.GraftExtensions")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        graft.functions.GraftExtensions.register(spark)
        dataDir.foreach { dir =>
          graft.tables.Tables.names.foreach { t =>
            graft.tables.Tables.load(spark, dir, t).createOrReplaceTempView(t)
          }
        }
        targets.foreach { q =>
          Log.debug(s"cli: running sql '$q'")
          val df = spark.sql(q)
          out(df.columns.mkString("\t"))
          df.limit(limit).collect().foreach { r =>
            out(r.toSeq.map {
              case null => "NULL"
              case a: Array[_] => a.mkString("[", ",", "]")
              case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
              case v => String.valueOf(v)
            }.mkString("\t"))
          }
        }

      case other => out(s"Unknown command '$other'")
    }
  }

  /** Config loader: .json via jackson (ships with Spark) or .toml via
    * a minimal parser covering the reference's config shape
    * (cli.py:34-45 supports both; reference example:
    * examples/ml-flow-params.toml — [route] tables of scalars).
    */
  private[core] def loadConfig(path: String): Map[String, Any] =
    if (path.endsWith(".toml")) loadToml(path) else loadJson(path)

  private def loadToml(path: String): Map[String, Any] = {
    val lines = java.nio.file.Files.readAllLines(new java.io.File(path).toPath)
    val result = scala.collection.mutable.LinkedHashMap[String, Map[String, Any]]()
    var section: Option[String] = None
    val sectionRe = "^\\[(.+)\\]$".r
    val kvRe = "^([A-Za-z0-9_.{}:-]+)\\s*=\\s*(.+)$".r
    def parseValue(raw: String): Any = {
      val v = raw.trim
      if (v.startsWith("\"") && v.endsWith("\"")) v.substring(1, v.length - 1)
      else if (v == "true" || v == "false") v.toBoolean
      else if (v.matches("[-+]?[0-9]+")) v.toLong
      else if (v.matches("[-+]?[0-9]*\\.[0-9]+")) v.toDouble
      else v
    }
    lines.forEach { rawLine =>
      val line = rawLine.takeWhile(_ != '#').trim
      line match {
        case "" =>
        case sectionRe(name) =>
          section = Some(name.trim)
          result.getOrElseUpdate(name.trim, Map.empty)
        case kvRe(k, v) =>
          val sec = section.getOrElse(
            throw new InvalidValue(s"TOML key '$k' outside a [section] in $path"))
          result(sec) = result(sec) + (k.trim -> parseValue(v))
        case other =>
          throw new InvalidValue(s"Unsupported TOML line in $path: '$other'")
      }
    }
    result.toMap
  }

  private def loadJson(path: String): Map[String, Any] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readValue(new java.io.File(path), classOf[java.util.Map[String, Object]])
    def conv(v: Any): Any = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, vv) => String.valueOf(k) -> conv(vv) }.toMap
      case l: java.util.List[_] => l.asScala.map(conv).toSeq
      case other                => other
    }
    conv(node).asInstanceOf[Map[String, Any]]
  }
}
