package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.tables.Tables

/** Crawl-frontier planning (O62, t41): turn a scored URL frontier
  * into politeness-bucketed fetch waves — at most `perWave` URLs per
  * host per wave, higher priority first, deterministic tie-break on
  * the URL itself. The downstream contract: wave k is fetched before
  * wave k+1, so per-host request spacing is `waveInterval /
  * perWave`-bounded no matter how hot one host's frontier is. Pairs
  * with the O58 robots gate (filter disallowed paths BEFORE planning)
  * and t40 (collapse redirect targets into the frontier first).
  *
  * Scale shape: ONE shuffle — the window partitions by host, which is
  * the politeness key and therefore the unavoidable partitioning; no
  * global window exists anywhere (the rankGlobal lesson). A
  * pathological host with tens of millions of frontier URLs sorts
  * inside one partition — that is exactly the host a crawler must cap
  * anyway, which is what `maxWaves`/`deferred` expresses: set it to
  * bound the per-host work a planning epoch accepts.
  */
object Frontier {

  /** Per-URL fetch plan: input cols + (host, wave, slot, deferred).
    * wave/slot are 0-based; slot < perWave positions the URL inside
    * its wave. URLs whose host doesn't parse are dropped (a crawler
    * cannot fetch them — route them to a quarantine sink upstream via
    * t35's `invalid` verdict if they must be kept). With `maxWaves`,
    * URLs planned beyond the horizon keep their wave but read
    * `deferred` — the next planning epoch re-enters them.
    */
  def plan(
      df: DataFrame,
      urlCol: String = "url",
      priorityCol: String = "priority",
      perWave: Int = 2,
      maxWaves: Option[Int] = None): DataFrame = {
    require(perWave >= 1, "plan: perWave must be >= 1")
    Seq("host", "wave", "slot", "deferred", "_r").foreach(c =>
      require(!df.columns.contains(c),
        s"Frontier.plan: input already has a '$c' column — rename it first"))
    val w = Window.partitionBy(col("host"))
      .orderBy(col(priorityCol).desc, col(urlCol))
    df.withColumn("host", GraftExpressions.urlHost(col(urlCol)))
      .where(col("host").isNotNull)
      .withColumn("_r", row_number().over(w) - 1)
      // `div`: exact integral division (a double `/` then cast would
      // round through IEEE for large ranks)
      .withColumn("wave", expr(s"CAST(_r DIV $perWave AS BIGINT)"))
      .withColumn("slot", (col("_r") % perWave).cast("long"))
      .withColumn("deferred",
        maxWaves.map(m => col("wave") >= m.toLong).getOrElse(lit(false)))
      .drop("_r")
  }

  // -----------------------------------------------------------------
  // t41: the canned query — a deterministic skewed frontier over the
  // documents table (every third URL lands on one hot host, the rest
  // spread over 7), planned at perWave=2 with a 40-wave horizon. The
  // hot host's tail defers; the small hosts finish in a few waves —
  // exactly the shape a politeness planner must produce.
  // -----------------------------------------------------------------

  private[operators] def syntheticFrontier(docs: DataFrame): DataFrame = {
    val host = when(col("doc_id") % 3 === 0, "big.example.com")
      .otherwise(concat(lit("h"), (col("doc_id") % 7).cast("string"),
        lit(".example.com")))
    docs.select(
      concat(lit("https://"), host, lit("/p/"), col("doc_id").cast("string")).as("url"),
      ((col("doc_id") * 37) % 100).cast("int").as("priority"))
  }

  private val duckSyntheticFrontier: String =
    "SELECT 'https://' || CASE WHEN doc_id % 3 = 0 THEN 'big.example.com' " +
      "ELSE 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' END || " +
      "'/p/' || CAST(doc_id AS VARCHAR) AS url, " +
      "CAST((doc_id * 37) % 100 AS INT) AS priority FROM documents"

  private def t41Oracle(perWave: Int, maxWaves: Int): String =
    s"""WITH f AS ($duckSyntheticFrontier),
      h AS (SELECT url, priority, ${UrlCuration.duckHostOf("url")} AS host FROM f
        WHERE ${UrlCuration.duckHostOf("url")} IS NOT NULL),
      r AS (SELECT url, priority, host,
          ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url) - 1 AS rk
        FROM h)
      SELECT url, priority, host,
        CAST(rk // $perWave AS BIGINT) AS wave,
        CAST(rk % $perWave AS BIGINT) AS slot,
        rk // $perWave >= $maxWaves AS deferred
      FROM r ORDER BY url"""

  val all: Seq[Q] = Seq(
    Q(
      "t41_frontier",
      "Politeness fetch-wave planning: per-host row_number -> wave/slot at perWave cap, horizon deferral",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        plan(syntheticFrontier(docs), perWave = 2, maxWaves = Some(40))
          .orderBy(col("url"))
      },
      Some(t41Oracle(2, 40))
    )
  )
}
