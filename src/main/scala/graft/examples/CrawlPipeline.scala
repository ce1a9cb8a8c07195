package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driveable end-to-end demo of the round-15 crawl surface: synthetic
  * WARC archives (plain + record-gzipped, with a blocked domain, a
  * tracking-noise mirror, a recrawl, a truncated record and a corrupt
  * .gz) land in a drop directory; ST29 streams them through parse →
  * canonical-url gate → extraction → admission against a standing
  * gram index; the run prints the countable outcomes.
  *
  * Run: sbt "runMain graft.examples.CrawlPipeline"
  * Expected output lines: see .claude/skills/verify/SKILL.md.
  */
object CrawlPipeline {

  private def rec(uri: String, body: String,
      date: String = "2026-08-16T00:00:00Z"): Array[Byte] = {
    val html = "<html><head><title>t</title><script>if(1<2){var x=\"</p>\";}</script>" +
      s"</head><body><p>$body</p><div>nav</div></body></html>"
    val payload = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(b); g.close(); bo.toByteArray
  }

  private def words(tag: String): String =
    (1 to 40).map(i => s"$tag$i").mkString(" ")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-crawldemo").toString
    // the standing corpus: an already-curated index
    graft.operators.GramIndex.writeGramIndex(
      Seq((1L, words("standing")), (2L, words("corpus")))
        .toDF("doc_id", "text"),
      s"$dir/idx", gram = 8, nBuckets = 4)

    // archive 1 (plain): fresh content, a blocked domain, spam, and a
    // stale capture that archive 2 recrawls
    val a1 = rec("https://news.example.org/a", words("alpha")) ++
      rec("https://SPAM-FARM.net./x?utm_source=feed", words("evil")) ++
      rec("https://news.example.org/b", Seq.fill(20)("spam").mkString(" ")) ++
      rec("https://shop.example.com/p?b=2&a=1#frag", words("stale"),
        date = "2026-08-01T00:00:00Z")
    // archive 2 (record-gzip): a mirror restating archive-1 content
    // through t36-collapsible noise, the recrawl of the stale page,
    // and a truncated record
    val full = rec("https://news.example.org/c", words("gamma"))
    val a2 = gz(rec("HTTPS://mirror.example.net:443/a-copy?utm_campaign=m",
        words("alpha"))) ++
      gz(rec("https://shop.example.com/p?a=1&b=2", words("freshened"),
        date = "2026-08-15T00:00:00Z")) ++
      gz(full.take(full.length - 40))
    new java.io.File(s"$dir/in").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/crawl-9.warc"), a1)
    Thread.sleep(1100)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/crawl-10.warc.gz"), a2)
    // and a dead archive: fully corrupt gzip
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/dead.warc.gz"),
      "never was gzip".getBytes("UTF-8"))

    val q = graft.streaming.Streams.crawlIngestStream(
        graft.sources.Sources.warcStream(spark, s"$dir/in", maxFilesPerTrigger = Some(1)),
        s"$dir/idx", s"$dir/out", block = Seq("spam-farm.net"))
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(s"$dir/out").cache()
    val byVerdict = out.groupBy($"verdict").count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(",")
    println(s"crawl_verdicts=$byVerdict")
    // the mirror of archive-1's admitted content is caught as
    // restated; the blocked domain never shows
    def idOf(u: String) = graft.functions.PortableHash.hash60Jvm(u)
    val mirror = out.where($"doc_id" ===
        idOf("https://mirror.example.net/a-copy"))
      .select($"verdict", $"novelty_ppm").collect()(0)
    println(s"crawl_mirror=${mirror.getString(0)}@${mirror.getLong(1)}ppm")
    val blockedSeen = out.where($"doc_id" ===
      idOf("https://spam-farm.net/x")).count()
    // truncated-record + dead-archive accounting straight off S8
    val raw = graft.sources.Sources.warc(spark, s"$dir/in")
    println(s"crawl_blocked_in_audit=$blockedSeen truncated_records=" +
      raw.where($"truncated").count())
    // the shop page was captured in BOTH archives; the archives
    // arrived in separate micro-batches, so each capture is its own
    // admission decision (a recrawl that lands later IS a content
    // update — it re-curates; captures within ONE batch collapse to
    // the latest by WARC-Date, which CrawlStreamSpec pins)
    val shop = out.where($"doc_id" === idOf("https://shop.example.com/p?a=1&b=2"))
      .select($"verdict").collect().map(_.getString(0)).toSeq
    println(s"crawl_recrawl=decisions:${shop.size}(${shop.distinct.mkString})")

    // O58: the politeness leg — robots.txt bodies fetched per host
    // gate paths the DOMAIN blocklist can't express (an allowed site
    // may still forbid /private/); one broadcast join + X21 check
    val robots = Seq(
      ("shop.example.com",
        "User-agent: graftbot\nDisallow: /private/\nAllow: /private/press/\n" +
          "Disallow: /*.pdf$\n"),
      ("mirror.example.net", "User-agent: *\nDisallow:\n")
    ).toDF("host", "robots_txt")
    val fetchQueue = Seq(
      "https://shop.example.com/p?a=1&b=2",
      "https://shop.example.com/private/cart",
      "https://shop.example.com/private/press/launch",
      "https://shop.example.com/catalog.pdf",
      "https://mirror.example.net/a-copy",
      "https://no-robots.example.org/free").toDF("url")
    val gated = graft.operators.Politeness.withRobotsVerdict(
      fetchQueue, graft.operators.Politeness.robotsRules(robots, agent = "graftbot"))
    val fetchable = gated.where($"robots_allowed").count()
    val polite = gated.where(!$"robots_allowed")
      .select($"url").collect().map(_.getString(0)).sorted.mkString(",")
    println(s"crawl_robots=fetchable:$fetchable blocked:[$polite]")

    // O59-O62: frontier discovery from a fresh batch (batch-read from
    // its own directory — the streaming loop above is untouched): a
    // hub page with outlinks, the host's sitemap, and a 301 whose
    // Location must fold into the frontier.
    val hubPayload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>hub <a href=\"/d\">d</a> <a href=\"../e\">e</a> " +
      "<a href='https://other.example.net/f'>f</a> " +
      "<a href=\"mailto:x@y.z\">m</a></p></body></html>").getBytes("UTF-8")
    val sitemapPayload = ("HTTP/1.1 200 OK\r\nContent-Type: application/xml\r\n\r\n" +
      "<?xml version=\"1.0\"?><urlset xmlns=\"s\">" +
      "<url><loc>https://news.example.org/s1</loc><priority>0.9</priority></url>" +
      "<url><loc>https://news.example.org/s2</loc></url></urlset>").getBytes("UTF-8")
    val redirPayload = ("HTTP/1.1 301 Moved Permanently\r\nLocation: /d\r\n\r\n")
      .getBytes("UTF-8")
    def rawRec(uri: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2026-08-16T01:00:00Z\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
    new java.io.File(s"$dir/disc").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/disc/disc-1.warc"),
      rawRec("https://news.example.org/hub/index.html", hubPayload) ++
        rawRec("https://news.example.org/sitemap.xml", sitemapPayload) ++
        rawRec("https://news.example.org/old", redirPayload))

    val disc = graft.operators.HttpPayload.withDecodedEntity(
      graft.operators.HttpPayload.withHttpMeta(
        graft.sources.Sources.warc(spark, s"$dir/disc")
          .where($"warc_type" === "response"), "payload"), "payload")
      .withColumn("location", graft.operators.HttpPayload.httpLocation($"payload"))
      .select($"target_uri".as("url"), $"http_status".as("status"),
        $"mime_type", $"location", $"html").cache()
    val outTargets = graft.operators.Links.outlinks(
        disc.where($"mime_type" === "text/html").select($"url", $"html"))
      .select($"target")
    val smTargets = graft.operators.Sitemaps.parse(
        disc.where($"mime_type" === "application/xml")
          .select($"url", $"html".as("xml")))
      .where($"same_host").select($"loc".as("target"))
    val redirTargets = graft.operators.Redirects.chains(
        disc.select($"url", $"status", $"location"))
      .where($"verdict" === "dangling").select($"final_url".as("target"))
    val fetched = disc.select($"url".as("target"))
    val frontier = outTargets.unionByName(smTargets).unionByName(redirTargets)
      .select(graft.operators.UrlCuration.canonicalUrl($"target").as("url"))
      .distinct()
      .join(fetched.select(
        graft.operators.UrlCuration.canonicalUrl($"target").as("url")),
        Seq("url"), "left_anti")
      .withColumn("priority", length($"url").cast("int"))
    val plan = graft.operators.Frontier.plan(frontier, perWave = 2)
      .orderBy($"host", $"wave", $"slot").collect()
    val waves = plan.map(r => s"${r.getAs[String]("host")}@${r.getAs[Long]("wave")}")
      .groupBy(identity).view.mapValues(_.length).toSeq.sorted
      .map { case (k, n) => s"$k:$n" }.mkString(",")
    println(s"crawl_frontier=discovered:${plan.length} plan[$waves]")
    spark.stop()
  }
}
