package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary round-16 bisect: which phase of the crawl probe carries
  * the 40 MiB task binaries / OOM — prep (crawlDocs) or the trigger.
  */
object R16Debug {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val phase = args.lift(1).getOrElse("prep")
    val n = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{CrawlIngest, GramIndex}

    val base = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text").cache()
    base.count()
    val docs = base.orderBy($"doc_id").limit(n)
      .select($"doc_id",
        when($"doc_id" % 2 === 0, regexp_replace($"text", "(\\S+)", "$1_r0"))
          .otherwise(regexp_replace($"text", "(\\S+)", "$1_new")).as("body"))
      .collect()
    val bo = new java.io.ByteArrayOutputStream()
    docs.foreach { r =>
      val id = r.getLong(0)
      val host = if (id % 10 == 0) "blocked-farm.net" else s"site$id.example.org"
      val html = s"<html><body><p>${r.getString(1)}</p><div>nav</div></body></html>"
      val payload = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      bo.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://$host/p/$id?utm_source=probe\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8"))
      bo.write(payload); bo.write("\r\n\r\n".getBytes("UTF-8"))
    }
    val archives = Seq(("a1.warc", bo.toByteArray)).toDF("path", "content").cache()
    archives.count()

    phase match {
      case "ser" =>
        import graft.operators.UrlCuration
        val records = graft.sources.Warc.records(archives).toDF()
        val resp = records
          .where($"warc_type" === "response" && !$"truncated" && $"target_uri" =!= "")
          .select($"target_uri".as("raw_url"), $"warc_date", $"path", $"offset", $"payload")
          .withColumn("url", UrlCuration.canonicalUrl($"raw_url"))
          .where($"url".isNotNull)
        val gated = UrlCuration.urlVerdicts(resp, "url", Nil, Seq("blocked-farm.net"))
          .where($"verdict" === "neutral" || $"verdict" === "allowed")
        val latest0 = gated.groupBy($"url")
          .agg(max_by($"payload", struct($"warc_date", $"path", $"offset")).as("_pay"))
        def measure(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val rdd = df.queryExecution.toRdd
          val counts = scala.collection.mutable.HashMap.empty[String, Int]
          val bo2 = new java.io.ByteArrayOutputStream()
          val oos = new java.io.ObjectOutputStream(bo2) {
            enableReplaceObject(true)
            override def replaceObject(obj: Object): Object = {
              val c = obj.getClass.getName
              counts(c) = counts.getOrElse(c, 0) + 1
              obj
            }
          }
          oos.writeObject(rdd); oos.close()
          println(s"r16debug.ser $name bytes=${bo2.size()}")
          counts.toSeq.sortBy(-_._2).take(12).foreach(p => println(s"  ${p._2}  ${p._1}"))
        }
        measure("C.gate", gated)
        measure("D.latest", latest0)
      case "stages" =>
        import graft.operators.{Html, HttpPayload, UrlCuration}
        val records = graft.sources.Warc.records(archives).toDF()
        val resp = records
          .where($"warc_type" === "response" && !$"truncated" && $"target_uri" =!= "")
          .select($"target_uri".as("raw_url"), $"warc_date", $"path", $"offset", $"payload")
          .withColumn("url", UrlCuration.canonicalUrl($"raw_url"))
          .where($"url".isNotNull)
        println("== A records ==");  records.count()
        println("== B canon ==");    resp.count()
        val gated = UrlCuration.urlVerdicts(resp, "url", Nil, Seq("blocked-farm.net"))
          .where($"verdict" === "neutral" || $"verdict" === "allowed")
        println("== C gate ==");     gated.count()
        val latest0 = gated.groupBy($"url")
          .agg(max_by($"payload", struct($"warc_date", $"path", $"offset")).as("_pay"))
        println("== D latest ==");   latest0.count()
        val dec = HttpPayload.withDecodedEntity(latest0, "_pay").select($"url", $"html")
        println("== E decode ==");   dec.count()
        val ext = Html.htmlExtract(dec, "url", "html")
        println("== F extract ==");  ext.count()
      case "prep" =>
        val c = CrawlIngest.crawlDocs(
          graft.sources.Warc.records(archives).toDF(),
          block = Seq("blocked-farm.net")).count()
        println(s"r16debug.prep: docs=$c")
      case "prep-nonear" =>
        val c = CrawlIngest.crawlDocs(
          graft.sources.Warc.records(archives).toDF(),
          block = Seq("blocked-farm.net"), nearDupJaccard = None).count()
        println(s"r16debug.prep-nonear: docs=$c")
      case "trigger" =>
        val dir = java.nio.file.Files.createTempDirectory("graft-r16d").toString
        GramIndex.writeGramIndex(base.limit(5000), s"$dir/idx", gram = 8)
        val (_, t) = { val t0 = System.nanoTime()
          val r = graft.streaming.Streams.crawlIngestTrigger(
            archives, 0L, s"$dir/idx", s"$dir/out",
            Nil, Seq("blocked-farm.net"), 5L, 350000L, 100000L)
          (r, (System.nanoTime() - t0) / 1e9) }
        println(f"r16debug.trigger: $t%.2fs")
    }
    spark.stop()
  }
}
