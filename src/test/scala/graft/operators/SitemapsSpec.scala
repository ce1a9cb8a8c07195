package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** O60: sitemap parsing — urlset and sitemapindex roots, mandatory
  * loc, entity decode, same-host policy flag, malformed inputs.
  */
class SitemapsSpec extends SparkTestBase {

  private val base = "https://www.ex.com/sitemap.xml"

  test("urlset entries: loc decode, optional fields, same-host flag") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url><loc>https://www.ex.com/a?x=1&amp;y=2</loc>
        |   <lastmod>2025-03-04</lastmod><changefreq>daily</changefreq>
        |   <priority>0.8</priority></url>
        | <url><loc>  https://spam.example.org/z  </loc></url>
        | <url><lastmod>2025-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val df = spark.createDataFrame(Seq((1L, base, xml))).toDF("id", "url", "xml")
    val out = Sitemaps.parse(df).orderBy("ord").collect()
    assert(out.length == 2) // the loc-less entry is dropped
    val r0 = out(0)
    assert(r0.getAs[String]("kind") == "url")
    assert(r0.getAs[String]("loc") == "https://www.ex.com/a?x=1&y=2")
    assert(r0.getAs[String]("lastmod") == "2025-03-04")
    assert(r0.getAs[String]("changefreq") == "daily")
    assert(r0.getAs[Double]("priority") == 0.8)
    assert(r0.getAs[Boolean]("same_host"))
    val r1 = out(1)
    assert(r1.getAs[String]("loc") == "https://spam.example.org/z") // whitespace trimmed
    assert(!r1.getAs[Boolean]("same_host"))
    assert(r1.isNullAt(r1.fieldIndex("priority")))
  }

  test("sitemapindex entries come out kind=sitemap") {
    val xml = "<sitemapindex xmlns=\"x\"><sitemap>" +
      "<loc>https://www.ex.com/maps/a.xml</loc><lastmod>2025-01-02</lastmod>" +
      "</sitemap><sitemap><loc>https://www.ex.com/maps/b.xml</loc></sitemap></sitemapindex>"
    val df = spark.createDataFrame(Seq((1L, base, xml))).toDF("id", "url", "xml")
    val out = Sitemaps.parse(df).orderBy("ord").collect()
    assert(out.map(_.getAs[String]("kind")).toSeq == Seq("sitemap", "sitemap"))
    assert(out.map(_.getAs[String]("loc")).toSeq ==
      Seq("https://www.ex.com/maps/a.xml", "https://www.ex.com/maps/b.xml"))
    assert(out(0).getAs[String]("lastmod") == "2025-01-02")
    assert(out(1).isNullAt(out(1).fieldIndex("lastmod")))
  }

  test("non-sitemap and null xml contribute no rows") {
    val df = spark.createDataFrame(Seq(
      (1L, base, "<html><body><url><loc>https://x/</loc></url></body></html>"),
      (2L, base, null.asInstanceOf[String]),
      (3L, base, "<urlset><url><loc>https://www.ex.com/ok</loc></url></urlset>")))
      .toDF("id", "url", "xml")
    val out = Sitemaps.parse(df).collect()
    assert(out.length == 1 && out(0).getAs[Long]("id") == 3L)
  }

  test("sitemapDirectives: case/indent/tab tolerance, comments, invalids") {
    val txt = "User-agent: *\nDisallow: /x\n" +
      "SITEMAP: https://www.ex.com/a.xml\n" +
      "\t sitemap :https://cdn.ex.net/b.xml\r\n" +
      "# Sitemap: https://nope.ex.org/c.xml\n" +
      "Sitemap: /relative.xml\n"
    val df = spark.createDataFrame(Seq((1L, "www.ex.com", txt)))
      .toDF("id", "host", "robots_txt")
    val out = Sitemaps.sitemapDirectives(df).orderBy("ord").collect()
    assert(out.map(_.getAs[String]("sitemap_url")).toSeq == Seq(
      "https://www.ex.com/a.xml", "https://cdn.ex.net/b.xml", "/relative.xml"))
    assert(out.map(r => Option(r.getAs[String]("sitemap_host"))).toSeq == Seq(
      Some("www.ex.com"), Some("cdn.ex.net"), None))
  }

  test("t44: directive counts per doc family") {
    val out = graft.SparkEntry.queries("t44_robots_sitemaps")(spark, sfDir).cache()
    // every doc: 1 same-host directive; every 4th: +1 cdn; every 5th: +1 invalid
    val bad = out.groupBy(org.apache.spark.sql.functions.col("doc_id"))
      .count().collect().filter { r =>
        val id = r.getLong(0)
        val expect = 1L + (if (id % 4 == 0) 1L else 0L) + (if (id % 5 == 0) 1L else 0L)
        r.getLong(1) != expect
      }
    assert(bad.isEmpty, bad.take(3).mkString(","))
    assert(out.where("NOT valid AND doc_id % 5 != 0").count() == 0L)
    out.unpersist()
  }

  test("t39 runs on testdata: urlset docs yield 3 entries, index docs 2") {
    val out = graft.SparkEntry.queries("t39_sitemap")(spark, sfDir)
    val byDoc = out.groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n")).collect()
    byDoc.foreach { r =>
      val (docId, kind, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      if (docId % 7 == 0) assert(kind == "sitemap" && n == 2L, s"doc $docId")
      else assert(kind == "url" && n == 3L, s"doc $docId")
    }
  }
}
