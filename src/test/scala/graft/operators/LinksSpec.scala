package graft.operators

import graft.SparkTestBase
import graft.functions.UrlOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** O59/X25: outlink extraction — href parsing, RFC 3986 resolution
  * (incl. exact remove_dot_segments at depths the bounded oracle twin
  * never sees), and the domain-edge rollup.
  */
class LinksSpec extends SparkTestBase {

  private def res(base: String, href: String): String = {
    val r = UrlOps.resolveUrl(UTF8String.fromString(base), UTF8String.fromString(href))
    if (r == null) null else r.toString
  }

  test("X25 resolution: absolute, protocol-relative, root-relative, merge") {
    val base = "https://www.ex.com/a/b/page.html?q=1#frag"
    assert(res(base, "https://other.org/x?z=1") == "https://other.org/x?z=1")
    assert(res(base, "HTTP://UP.ORG/Y") == "HTTP://UP.ORG/Y") // case preserved for canonicalUrl downstream
    assert(res(base, "//cdn.net/lib.js") == "https://cdn.net/lib.js")
    assert(res(base, "/root/x") == "https://www.ex.com/root/x")
    assert(res(base, "sib.html") == "https://www.ex.com/a/b/sib.html")
    assert(res(base, "./sib.html") == "https://www.ex.com/a/b/sib.html")
    assert(res(base, "../up.html") == "https://www.ex.com/a/up.html")
    assert(res(base, "c/d.html") == "https://www.ex.com/a/b/c/d.html")
    // query-only reference keeps the base's WHOLE path (RFC 3986
    // §5.2.2 — '?page=2' pages the same resource, not the directory)
    assert(res(base, "?page=2") == "https://www.ex.com/a/b/page.html?page=2")
    assert(res("https://ex.com", "?x=1") == "https://ex.com/?x=1")
  }

  test("X25 skips non-targets and strips fragments") {
    val base = "https://ex.com/a/"
    assert(res(base, "") == null)
    assert(res(base, "#top") == null)
    assert(res(base, "x#top") == "https://ex.com/a/x")
    assert(res(base, "mailto:a@b.c") == null)
    assert(res(base, "javascript:void(0)") == null)
    assert(res(base, "data:text/plain,hi") == null)
    assert(res(base, "tel:+123") == null)
    assert(res(base, "  /sp  ") == "https://ex.com/sp") // ASCII trim
    assert(res("no-frame", "/x") == null) // base without scheme://
    assert(res(base, null) == null)
  }

  test("X25 remove_dot_segments is exact at any depth") {
    val base = "https://h.com/a/b/c/d/e/page.html"
    // deeper than the oracle twin's bounded passes
    assert(res(base, "../../../../../../../../x") == "https://h.com/x")
    assert(res(base, "../../x/./y/../z") == "https://h.com/a/b/c/x/z")
    assert(res("https://h.com/", "..") == "https://h.com/")
    assert(res("https://h.com/a/b", ".") == "https://h.com/a/")
    assert(res("https://h.com/a/b/", "..") == "https://h.com/a/")
    // query of the target survives untouched; dots in the query stay
    assert(res(base, "../q?next=/a/../b") == "https://h.com/a/b/c/d/q?next=/a/../b")
    // empty segments are real segments ("a//b"): '..' pops one of them
    assert(res("https://h.com/a//b/", "../x") == "https://h.com/a//x")
    // authority-only base merges against '/'
    assert(res("https://h.com", "x") == "https://h.com/x")
    assert(res("https://h.com?q=1", "x") == "https://h.com/x")
  }

  test("href parse: quote forms, data-href decoy, empty href") {
    val df = spark.createDataFrame(Seq(
      (1L, "https://s.com/d/p.html",
        """<a href="dq.html">a</a><A HREF='sq.html'>b</A>""" +
          """<a data-href="https://evil.example/" href=bare.html>c</a>""" +
          """<a href="">empty</a><a name="x">none</a><a href="#f">frag</a>"""))).toDF("id", "url", "html")
    val out = Links.outlinks(df).orderBy("link_idx")
      .select("link_idx", "href", "target").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("dq.html", "sq.html", "bare.html"))
    assert(out.map(_.getString(2)).toSeq == Seq(
      "https://s.com/d/dq.html", "https://s.com/d/sq.html", "https://s.com/d/bare.html"))
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L)) // ordinals over all anchors
  }

  test("anchorTexts: tags stripped, entities decoded, empty text kept") {
    val df = spark.createDataFrame(Seq(
      (1L, "https://s.com/d/",
        "<a href=\"/x\">Read &amp; <b>more</b>  now</a>" +
          "<a href=\"/y\"><img src=\"i.png\"/></a><a name=\"z\">no link</a>")))
      .toDF("id", "url", "html")
    val out = Links.anchorTexts(df).orderBy("link_idx")
      .select("target", "anchor_text").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("https://s.com/x", "Read & more now"),
      ("https://s.com/y", "")))
  }

  test("outlinks: null html, no anchors, extra columns survive") {
    val df = spark.createDataFrame(Seq(
      (1L, "https://s.com/", null.asInstanceOf[String], "k1"),
      (2L, "https://s.com/", "<p>no links</p>", "k2"),
      (3L, "https://s.com/", "<a href=\"/x\">l</a>", "k3"))).toDF("id", "url", "html", "extra")
    val out = Links.outlinks(df)
    assert(out.columns.toSeq == Seq("id", "url", "extra", "link_idx", "href", "target"))
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("extra") == "k3")
  }

  test("domainEdges rolls up by registrable domain with distinct canonical urls") {
    val df = spark.createDataFrame(Seq(
      (1L, "https://a.src.com/p/",
        "<a href=\"https://x.out.org/1?b=2&a=1\">1</a>" +
          "<a href=\"https://x.out.org/1?a=1&b=2\">same-canon</a>" +
          "<a href=\"https://y.out.org/2\">2</a>"))).toDF("id", "url", "html")
    val e = Links.domainEdges(Links.outlinks(df)).collect()
    assert(e.length == 1)
    val r = e(0)
    assert(r.getAs[String]("src_domain") == "src.com")
    assert(r.getAs[String]("dst_domain") == "out.org")
    assert(r.getAs[Long]("n_links") == 3L)
    assert(r.getAs[Long]("n_urls") == 2L) // param order canonicalizes away
    assert(r.getAs[Long]("n_hosts") == 2L)
  }

  test("t38 runs on testdata and keeps the expected edge structure") {
    val out = graft.SparkEntry.queries("t38_outlinks")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every src domain links to example.org, example.net, and itself
    val bySrc = rows.groupBy(_.getAs[String]("src_domain"))
    bySrc.foreach { case (src, es) =>
      val dsts = es.map(_.getAs[String]("dst_domain")).toSet
      assert(dsts.contains("example.org"), s"$src missing example.org")
      assert(dsts.contains("example.net"), s"$src missing example.net")
      assert(dsts.contains(src), s"$src missing self edge")
    }
  }
}
