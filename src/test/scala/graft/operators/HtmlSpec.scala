package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t34 HTML → text extraction on handcrafted adversarial markup:
  * script bodies holding literal markup, style rules, nested tags,
  * double-escaped entities, <br> boundaries, whitespace collapse.
  */
class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(html: String) =
    Html.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .select($"text", $"n_blocks", $"n_boiler", $"content_len")
      .collect()(0)

  test("script/style bodies are removed WHOLE — even when they contain literal markup") {
    val r = extract(
      "<html><head><style>p { margin: 0; } .nav > a { color: red; }</style>" +
        "<script>if (1<2) { var s = \"</p><p>injected\"; }</script></head>" +
        "<body><p>This paragraph is the only real content of the document.</p></body></html>")
    assert(r.getString(0) == "This paragraph is the only real content of the document.",
      s"got '${r.getString(0)}'")
    assert(r.getLong(1) == 1L, s"script-injected markup created blocks: ${r.getLong(1)}")
  }

  test("nested tags strip; block boundaries segment; <br> splits; whitespace collapses") {
    val r = Html.htmlBlocks(Seq((1L,
      "<div>A first block with <b>nested <i>inline</i> tags</b> kept as running text.</div>" +
        "<p>Second   block \t with    ragged whitespace collapsed to single spaces.</p>" +
        "<p>line one of the third block, long enough<br/>line two of the third block</p>"
    )).toDF("doc_id", "html")).orderBy($"block_idx")
      .select($"block_text").collect().map(_.getString(0)).toSeq
    assert(r == Seq(
      "A first block with nested inline tags kept as running text.",
      "Second block with ragged whitespace collapsed to single spaces.",
      "line one of the third block, long enough",
      "line two of the third block"), s"got $r")
  }

  test("<br> needs a name boundary: <brand>/<broadcast-player> are NOT line breaks") {
    val r = Html.htmlBlocks(Seq((1L,
      "<p>our <brand>acme</brand> product line stays one block of text" +
        "<br>while real breaks<br />with attributes<br class=\"x\">still split" +
        "<broadcast-player src=\"x\"></broadcast-player> inline element kept</p>"
    )).toDF("doc_id", "html")).orderBy($"block_idx")
      .select($"block_text").collect().map(_.getString(0)).toSeq
    assert(r == Seq(
      "our acme product line stays one block of text",
      "while real breaks",
      "with attributes",
      "still split inline element kept"), s"got $r")
  }

  test("entities decode once, named-first: &amp;lt; is the literal string &lt;, not <") {
    val r = extract(
      "<p>Tom &amp; Jerry say &quot;5 &lt; 6 &gt; 4&quot; and &#39;hi&#39;&nbsp;twice; " +
        "the escaped entity &amp;lt; survives as text.</p>")
    assert(r.getString(0) ==
      "Tom & Jerry say \"5 < 6 > 4\" and 'hi' twice; the escaped entity &lt; survives as text.",
      s"got '${r.getString(0)}'")
  }

  test("boilerplate flag: short chrome blocks flagged, content not; all-boiler doc keeps text=''") {
    val blocks = Html.htmlBlocks(Seq((1L,
      "<div>home</div><div>A content block comfortably past the thirty-char bar.</div>"
    )).toDF("doc_id", "html"))
    val flags = blocks.orderBy($"block_idx")
      .select($"is_boiler").collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(true, false), s"got $flags")
    val allBoiler = extract("<li>one</li><li>two</li>")
    assert(allBoiler.getString(0) == "" && allBoiler.getLong(2) == 2L &&
      allBoiler.getLong(3) == 0L, s"got $allBoiler")
  }

  test("content joins in document order; empty segments drop without renumbering gaps mattering") {
    val r = extract(
      "<p>First content block, long enough to clear the boiler bar.</p>" +
        "<p>   </p><p></p>" + // whitespace-only and empty segments
        "<p>Second content block, also long enough to clear the bar.</p>")
    assert(r.getString(0) ==
      "First content block, long enough to clear the boiler bar. " +
        "Second content block, also long enough to clear the bar.")
    assert(r.getLong(1) == 2L)
  }

  test("uppercase markup: <SCRIPT>/<STYLE> removed, </P>/<BR> are boundaries") {
    val r = Html.htmlBlocks(Seq((1L,
      "<SCRIPT>var s = \"</p>\"; if (1<2) {}</SCRIPT><STYLE>P{color:red}</STYLE>" +
        "<P>Upper-case paragraph one, long enough to clear the bar.</P>" +
        "<p>lower-case paragraph two, long enough<BR/>and its second line</p>"
    )).toDF("doc_id", "html")).orderBy($"block_idx")
      .select($"block_text").collect().map(_.getString(0)).toSeq
    assert(r == Seq(
      "Upper-case paragraph one, long enough to clear the bar.",
      "lower-case paragraph two, long enough",
      "and its second line"), s"got $r")
  }

  test("degenerate docs stay present: empty/NULL html and markup that cleans to nothing") {
    val df = Seq(
      (1L, "<p>Real content, long enough to clear the boiler bar fine.</p>"),
      (2L, ""),
      (3L, "<div>   </div><script>gone()</script>"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "html")
    val out = Html.htmlExtract(df).orderBy($"doc_id")
      .select($"doc_id", $"n_blocks", $"text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L),
      s"degenerate docs dropped: ${out.map(_._1)}")
    assert(out(0)._2 == 1L && out(0)._3.nonEmpty)
    assert(out.drop(1).forall(r => r._2 == 0L && r._3 == ""), s"got $out")
  }

  test("fuzz: arbitrary strings through htmlExtract hold the row-and-count invariants") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val soup: Gen[String] = for {
      n <- Gen.chooseNum(0, 300)
      cs <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.alphaNumChar, 2 -> Gen.oneOf('<', '>', '&', ';', '#'),
        1 -> Gen.oneOf('\n', '\r', '\t', ' '),
        1 -> Gen.oneOf("script", "style", "</p>", "<div", "&amp;", "<br>")
          .flatMap(s => Gen.oneOf(s.toSeq))))
    } yield cs.mkString
    val inputs = (0 until 120)
      .flatMap(i => soup.apply(Gen.Parameters.default, Seed(31L + i)))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val out = Html.htmlExtract(inputs.toDF("doc_id", "html")).collect()
    // every input doc present exactly once; counts and lengths cohere
    assert(out.length == inputs.length, s"${out.length} of ${inputs.length} docs survived")
    out.foreach { r =>
      val (nb, nboil, text, clen) =
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))
      assert(nboil <= nb && nb >= 0, s"counts incoherent: $r")
      assert(clen == text.length.toLong, s"content_len != length(text): $r")
      assert(!text.contains("\n"), s"unsplit boundary in content: $r")
    }
  }

  test("reserved output column on the input fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      Html.htmlBlocks(Seq((1L, "<p>x</p>", true)).toDF("doc_id", "html", "is_boiler"))
    }
    assert(ex.getMessage.contains("is_boiler"))
  }
}
