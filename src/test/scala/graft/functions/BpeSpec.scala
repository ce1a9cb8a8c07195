package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {

  test("merge table is derivation-consistent (constituents exist before use)") {
    val known = scala.collection.mutable.Set[String]()
    Bpe.merges.foreach { case (a, b) =>
      assert(a.length == 1 || known.contains(a), s"left '$a' used before derived")
      assert(b.length == 1 || known.contains(b), s"right '$b' used before derived")
      known += (a + b)
    }
    assert(Bpe.merges.nonEmpty && Bpe.merges.size == Bpe.merges.distinct.size)
  }

  test("hand-traced segmentations") {
    import spark.implicits._
    val df = Seq("the", "this", "thing", "and", "cat", "recorders", "xyzq")
      .toDF("w")
      .select($"w", expr(s"trim(${Bpe.sparkSegments("w")})").as("seg"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("the") == "the") // t h e -> th e -> the
    assert(m("this") == "this") // t h i s -> th i s -> th is -> this
    assert(m("thing") == "th ing") // th i n g -> th in g -> th ing
    assert(m("and") == "and") // a n d -> an d -> and
    assert(m("cat") == "c at")
    assert(m("recorders") == "re c or d ers")
    assert(m("xyzq") == "x y z q") // nothing merges
  }

  test("count over a word array sums per-word token counts") {
    import spark.implicits._
    val df = Seq("the thing and recorders").toDF("text")
      .select(expr(Bpe.sparkCount("filter(split(text, ' '), x -> x <> '')")).as("n"))
    // 1 + 2 + 1 + 5
    assert(df.head().getLong(0) == 9L)
  }

  test("codegen BpeCount equals the SQL replace-chain over the corpus") {
    import spark.implicits._
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val bad = docs.select(
      GraftExpressions.bpeCount($"text").as("fast"),
      expr(Bpe.sparkCount("filter(split(text, ' '), x -> x <> '')")).cast("long").as("sql")
    ).filter($"fast" =!= $"sql").count()
    assert(bad == 0, s"$bad docs diverge between expression and SQL chain")
  }

  test("property: expression == SQL chain on adversarial random strings") {
    import spark.implicits._
    // deterministic fuzz batch: ascii words, merge-prone fragments,
    // punctuation, repeated runs, and astral-plane chars (code-point
    // vs UTF-16-unit divergence is exactly what this guards)
    val rnd = new scala.util.Random(42)
    val frags = Seq("th", "the", "in", "and", "ers", "a", "tt", "hh", "  ",
      "x'y", "\"q\"", "...", "ththth", "ananan", "😀", "e😀r", "ü", "日本")
    val strings = (1 to 300).map { _ =>
      (0 to rnd.nextInt(12)).map(_ => frags(rnd.nextInt(frags.size))).mkString(
        if (rnd.nextBoolean()) " " else "")
    } :+ "" :+ " " :+ "😀😀😀"
    val bad = strings.toDF("text").select(
      GraftExpressions.bpeCount($"text").as("fast"),
      expr(Bpe.sparkCount("filter(split(text, ' '), x -> x <> '')")).cast("long").as("sql")
    ).filter($"fast" =!= $"sql").count()
    assert(bad == 0, s"$bad fuzz strings diverge between expression and SQL chain")
  }

  test("X15 encode: hand-traced ids (code points | MergeIdBase+rank, space=32)") {
    import spark.implicits._
    val ranks = Bpe.merges.zipWithIndex.map { case ((a, b), r) => (a + b) -> r }.toMap
    val ids = Seq("the cat").toDF("text")
      .select(GraftExpressions.bpeEncode($"text").as("ids"))
      .head().getSeq[Int](0)
    assert(ids == Seq(
      Bpe.MergeIdBase + ranks("the"), 32, 'c'.toInt, Bpe.MergeIdBase + ranks("at")))
  }

  test("X16 decode(encode(x)) == corpus normalization, corpus + fuzz") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val frags = Seq("th", "the", "in", "and", "ers", "a", "  ", "x'y", "...",
      "ththth", "😀", "e😀r", "ü", "日本", "\tq")
    val fuzz = (1 to 200).map { _ =>
      (0 to rnd.nextInt(10)).map(_ => frags(rnd.nextInt(frags.size))).mkString(
        if (rnd.nextBoolean()) " " else "")
    } :+ "" :+ "   " :+ "😀 😀"
    val docs = graft.tables.Tables.load(spark, sfDir, "documents").select($"text")
      .union(fuzz.toDF("text"))
    val bad = docs.select(
      GraftExpressions.bpeDecode(GraftExpressions.bpeEncode($"text")).as("rt"),
      concat_ws(" ", expr("filter(split(text, ' '), x -> x <> '')")).as("norm")
    ).filter($"rt" =!= $"norm").count()
    assert(bad == 0, s"$bad strings fail decode∘encode == normalization")
  }

  test("X15 size(encode) == bpe_count + (words - 1) separators, corpus-wide") {
    import spark.implicits._
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val bad = docs.select(
      size(GraftExpressions.bpeEncode($"text")).cast("long").as("n_enc"),
      (GraftExpressions.bpeCount($"text")
        + greatest(size(expr("filter(split(text, ' '), x -> x <> '')")).cast("long") - 1L,
          lit(0L))).as("expect")
    ).filter($"n_enc" =!= $"expect").count()
    assert(bad == 0, s"$bad docs break the size identity")
  }

  test("X15 codegen encode == engine-neutral SQL twin (replace chain + id CASE)") {
    import spark.implicits._
    // BMP-only fuzz for the Spark HOF twin (ascii() of an astral char
    // is the code point too, but the twin's job is the cross-engine
    // argument, and the DuckDB side is exercised by t26's oracle gate)
    val docs = graft.tables.Tables.load(spark, sfDir, "documents").select($"text")
      .union(Seq("the cat sat", "ththth and", "ü ber", "", " x  y ").toDF("text"))
    val bad = docs.select(
      GraftExpressions.bpeEncode($"text").as("fast"),
      expr(Bpe.sparkEncode("filter(split(text, ' '), x -> x <> '')"))
        .cast("array<int>").as("sql")
    ).filter(not($"fast" <=> $"sql")).count()
    assert(bad == 0, s"$bad strings diverge between codegen encode and SQL twin")
  }

  test("bpe_encode / bpe_decode registered as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT bpe_decode(bpe_encode('the thing and recorders')) AS rt").head()
    assert(r.getString(0) == "the thing and recorders")
  }

  test("overlapping pairs resolve left-to-right in both replace semantics") {
    // "a a a a" under a hypothetical (a,a) merge would become
    // "aa aa"; our table has no self-pair, but pin the left-to-right
    // scan that the cross-engine argument relies on
    assert("a a a a".replace("a a", "aa") == "aa aa")
  }
}
