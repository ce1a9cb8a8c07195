package graft.functions

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Custom expressions must be bit-identical to their composed-builtin
  * formulations (that's what keeps the DuckDB oracles valid).
  */
class ExpressionsSpec extends SparkTestBase {

  test("fused CosineSimilarity == three-fold formulation, bit-exact, all pairs") {
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
    val a = e.select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("eb"))
    val joined = a.join(b, $"ia" < $"ib").limit(5000)
    val diffs = joined
      .withColumn("fused", GraftExpressions.cosineSim($"ea", $"eb"))
      .withColumn("folded", VectorFunctions.cosineFold("ea", "eb"))
      .filter($"fused" =!= $"folded") // bit-exact double comparison
      .count()
    assert(diffs == 0)
  }

  test("RollingPolyHash == split/aggregate fold, all documents") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val diffs = docs
      .withColumn("fast", GraftExpressions.polyHash($"text"))
      .withColumn(
        "slow",
        expr(
          "aggregate(transform(filter(split(text, ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT)), " +
            "CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % 1000000007)"
        )
      )
      .filter($"fast" =!= $"slow")
      .count()
    assert(diffs == 0)
  }

  test("SimHashAgg == 64 column-wise sums") {
    import spark.implicits._
    val tok = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
      .withColumn("h", xxhash64($"w"))
    val viaAgg = tok.groupBy($"doc_id")
      .agg(GraftExpressions.simHashAgg($"h").as("sim"))
    val bitAggs = (0 until 64).map(i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val sums = tok.groupBy($"doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val simhash = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val viaCols = sums.select($"doc_id", simhash.as("sim"))
    assert(viaAgg.except(viaCols).count() == 0 && viaCols.except(viaAgg).count() == 0)
  }

  test("expressions survive codegen (no interpreted fallback errors)") {
    import spark.implicits._
    // force a plan through WholeStageCodegen with both expressions
    val e = Tables.load(spark, sfDir, "embeddings").limit(10)
    val out = e.select(GraftExpressions.cosineSim($"embedding", $"embedding").as("c")).collect()
    assert(out.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val h = Tables.load(spark, sfDir, "documents").limit(10)
      .select(GraftExpressions.polyHash($"text")).collect()
    assert(h.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 1000000007L))
  }

  test("WordShingles == filter/transform/array_distinct HOF chain, all documents") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val viaHof = docs
      .withColumn("words", org.apache.spark.sql.functions.expr(
        "filter(split(text, ' '), x -> x <> '')"))
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        "CASE WHEN size(words) >= 3 THEN array_distinct(transform(slice(words, 1, size(words) - 2), " +
          "(x, i) -> concat(x, ' ', words[i + 1], ' ', words[i + 2]))) ELSE array() END").as("sh"))
    val viaExpr = docs.select($"doc_id",
      GraftExpressions.wordShingles($"text", 3, distinct = true).as("sh"))
    assert(viaExpr.except(viaHof).count() == 0 && viaHof.except(viaExpr).count() == 0)
    // non-distinct keeps duplicates (multiset equality via explode counts)
    val dupHof = docs
      .withColumn("words", org.apache.spark.sql.functions.expr(
        "filter(split(text, ' '), x -> x <> '')"))
      .where(org.apache.spark.sql.functions.size($"words") >= 3)
      .select($"doc_id", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "transform(slice(words, 1, size(words) - 2), (x, i) -> concat(x, ' ', words[i + 1], ' ', words[i + 2]))"))
        .as("s"))
      .groupBy("doc_id", "s").count()
    val dupExpr = docs.select($"doc_id", org.apache.spark.sql.functions.explode(
      GraftExpressions.wordShingles($"text", 3, distinct = false)).as("s"))
      .groupBy("doc_id", "s").count()
    assert(dupExpr.except(dupHof).count() == 0 && dupHof.except(dupExpr).count() == 0)
    // edge cases: consecutive/leading/trailing spaces, short docs, empty
    val edge = Seq("a  b   c d", "  x y   z  ", "one two", "", "   ").toDF("text")
    val got = edge.select(GraftExpressions.wordShingles($"text", 3, distinct = true)).collect()
      .map(_.getSeq[String](0).toList)
    assert(got(0) == List("a b c", "b c d"))
    assert(got(1) == List("x y z"))
    assert(got(2) == Nil && got(3) == Nil && got(4) == Nil)
  }

  test("NibbleHistogram == the hex/instr formulation over real payloads") {
    import spark.implicits._
    // the equivalence the m07 rewrite rests on: (b & 0xF0) >>> 4 ==
    // the odd-position hex digit decode, byte for byte
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
    val viaExpr = docs
      .select($"doc_id", posexplode(GraftExpressions.nibbleHistogram($"payload"))
        .as(Seq("bin", "n")))
      .where($"n" > 0)
      .select($"doc_id", $"bin".cast("int").as("bin"), $"n")
    val viaHex = docs
      .select($"doc_id", hex($"payload").as("hp"))
      .select($"doc_id", explode(sequence(lit(1), length($"hp"), lit(2))).as("i"), $"hp")
      .select($"doc_id",
        (expr("instr('0123456789ABCDEF', substr(hp, i, 1))") - 1).cast("int").as("bin"))
      .groupBy($"doc_id", $"bin").agg(count(lit(1)).as("n"))
    assert(viaExpr.count() > 0)
    assert(viaExpr.except(viaHex).count() == 0 && viaHex.except(viaExpr).count() == 0)
    // handcrafted bytes: one per nibble bucket + empties
    val h = Seq(Array[Byte](0x00, 0x10, 0x1F, 0x7F, -1 /*0xFF*/))
      .toDF("p").select(GraftExpressions.nibbleHistogram($"p").as("h"))
      .head().getSeq[Long](0)
    assert(h(0) == 1 && h(1) == 2 && h(7) == 1 && h(15) == 1 && h.sum == 5)
    val zero = Seq(Array.empty[Byte]).toDF("p")
      .select(GraftExpressions.nibbleHistogram($"p").as("h")).head().getSeq[Long](0)
    assert(zero.sum == 0 && zero.length == 16)
  }

  test("null handling: cosine of null array is null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(GraftExpressions.cosineSim($"a", $"b")).head()
    assert(r.isNullAt(0))
  }
}

/** SQL-surface registration of the custom expressions. */
class ExtensionsSpec extends graft.SparkTestBase {
  test("cosine_sim and poly_hash callable from SQL after registration") {
    GraftExtensions.register(spark)
    graft.tables.Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb")
    val r = spark.sql(
      "SELECT vec_id, cosine_sim(embedding, embedding) AS c FROM emb LIMIT 5").collect()
    assert(r.nonEmpty && r.forall(x => math.abs(x.getDouble(1) - 1.0) < 1e-9))
    graft.tables.Tables.load(spark, sfDir, "documents").createOrReplaceTempView("docs")
    val h = spark.sql("SELECT poly_hash(text) AS h FROM docs LIMIT 5").collect()
    assert(h.forall(x => x.getLong(0) >= 0 && x.getLong(0) < 1000000007L))
  }

  test("word_shingles / minhash_hex / bpe_count / nibble_histogram callable from SQL") {
    import spark.implicits._
    GraftExtensions.register(spark)
    graft.tables.Tables.load(spark, sfDir, "documents").createOrReplaceTempView("docs2")
    // each SQL call must equal its Column-API twin, row for row
    val sqlSide = spark.sql(
      """SELECT doc_id, word_shingles(text, 3) AS sh,
        minhash_hex(word_shingles(text, 3), 16) AS mh,
        bpe_count(text) AS bpe,
        nibble_histogram(CAST(text AS BINARY)) AS nh
        FROM docs2""")
    val apiSide = graft.tables.Tables.load(spark, sfDir, "documents")
      .select($"doc_id",
        GraftExpressions.wordShingles($"text", 3, distinct = true).as("sh"),
        GraftExpressions.minHashHex(
          GraftExpressions.wordShingles($"text", 3, distinct = true), 16).as("mh"),
        GraftExpressions.bpeCount($"text").as("bpe"),
        GraftExpressions.nibbleHistogram($"text".cast("binary")).as("nh"))
    assert(sqlSide.count() > 0)
    assert(sqlSide.except(apiSide).count() == 0 && apiSide.except(sqlSide).count() == 0)
    // literal-arg guard: a non-literal n must fail loudly, not misparse
    val err = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, CAST(doc_id AS INT)) FROM docs2").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("MinHashHex == the 16x array_min(transform(md5)) HOF chain, all documents") {
    import spark.implicits._
    val sh = Tables.load(spark, sfDir, "documents")
      .select($"doc_id",
        GraftExpressions.wordShingles($"text", 3, distinct = true).as("sh"))
      .where(org.apache.spark.sql.functions.size($"sh") > 0)
    val viaHof = sh.select(
      ($"doc_id" +: (0 until 16).map(i =>
        org.apache.spark.sql.functions.expr(
          s"array_min(transform(sh, x -> substring(md5(concat(x, '|$i')), 1, 16)))").as(s"mh$i"))): _*)
    val viaExpr = sh
      .select($"doc_id", GraftExpressions.minHashHex($"sh", 16).as("mh"))
      .select(($"doc_id" +: (0 until 16).map(i =>
        org.apache.spark.sql.functions.element_at($"mh", i + 1).as(s"mh$i"))): _*)
    assert(viaExpr.count() > 0)
    assert(viaExpr.except(viaHof).count() == 0 && viaHof.except(viaExpr).count() == 0)
    // null on empty arrays, like array_min over an empty transform
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(GraftExpressions.minHashHex($"sh", 16).as("mh")).collect()
    assert(empty.head.isNullAt(0))
  }

  test("WordCount agrees with WordShingles' tokenizer, all documents + edges") {
    import spark.implicits._
    // the load-bearing agreement: wordCount(text) >= n  <=>
    // size(wordShingles(text, n, _)) > 0 — shingleArrays' cheap
    // pre-filter stands in for the doubled shingle build
    val docs = Tables.load(spark, sfDir, "documents")
    Seq(3, 5, 8).foreach { n =>
      val disagree = docs
        .withColumn("byCount", GraftExpressions.wordCount($"text") >= n)
        .withColumn("byShingles",
          size(GraftExpressions.wordShingles($"text", n, distinct = true)) > 0)
        .filter($"byCount" =!= $"byShingles")
        .count()
      assert(disagree == 0, s"n=$n: WordCount gate drifted from WordShingles")
    }
    // exact counts vs the HOF formulation
    val hofDiff = docs
      .withColumn("fast", GraftExpressions.wordCount($"text"))
      .withColumn("hof", size(expr("filter(split(text, ' '), x -> x <> '')")).cast("long"))
      .filter($"fast" =!= $"hof").count()
    assert(hofDiff == 0)
    // edge cases: runs of spaces, leading/trailing, empty, null
    val edge = Seq("a  b   c d", "  x y   z  ", "one", "", "   ").toDF("text")
    val got = edge.select(GraftExpressions.wordCount($"text")).collect().map(_.getLong(0))
    assert(got.toList == List(4L, 3L, 1L, 0L, 0L))
    val nul = Seq[Option[String]](None).toDF("text")
      .select(GraftExpressions.wordCount($"text")).head
    assert(nul.isNullAt(0))
  }
}
