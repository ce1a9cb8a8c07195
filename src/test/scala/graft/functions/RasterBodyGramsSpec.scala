package graft.functions

import graft.SparkTestBase
import graft.operators.Multimodal
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** X12 RasterBodyGrams: the one-pass codegen header-walk + gram-set
  * must be value-identical to the independent reference formulation
  * it replaced (decodeBodies' mapPartitions hex materialization + the
  * array_distinct(transform(sequence(...))) HOF chain), the mod-16
  * sketch must equal the engine-neutral list filter, and the
  * generator-layout assumptions the m08 DuckDB oracle hard-codes must
  * hold for every payload the generator emits.
  */
class RasterBodyGramsSpec extends SparkTestBase {

  private def payloads = Multimodal.imagePayloads(spark, sfDir)

  test("X12 grams == decodeBodies + HOF chain (format and gram array), width 8") {
    import spark.implicits._
    val viaExpr = payloads
      .select($"doc_id",
        GraftExpressions.rasterBodyGrams($"payload", 8).as("rb"))
      .where($"rb".isNotNull)
      .select($"doc_id", $"rb.format".as("format"), $"rb.grams".as("grams"))
    val viaRef = Multimodal.decodeBodies(payloads).toDF()
      .where(length($"body_hex") >= 16)
      .select($"doc_id", $"format",
        array_distinct(expr(
          "transform(sequence(1L, length(body_hex) div 2 - 7), i -> substr(body_hex, CAST(2 * i - 1 AS INT), 16))"))
          .as("grams"))
    val e = viaExpr.withColumnRenamed("format", "fe").withColumnRenamed("grams", "ge")
    val r = viaRef.withColumnRenamed("format", "fr").withColumnRenamed("grams", "gr")
    val joined = e.join(r, "doc_id")
    assert(viaExpr.count() == viaRef.count())
    // first-occurrence order must match too (array equality is ordered)
    assert(joined.where($"fe" =!= $"fr" || $"ge" =!= $"gr").isEmpty)
  }

  test("X12 sketch == list-filter of grams on trailing hex '0', order preserved") {
    import spark.implicits._
    val bad = payloads
      .select(GraftExpressions.rasterBodyGrams($"payload", 8).as("rb"))
      .where($"rb".isNotNull)
      .where($"rb.sketch" =!=
        expr("filter(rb.grams, s -> substring(s, 16, 1) = '0')"))
      .count()
    assert(bad == 0)
  }

  test("X12 null for unknown containers and sub-width bodies") {
    import spark.implicits._
    val rows = Seq(
      // unknown magic
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16),
      // GIF8 magic but body of 5 bytes < width 8
      ("GIF89a".getBytes("ASCII") ++ Array.fill[Byte](7)(0) ++
        Array[Byte](1, 2, 3, 4, 5)),
      // GIF8 magic with exactly 8 body bytes -> one gram, NOT null
      ("GIF89a".getBytes("ASCII") ++ Array.fill[Byte](7)(0) ++
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    ).toDF("payload")
    val out = rows
      .select(GraftExpressions.rasterBodyGrams($"payload", 8).as("rb"))
      .select($"rb".isNull.as("n"), size($"rb.grams").as("g"))
      .collect()
    assert(out(0).getBoolean(0) && out(1).getBoolean(0))
    assert(!out(2).getBoolean(0) && out(2).getInt(1) == 1)
  }

  test("generator layout pins the m08 oracle's strt simplifications") {
    import spark.implicits._
    // The oracle takes the FIRST JPEG marker segment as the SOF and
    // classifies any non-PNG/non-JPEG payload as GIF with strt=13.
    // That is exact only while the generator emits SOI+SOF0 JPEGs
    // (no APPn) and GIF89a for every doc_id % 3 == 2. Pin it.
    val bad = payloads
      .select($"doc_id", hex($"payload").as("hp"))
      .withColumn("cls", pmod($"doc_id", lit(3)))
      .where(
        (col("cls") === 0 && substring($"hp", 1, 16) =!= "89504E470D0A1A0A") ||
        (col("cls") === 1 && substring($"hp", 1, 8) =!= "FFD8FFC0") ||
        (col("cls") === 2 &&
          (substring($"hp", 1, 12) =!= "474946383961" || length($"hp") < 26)))
      .count()
    assert(bad == 0)
  }

  test("m08 finds every re-containered identical body as jaccard 1.0") {
    import spark.implicits._
    // Body = text bytes, so two docs with identical text but different
    // containers are exactly the pairs the operator exists for: each
    // must surface with jaccard == 1.0 and cross_container = true.
    val docs = Tables.load(spark, sfDir, "documents")
      .where(length($"text") >= 8)
    val expected = docs.select($"doc_id".as("id_a"), $"text")
      .join(docs.select($"doc_id".as("id_b"), $"text"), Seq("text"))
      .where($"id_a" < $"id_b")
      .where(pmod($"id_a", lit(3)) =!= pmod($"id_b", lit(3)))
      .select($"id_a", $"id_b")
    val m08 = graft.SparkEntry.queries("m08_container_invariant_dup")(spark, sfDir)
    val found = m08.where($"cross_container" && $"jaccard" === 1.0)
      .select($"id_a", $"id_b")
    assert(expected.exceptAll(found).isEmpty,
      "an identical-body cross-container pair was missed")
    spark.catalog.clearCache()
  }
}
