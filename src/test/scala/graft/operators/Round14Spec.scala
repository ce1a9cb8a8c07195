package graft.operators

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Round-14 cross-surface pins that don't belong to a single
  * operator's spec: t30 novelty semantics on hand-built docs, and
  * its consistency with the t28 coordinates.
  */
class Round14Spec extends SparkTestBase {
  import spark.implicits._

  test("t30 semantics: a verbatim copy scores 0 ppm, fresh text 1e6 ppm, a half-copy in between") {
    // build a corpus/batch split in the query's own id regime
    // (corpus < 400, batch >= 400) from documents' real text so the
    // X15 tokenization is exercised on corpus content
    val real = Tables.load(spark, sfDir, "documents")
      .where($"doc_id" < 2).select($"doc_id", $"text")
      .collect().map(_.getString(1))
    val corpusText = real(0)
    val docs = Seq(
      (0L, corpusText),
      // verbatim copy of corpus doc 0 -> every 8-gram covered
      (400L, corpusText),
      // fresh text sharing no 8-gram with the corpus
      (401L, (1 to 40).map(i => s"zzq$i").mkString(" "))
    ).toDF("doc_id", "text")
    // run the query's own plan over a temp view... the canned query
    // reads the documents table, so rebuild its body inline via the
    // registered function on a swapped frame: reuse the same split
    // constants by writing the frame to a temp dir and pointing the
    // loader at it
    val dir = java.nio.file.Files.createTempDirectory("graft-t30").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("t30_gram_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(400L) == 0L, s"verbatim copy scored ${out(400L)} ppm, want 0")
    assert(out(401L) == 1000000L, s"fresh text scored ${out(401L)} ppm, want 1e6")
    assert(!out.contains(0L), "a corpus doc leaked into the batch-side output")
  }

  test("t30 coordinates agree with t28's: covered grams = dup grams when batch == corpus copy") {
    // for a batch doc that verbatim-copies a corpus doc, t30's
    // n_covered must equal the doc's total gram count, which is the
    // same [0, len-8] position range t28 stitches — pin the count
    // arithmetic against the tokenizer directly
    val d = Tables.load(spark, sfDir, "documents")
    val out = graft.SparkEntry.queries("t30_gram_novelty")(spark, sfDir)
    val nGrams = out.select($"doc_id", $"n_grams")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = d.where($"doc_id" >= 400)
      .select($"doc_id",
        (size(graft.functions.GraftExpressions.bpeEncode($"text")) - 7).cast("long").as("n"))
      .where($"n" >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nGrams == expect && nGrams.nonEmpty,
      s"t30 gram totals disagree with the tokenizer (${nGrams.size} vs ${expect.size})")
    // and every novelty value is a valid exact ppm
    val bad = out.where($"novelty_ppm" < 0 || $"novelty_ppm" > 1000000)
    assert(bad.isEmpty)
  }
}
