package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O56: the ADMISSION decision — the composition point where the
  * curation signals this library computes separately (quality ratios,
  * t02/t12; batch novelty vs the standing corpus, t30/O55) become the
  * pipeline's actual verdict per incoming doc: admit, reject for
  * quality, or reject as restated corpus content. This is the step a
  * live ingestion DAG runs per micro-batch (ST27 wraps it in the
  * probe-then-append-admitted loop), and the batch rescan form is
  * oracle-gated as t33_curate_admission.
  *
  * Two novelty legs share ONE verdict tail so they cannot drift:
  *  - [[curateAgainstCorpus]] rescans a standing corpus frame (t30's
  *    plan — the batch's distinct gram set broadcasts, the corpus
  *    gram stream is left-semi restricted BEFORE its distinct, the
  *    covered set broadcasts back; corpus scanned once, nothing
  *    corpus-scaled shuffles) — the oracle-checkable form;
  *  - [[curateBatch]] serves the same verdicts from O52's stored gram
  *    counts (GramIndex.noveltyFromIndex — zero corpus rescans), the
  *    at-scale serving form; CurationSpec pins the two equal on the
  *    same split.
  *
  * Verdict semantics (all thresholds exact integers — ppm, counts):
  *  - quality gate first: n_words >= minWords AND uniq_ppm >=
  *    minUniqPpm (t02's uniqueness ratio in exact ppm). Failing docs
  *    are 'rejected_quality' with novelty_ppm = -1: their novelty is
  *    NEVER computed (no wasted gram work on spam) and they must
  *    never enter the index.
  *  - novelty gate second: quality-passing docs shorter than the gram
  *    width have nothing to cover and count as FULLY novel (1e6 ppm);
  *    novelty_ppm < minNoveltyPpm -> 'rejected_novelty' (restated
  *    corpus content — the memorization/contamination risk t30
  *    measures); else 'admitted'.
  */
object Curation {

  /** The shared verdict tail: quality columns + a supplied novelty
    * frame (doc_id, ..., novelty_ppm — only quality-passing docs need
    * rows) joined back onto the batch. Output: (doc_id, n_words,
    * uniq_ppm, novelty_ppm, verdict), one row per batch doc.
    */
  private def verdicts(
      docs: DataFrame,
      noveltyOfQualityPassing: DataFrame => DataFrame,
      minWords: Long,
      minUniqPpm: Long,
      minNoveltyPpm: Long): DataFrame = {
    val m = docs
      .withColumn("_w", expr(TextAnalysis.sparkWords))
      .withColumn("n_words", size(col("_w")).cast("long"))
      .withColumn("_nu", size(array_distinct(col("_w"))).cast("long"))
      .withColumn("uniq_ppm",
        when(col("n_words") > 0L, expr("_nu * 1000000 div n_words"))
          .otherwise(lit(0L)))
      .withColumn("_qok",
        col("n_words") >= minWords && col("uniq_ppm") >= minUniqPpm)
      .select(col("doc_id"), col("n_words"), col("uniq_ppm"), col("_qok"))
    val nov = noveltyOfQualityPassing(
        docs.join(m.where(col("_qok")).select(col("doc_id")), Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), col("novelty_ppm").as("_nov"))
    m.join(nov, Seq("doc_id"), "left")
      .withColumn("novelty_ppm",
        when(!col("_qok"), lit(-1L))
          .otherwise(coalesce(col("_nov"), lit(1000000L))))
      .withColumn("verdict",
        when(!col("_qok"), lit("rejected_quality"))
          .when(col("novelty_ppm") < minNoveltyPpm, lit("rejected_novelty"))
          .otherwise(lit("admitted")))
      .select(col("doc_id"), col("n_words"), col("uniq_ppm"),
        col("novelty_ppm"), col("verdict"))
  }

  /** t30's rescan novelty plan as THE shared leg (the t30 query calls
    * this — one body, no drift): per batch doc, the exact-ppm
    * fraction of its token-`gram`-grams absent from `corpus`; the
    * batch's distinct gram set broadcasts, the corpus gram stream is
    * left-semi restricted against it BEFORE its distinct (covered set
    * batch-bounded), then GramIndex.noveltyTail counts totals and
    * covered in one pass. Identical output shape to noveltyFromIndex.
    */
  def noveltyRescan(batch: DataFrame, corpus: DataFrame, gram: Int = 8): DataFrame = {
    val bg = GramIndex.gramsOf(batch, gram)
    val bset = bg.select(col("g")).distinct()
    val covSet = GramIndex.gramsOf(corpus, gram).select(col("g"))
      .join(broadcast(bset), Seq("g"), "left_semi")
      .distinct()
    GramIndex.noveltyTail(bg, covSet, Seq("g"))
  }

  /** Admission verdicts with the novelty leg RESCANNING a standing
    * corpus frame — the oracle-checkable form (t33).
    */
  def curateAgainstCorpus(
      batch: DataFrame,
      corpus: DataFrame,
      minWords: Long = 5L,
      minUniqPpm: Long = 350000L,
      minNoveltyPpm: Long = 100000L,
      gram: Int = 8): DataFrame =
    verdicts(batch, b => noveltyRescan(b, corpus, gram),
      minWords, minUniqPpm, minNoveltyPpm)

  /** Admission verdicts served from O52's STORED gram counts — zero
    * corpus rescans; the ST27 per-trigger form. Equal to
    * [[curateAgainstCorpus]] over the indexed corpus (CurationSpec).
    */
  def curateBatch(
      batch: DataFrame,
      index: GramIndex.GramIndexHandle,
      minWords: Long = 5L,
      minUniqPpm: Long = 350000L,
      minNoveltyPpm: Long = 100000L): DataFrame =
    verdicts(batch, b => GramIndex.noveltyFromIndex(b, index),
      minWords, minUniqPpm, minNoveltyPpm)
}
