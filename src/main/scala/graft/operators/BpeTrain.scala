package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O53: BPE merge-table TRAINING (t29) — the step that produces what
  * X15/graft.functions.Bpe consume. The committed merge table
  * (bpe_merges.txt) is applied by the tokenize/pack/count surfaces;
  * a real pipeline LEARNS that table from its own corpus (Sennrich et
  * al., ACL'16): iteratively take the most frequent adjacent symbol
  * pair and fuse it, starting from per-code-point symbols.
  *
  * Spark-first formulation (the e10 bounded-driver-state discipline):
  *
  *  - ONE corpus pass builds the (word, freq) vocabulary — after
  *    that, every iteration works on the DISTINCT-word table, which
  *    is vocabulary-bounded (Heaps' law: sublinear in the corpus), so
  *    training cost does not scale with corpus size beyond the first
  *    aggregation;
  *  - per iteration: one map-side-combinable pair-count aggregation
  *    (adjacent symbol pairs weighted by word freq, exact int64) and
  *    one top-1 reduction — driver state is exactly the argmax row
  *    (the growing merge table itself: nMerges rows, never
  *    corpus-scaled);
  *  - the chosen pair is fused with the SAME non-overlapping
  *    left-to-right double-`replace` over the sentinel-padded symbol
  *    string that graft.functions.Bpe's apply chain uses (see its
  *    scaladoc for the repair-pass argument) — so a learned table is
  *    derivation-consistent BY CONSTRUCTION (a merge's constituents
  *    are single code points or earlier fusions, because that is all
  *    the state ever contains) and drops straight into the X15
  *    encoder's id scheme (BpeTrainSpec pins both).
  *
  * Determinism / oracle parity: counts are exact int64; the argmax
  * tiebreak is (count desc, left asc, right asc) over UTF-8 binary
  * string order (identical in Spark and DuckDB); `replace` scans
  * left-to-right over non-overlapping occurrences in both engines.
  * No fp anywhere, so the whole trajectory — and therefore the
  * learned table — is engine-replayable exactly; the t29 oracle
  * unrolls the identical iterations as CTEs (e10's pattern).
  *
  * Fusion semantics are SCAN-ORDER-DEFINED, the committed Bpe
  * convention (see graft.functions.Bpe's scaladoc): within a run of
  * ≥ 5 identical symbols under a self-pair, a replacement consumes
  * the run's shared sentinel space, so " a a a a a " fuses to
  * [aa, a, aa] where canonical leftmost-pairing gives [aa, aa, a] —
  * token COUNTS are identical, tie-POSITIONS differ. This is the
  * deliberate trade: the scan semantics are a native `replace` in
  * both engines (bit-identical, codegen-able), and the learned table
  * is self-consistent because training-time fusion and X15 apply-time
  * segmentation follow the same committed convention. BpeTrainSpec
  * pins the ≥5-run trajectory explicitly.
  *
  * All state uses Column-built plans (functions.replace with literal
  * Columns, never SQL-string splicing), so symbols containing quotes
  * or backslashes cannot break or inject into the plan.
  */
object BpeTrain {

  /** Sentinel-padded per-code-point symbol string of a word column:
    * "cat" → " c a t " (the graft.functions.Bpe representation). */
  private def spaced(w: Column): Column =
    concat(lit(" "), regexp_replace(w, lit("(.)"), lit("$1 ")))

  /** Adjacent symbol pairs of the padded string `s`, OVERLAPPING
    * (every position counts — the Sennrich learn-time statistic;
    * apply-time fusion is non-overlapping, exactly like the
    * committed-table apply chain). */
  private def pairsOf(s: Column): Column = {
    val sy = split(trim(s), " ")
    zip_with(
      slice(sy, lit(1), size(sy) - 1),
      slice(sy, lit(2), size(sy) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))
  }

  /** Learn `nMerges` merges from `docs(textCol)`. Returns the merge
    * table in rank order: (left, right, pairCount) — pairCount is the
    * exact weighted count that made the pair the argmax, a useful
    * training diagnostic (it is monotonically useful, not needed for
    * apply). Driver state: this table and nothing else.
    */
  def trainBpeMerges(
      docs: DataFrame,
      nMerges: Int,
      textCol: String = "text"): Seq[(String, String, Long)] = {
    require(nMerges > 0, s"trainBpeMerges: nMerges must be > 0, got $nMerges")
    val words = docs
      .select(explode(expr(
        s"filter(split($textCol, ' '), x -> x <> '')")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(spaced(col("w")).as("s"), col("f"))
    var state = words.cache()
    // the parent of the CURRENT state: unpersisted only after the
    // argmax job has materialized the current state's cache — the
    // former `next.count()` ran a dedicated materialization job per
    // iteration (2 jobs/merge instead of 1) just to be able to drop
    // the parent immediately
    var parent: Option[DataFrame] = None
    val out = Seq.newBuilder[(String, String, Long)]
    try {
      for (_ <- 1 to nMerges) {
        val top = state
          .select(explode(pairsOf(col("s"))).as("p"), col("f"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .collect() // materializes state's cache; parent now unused
        parent.foreach(_.unpersist())
        parent = None
        require(top.nonEmpty,
          "trainBpeMerges: no adjacent pairs left to merge (corpus too " +
            "small for the requested nMerges); guard upstream")
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((a, b, cnt))
        val pat = lit(s" $a $b ")
        val rep = lit(s" $a$b ")
        // double replace: the Bpe repair-pass trick — a replacement
        // consumes the shared sentinel space of an immediately
        // following occurrence; misses can't sit adjacent, so one
        // second pass catches them all (identical in DuckDB)
        val next = state
          .select(replace(replace(col("s"), pat, rep), pat, rep).as("s"), col("f"))
          .cache()
        parent = Some(state)
        state = next
      }
    } finally {
      parent.foreach(_.unpersist())
      state.unpersist()
    }
    out.result()
  }

  /** The fixed t29 training configuration: 8 merges — enough to show
    * multi-level fusions (merges of merges) while keeping the
    * unrolled oracle readable. */
  private[operators] val T29Merges = 8
}
