package graft.operators

import graft.SparkTestBase
import graft.tables.Tables

/** O53 BPE training: hand-computable synthetic expectations, an
  * independent driver-side replay of the full trajectory on the real
  * corpus (the e10 discipline), determinism, and the
  * derivation-consistency invariant graft.functions.Bpe requires of
  * any table it applies.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic corpus: the learned trajectory is the hand-computed one") {
    // freq-weighted: "aaab" x3, "ab" x2 ->
    //   iter1 pairs: (a,a): 2 per "aaab" x3 = 6; (a,b): 3+2 = 5  -> merge (a,a)
    //   fusion is non-overlapping leftmost: "a a a b" -> "aa a b"
    //   iter2 pairs: (aa,a): 3, (a,b): 3, (a,b from 'ab'): 2 -> (a,b)=5 -> merge (a,b)
    //   wait: after iter1, "aaab" = [aa, a, b]: pairs (aa,a)=3, (a,b)=3; "ab" = [a, b]: (a,b)=2
    //   so (a,b) totals 5 > (aa,a)=3 -> merge (a,b)
    val docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("ab")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = BpeTrain.trainBpeMerges(docs, 2)
    assert(m == Seq(("a", "a", 6L), ("a", "b", 5L)), s"got $m")
  }

  test("real corpus: learned table == an independent driver-side replay of the same algorithm") {
    // collect (word, freq) once, then replay the exact trajectory in
    // plain Scala: overlapping pair counts, (cnt desc, a, b) argmax,
    // and the SAME scan-order double-replace fusion over the
    // sentinel-padded string (java.lang.String.replace is literal
    // left-to-right non-overlapping — the engines' semantics) — any
    // divergence in the Spark formulation (tiebreaks, slicing, the
    // repair pass) shows up as a different merge somewhere in 8 steps
    val docs = Tables.load(spark, sfDir, "documents")
    val viaSpark = BpeTrain.trainBpeMerges(docs, 8)
    val wf: Array[(String, Long)] = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "filter(split(text, ' '), x -> x <> '')")).as("w"))
      .groupBy("w").count()
      .collect()
      .map(r => (" " + r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).mkString(" ") + " ",
        r.getLong(1)))
    var state = wf
    val replay = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to 8) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (s, f) =>
        val syms = s.trim.split(' ')
        var i = 0
        while (i + 1 < syms.length) {
          counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x, y) }
      replay += ((a, b, cnt))
      val (pat, rep) = (s" $a $b ", s" $a$b ")
      state = state.map { case (s, f) => (s.replace(pat, rep).replace(pat, rep), f) }
    }
    assert(viaSpark == replay.result(), s"Spark trajectory diverged: $viaSpark")
  }

  test("scan-order fusion on a >=5 self-pair run: the committed Bpe convention, pinned") {
    // " a a a a a " under merge (a,a): the engines' replace consumes
    // the shared sentinel space, fusing positions (0,1) and (3,4) ->
    // [aa, a, aa]; canonical leftmost pairing would give [aa, aa, a].
    // Token COUNTS agree (3); tie-POSITIONS are scan-order-defined —
    // the same convention graft.functions.Bpe commits to at apply
    // time, so train and apply cannot disagree. Pin the trajectory:
    // iter2's pair table over [aa, a, aa] is {(aa,a):1, (a,aa):1} —
    // tie on count, (a, aa) wins the (lhs asc) tiebreak. A canonical
    // fusion would instead offer {(aa,aa):1, (aa,a):1} and merge
    // (aa,a)... the second merge is the detector.
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val m = BpeTrain.trainBpeMerges(docs, 2)
    assert(m == Seq(("a", "a", 4L), ("a", "aa", 1L)), s"got $m")
  }

  test("determinism, derivation consistency, and drop-in applicability") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val m1 = BpeTrain.trainBpeMerges(docs, 6)
    val m2 = BpeTrain.trainBpeMerges(docs, 6)
    assert(m1 == m2, "two training runs diverged")
    // derivation consistency — the invariant Bpe.merges requires: each
    // side of merge r is a single code point or the fusion produced by
    // an EARLIER rank, so apply-in-rank-order == min-rank-first and
    // the X15 id scheme (MergeIdBase + rank) stays collision-free
    val produced = scala.collection.mutable.HashSet.empty[String]
    m1.foreach { case (a, b, _) =>
      Seq(a, b).foreach { s =>
        assert(s.codePointCount(0, s.length) == 1 || produced.contains(s),
          s"merge side '$s' is neither a code point nor an earlier fusion")
      }
      produced += a + b
    }
    // counts are positive and non-increasing is NOT required (merges
    // can unlock new frequent pairs), but each count must be >= 2 for
    // a merge to be meaningful on 200 docs
    assert(m1.forall(_._3 >= 2L))
  }
}
