package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s13 BM25 lexical retrieval + the hybrid RRF fusion unit.
  *
  * The scoring itself is oracle-gated (s13 at sf0.01/sf1); these
  * specs pin the RANKING semantics (tf/idf/length monotonicity) and
  * drive the hybrid lexical+ANN fusion end-to-end with a driver-side
  * replay of the RRF arithmetic over the two collected input lists.
  */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def queryOf(terms: String*) =
    terms.map(t => (1, t)).toDF("q_id", "term")

  test("bm25: higher tf ranks first at equal length; absent docs don't appear") {
    val docs = docsOf(
      10L -> "spark spark spark pad1 pad2 pad3",
      11L -> "spark other words pad1 pad2 pad3",
      12L -> "nothing relevant here pad1 pad2 pad3")
    val r = Similarity.bm25TopK(docs, queryOf("spark"), k = 10)
      .orderBy($"rn").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(10L, 11L), r.mkString(","))
    assert(r.head.getDouble(3) > r(1).getDouble(3))
  }

  test("bm25: rarer term contributes more than a common one (idf monotonicity)") {
    // 'rare' appears in 1 of 6 docs, 'common' in all 6; two probe
    // docs have identical length and tf=1 of exactly one query term
    val docs = docsOf(
      0L -> "rare filler0 fillerA fillerB",
      1L -> "common filler1 fillerA fillerB",
      2L -> "common filler2 x y",
      3L -> "common filler3 x y",
      4L -> "common filler4 x y",
      5L -> "common filler5 x y")
    val r = Similarity.bm25TopK(docs, queryOf("rare", "common"), k = 10)
      .collect().map(x => x.getLong(2) -> x.getDouble(3)).toMap
    assert(r(0L) > r(1L), s"rare-term doc must outscore common-term doc: $r")
  }

  test("bm25: at equal tf, the shorter doc ranks first (length normalization)") {
    val docs = docsOf(
      20L -> "spark one",
      21L -> "spark one two three four five six seven eight nine")
    val r = Similarity.bm25TopK(docs, queryOf("spark"), k = 10)
      .orderBy($"rn").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(20L, 21L))
  }

  test("rrfFuse: hand-checked fusion of two rankings") {
    // list A: (d1,1) (d2,2) (d3,3); list B: (d2,1) (d4,2)
    // rrf(d2) = 1/62 + 1/61 > rrf(d1) = 1/61 > rrf(d4) = 1/62 > rrf(d3) = 1/63
    val a = Seq((1, 100L, 1), (1, 200L, 2), (1, 300L, 3)).toDF("q", "id", "rn")
    val b = Seq((1, 200L, 1), (1, 400L, 2)).toDF("q", "id", "rn")
    val r = Similarity.rrfFuse(a, b, "q", "id", "rn", k = 10)
      .orderBy($"rn").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(200L, 100L, 400L, 300L), r.mkString(","))
    val expect200 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(math.abs(r.head.getDouble(3) - expect200) < 1e-9)
  }

  test("hybrid retrieval: s13 BM25 fused with s10's sign-sketch ANN, driver-replayed") {
    // vec_id and doc_id share the id space in the testdata, so the
    // hybrid surface is real: lexical ranks from s13's query set,
    // vector ranks from the s10 binary-sketch ANN, fused per query
    // with q_id 1..4 mapped onto ANN probes p_id 1..4.
    val bm25 = graft.SparkEntry.queries("s13_bm25_topk")(spark, sfDir)
      .select($"q_id".as("q"), $"doc_id".as("id"), $"rn").cache()
    val ann = graft.SparkEntry.queries("s10_sign_sketch_rerank")(spark, sfDir)
      .where($"p_id".between(1, 4))
      .select($"p_id".cast("int").as("q"), $"n_id".as("id"), $"rn").cache()
    val fused = Similarity.rrfFuse(bm25, ann, "q", "id", "rn", k = 5)
    val got = fused.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // driver-side replay: recompute RRF from the two collected lists
    val la = bm25.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    val lb = ann.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expect = (la.keySet ++ lb.keySet).toSeq
      .map { case (q, id) =>
        val s = la.get((q, id)).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          lb.get((q, id)).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, id, math.rint(s * 1e6) / 1e6)
      }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy { case (_, id, s) => (-s, id) }.take(5).zipWithIndex
          .map { case ((_, id, s), i) => (q, i + 1, id, s) }
      }.toSet
    assert(got.toSet == expect, s"fused=${got.size} expect=${expect.size}")
    assert(got.nonEmpty && got.map(_._1).toSet == Set(1, 2, 3, 4))
    bm25.unpersist(); ann.unpersist()
  }
}
