package graft.operators

import graft.SparkTestBase
import graft.tables.Tables

/** Round-17: [[Similarity.bm25TopK]] gained a single-pass plan (one
  * tokenize into the (doc_id, w, tf) aggregate; dl = sum(tf), df =
  * per-term row count of the query-term slice — §2.3 "aggregate before
  * you shuffle") next to the original multi-pass plan. The two forms
  * feed the SAME exact-int64 statistics into the shared bm25Rank tail,
  * so they must be row-for-row identical at ANY size-threshold flip
  * point — this spec pins that on the real corpus + the canned query
  * set, which is what makes the size-conditional default safe.
  */
class Bm25FormSpec extends SparkTestBase {

  test("single-pass bm25TopK equals the multi-pass form row-for-row") {
    val docs = Tables.load(spark, sfDir, "documents")
    val q = {
      import spark.implicits._
      Similarity.bm25Queries.toDF("q_id", "term")
    }
    def rows(single: Boolean): Seq[String] =
      Similarity.bm25TopK(docs, q, singlePass = Some(single))
        .collect().map(_.toString).sorted.toSeq
    val single = rows(single = true)
    val multi = rows(single = false)
    assert(single.nonEmpty, "empty bm25 result")
    assert(single == multi,
      s"forms diverge:\nsingle=${single.take(5)}\nmulti=${multi.take(5)}")
  }
}
