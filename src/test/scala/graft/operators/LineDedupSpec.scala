package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t42: corpus-level line dedup — df threshold, trim semantics,
  * order preservation, all-boilerplate and empty docs.
  */
class LineDedupSpec extends SparkTestBase {

  test("lines at df >= minDf vanish everywhere, order preserved") {
    val banner = "Subscribe now"
    val df = spark.createDataFrame(Seq(
      (1L, s"$banner\nalpha one\n  $banner  \nbeta two"),
      (2L, s"$banner\ngamma three"),
      (3L, s"unique line\n$banner"))).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(df, minDf = 3).orderBy("doc_id").collect()
    // banner df = 4 (doc 1 carries it twice, trimmed forms collapse)
    assert(out(0).getAs[String]("text_clean") == "alpha one\nbeta two")
    assert(out(0).getAs[Long]("n_lines") == 4L)
    assert(out(0).getAs[Long]("n_removed") == 2L)
    assert(out(1).getAs[String]("text_clean") == "gamma three")
    assert(out(2).getAs[String]("text_clean") == "unique line")
  }

  test("below-threshold repeats survive; empty docs come back empty") {
    val df = spark.createDataFrame(Seq(
      (1L, "twice\na"), (2L, "twice\nb"), (3L, ""),
      (4L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(df, minDf = 3).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_clean") == "twice\na") // df=2 < 3
    assert(out(2).getAs[Long]("n_lines") == 0L)
    assert(out(2).getAs[String]("text_clean") == "")
    assert(out(3).getAs[String]("text_clean") == "")
    assert(out.length == 4) // every doc present
  }

  test("all-boilerplate doc comes back with text_clean = ''") {
    val rows = (1L to 5L).map(i => (i, "the banner"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(df, minDf = 3).collect()
    assert(out.forall(_.getAs[String]("text_clean") == ""))
    assert(out.forall(_.getAs[Long]("n_removed") == 1L))
  }

  test("t42: strata removed, unique content intact") {
    val out = graft.SparkEntry.queries("t42_line_dedup")(spark, sfDir).cache()
    assert(out.where(col("n_removed") =!= 3L).count() == 0L)
    assert(out.where(!col("text_clean").startsWith("u")).count() == 0L)
    assert(out.where(col("text_clean").contains("Subscribe") ||
      col("text_clean").contains("share") ||
      col("text_clean").contains("Copyright")).count() == 0L)
    out.unpersist()
  }
}
