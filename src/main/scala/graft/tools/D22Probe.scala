package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 check: does the banded candidate pass lose ANY verified
  * exact-Jaccard >= 0.4 pair vs the brute posting join, per sf dir?
  * (Decides whether d22's oracle must replay banding or can stay on
  * the brute d06 CTEs.)
  */
object D22Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sh = graft.operators.Dedup.shingleArrays(spark, sfDir).cache()
    val posting = sh.select($"doc_id", explode($"sh").as("s"))
    val sizes = sh.select($"doc_id", size($"sh").cast("long").as("n"))

    def verify(p: org.apache.spark.sql.DataFrame) = p
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("c"))
      .join(sizes.select($"doc_id".as("id_a"), $"n".as("na")), "id_a")
      .join(sizes.select($"doc_id".as("id_b"), $"n".as("nb")), "id_b")
      .where($"c".cast("double") / ($"na" + $"nb" - $"c") >= 0.4)
      .select($"id_a", $"id_b")

    val brute = verify(
      posting.select($"doc_id".as("id_a"), $"s")
        .join(posting.select($"doc_id".as("id_b"), $"s"), Seq("s"))
        .where($"id_a" < $"id_b")).cache()

    val cands = graft.operators.Dedup.minhashCandidates(sh).cache()
    val candDocs = cands.select(explode(array($"id_a", $"id_b")).as("doc_id")).distinct()
    val restricted = posting.join(candDocs, Seq("doc_id"), "left_semi")
    val banded = verify(
      restricted.select($"doc_id".as("id_a"), $"s")
        .join(restricted.select($"doc_id".as("id_b"), $"s"), Seq("s"))
        .where($"id_a" < $"id_b"))
      .join(cands, Seq("id_a", "id_b"), "left_semi").cache()

    val nb = brute.count()
    val nd = banded.count()
    val lost = brute.exceptAll(banded).count()
    val extra = banded.exceptAll(brute).count()
    println(s"[d22probe] $sfDir brute=$nb banded=$nd lost=$lost extra=$extra")
    spark.stop()
  }
}
