package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 scale probes for the dedup chain (the round-12 verdict's
  * open items 1b and 4):
  *
  * 1. **d21 verify head-to-head at sf0.1** — the driver artifact had
  *    d21 at 3.78x its frozen best with 9.5–17 s of REAL executor
  *    time (not round-11-t25's compile starvation). The suspect is
  *    the verify's restricted-posting self-join: within one shingle
  *    shared by c candidate docs the join emits c·(c−1)/2 rows
  *    before the pair agg, so its shuffle volume is governed by the
  *    posting skew, not the candidate count — exactly the shape that
  *    amplifies under a contended host. This probe measures, same
  *    session, warm: (a) the structural numbers — candidate pairs,
  *    Σ c·(c−1)/2 join-emitted rows, max/mean posting c — and (b)
  *    wall time of the posting verify vs the pairwise
  *    array_intersect verify that canned d02/d21/dupClusterAssign
  *    route through since round 13.
  *
  * 2. **dedup chain at 100× of bench scale** — sf1 documents (10× of
  *    the sf0.1 bench corpus) replicated ×10 two ways:
  *    - `independent`: every word salted with the replica id (no
  *      shingle crosses replicas), so the corpus is 10 independent
  *      populations — verified pairs must be exactly 10× the sf1
  *      count (invariance assert), and the interesting output is how
  *      wall time, band-bucket skew, and CC rounds move vs sf1.
  *    - `dupheavy`: verbatim replication — every doc gains 9 exact
  *      clones, so band buckets and the dup graph couple ACROSS
  *      replicas (45 clone pairs per base doc before near-dups); the
  *      worst case the banded design must survive, with the output
  *      dup-bounded (pairs ~ 100× base, edges still linear in dups,
  *      never corpus²).
  *    Reported per stage: band-bucket max/mean size, candidate
  *    pairs, verified pairs, star-CC rounds, wall seconds.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR13 [sf01Dir] [sf1Dir] [factor]"
  * Findings land in docs/SCALING.md (round 13 section).
  */
object ScaleProbeR13 {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Ops}

    // ---- Probe 1: verify head-to-head at sf0.1 (d21 diagnosis) ----
    val docs01 = spark.read.parquet(s"$sf01/documents.parquet").cache()
    docs01.count()

    // structural numbers of the posting verify
    val sh = Dedup.shingleArrays(docs01).cache()
    val cands = Dedup.minhashCandidates(sh).distinct().cache()
    val nCands = cands.count()
    val candDocs = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val restricted = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val postStats = restricted.groupBy(col("s")).agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c") * (col("c") - 1) / 2).as("join_rows"),
        max(col("c")).as("max_c"),
        avg(col("c")).as("mean_c"),
        count(lit(1)).as("n_shingles")).head()
    println(s"probe1.structure: cand_pairs=$nCands " +
      s"posting_join_emitted_rows=${postStats.get(0)} " +
      s"hottest_shingle_c=${postStats.get(1)} mean_c=${postStats.get(2)} " +
      s"restricted_shingles=${postStats.get(3)}")
    sh.unpersist(); cands.unpersist()

    // warm both paths once, then 3 timed reps each
    Dedup.minhashLshAtScale(docs01).count(); spark.catalog.clearCache(); docs01.cache().count()
    Dedup.minhashLshPostingVerifyRef(docs01).count(); spark.catalog.clearCache(); docs01.cache().count()
    for (rep <- 1 to 3) {
      val (nPair, tPair) = timed(Dedup.minhashLshAtScale(docs01).count())
      spark.catalog.clearCache(); docs01.cache().count()
      val (nPost, tPost) = timed(Dedup.minhashLshPostingVerifyRef(docs01).count())
      spark.catalog.clearCache(); docs01.cache().count()
      println(f"probe1.rep$rep: pairwise=$tPair%.2fs ($nPair pairs) " +
        f"posting=$tPost%.2fs ($nPost pairs)")
    }
    docs01.unpersist()

    // ---- Probe 2: dedup chain at 100x of bench scale ----
    val docs1 = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val nBase = docs1.count()

    def chain(tag: String, docs: DataFrame): Unit = {
      val shX = Dedup.shingleArrays(docs).cache()
      val (_, tSh) = timed(shX.count())
      val bands = Dedup.bandKeysFromShingles(shX, "doc_id", "sh")
      val bStats = bands.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max"), avg(col("c")).as("mean"),
          count(lit(1)).as("n")).head()
      val candsX = Dedup.minhashCandidates(shX).distinct()
      val (nC, tC) = timed(candsX.count())
      val pairs = candsX
        .join(shX.select(col("doc_id").as("id_a"), col("sh").as("_ta")), "id_a")
        .join(shX.select(col("doc_id").as("id_b"), col("sh").as("_tb")), "id_b")
        .withColumn("c", size(array_intersect(col("_ta"), col("_tb"))).cast("long"))
        .withColumn("j",
          col("c").cast("double") / (size(col("_ta")) + size(col("_tb")) - col("c")))
        .filter(col("j") >= 0.4)
        .select(col("id_a"), col("id_b"))
        .cache()
      val (nV, tV) = timed(pairs.count())
      val ((_, rounds), tCC) = timed(
        Ops.connectedComponentsStar(pairs, "id_a", "id_b"))
      println(f"probe2.$tag: docs=${docs.count()} shingle=$tSh%.1fs " +
        f"bucket_max=${bStats.get(0)} bucket_mean=${bStats.get(1)} " +
        f"buckets=${bStats.get(2)} cand_pairs=$nC ($tC%.1fs) " +
        f"verified_pairs=$nV ($tV%.1fs) cc_rounds=$rounds ($tCC%.1fs)")
      pairs.unpersist(); shX.unpersist()
      spark.catalog.clearCache(); docs1.cache().count()
    }

    chain("sf1_base", docs1)

    val independent = (0 until factor).map { i =>
      docs1.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        // salt every word with the replica id: no shingle crosses
        // replicas, so the corpus is `factor` independent populations
        regexp_replace(col("text"), "(\\S+)", s"$$1_r$i").as("text"))
    }.reduce(_ unionByName _)
    chain(s"independent_x$factor", independent)

    val dupheavy = ProbeReplicate(docs1, Seq("doc_id"), factor, 10000000L)
    chain(s"dupheavy_x$factor", dupheavy)

    // invariance: independent replication must scale pairs linearly
    val basePairs = Dedup.minhashLshAtScale(docs1).count()
    spark.catalog.clearCache()
    println(s"probe2.invariance: base_pairs=$basePairs expect_independent=" +
      s"${basePairs * factor} (assert printed above matches)")
    spark.stop()
  }
}
