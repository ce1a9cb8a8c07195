package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Scale guards for the dedup pipelines: the hot-shingle cap must
  * bound candidate generation on a boilerplate-skewed corpus while
  * keeping exact Jaccard values for every surviving pair.
  */
class DedupScaleSpec extends SparkTestBase {

  // 120 docs: 10 boilerplate words shared by ALL docs + an 8-word
  // tail. Docs 0..5 reuse 3 tails (id % 3), so (0,3) (1,4) (2,5) are
  // exact duplicates; every other doc's tail is unique. Every pair
  // shares the 8 boilerplate-only shingles -> uncapped candidate
  // generation is O(n^2).
  private def skewedDocs = {
    val boiler = "terms of service apply to every user of this platform"
    spark.range(120).select(
      col("id").as("doc_id"),
      concat(
        lit(boiler + " "),
        expr("concat_ws(' ', transform(sequence(0, 7), " +
          "j -> concat('t', CAST(CASE WHEN id < 6 THEN id % 3 ELSE id END AS STRING), 'x', CAST(j AS STRING))))")
      ).as("text")
    )
  }

  test("hot-shingle cap bounds candidate blowup on a skewed corpus; survivors exact") {
    val uncapped = Dedup.ngramJaccardAtScale(skewedDocs, 0.3, maxPostingsPerToken = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val capped = Dedup.ngramJaccardAtScale(skewedDocs, 0.3, maxPostingsPerToken = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // uncapped: boilerplate makes EVERY pair jaccard >= 1/3 -> n^2 blowup
    assert(uncapped.size == 120 * 119 / 2, s"uncapped: ${uncapped.size}")
    // capped: boilerplate shingles (df=120 > 10) are excluded from
    // candidate generation; only the true duplicate pairs (which share
    // non-hot tail shingles) survive
    assert(capped.keySet == Set((0L, 3L), (1L, 4L), (2L, 5L)), s"capped: ${capped.keySet}")
    // values for survivors are EXACT (full-posting Jaccard, cap only
    // affects candidate generation): identical docs -> 1.0, and equal
    // to the uncapped value
    capped.foreach { case (pair, j) =>
      assert(j == 1.0 && uncapped(pair) == j, s"$pair: capped=$j uncapped=${uncapped(pair)}")
    }
    // the pairwise (array_intersect) verify mode returns the identical
    // result — it is a cost trade-off, not a semantics change
    val pairwise = Dedup.ngramJaccardAtScale(skewedDocs, 0.3, 10, pairwiseVerify = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairwise == capped, s"pairwise verify diverged: ${pairwise.size} vs ${capped.size}")
  }

  test("pairwise array_intersect verify equals the posting-join verify (d02/d21 reroute)") {
    // Round 13 routed canned d02/d21 through minhashLshAtScale's
    // pairwise verify; the retired restricted-posting self-join is
    // kept as the independent reference formulation and must stay
    // value-identical — same candidates, same exact Jaccard.
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val pairwise = Dedup.minhashLshAtScale(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    val postingRef = Dedup.minhashLshPostingVerifyRef(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairwise == postingRef && pairwise.nonEmpty,
      s"${pairwise.size} vs ${postingRef.size}")
    spark.catalog.clearCache()
    val canned = graft.SparkEntry.queries("d02_dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairwise == canned, s"${pairwise.size} vs ${canned.size}")
  }

  test("canned d04 equals the scale configuration when no shingle is hot") {
    // on the real sf0.001 corpus with a cap far above the hottest
    // shingle, the capped pipeline is value-identical to canned d04
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val atScale = Dedup.ngramJaccardAtScale(docs, 0.4, maxPostingsPerToken = 100000)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val canned = graft.SparkEntry.queries("d04_dedup_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(atScale == canned)
  }

  test("per-row bandKeys derive the same candidates as the groupBy minhash path") {
    // array_min over the distinct shingle array must equal min over
    // the grouped posting rows — same set, same md5 derivation — so
    // the streaming-safe banding (ST6) agrees with d02's batch banding.
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val bk = Dedup.bandKeys(docs, "doc_id", "text")
    val perRow = bk.select(col("doc_id").as("id_a"), col("band"), col("bh"))
      .join(bk.select(col("doc_id").as("id_b"), col("band"), col("bh")), Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grouped = Dedup.minhashCandidatesPostingRef(Dedup.shinglePosting(spark, sfDir))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(perRow == grouped && perRow.nonEmpty)
  }

  test("fuzzyEditAtScale equals canned d14 uncapped; bucket cap bounds the skewed corpus") {
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val atScale = Dedup.fuzzyEditAtScale(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val canned = graft.SparkEntry.queries("d14_fuzzy_edit_distance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(atScale == canned, s"${atScale.size} vs ${canned.size}")
    spark.catalog.clearCache()
    // banded DP with a threshold above every doc length == exact form
    val banded = Dedup.fuzzyEditAtScale(docs, maxDist = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == canned, s"banded ${banded.size} vs ${canned.size}")
    spark.catalog.clearCache()
    // skewed corpus: every doc shares boilerplate shingles -> minhash
    // buckets go hot; the cap must bound candidate work while exact
    // duplicate pairs (same text -> same signature, low ids) survive
    val uncapped = Dedup.fuzzyEditAtScale(skewedDocs).count()
    val capped = Dedup.fuzzyEditAtScale(skewedDocs, maxBucket = 12)
    val cappedRows = capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cappedRows.length <= uncapped.toInt)
    // the three exact-dup pairs sit at doc_ids 0..5 (lowest ids, kept
    // by the cap) and must survive with edit_dist == 0
    Seq((0L, 3L), (1L, 4L), (2L, 5L)).foreach { case (a, b) =>
      assert(cappedRows.exists(p => p._1 == a && p._2 == b && p._3 == 0L),
        s"exact pair ($a,$b) lost by cap")
    }
    spark.catalog.clearCache()
  }
}
