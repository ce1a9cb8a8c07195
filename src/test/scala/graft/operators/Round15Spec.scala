package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-15 behaviors: gram-index takedown corruption detection at
  * compaction, append-ledger marker subsumption pruning.
  */
class Round15Spec extends SparkTestBase {
  import spark.implicits._

  test("compactGramIndex fails loudly on net counts < 0 (takedown contract violation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r15-corrupt").toString
    val seed = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    GramIndex.writeGramIndex(seed, dir, gram = 8, nBuckets = 4)
    val victim = seed.where($"doc_id" === 1L)
    // the contract violation: the SAME doc taken down under TWO
    // different takedownIds — its grams' net counts go to -1
    GramIndex.takedownGramIndex(victim, dir, takedownId = 100L)
    GramIndex.takedownGramIndex(victim, dir, takedownId = 101L)
    val ex = intercept[IllegalArgumentException] {
      GramIndex.compactGramIndex(spark, dir)
    }
    assert(ex.getMessage.contains("net gram counts < 0"),
      s"wrong failure: ${ex.getMessage}")
    // and the evidence survives: the epoch was NOT republished, the
    // negative deltas are still readable
    val neg = GramIndex.readGramIndex(spark, dir).grams
      .groupBy($"g").agg(sum($"c").as("c")).where($"c" < 0L).count()
    assert(neg > 0, "negative evidence was erased despite the refusal")
  }

  test("compactGramIndex stays green on a contract-respecting takedown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r15-clean").toString
    val seed = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    GramIndex.writeGramIndex(seed, dir, gram = 8, nBuckets = 4)
    GramIndex.takedownGramIndex(seed.where($"doc_id" === 1L), dir, takedownId = 100L)
    GramIndex.compactGramIndex(spark, dir) // must not throw
    val left = GramIndex.readGramIndex(spark, dir).grams.count()
    assert(left > 0)
  }

  // -----------------------------------------------------------------
  // m10 scale path: hash60 frame keys + frame document-frequency cap
  // -----------------------------------------------------------------

  test("m10 capped/hash60 form == exact raw-hex form on the spec corpus") {
    val pay = Multimodal.videoPayloads(spark, sfDir)
    val frames = Multimodal.decodeFrames(pay).toDF()
    // the pre-round-15 exact form: raw 100-char hex frame keys, no cap
    val rawKeyed = frames.join(pay, Seq("doc_id"))
      .select($"doc_id", upper(expr(
        "substring(hex(payload), cast(f_offset * 2 + 1 as int), cast(f_size * 2 as int))"))
        .as("fk"))
      .distinct()
    val exact = rawKeyed.select($"doc_id".as("vid_a"), $"fk")
      .join(rawKeyed.select($"doc_id".as("vid_b"), $"fk"), Seq("fk"))
      .where($"vid_a" < $"vid_b")
      .groupBy($"vid_a", $"vid_b").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = Multimodal.frameDupPairs(Multimodal.frameKeys(pay))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == exact && capped.nonEmpty,
      s"capped/hash60 form diverged from exact (${capped.size} vs ${exact.size})")
  }

  test("frameDupPairs: a boilerplate frame shared by k videos is excluded, pair work bounded") {
    // adversarial black frame: ONE key held by 100 videos (uncapped
    // cost: 4,950 pairs); videos 1 and 2 also share a real frame
    val hot = (1L to 100L).map(v => (v, 999L))
    val real = Seq((1L, 1L), (2L, 1L))
    val keyed = (hot ++ real).toDF("doc_id", "fk")
    val pairs = Multimodal.frameDupPairs(keyed, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the recall contract: the (1,2) pair still surfaces via its
    // non-boilerplate frame, n_shared counts ONLY that frame; the
    // 4,949 boilerplate-only pairs are gone
    assert(pairs == Set((1L, 2L, 1L)), s"got $pairs")
  }

  test("frameDupPairs: a frame at exactly dfCap still pairs; dfCap+1 does not") {
    val at = (1L to 5L).map(v => (v, 10L))     // df = 5 == cap
    val over = (1L to 6L).map(v => (v, 20L))   // df = 6 > cap
    val keyed = (at ++ over).toDF("doc_id", "fk")
    val pairs = Multimodal.frameDupPairs(keyed, dfCap = 5)
      .agg(count(lit(1)), sum($"n_shared")).collect()(0)
    assert(pairs.getLong(0) == 10L && pairs.getLong(1) == 10L, // C(5,2) pairs, all n_shared=1
      s"got $pairs")
  }

  test("copyAppendLedger drops outdone-N subsumed by batch-N, keeps orphans and takedowns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r15-ledger").toString
    val epoch = s"$dir/v00001"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(epoch))
    // batch 1 completed both phases; batch 2 crashed mid-window
    // (outdone only); one takedown marker
    IndexLayout.commitAppend(spark, epoch, 1L, "outdone")
    IndexLayout.commitAppend(spark, epoch, 1L, "batch")
    IndexLayout.commitAppend(spark, epoch, 2L, "outdone")
    IndexLayout.commitAppend(spark, epoch, 7L, "takedown")
    val next = s"$dir/v00002"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(next))
    IndexLayout.copyAppendLedger(spark, epoch, next)
    assert(IndexLayout.appendCommitted(spark, next, 1L, "batch"))
    assert(!IndexLayout.appendCommitted(spark, next, 1L, "outdone"),
      "subsumed outdone-1 was recopied — unbounded ledger growth")
    assert(IndexLayout.appendCommitted(spark, next, 2L, "outdone"),
      "in-flight crash-window marker must survive compaction")
    assert(IndexLayout.appendCommitted(spark, next, 7L, "takedown"))
  }
}
