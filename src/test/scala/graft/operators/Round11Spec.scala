package graft.operators

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Round-11 verdict items: the decontaminateAtScale storage contract
  * under repeated invocation, and d22's banded pair generation
  * conserving the brute pair list at spec scale.
  */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  test("decontaminateAtScale: repeated invocations leave no shingle cache behind") {
    val docs = Tables.load(spark, sfDir, "documents")
    val train = docs.where($"doc_id" % 10 =!= 0)
    val ev = docs.where($"doc_id" % 10 === 0)
    spark.catalog.clearCache()
    // Baseline AFTER a first call (session-fixture caches settled)
    Dedup.decontaminateAtScale(train, ev, fpp = 0.01).count()
    val base = spark.sparkContext.getPersistentRDDs.size
    val rounds = 3
    (1 to rounds).foreach { _ =>
      Dedup.decontaminateAtScale(train, ev, fpp = 0.01).count()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    // Each invocation may add exactly its ONE localCheckpoint'd
    // verdict frame (narrow row per train doc — the caller-owned
    // result); the two internal shingle caches must be gone. Growth
    // beyond 1 persisted RDD per call == the round-9 leak regressing.
    assert(after - base <= rounds,
      s"storage grew by ${after - base} persistent RDDs over $rounds calls " +
        "- internal shingle caches are leaking again")
    spark.catalog.clearCache()
  }

  test("d22 banded pair generation conserves the brute pair list at spec scale") {
    // The d22/d21 candidate pass bands before verifying; at sf0.001
    // banding is measured lossless (0 of 28 pairs pruned), so the
    // banded pair list must equal d04's brute-verified list exactly.
    // (At sf0.1 exactly 1 borderline pair of 256 is pruned — the
    // oracle replays the same banding, so the gate stays green; this
    // spec pins the SPEC-SCALE equality that the straddle test in
    // Round10OpsSpec relies on.)
    val sh = Dedup.shingleArrays(spark, sfDir).cache()
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
        .where($"id_a" < $"id_b"))
    val cands = Dedup.minhashCandidates(sh)
    val candDocs = cands.select(explode(array($"id_a", $"id_b")).as("doc_id")).distinct()
    val restricted = posting.join(candDocs, Seq("doc_id"), "left_semi")
    val banded = verify(
      restricted.select($"doc_id".as("id_a"), $"s")
        .join(restricted.select($"doc_id".as("id_b"), $"s"), Seq("s"))
        .where($"id_a" < $"id_b"))
      .join(cands, Seq("id_a", "id_b"), "left_semi")
    assert(brute.exceptAll(banded).isEmpty && banded.exceptAll(brute).isEmpty)
    spark.catalog.clearCache()
  }

  // ---- O42 maintainAggView (incremental view maintenance) ----

  private def eventsCents = Tables.load(spark, sfDir, "events")
    .select($"user_id", $"event_type",
      unix_micros($"ts").as("ts_us"),
      floor($"value" * 100).cast("long").as("cents"))

  private val q66Aggs = Seq(
    ("n_ops", "count", lit(1)),
    ("sum_cents", "sum", col("cents")),
    ("min_cents", "min", col("cents")),
    ("max_cents", "max", col("cents")))

  private def fullAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_ops"), sum($"cents").as("sum_cents"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))

  test("maintainAggView: maintained view == full recompute (IVM contract)") {
    val ev = eventsCents.cache()
    val cut = 1706054400000000L
    val snapshot = fullAgg(ev.filter($"ts_us" < cut))
    val maintained = Ops.maintainAggView(
      snapshot, ev.filter($"ts_us" >= cut), Seq("user_id", "event_type"), q66Aggs)
    val recomputed = fullAgg(ev)
    assert(maintained.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(maintained).isEmpty)
    ev.unpersist()
  }

  test("maintainAggView: delta-only keys surface, untouched rows pass through bit-identical") {
    val view = Seq((1L, 10L, 2L, 7L), (2L, 3L, 5L, 5L))
      .toDF("k", "n", "mn", "mx")
    val delta = Seq((2L, 9L), (3L, 4L)).toDF("k", "v") // touches k=2, introduces k=3
    val out = Ops.maintainAggView(view, delta, Seq("k"),
      Seq(("n", "count", lit(1)), ("mn", "min", $"v"), ("mx", "max", $"v")))
      .orderBy($"k").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 10L, 2L, 7L),      // untouched: exactly the stored state
          (2L, 4L, 5L, 9L),       // 3 stored + 1 delta row; min/max merge
          (3L, 1L, 4L, 4L)))      // delta-only key born with its partials
  }

  test("maintainAggView: retractions as signed sums maintain deletes exactly") {
    // The caller encodes a delete as (-1, -v): count and sum states
    // absorb it associatively — the standard IVM trick for the
    // additive aggregates (min/max excluded, per the scaladoc).
    val base = Seq((1L, 5L), (1L, 7L), (2L, 3L)).toDF("k", "v")
    val view = base.groupBy($"k")
      .agg(sum(lit(1L)).as("n"), sum($"v").as("s"))
    val delta = Seq((1L, -1L, -5L), (2L, 1L, 10L)).toDF("k", "dn", "dv")
    val out = Ops.maintainAggView(view, delta, Seq("k"),
      Seq(("n", "sum", $"dn"), ("s", "sum", $"dv")))
      .orderBy($"k").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 7L),   // the (1,5) row retracted
          (2L, 2L, 13L))) // one insert
  }

  test("maintainAggView: broadcast merge plan — the view is never shuffle-joined") {
    val ev = eventsCents
    val cut = 1706054400000000L
    val maintained = Ops.maintainAggView(
      fullAgg(ev.filter($"ts_us" < cut)),
      ev.filter($"ts_us" >= cut), Seq("user_id", "event_type"), q66Aggs)
    val plan = maintained.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2,
      s"expected broadcast anti+semi against the touched-key set:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the stored view must not be shuffled to meet the delta")
  }

  // ---- g10 modularity ----

  test("g10 modularity: two disconnected triangles score the textbook Q = 1/2") {
    // K3 + K3, no bridge: LPA labels each triangle by its min node;
    // m = 6, per community e_c = 3 and D_c = 6, so q_num = 4*6*3 -
    // 6^2 = 36 per community and Q = (36+36)/(4*36) = 1/2 — the
    // classic two-clique modularity. Exercises the exact-integer
    // formulation end-to-end on a hand-checkable graph.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("u", "v")
    val lbl = Graph.labelPropagation(und, rounds = 3)
    val m = und.count()
    val intra = und
      .join(lbl.select($"node".as("u"), $"l".as("lu")), "u")
      .join(lbl.select($"node".as("v"), $"l".as("lv")), "v")
      .where($"lu" === $"lv")
      .groupBy($"lu".as("label")).agg(count(lit(1)).cast("long").as("n_intra"))
    val deg = und.select($"u".as("node")).unionAll(und.select($"v"))
      .groupBy($"node").agg(count(lit(1)).cast("long").as("dg"))
    val dsum = lbl.join(deg, "node").groupBy($"l".as("label"))
      .agg(sum($"dg").as("deg_sum"))
    val rows = dsum.join(intra, Seq("label"), "left")
      .select($"label", coalesce($"n_intra", lit(0L)).as("n_intra"), $"deg_sum")
      .orderBy($"label").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 6L), (4L, 3L, 6L)))
    val qNum = rows.map(r => 4L * m * r.getLong(1) - r.getLong(2) * r.getLong(2)).sum
    assert(qNum == 72L && 4L * m * m == 144L) // Q = 1/2 exactly
  }

  test("g10 modularity: conservation identities on the real corpus") {
    val out = graft.SparkEntry.queries("g10_modularity")(spark, sfDir)
      .select($"n_intra", $"deg_sum", $"m", $"q_num_4m2").collect()
    val m = out.head.getLong(2)
    assert(out.forall(_.getLong(2) == m))
    // every edge is intra to at most one community; every endpoint's
    // degree lands in exactly one community
    assert(out.map(_.getLong(0)).sum <= m)
    assert(out.map(_.getLong(1)).sum == 2 * m)
    out.foreach { r =>
      assert(r.getLong(3) == 4L * m * r.getLong(0) - r.getLong(1) * r.getLong(1))
    }
    // Q = sum(q_num)/(4m^2) in [-1/2, 1] (Brandes et al. bounds)
    val q = out.map(_.getLong(3)).sum.toDouble / (4.0 * m * m)
    assert(q >= -0.5 && q <= 1.0, s"Q=$q out of range")
  }

  // ---- X13 AvgHash60 / m09 perceptual near-dup ----

  test("X13 avgHash60: container-invariant — all three wraps of one body hash identically") {
    val variants = (0 to 2).map { shift =>
      Multimodal.payloadsWithContainer(spark, sfDir, containerShift = shift, idOffset = 0L)
        .select($"doc_id",
          graft.functions.GraftExpressions.avgHash60($"payload").as("a"))
        .where($"a".isNotNull)
        .select($"doc_id", $"a.format".as(s"f$shift"), $"a.ahash".as(s"h$shift"))
    }
    val joined = variants(0).join(variants(1), "doc_id").join(variants(2), "doc_id")
    assert(joined.where($"h0" =!= $"h1" || $"h1" =!= $"h2").isEmpty,
      "same body under different containers must produce the same hash")
    // and the walk really saw three different containers per doc
    assert(joined.where($"f0" === $"f1" || $"f1" === $"f2" || $"f0" === $"f2").isEmpty)
    assert(joined.count() > 0)
  }

  test("X13 avgHash60: driver-side first-principles replay + null edges") {
    import graft.functions.AvgHash60
    val rows = Multimodal.imagePayloads(spark, sfDir)
      .select($"doc_id", $"payload").orderBy($"doc_id").limit(5).collect()
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val out = AvgHash60.compute(payload)
      Multimodal.rasterStart(payload) match {
        case Some((fmt, start)) if payload.length - start >= 60 =>
          val body = payload.drop(start).map(_ & 0xff)
          val n = body.length
          val expected = (0 until 60).map { j =>
            val idx = body.indices.filter(i => i.toLong * 60 / n == j)
            val s = idx.map(body(_).toLong).sum
            // exact cross-multiplied mean comparison
            if (s * n > body.map(_.toLong).sum * idx.length) 1L << j else 0L
          }.sum
          assert(out.getString(0) == fmt)
          assert(out.getLong(1) == expected, s"doc ${r.getLong(0)}")
        case _ => assert(out == null)
      }
    }
    // truncated container and sub-60-byte body are null, not garbage
    assert(AvgHash60.compute(Array[Byte](1, 2, 3)) == null)
    val tiny = Multimodal.imagePayloads(spark, sfDir)
      .select(graft.functions.GraftExpressions.avgHash60(
        expr("substring(payload, 1, 40)")).as("a"))
    assert(tiny.where($"a".isNotNull).isEmpty)
  }

  test("m09: pigeonhole banding finds EVERY Hamming<=3 pair (brute-force parity at spec scale)") {
    val ah = Multimodal.imagePayloads(spark, sfDir)
      .unionByName(Multimodal.payloadsWithContainer(spark, sfDir,
        containerShift = 1, idOffset = 1000000000L))
      .select($"doc_id",
        graft.functions.GraftExpressions.avgHash60($"payload").as("a"))
      .where($"a".isNotNull)
      .select($"doc_id", $"a.ahash".as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- ah; (ib, hb) <- ah if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    val banded = graft.SparkEntry.queries("m09_perceptual_near_dup")(spark, sfDir)
      .select($"id_a", $"id_b", $"hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty)
  }

  test("maintainAggView: validation rejects bad fn, missing state, key collision") {
    val view = Seq((1L, 2L)).toDF("k", "n")
    val delta = Seq((1L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Ops.maintainAggView(view, delta, Seq("k"), Seq(("n", "avg", $"v")))
    }
    intercept[IllegalArgumentException] {
      Ops.maintainAggView(view, delta, Seq("k"), Seq(("absent", "count", lit(1))))
    }
    intercept[IllegalArgumentException] {
      Ops.maintainAggView(view, delta, Seq("k"), Seq(("k", "count", lit(1))))
    }
  }
}
