package graft.operators

import graft.SparkTestBase
import graft.SparkEntry

class RelationalSpec extends SparkTestBase {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"missing oracles: $noOracle")
  }

  test("q30 HLL sketch stays within the oracle's 5% bound vs exact") {
    import org.apache.spark.sql.functions._
    // The canned q30 exposes the bound as a boolean (the sketch value
    // itself is engine-specific); this pins the numeric error directly.
    val li = graft.tables.Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL error too large: $approx vs $exact")
    }
    // and the canned query's boolean is all-true (what the oracle pins)
    val canned = SparkEntry.queries("q30_approx_distinct")(spark, sfDir).collect()
    assert(canned.forall(_.getAs[Boolean]("approx_within_5pct")))
  }

  // Every relational operator runs at sf0.001 and yields a sane result.
  for (q <- Relational.all) {
    test(s"${q.name} executes") {
      val df = q.build(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty even at the smallest sf
      if (!Set("q07_anti_join").contains(q.name)) {
        assert(n > 0, s"${q.name} returned 0 rows at sf0.001")
      }
    }
  }

  test("q01 aggregates match hand-computed values") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q01_pricing_agg").get.build(spark, sfDir)
    val row = df.filter(col("l_returnflag") === "A" && col("l_linestatus") === "F").head()
    // cross-check: sum_qty equals the raw double sum within float noise
    val li = graft.tables.Tables.load(spark, sfDir, "lineitem")
    val expected = li
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .agg(sum("l_quantity"))
      .head()
      .getDouble(0)
    assert(math.abs(row.getAs[Double]("sum_qty") - expected) < 1e-6)
  }

  test("q22 session counts sum to event count") {
    val df = Relational.all.find(_.name == "q22_sessionize").get.build(spark, sfDir)
    import org.apache.spark.sql.functions._
    val total = df.agg(sum("n_events")).head().getLong(0)
    val events = graft.tables.Tables.load(spark, sfDir, "events").count()
    assert(total == events)
  }

  test("q39 pivot equals the conditional-aggregation plan exactly") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q39_pivot").get.build(spark, sfDir)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(ty =>
      coalesce(
        sum(when(col("event_type") === ty, col("value").cast("decimal(18,6)"))),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")
      ).cast("double").as(s"v_$ty"))
    val manual = graft.tables.Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
    assert(df.count() == manual.count())
    assert(df.except(manual).count() == 0) // decimal sums ⇒ exact doubles
  }

  test("q40 running distinct count ends at the exact per-user distinct count") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q40_window_distinct").get.build(spark, sfDir).cache()
    assert(df.filter(col("n_types_seen") < 1 || col("n_types_seen") > 5).count() == 0)
    val finalPerUser = df.groupBy("user_id").agg(max("n_types_seen").as("seen"))
    val exact = graft.tables.Tables.load(spark, sfDir, "events")
      .groupBy("user_id").agg(countDistinct("event_type").cast("int").as("exact"))
    assert(finalPerUser.join(exact, "user_id")
      .filter(col("seen") =!= col("exact")).count() == 0)
  }

  test("q41 funnel stages are time-ordered and converted implies all stages") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q41_funnel").get.build(spark, sfDir).cache()
    assert(df.filter(col("click_ts") < col("signup_ts")).count() == 0)
    assert(df.filter(col("purchase_ts") < col("click_ts")).count() == 0)
    assert(df.filter(col("converted") && col("purchase_ts").isNull).count() == 0)
    assert(df.filter(col("converted") =!= col("purchase_ts").isNotNull).count() == 0)
    val signupUsers = graft.tables.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(df.count() == signupUsers)
  }

  test("q42 streaks partition each user's active days into disjoint runs") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q42_gaps_islands").get.build(spark, sfDir).cache()
    // streak length == day span (that's what "consecutive" means)
    assert(df.filter(
      datediff(to_date(col("streak_end")), to_date(col("streak_start"))) + 1
        =!= col("streak_days")).count() == 0)
    // streak day counts sum to the user's distinct active days
    val fromStreaks = df.groupBy("user_id").agg(sum("streak_days").as("n"))
    val exact = graft.tables.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("exact"))
    assert(fromStreaks.join(exact, "user_id").filter(col("n") =!= col("exact")).count() == 0)
    // streaks within a user don't touch: next start > previous end + 1 day
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("streak_start")
    assert(df.withColumn("prev_end", lag(col("streak_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        datediff(to_date(col("streak_start")), to_date(col("prev_end"))) < 2)
      .count() == 0)
  }

  test("q43 retention: offset-0 retention is 1.0 and actives never exceed cohort size") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q43_retention_cohort").get.build(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("week_offset") === 0 && col("retention") =!= 1.0).count() == 0)
    assert(df.filter(col("n_active") > col("cohort_size")).count() == 0)
    assert(df.filter(col("week_offset") < 0).count() == 0)
    // cohort sizes sum to the total distinct-user count (partition property)
    val totalUsers = graft.tables.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    val cohortSum = df.filter(col("week_offset") === 0)
      .agg(sum("cohort_size")).head().getLong(0)
    assert(cohortSum == totalUsers)
  }

  test("q44 word-position stats conserve the corpus token count") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q44_explode_ordinality").get
      .build(spark, sfDir).cache()
    val totalTokens = graft.tables.Tables.load(spark, sfDir, "documents")
      .select(size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(df.agg(sum("n_occ")).head().getLong(0) == totalTokens)
    assert(df.filter(col("first_pos") < 1).count() == 0)
    // sum_pos of a word is at least first_pos per occurrence's lower bound
    assert(df.filter(col("sum_pos") < col("n_occ") * col("first_pos")).count() == 0)
  }

  test("q45 merged intervals are disjoint, ordered, and conserve events") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q45_interval_merge").get
      .build(spark, sfDir).cache()
    assert(df.filter(col("end_us") <= col("start_us")).count() == 0)
    // islands within a user never overlap: next start > previous end
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("island")
    assert(df.withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_us") <= col("prev_end"))
      .count() == 0)
    val totalEvents = graft.tables.Tables.load(spark, sfDir, "events").count()
    assert(df.agg(sum("n_events")).head().getLong(0) == totalEvents)
  }

  test("q46 median sits inside the value range and mode carries the max count") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q46_median_mode").get
      .build(spark, sfDir).cache()
    val bounds = graft.tables.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(min("l_quantity").as("lo"), max("l_quantity").as("hi"),
        count(lit(1)).as("n"))
    val j = df.join(bounds, "flag").cache()
    assert(j.filter(col("median_qty") < col("lo") || col("median_qty") > col("hi"))
      .count() == 0)
    assert(j.filter(col("n_rows") =!= col("n")).count() == 0)
    // the mode's count is the max over all (flag, qty) counts
    val maxCnt = graft.tables.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("flag").agg(max("cnt").as("max_cnt"))
    assert(df.join(maxCnt, "flag").filter(col("mode_cnt") =!= col("max_cnt"))
      .count() == 0)
  }

  test("q47 bitmap popcount agrees with Long.bitCount and member flags") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q47_bitmap_segments").get
      .build(spark, sfDir).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getAs[Long]("segments")
      assert(seg >= 1L && seg <= 31L)
      assert(r.getAs[Int]("n_types") == java.lang.Long.bitCount(seg))
      assert(r.getAs[Boolean]("has_purchase") == ((seg & 4L) != 0L))
    }
    // one row per distinct user
    val users = graft.tables.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.length == users)
  }

  test("q48 spine is dense and gap rows are exactly the zero-order days") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q48_date_spine_gapfill").get
      .build(spark, sfDir).cache()
    val nations = graft.tables.Tables.load(spark, sfDir, "nation").count()
    assert(df.count() == nations * 90) // 1995-01-01..1995-03-31
    // zero revenue iff zero orders (gap rows are true gaps)
    assert(df.filter((col("n_orders") === 0) =!= (col("revenue") === 0.0))
      .count() == 0)
    // non-gap revenue reconciles to the direct fact aggregation total
    val direct = graft.tables.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))))
      .head().getDecimal(0).doubleValue()
    val filled = df.agg(sum(col("revenue").cast(org.apache.spark.sql.types.DecimalType(14, 2))))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(filled - direct) < 1e-6)
  }

  test("q50 division returns exactly the customers covering every priority") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q50_relational_division").get
      .build(spark, sfDir).cache()
    val o = graft.tables.Tables.load(spark, sfDir, "orders")
    val np = o.agg(countDistinct(col("o_orderpriority"))).head().getLong(0)
    val truth = o.groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("nc"))
      .filter(col("nc") === np).select("o_custkey")
    assert(df.select("o_custkey").except(truth).count() == 0)
    assert(truth.except(df.select("o_custkey")).count() == 0)
  }

  test("q51 shares sum to 1 within every region; totals consistent") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q51_ratio_to_report").get
      .build(spark, sfDir).cache()
    df.groupBy("r_name").agg(sum("share").as("s")).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-4, s"region shares: $r")
    }
    // region_revenue equals the sum of its nations' revenues
    val chk = df.groupBy("r_name")
      .agg(sum("revenue").as("s"), max("region_revenue").as("t"),
        min("region_revenue").as("t2"))
      .collect()
    chk.foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - r.getAs[Double]("t")) < 1e-4)
      assert(r.getAs[Double]("t") == r.getAs[Double]("t2"))
    }
  }

  test("q52 EWMA matches a driver-side sequential replay per user") {
    import org.apache.spark.sql.functions._
    val df = Relational.all.find(_.name == "q52_ewma").get.build(spark, sfDir).cache()
    val truth = graft.tables.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val vs = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2))).map(_.getDouble(3))
        u -> vs.foldLeft(0.0)((acc, x) => acc * 0.75 + x * 0.25)
      }
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (u, e) =>
      assert(math.abs(e - truth(u)) < 1e-5, s"user $u: $e vs ${truth(u)}")
    }
  }

  test("q54 rollup grains are internally consistent") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q54_rollup")(spark, sfDir).cache()
    val detail = df.filter(col("gid") === 0)
    val regionTot = df.filter(col("gid") === 1)
    val grand = df.filter(col("gid") === 3)
    assert(grand.count() == 1)
    // each region subtotal equals the sum of its detail rows (money in
    // cents to dodge FP summation order)
    val fromDetail = detail.groupBy(col("region"))
      .agg(round(sum(col("revenue")) * 100).as("cents"),
        sum(col("n_items")).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    regionTot.collect().foreach { r =>
      val (cents, n) = fromDetail(r.getAs[String]("region"))
      assert(math.round(r.getAs[Double]("revenue") * 100).toDouble == cents,
        s"region ${r.getString(0)} revenue mismatch")
      assert(r.getAs[Long]("n_items") == n)
    }
    // grand total equals the sum of region subtotals
    val gn = grand.head().getAs[Long]("n_items")
    assert(gn == regionTot.agg(sum(col("n_items"))).head().getLong(0))
    df.unpersist()
  }

  test("q53 high-cardinality running distinct equals q40's set form") {
    // the two formulations of COUNT(DISTINCT) OVER must agree row for
    // row — q40 carries the set, q53 carries a flag; same semantics
    val q40 = graft.SparkEntry.queries("q40_window_distinct")(spark, sfDir)
    val q53 = graft.SparkEntry.queries("q53_window_distinct_hc")(spark, sfDir)
    assert(q40.schema.map(f => (f.name, f.dataType)) ==
      q53.schema.map(f => (f.name, f.dataType)))
    assert(q40.except(q53).count() == 0 && q53.except(q40).count() == 0)
    assert(q53.count() > 0)
  }

  test("q56 salted join result equals the unsalted plain join exactly") {
    import org.apache.spark.sql.functions._
    val salted = graft.SparkEntry.queries("q56_salted_skew_join")(spark, sfDir)
    val ev = graft.tables.Tables.load(spark, sfDir, "events")
      .select(col("user_id").as("k"), floor(col("value") * 100).cast("long").as("c"))
    val cust = graft.tables.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = ev.join(cust, "k")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"), sum(col("c")).as("sum_cents"))
    assert(salted.count() > 0)
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }
}
