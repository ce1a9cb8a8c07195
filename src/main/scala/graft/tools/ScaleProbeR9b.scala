package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 batch-2 scale probes for the new operators:
  *
  * 1. d16 vs d19 (MEASURED, not asserted): the bloom path's whole
  *    point is cutting the corpus-sized exploded-shingle stream
  *    BEFORE its shuffle — RuntimeAudit reads shuffle records/bytes
  *    off both final AQE plans, plus row-count equality (the oracle
  *    already pins values; here we pin the resource claim).
  *
  * 2. g06 BFS / g07 SSSP at 10×: the co-purchase inputs replicate
  *    with part keys shifted by a MULTIPLE OF 97 (97e6) and order
  *    keys by a disjoint stride — replicas are disconnected
  *    components whose nodes keep their (mod 97) seed membership, so
  *    per-replica distances must EQUAL the base corpus's keyed by
  *    base node id (value-level invariance, the ScaleProbeR8b
  *    methodology), while cost should scale ~linearly in edges
  *    (every per-round shuffle is keyed; no cross-replica coupling).
  *
  * 3. O40 writeShuffledShards: shard-size balance (max/mean over 16
  *    shards — hash uniformity is the load-balance claim) + wall.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR9b [baseSfDir] [factor]"
  */
object ScaleProbeR9b {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Graph, Ops}

    // ---- 1. d19 bloom vs d16: measured shuffle cut ----
    // At bench scale the eval universe BROADCASTS in both paths, so
    // there is nothing for the bloom to cut (measured below as the
    // control: identical shuffle profiles). The regime d19 exists for
    // is eval-past-broadcast-capacity — simulated exactly by
    // disabling auto-broadcast: d16's semi-join then shuffles the
    // full corpus-sized exploded-shingle stream, while d19's
    // codegen'd might_contain prefilters it BEFORE the exchange and
    // only hits+fpp reach the (now shuffled) exact verify.
    println("== d16 vs d19, broadcast allowed (control: bloom has nothing to cut) ==")
    val d16b = RuntimeAudit.runQuery(spark, "d16_decontaminate", base)
    println(d16b.line("d16_broadcast"))
    val d19b = RuntimeAudit.runQuery(spark, "d19_decontam_bloom", base)
    println(d19b.line("d19_bloom"))
    require(d16b.rows == d19b.rows, s"row mismatch: ${d16b.rows} vs ${d19b.rows}")

    println("== d16 vs d19, broadcast DISABLED (the past-capacity regime) ==")
    val bcThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d16s = RuntimeAudit.runQuery(spark, "d16_decontaminate", base)
      println(d16s.line("d16_shuffle_semi"))
      val d19s = RuntimeAudit.runQuery(spark, "d19_decontam_bloom", base)
      println(d19s.line("d19_bloom_prefilter"))
      require(d16s.rows == d19s.rows, s"row mismatch: ${d16s.rows} vs ${d19s.rows}")
      println(f"shuffle-record cut: ${d16s.shuffleRecords}%d -> ${d19s.shuffleRecords}%d " +
        f"(${d19s.shuffleRecords.toDouble / math.max(1, d16s.shuffleRecords)}%.2fx), " +
        f"bytes ${d16s.shuffleBytes}%d -> ${d19s.shuffleBytes}%d " +
        f"(${d19s.shuffleBytes.toDouble / math.max(1, d16s.shuffleBytes)}%.2fx)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThresh)

    // ---- 2. g06/g07 at factor×: invariance + cost law ----
    // part keys shift by multiples of 97 so replica nodes keep their
    // seed membership; order keys stride disjointly so co-purchase
    // edges never cross replicas.
    val pOff = 97000000L
    val okOff = 1000000000L
    val ipBase = spark.read.parquet(s"$base/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey").cast("long").as("ok"),
        col("l_partkey").cast("long").as("p")).distinct()
      .localCheckpoint()
    val reps = spark.range(factor).select(col("id").as("r"))
    val ipBig = ipBase.crossJoin(broadcast(reps))
      .select((col("ok") + col("r") * okOff).as("ok"),
        (col("p") + col("r") * pOff).as("p"), col("r"))
      .localCheckpoint()

    def edgesOf(ip: DataFrame): DataFrame = {
      val und = ip.as("a").join(ip.as("b"), "ok")
        .where(col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      und.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    }
    def seedsOf(e: DataFrame): DataFrame =
      e.select(col("src").as("node")).where(col("node") % 97 === 0).distinct()

    def bfs(ip: DataFrame): DataFrame = {
      val e = edgesOf(ip)
      Graph.bfsDistances(e, seedsOf(e), maxHops = 3)
    }
    val (bBase, tBfsBase) = timed(bfs(ipBase.select("ok", "p")).localCheckpoint())
    val (bBig, tBfsBig) = timed(bfs(ipBig.select("ok", "p")).localCheckpoint())
    val bfsDrift = bBig
      .withColumn("node0", col("node") % pOff)
      .join(bBase.select(col("node").as("node0"), col("dist").as("d0")),
        Seq("node0"), "full")
      .where(col("dist").isNull || col("d0").isNull || col("dist") =!= col("d0"))
      .count()
    println(f"g06_bfs: base ${bBase.count()}%d rows ${tBfsBase}%.1fs -> " +
      f"${factor}x ${bBig.count()}%d rows ${tBfsBig}%.1fs " +
      f"(x${tBfsBig / tBfsBase}%.1f wall), drifted=$bfsDrift%d")
    require(bfsDrift == 0, "BFS replication invariance violated")

    def sssp(ip: DataFrame): DataFrame = {
      val wp = ip.as("a").join(ip.as("b"), "ok")
        .where(col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v")).agg(count(lit(1)).as("cnt"))
      val w = (lit(11) - least(col("cnt"), lit(10))).cast("long").as("w")
      val e = wp.select(col("u").as("src"), col("v").as("dst"), w)
        .unionAll(wp.select(col("v").as("src"), col("u").as("dst"), w))
      val seeds = e.select(col("src").as("node")).where(col("node") % 97 === 0).distinct()
      Graph.ssspBounded(e, seeds, rounds = 3)
    }
    val (sBase, tSsspBase) = timed(sssp(ipBase.select("ok", "p")).localCheckpoint())
    val (sBig, tSsspBig) = timed(sssp(ipBig.select("ok", "p")).localCheckpoint())
    val ssspDrift = sBig
      .withColumn("node0", col("node") % pOff)
      .join(sBase.select(col("node").as("node0"), col("dist").as("d0")),
        Seq("node0"), "full")
      .where(col("dist").isNull || col("d0").isNull || col("dist") =!= col("d0"))
      .count()
    println(f"g07_sssp: base ${sBase.count()}%d rows ${tSsspBase}%.1fs -> " +
      f"${factor}x ${sBig.count()}%d rows ${tSsspBig}%.1fs " +
      f"(x${tSsspBig / tSsspBase}%.1f wall), drifted=$ssspDrift%d")
    require(ssspDrift == 0, "SSSP replication invariance violated")

    // ---- 3. O40 shard layout: balance + wall ----
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("probe_shards").toString
    val (_, tWrite) = timed(
      Ops.writeShuffledShards(docs, "doc_id", s"$out/l", nShards = 16, seed = "9"))
    val sizes = Ops.readShuffledShards(spark, s"$out/l").groupBy(col("shard")).count()
      .select(col("count")).as[Long].collect()
    println(f"o40_shards: ${sizes.length}%d shards, max/mean=" +
      f"${sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)}%.3f, " +
      f"write ${tWrite}%.1fs for ${sizes.sum}%d rows")
    spark.stop()
  }
}
