package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 scale probes: measures the NEW operators (trained IVF+PQ,
  * Bloom semi-join, band-index append/probe maintenance) on a
  * replicated corpus — the same methodology as the round-4 100×
  * probes (docs/SCALING.md): each base table unions `factor` copies
  * with disjoint id ranges, so content duplicates scale the way a
  * crawl's near-dup mass does, and every cost claim is a measured
  * RuntimeAudit number (post-AQE shuffle records/bytes), not an
  * argument.
  *
  * Run: sbt "runMain graft.tools.ScaleProbeR5 [baseSfDir] [factor]"
  */
object ScaleProbeR5 {

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
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory(s"graft_r5_x$factor").toString
    def stage(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    stage("embeddings", ProbeReplicate(
      spark.read.parquet(s"$base/embeddings.parquet"), Seq("vec_id"), factor, 10000000L))
    stage("documents", ProbeReplicate(
      spark.read.parquet(s"$base/documents.parquet"), Seq("doc_id"), factor, 10000000L))
    stage("lineitem", ProbeReplicate(
      spark.read.parquet(s"$base/lineitem.parquet"), Seq("l_orderkey"), factor, 100000000L))
    stage("orders", ProbeReplicate(
      spark.read.parquet(s"$base/orders.parquet"), Seq("o_orderkey"), factor, 100000000L))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"staged x$factor of $base: ${emb.count()} vectors, ${docs.count()} docs")

    def audit(label: String)(df: DataFrame): Unit = {
      spark.catalog.clearCache()
      val a = RuntimeAudit.run(df)
      println(a.line(label))
      spark.catalog.clearCache()
    }

    // s07: the full trained pipeline at scale — training cost is in
    // the build (Lloyd actions), the audited plan is the probe query
    audit(s"s07 trained IVFPQ x$factor") {
      val probes = emb.orderBy($"vec_id").limit(10)
      graft.operators.Ops.ivfPqTrained(emb, "vec_id", "embedding",
        probes, "vec_id", "embedding")
    }

    // q55: Bloom pre-filter at scale — shufRecords vs scanRows is the
    // pre-exchange reduction; also audit the plain semi-join baseline
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_returnflag", $"l_quantity")
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .filter($"o_totalprice" > 450000.0).select($"o_orderkey")
    audit(s"q55 bloom semi x$factor") {
      graft.operators.Ops.bloomSemiJoin(li, "l_orderkey", keys, "o_orderkey")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }
    audit(s"plain left_semi x$factor") {
      li.join(keys, $"l_orderkey" === $"o_orderkey", "left_semi")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }
    // the operator's actual regime: a key set PAST broadcast capacity
    // (simulated by disabling auto-broadcast) — the plain semi then
    // shuffles BOTH full sides on the key, while the Bloom path
    // pre-filters the big side ahead of its exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    audit(s"q55 bloom semi x$factor NOBCAST") {
      graft.operators.Ops.bloomSemiJoin(li, "l_orderkey", keys, "o_orderkey")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }
    audit(s"plain left_semi x$factor NOBCAST") {
      li.join(keys, $"l_orderkey" === $"o_orderkey", "left_semi")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // O24/O28 day-N maintenance at scale: index build is the one-time
    // cost; the probe and append must stay O(batch), corpus-flat
    val idxDir = s"$dir/bandindex"
    val t0 = System.nanoTime()
    graft.operators.Dedup.writeBandIndex(docs, "doc_id", "text", idxDir)
    println(f"writeBandIndex x$factor: ${(System.nanoTime() - t0) / 1e9}%.2f s (one-time)")
    val batch = spark.read.parquet(s"$base/documents.parquet")
      .filter($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + lit(900000000L))
    batch.write.mode("overwrite").parquet(s"$dir/day2batch.parquet")
    val day2 = spark.read.parquet(s"$dir/day2batch.parquet")
    audit(s"probeBandIndex day-2 x$factor") {
      graft.operators.Dedup.probeBandIndex(day2, "doc_id", "text",
        graft.operators.Dedup.readBandIndex(spark, idxDir))
    }
    val t1 = System.nanoTime()
    graft.operators.Dedup.appendBandIndex(day2, "doc_id", "text", idxDir)
    println(f"appendBandIndex ${day2.count()} docs: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    audit(s"probeBandIndex day-3 x$factor") {
      graft.operators.Dedup.probeBandIndex(
        day2.withColumn("doc_id", $"doc_id" + lit(1000L)), "doc_id", "text",
        graft.operators.Dedup.readBandIndex(spark, idxDir))
    }
    // O29 day-2 ANN: one-time index build, then bounded probes that
    // read only their nprobe cell partitions regardless of corpus
    val annDir = s"$dir/annindex"
    val t2 = System.nanoTime()
    graft.operators.Ops.writeAnnIndex(emb, "vec_id", "embedding", annDir)
    println(f"writeAnnIndex x$factor: ${(System.nanoTime() - t2) / 1e9}%.2f s (one-time)")
    audit(s"probeAnnIndex 10 probes x$factor") {
      graft.operators.Ops.probeAnnIndex(
        emb.orderBy($"vec_id").limit(10), "vec_id", "embedding",
        graft.operators.Ops.readAnnIndex(spark, annDir))
    }
    val t3 = System.nanoTime()
    graft.operators.Ops.appendAnnIndex(
      spark.read.parquet(s"$base/embeddings.parquet")
        .withColumn("vec_id", $"vec_id" + lit(900000000L)).limit(100),
      "vec_id", "embedding", annDir)
    println(f"appendAnnIndex 100 vecs: ${(System.nanoTime() - t3) / 1e9}%.2f s")
    spark.stop()
    // the staged corpus is GBs at x100 — don't leave it in /tmp
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }
}
