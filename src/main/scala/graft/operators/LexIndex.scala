package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.operators.{IndexLayout => IL}

/** O51: the persisted LEXICAL index — BM25 serving without a corpus
  * rescan, the same productionization step the ANN path got in O29/
  * O46. [[Similarity.bm25TopK]] recomputes tf/df/doc-lengths from the
  * corpus per call; a serving stack builds them ONCE and probes a
  * stored, bucket-partitioned layout — ONE versioned epoch holds all
  * of it (a reader can never pair new postings with old doclens):
  *
  *   store/vNNN/postings/  (bucket, term, doc_id, tf)  hive `bucket=` dirs
  *   store/vNNN/terms/     (bucket, term, df)          hive `bucket=` dirs
  *   store/vNNN/doclens/   (doc_id, dl)
  *   store/vNNN/_LEXSTATS  manifest: exact-int ndocs/ntok + nBuckets + idCol
  *                         (written BEFORE the publish flip)
  *
  * bucket = hash60(term) mod nBuckets, so a probe touches ONLY the
  * bucket directories its query terms hash to — at 100 TB the
  * corpus-scaled postings store is read |query-term buckets| / nBuckets
  * sparsely (measured in LexIndexSpec via the scan's numPartitions
  * metric), the terms store likewise, and only matched doc_ids pull
  * their lengths through the doclens join. All stored quantities are
  * exact int64 (tf/df/dl/ndocs/ntok); scoring reuses
  * [[Similarity.bm25Rank]] VERBATIM, so probe results are bit-equal to
  * the corpus-rescan form (spec-pinned) — the avgdl division, the one
  * ln, the rounded-rank discipline all live in that one definition.
  *
  * Lifecycle: the three stores publish versioned epochs with the O30
  * atomic `_CURRENT` flip (readers resolve the manifest; a probe
  * mid-publish sees the old epoch). The manifest is AUTHORITATIVE for
  * nBuckets/idCol (the O43 discipline) — probes derive routing from
  * it, never from caller args. Updating the index is an epoch rewrite
  * (df/ndocs/ntok are corpus-global, so incremental appends would
  * serve stale statistics; the rewrite cost is one t09-shaped agg
  * pass — cheap next to what it indexes).
  */
object LexIndex {

  final case class LexIndexHandle(
      postings: DataFrame,
      terms: DataFrame,
      doclens: DataFrame,
      ndocs: Long,
      ntok: Long,
      nBuckets: Int)

  private val MetaName = "_LEXSTATS"

  def writeLexIndex(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"writeLexIndex: nBuckets must be > 0, got $nBuckets")
    val spark = docs.sparkSession
    // one cached narrow relation feeds FOUR consumers (stats head,
    // postings write, terms agg, doclens write) — the d02/t28 cache
    // discipline; without it the corpus explode runs four times
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(expr(s"filter(split($textCol, ' '), x -> x <> '')")).as("term"))
      .cache()
    val bucketOf =
      pmod(PortableHash.hash60(col("term")), lit(nBuckets.toLong)).cast("int")
    val post = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketOf)
      .select(col("bucket"), col("term"), col("doc_id"), col("tf"))
      .cache()
    val terms = post.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("df"))
    val dls = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val statsRow = dls.agg(
      coalesce(sum(col("dl")), lit(0L)).as("ntok"),
      count(lit(1)).as("ndocs")).head()
    val (ntok, ndocs) = (statsRow.getLong(0), statsRow.getLong(1))
    // an index over nothing would publish an epoch whose zero-row
    // hive-partitioned stores carry no schema (unreadable) and whose
    // BM25 statistics are undefined (avgdl = 0/0) — fail loudly at
    // build time rather than at some later probe
    require(ndocs > 0,
      "writeLexIndex: the corpus is empty — refusing to publish an " +
        "unreadable/statistics-free epoch; guard upstream")

    // ONE versioned root holds all three stores, so readers can never
    // pair new postings with old doclens (a torn cross-store read
    // would silently drop/mis-normalize docs); the manifest lands
    // BEFORE the atomic publish flip, so a published epoch is always
    // readable, even across a writer crash mid-sequence
    val root = s"$path/store"
    val v = IL.nextVersion(spark, root)
    val sink = graft.sinks.RoutedSink.standard()
    sink.write(s"parquet:$root/$v/postings:by:bucket", post)
    sink.write(s"parquet:$root/$v/terms:by:bucket", terms)
    dls.write.mode("overwrite").parquet(s"$root/$v/doclens")
    IL.writeMeta(spark, s"$root/$v", MetaName,
      s"""{"ndocs":$ndocs,"ntok":$ntok,"nBuckets":$nBuckets,""" +
        s""""idCol":"${Ops.jsonEscape(idCol)}"}""")
    IL.publish(spark, root, v)
    IL.gcVersions(spark, root, keep = 1)
    post.unpersist(); tok.unpersist()
  }

  /** Resolve the CURRENT epoch (one atomic flip covers postings,
    * terms, doclens AND the stats manifest). */
  def readLexIndex(spark: SparkSession, path: String): LexIndexHandle = {
    val dir = IL.resolveDir(spark, s"$path/store")
    val meta = IL.readMeta(spark, dir, MetaName).getOrElse(
      sys.error(s"readLexIndex: $dir has no $MetaName manifest"))
    def longOf(k: String): Long =
      ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(meta).map(_.group(1).toLong)
        .getOrElse(sys.error(s"readLexIndex: malformed $MetaName: $meta"))
    LexIndexHandle(
      postings = spark.read.parquet(s"$dir/postings"),
      terms = spark.read.parquet(s"$dir/terms"),
      doclens = spark.read.parquet(s"$dir/doclens"),
      ndocs = longOf("ndocs"),
      ntok = longOf("ntok"),
      nBuckets = longOf("nBuckets").toInt)
  }

  /** BM25 top-k against the stored index. `queries`: (q_id, term)
    * rows, benchmark-sized. `routeOnDriver = true` computes the
    * query-term → bucket set with the JVM twin of the portable hash
    * (a bounded driver routing table, the probeAnnIndex pattern) and
    * pushes it as a static `bucket IN (...)` filter — partition
    * pruning at plan time; `false` keeps everything in the plan and
    * relies on the broadcast join's dynamic pruning. Results are
    * bit-equal to [[Similarity.bm25TopK]] on the indexed corpus
    * (LexIndexSpec pins row equality and measures the pruning).
    */
  def probeLexIndex(
      queries: DataFrame,
      index: LexIndexHandle,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      routeOnDriver: Boolean = true): DataFrame = {
    val bucketOf =
      pmod(PortableHash.hash60(col("term")), lit(index.nBuckets.toLong)).cast("int")
    val q = queries.select(col("q_id"), col("term")).withColumn("bucket", bucketOf)
    val (post, terms) =
      if (!routeOnDriver) (index.postings, index.terms)
      else {
        // driver routing table: one bucket id per DISTINCT query term
        // — bounded by the query workload, never the corpus
        val buckets = queries.select(col("term")).distinct()
          .collect()
          .map(r => (PortableHash.hash60Jvm(r.getString(0)) % index.nBuckets).toInt)
          .distinct.toSeq
        (index.postings.where(col("bucket").isin(buckets: _*)),
          index.terms.where(col("bucket").isin(buckets: _*)))
      }
    val scored = post
      .join(broadcast(q), Seq("bucket", "term"))
      .join(broadcast(terms), Seq("bucket", "term"))
      .join(index.doclens, "doc_id")
      .withColumn("ntok", lit(index.ntok))
      .withColumn("ndocs", lit(index.ndocs))
    Similarity.bm25Rank(scored, k, k1, b)
  }
}
