package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2.5) over the events
  * schema. Each builder takes a streaming DataFrame (readStream) and
  * returns the transformed stream; batch/stream parity lets the same
  * logic run in both modes (tests drive them with file sources + the
  * memory sink).
  *
  * Scale notes: watermarks bound state; the stateful sessionizer keys
  * by user_id so state shards across executors; streaming dedup keys
  * by event_id within the watermark horizon.
  */
object Streams {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double
  )

  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long
  )

  // public: Catalyst's state Encoder generates constructor calls
  final case class SessionState(
      start: Long,
      end: Long,
      n: Long
  )

  /** ST1: watermarked tumbling-window aggregation. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"),
        col("n"),
        col("total_value")
      )

  /** ST2: stateful gap-based sessionization (30 min) with event-time
    * timeout — sessions emit when the watermark passes their gap.
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (userId, events, state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(
            Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
          )
        } else {
          var closed = List.empty[Session]
          var cur = state.getOption
          events.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end <= gapMs =>
                cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
              case Some(s) =>
                closed ::= Session(userId, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.end), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.end + gapMs)
          }
          closed.reverseIterator
        }
      }
  }

  final case class AsOfMatch(
      event_id: Long,
      user_id: Long,
      ts: java.sql.Timestamp,
      lag_us: Long // micros since latest at-or-before click; -1 = none
  )

  // public: Catalyst's state Encoder generates constructor calls.
  // `lastClickUs` compacts every click below the watermark to one
  // long; `pending` holds only events at-or-above it.
  final case class AsOfState(
      lastClickUs: Long,
      pending: List[(Long, Long, Boolean)] // (event_id, ts_us, isClick)
  )

  /** ST11: streaming as-of join — each purchase matched to the same
    * user's latest at-or-before click (q57/O1's semantics), EXACT
    * under out-of-order arrival: results emit only once the watermark
    * passes the purchase's timestamp, at which point every earlier
    * click has either arrived or been excluded by the same watermark
    * that bounds every other stateful op here. The batch twin is
    * Ops.asofJoin on the same events (spec-pinned).
    *
    * State per user is BOUNDED: everything below the watermark
    * compacts to ONE long (the latest click ts — older clicks can
    * never win an as-of match again); only the in-flight horizon
    * (watermark delay's worth of events) stays buffered. Keyed by
    * user_id, so state shards across executors like ST2.
    */
  def asofStream(spark: SparkSession, events: DataFrame): Dataset[AsOfMatch] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (userId, batch, state: GroupState[AsOfState]) =>
        val wm = state.getCurrentWatermarkMs() * 1000L // micros
        val prev = state.getOption.getOrElse(AsOfState(-1L, Nil))
        // full micros: getTime is millis-truncated, getNanos carries
        // the complete within-second fraction (events are µs-valued)
        def micros(t: java.sql.Timestamp): Long =
          t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        val incoming = batch.map(e =>
          (e.event_id, micros(e.ts), e.event_type == "click")).toList
        val all = prev.pending ++ incoming
        // ripe = strictly below the watermark: nothing earlier can
        // still arrive. Sort by (ts, clicks-first) — the inclusive
        // boundary of the batch operator.
        val (ripe, hold) = all.partition(_._2 < wm)
        var lastClick = prev.lastClickUs
        val out = List.newBuilder[AsOfMatch]
        ripe.sortBy(t => (t._2, !t._3)).foreach { case (id, us, isClick) =>
          if (isClick) lastClick = math.max(lastClick, us)
          else {
            val t = new java.sql.Timestamp(us / 1000L)
            t.setNanos((us % 1000000L).toInt * 1000)
            out += AsOfMatch(id, userId, t,
              if (lastClick < 0) -1L else us - lastClick)
          }
        }
        // NEVER drop lastClick on an idle flush: the latest click
        // stays as-of-relevant FOREVER (a purchase hours later still
        // matches it), so an idle user's state compacts to the one
        // long — removed only if there is truly nothing to remember.
        // Per-user steady state is bounded by user cardinality (16
        // bytes each), not event volume.
        if (hold.isEmpty && lastClick < 0) state.remove()
        else {
          state.update(AsOfState(lastClick, hold))
          // wake this key when the watermark passes its oldest
          // pending event, even if no new data arrives for it
          if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_._2).min / 1000L + 1L)
        }
        out.result().iterator
      }
  }

  /** ST3: streaming exact dedup on event_id within the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")

  /** ST4: stream-stream interval join — purchases matched to the same
    * user's clicks within the preceding hour. Watermarks on both
    * sides + the time-range condition bound the join state.
    */
  def streamStreamJoin(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "30 minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "30 minutes")
    purchases.join(
      clicks,
      expr("p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 1 HOUR")
    )
  }

  /** ST5: stream-static enrichment join — the streaming side joins a
    * static dimension DataFrame (re-read per micro-batch by Spark, so
    * slowly-changing dims pick up updates). The static side should be
    * broadcastable; no state is kept (unlike stream-stream joins), so
    * this scales with the static side's size only.
    */
  def streamStaticEnrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** ST6: streaming near-duplicate candidate detection against a
    * static corpus index — the ingestion-time "is this new document a
    * near-dup of anything already in the corpus" check. The index is
    * the corpus's (band, bh) minhash band keys (build it once with
    * [[graft.operators.Dedup.bandKeys]] and persist/broadcast it);
    * each incoming doc is banded PER ROW with the identical md5
    * derivation (array_min over the shingle array — no aggregation,
    * so the query is append-mode legal and stateless: the index IS
    * the state). The join is a stream-static equi-join on (band, bh);
    * at 100 TB the index is bucketed by bh so each micro-batch probes
    * only matching buckets. Output: one row per (new doc, band,
    * matched corpus doc) — downstream either drops matches or runs
    * the exact verify on the candidate pairs.
    */
  def dupCandidatesStream(newDocs: DataFrame, index: DataFrame): DataFrame =
    graft.operators.Dedup.bandKeys(newDocs, "doc_id", "text")
      .join(index.select(col("doc_id").as("corpus_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .where(col("doc_id") =!= col("corpus_id"))
      .select(col("doc_id"), col("band"), col("corpus_id"))

  final case class DocTokens(doc_id: Long, lang: String, n_tokens: Long)

  final case class PackedDoc(doc_id: Long, lang: String, n_tokens: Long, bin_id: Long)

  // public: Catalyst's state Encoder generates constructor calls
  final case class PackState(cum: Long)

  /** ST7: streaming sequence packing — token-budget bin assignment at
    * ingestion time (the streaming form of Ops.packBins / t10). State
    * per key is ONE long: the running token count; a doc's bin is
    * cum-before-it / budget, exactly the batch rule. Docs within a
    * micro-batch are processed in doc_id order, so a stream delivered
    * in id order (or any single batch) is spec-equal to the batch
    * packing; out-of-order arrival packs arrival order — the honest
    * semantics of an infinite stream, where "sort the corpus first"
    * doesn't exist. Append-mode legal (no watermark needed:
    * NoTimeout, each doc emits exactly once). At 100 TB key by
    * (lang, shard) exactly like t13 to bound per-key throughput;
    * state size is 8 bytes per key regardless of history.
    */
  def packBinsStream(
      spark: SparkSession,
      docs: DataFrame,
      budget: Long = 512L
  ): Dataset[PackedDoc] = {
    import spark.implicits._
    docs.selectExpr("doc_id", "lang", "n_tokens").as[DocTokens]
      .groupByKey(_.lang)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (lang, it, state: GroupState[PackState]) =>
        var cum = state.getOption.map(_.cum).getOrElse(0L)
        val out = it.toSeq.sortBy(_.doc_id).map { d =>
          val bin = cum / budget
          cum += d.n_tokens
          PackedDoc(d.doc_id, lang, d.n_tokens, bin)
        }
        state.update(PackState(cum))
        out.iterator
      }
  }

  /** ST8: streaming writes through the pattern-routed multi-sink
    * (S3/RoutedSink) — every micro-batch dispatches on a sink ROUTE,
    * so the same routed write surface serves batch and streaming.
    * foreachBatch is Structured Streaming's adapter for sinks without
    * a native streaming writer; `targetFor` maps the batch id to a
    * route.
    *
    * REPLAY CONTRACT: after crash recovery Structured Streaming
    * re-invokes the batch writer with the SAME batch id, so
    * exactly-once = checkpointing + an idempotent per-target write.
    * Concretely:
    *   - [[perBatchOverwriteTarget]] (the recommended ST8 target):
    *     one overwrite-mode parquet directory per batch id — a
    *     replayed batch REWRITES its own directory and the read-back
    *     corpus is unchanged (StreamingSpec pins this);
    *   - a constant `parquet:`/`csv:`/`json:` route is idempotent
    *     only under single-batch replay (each batch overwrites the
    *     whole target);
    *   - `parquet-append:` routes duplicate on replay — only pair
    *     them with dedup-on-read consumers (the O24/O29 index
    *     contract: probes distinct candidates, compaction reclaims),
    *     never with a plain read-back corpus;
    *   - `parquet-append-batch:{path}:id:{batchId}` is the
    *     exactly-once append: batch-keyed stage-then-move under
    *     deterministic file names, replay rewrites instead of
    *     duplicating — what the ledger-guarded streams
    *     (ST24/ST25/ST26/ST27) use for their audit trails.
    */
  def routedStreamSink(
      stream: DataFrame,
      sink: graft.sinks.RoutedSink,
      targetFor: Long => String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(routedBatchWriter(sink, targetFor))

  /** The per-micro-batch write function behind [[routedStreamSink]],
    * exposed so the replay contract is TESTABLE: invoking it twice
    * with one batch id is exactly what recovery does.
    */
  def routedBatchWriter(
      sink: graft.sinks.RoutedSink,
      targetFor: Long => String
  ): (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, id) => sink.write(targetFor(id), batch.toDF())

  /** The idempotent-replay ST8 target: `parquet:<base>/batch_<id>` —
    * the overwrite-mode parquet route into a PER-BATCH directory, so
    * a replayed micro-batch rewrites its own directory instead of
    * appending duplicates, and a glob read-back (`spark.read.parquet`
    * over base + slash-wildcard) sees each batch exactly once.
    * (`batch=` hive naming would be nicer provenance, but `=` is
    * outside the router's `path` value pattern — `[a-z0-9./_-]+`,
    * mirrored from the reference — so the separator is `_`.)
    */
  def perBatchOverwriteTarget(base: String): Long => String =
    id => s"parquet:$base/batch_$id"

  /** ST6's write half: streaming maintenance of the persisted band
    * index. Each micro-batch of KEPT docs (post-verdict, the
    * [[graft.operators.Dedup.appendBandIndex]] contract) bands per
    * row — stateless, append-mode legal — and appends through the
    * same routed `:append` sink route the batch maintainer uses, so
    * one write surface serves both ingestion modes. Exactly-once =
    * checkpointing + the replay caveat of any file-append sink: a
    * replayed micro-batch appends its band keys twice, which is
    * HARMLESS to probe semantics (candidates are distinct-ed) and
    * reclaimed by the next [[graft.operators.Dedup.compactBandIndex]]
    * if dedup-on-compact is added; strict once-only needs per-batch
    * subdirectories (the `targetFor(batchId)` form below).
    */
  def appendBandIndexStream(
      keptDocs: DataFrame,
      path: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    routedStreamSink(
      graft.operators.Dedup.bandKeys(keptDocs, "doc_id", "text")
        .withColumn("pfx", substring(col("bh"), 1, 1)),
      graft.sinks.RoutedSink.standard(),
      // resolve the manifest PER micro-batch (targetFor runs at each
      // trigger): appends land inside the current version directory,
      // and a compaction publishing mid-stream redirects the next
      // batch to the new version automatically
      _ => "parquet-append:" +
        graft.operators.IndexLayout.resolveDir(keptDocs.sparkSession, path) +
        ":by:band+pfx")

  /** ST9's write half (ST10): streaming maintenance of the persisted
    * trained-IVFPQ index — a vector-ingestion stream grows the stored
    * inverted lists, the O28 appendBandIndexStream pattern applied to
    * ANN. Encoding a micro-batch needs two broadcast-argmin
    * aggregations against the stored quantizers (cell assignment +
    * PQ codes), which append-mode streaming forbids mid-plan, so each
    * batch runs [[graft.operators.Ops.appendAnnIndex]] inside
    * foreachBatch — reading the two tiny quantizer frames per batch,
    * never the corpus — and appends through the routed
    * `parquet-append` sink into only the cells the new vectors hash
    * to. Probes see streamed vectors immediately. Exactly-once =
    * checkpointing + the file-append replay caveat documented on
    * appendAnnIndex: a replayed micro-batch appends duplicate rows,
    * which probeAnnIndex's candidate distinct keeps harmless and
    * [[graft.operators.Ops.compactAnnIndex]] reclaims.
    */
  def appendAnnIndexStream(
      vecStream: DataFrame,
      indexPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      dim: Int = 64
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Ops.appendAnnIndex(batch.toDF(), idCol, vecCol, indexPath,
          m = m, dim = dim)
    }

  /** ST13: continuous ingestion into the O40 training-shard layout —
    * each micro-batch routes through
    * [[graft.operators.Ops.appendShuffledShards]] (foreachBatch: the
    * per-batch range repartition + per-task sort is not expressible
    * as a single append-mode streaming plan), so every streamed doc
    * lands in the SAME shard=K directory the batch rewrite would
    * assign it (pure (id, seed) arithmetic — shard placement is
    * ingestion-order-independent) and each appended file is
    * internally permutation-ordered. Cross-file epoch order stays
    * approximate until the epoch-boundary [[graft.operators.Ops
    * .writeShuffledShards]] rewrite — the "ingest all day, reshuffle
    * nightly" production shape. Exactly-once = checkpointing + the
    * file-append replay caveat on appendShuffledShards (replayed
    * batches append duplicates; the epoch rewrite dedupes on id).
    *
    * (nShards, seed) default to "derive from the layout's _LAYOUT
    * manifest" — a redeploy can't silently drift the permutation
    * regime; explicit values are validated against the manifest and
    * only REQUIRED when the first micro-batch creates the layout
    * (see appendShuffledShards).
    */
  def appendShuffledShardsStream(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      nShards: Int = -1,
      seed: String = null
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Ops.appendShuffledShards(batch.toDF(), idCol, path,
          nShards, seed)
    }

  /** ST21: ingestion-time token-ID emission — t26/O44's training-data
    * last mile on the stream, so a crawl feed becomes loader-ready
    * fixed-length ID windows as it ARRIVES instead of in a nightly
    * batch. [[graft.operators.TextAnalysis.tokenizeWindows]] (X15
    * codegen encode + explode into padded W-windows) is stateless
    * per-row work — no agg, no watermark, no state store — so it runs
    * INSIDE the streaming plan and tokens flow incrementally; only
    * the shard placement runs per micro-batch (foreachBatch →
    * [[graft.operators.Ops.appendShuffledShards]] keyed on the
    * doc:window sample_id, manifest-validated like ST13). Epoch
    * hygiene is ST13's exactly: appended files are internally
    * permutation-ordered, cross-file order decays to arrival order,
    * and the boundary [[graft.operators.Ops.compactShuffledShards]]
    * (O43) restores exact epoch order and dedupes at-least-once
    * replays on sample_id. (nShards, seed) default to
    * "derive from _LAYOUT"; required only when the first micro-batch
    * creates the layout.
    */
  def tokenizePackStream(
      docs: DataFrame,
      path: String,
      window: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id",
      nShards: Int = -1,
      seed: String = null
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val windows = graft.operators.TextAnalysis.tokenizeWindows(docs, window, textCol)
      .withColumn("sample_id",
        concat(col(idCol).cast("string"), lit(":"), col("window_id").cast("string")))
    windows.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Ops.appendShuffledShards(batch.toDF(), "sample_id", path,
          nShards, seed)
    }
  }

  /** ST9: streaming ANN lookup against the PERSISTED trained-IVFPQ
    * index (O29) — the ingestion-time "what does this new embedding
    * near-duplicate" check, the vector analogue of ST6. Each
    * micro-batch of probe vectors is ranked by
    * [[graft.operators.Ops.probeAnnIndex]] — top-k per probe needs a
    * per-probe aggregation and window, which append-mode streaming
    * forbids mid-plan, so the batch ranking runs per micro-batch in
    * foreachBatch (exactly how a serving layer drains a probe queue)
    * and results append through the routed sink. The index is the
    * state; the stream holds none.
    */
  def annProbeStream(
      probeStream: DataFrame,
      indexPath: String,
      outPath: String,
      nprobe: Int = 2,
      topK: Int = 5,
      refine: Int = 0,
      allowedIds: Option[DataFrame] = None
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    probeStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val idx = graft.operators.Ops.readAnnIndex(batch.sparkSession, indexPath)
        // allowedIds is a static frame RE-EXECUTED per micro-batch,
        // but refresh semantics depend on its source: a JDBC/Delta/
        // catalog-table frame re-reads current data each trigger (the
        // ST5 discipline), while a plain spark.read.parquet frame
        // CACHES its file listing at creation — appended/rewritten
        // allow-list files are NOT picked up (re-create the frame, or
        // read through a table, for rights tables that must revoke)
        graft.sinks.RoutedSink.standard().write(s"parquet-append:$outPath",
          graft.operators.Ops.probeAnnIndex(batch.toDF(), "vec_id", "embedding",
            idx, nprobe = nprobe, topK = topK, refine = refine,
            allowedIds = allowedIds))
    }

  /** ST22: streaming BINARY-quantized filtered probe — the ST9
    * serving pattern over O46's sign-sketch path: each micro-batch
    * of probe vectors runs [[graft.operators.Ops.probeSignIndex]]
    * against the persisted sigs sidecar (popcount coarse scan on the
    * nprobe routed cells, allow-list pre-filter, exact rerank from
    * the cell-pruned vectors store) and results append through the
    * routed sink. The index is the state; the stream holds none —
    * per-probe results are batch-independent, so micro-batch
    * boundaries cannot change values (StreamingSpec pins stream ==
    * batch row-for-row). Same allowedIds refresh caveat as ST9.
    */
  def signProbeStream(
      probeStream: DataFrame,
      indexPath: String,
      outPath: String,
      nprobe: Int = 2,
      hammingTopM: Int = 50,
      topK: Int = 5,
      allowedIds: Option[DataFrame] = None,
      allowedIdsCount: Option[Long] = None
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    probeStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val idx = graft.operators.Ops.readAnnIndex(batch.sparkSession, indexPath)
        graft.sinks.RoutedSink.standard().write(s"parquet-append:$outPath",
          graft.operators.Ops.probeSignIndex(batch.toDF(), "vec_id", "embedding",
            idx, nprobe = nprobe, hammingTopM = hammingTopM, topK = topK,
            allowedIds = allowedIds, allowedIdsCount = allowedIdsCount))
    }

  /** ST23: streaming LEXICAL probe — the ST9/ST22 serving pattern
    * over O51's stored BM25 index: each micro-batch of (q_id, term)
    * query rows probes [[graft.operators.LexIndex.probeLexIndex]]
    * against the persisted bucket-partitioned postings (driver-routed
    * `bucket IN` pruning per batch — the batch's term set is
    * trigger-bounded, so the routing table stays tiny) and the fused
    * top-k rows append through the routed sink. The index is the
    * state; the stream holds none — per-query results depend only on
    * the query's own terms and the stored statistics, so micro-batch
    * boundaries cannot change values (StreamingSpec pins stream ==
    * batch row-for-row). The handle is re-read per batch, so BOTH an
    * epoch rewrite (writeLexIndex) and day-2 appended postings
    * (appendLexIndex — new files + stats-delta manifests in the same
    * epoch) are picked up at the next trigger with fresh corpus-global
    * statistics — never a torn mix of old postings and new df.
    */
  def lexProbeStream(
      queryStream: DataFrame,
      indexPath: String,
      outPath: String,
      topK: Int = 10
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val idx = graft.operators.LexIndex.readLexIndex(batch.sparkSession, indexPath)
        graft.sinks.RoutedSink.standard().write(s"parquet-append:$outPath",
          graft.operators.LexIndex.probeLexIndex(batch.toDF(), idx, k = topK))
    }

  /** ST24: streaming repeated-interval detection — t28's memorization
    * report at INGESTION, over O52's stored gram index: each
    * micro-batch of documents is probed against the persisted gram
    * counts (covered iff stored + within-batch occurrences ≥ 2,
    * islands per doc — the probe plan broadcasts only the batch's
    * gram set, DPP-pruning the stored buckets), the intervals append
    * through the routed sink, and THEN the batch's own gram counts
    * append into the index — so later batches see earlier ones (the
    * probe-before-append order keeps each batch's contract: new docs
    * vs the past + themselves, never double-counted). The index is
    * the state; the stream holds none. The WHOLE TRIGGER is
    * exactly-once under the engine's at-least-once foreachBatch
    * replays: the micro-batch id keys O52's append ledger, and a
    * replayed trigger SKIPS ENTIRELY when its marker exists — not
    * just the append. Skipping the probe too is load-bearing: a
    * committed append means the index already contains the batch's
    * own counts, so re-probing would see stored + batch ≥ 2 at every
    * batch position and append false "repeated" rows for unique
    * content to the output (the completed attempt wrote the batch's
    * probe rows BEFORE it appended, so nothing is lost by skipping).
    * The OUTPUT append is exactly-once too: it goes through the
    * batch-keyed `parquet-append-batch` route (stage-then-move under
    * deterministic names), so a driver death BETWEEN the output write
    * and the ledger commit — the window where the replay re-runs the
    * whole trigger — rewrites the same files instead of duplicating
    * the batch's probe rows. StreamingSpec stages an engine-level
    * replay and pins index state + probe rows identical.
    */
  /** ST24's per-trigger body, factored for direct crash-window
    * testing. TWO-PHASE replay guard: the batch marker alone cannot
    * cover the window where the index append's file MOVES have
    * happened but the marker hasn't (the appended counts are
    * reader-visible at the moves) — a replayed probe there would see
    * stored+batch >= 2 for every unique batch gram and overwrite the
    * correct output files with false "repeated" rows. So phase 1
    * (probe + batch-keyed output write) commits its own `outdone`
    * marker BEFORE any index mutation; a replay after it skips
    * straight to the idempotent append.
    */
  private[graft] def gramProbeTrigger(
      df0: org.apache.spark.sql.DataFrame, batchId: Long,
      indexPath: String, outPath: String): Unit = {
    val spark = df0.sparkSession
    if (!graft.operators.GramIndex.appendCommitted(spark, indexPath, batchId)) {
      val df = df0.cache()
      try {
        if (!graft.operators.GramIndex.outputCommitted(spark, indexPath, batchId)) {
          val idx = graft.operators.GramIndex.readGramIndex(spark, indexPath)
          graft.sinks.RoutedSink.standard().write(
            s"parquet-append-batch:$outPath:id:$batchId",
            graft.operators.GramIndex.probeGramIndex(df, idx))
          graft.operators.GramIndex.commitOutput(spark, indexPath, batchId)
        }
        graft.operators.GramIndex.appendGramIndex(df, indexPath, batchId)
      } finally df.unpersist()
    }
  }

  def gramProbeStream(
      docStream: DataFrame,
      indexPath: String,
      outPath: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gramProbeTrigger(batch.toDF(), batchId, indexPath, outPath)
    }

  /** ST12: streaming decontamination — the ingestion-time form of
    * d16 (the ST9 serving pattern): each micro-batch of incoming docs
    * is measured against the STATIC eval-benchmark table via the
    * exact Dedup.decontaminate machinery and the per-doc overlap rows
    * append through the routed sink. The stream holds NO state — the
    * eval universe is the state, re-derived per batch from the static
    * frame (benchmark-sized, broadcast inside the batch job), so eval
    * suite updates are picked up at the next micro-batch the way
    * ST5's dims are. Per-doc results are batch-independent (each
    * doc's overlap depends only on itself and the eval set), so
    * micro-batch boundaries cannot change values — StreamingSpec pins
    * streamed rows == the batch operator over the same corpus.
    */
  def decontaminateStream(
      newDocs: DataFrame,
      evalDocs: DataFrame,
      outPath: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    newDocs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sinks.RoutedSink.standard().write(s"parquet-append:$outPath",
          graft.operators.Dedup.decontaminate(batch.toDF(), evalDocs))
    }

  /** ST14: windowed MERGEABLE quantile sketch — per (5-min window,
    * event_type) approx p50/p90/p99 of `value` via approx_percentile's
    * Greenwald-Khanna summary: the streaming form of q64. The sketch
    * buffer IS the streaming state — O(accuracy·log n) per open
    * window instead of the raw values a sort-based percentile would
    * buffer — and summaries merge associatively across micro-batches,
    * so state size is independent of window row count. Append mode
    * emits each window exactly once, when the watermark closes it;
    * the deterministic GK rank bound (error <= n/accuracy per
    * summary, 2x under merges — measured in GkErrProbe) carries over
    * unchanged because the merged summary is the same object the
    * batch agg builds.
    */
  def windowedQuantiles(events: DataFrame, accuracy: Int = 1000): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        expr(s"approx_percentile(value, array(0.5D, 0.9D, 0.99D), $accuracy)").as("pct"),
        count(lit(1)).as("n"))
      .select(
        col("window.start").as("w_start"), col("event_type"),
        col("pct")(0).as("p50"), col("pct")(1).as("p90"), col("pct")(2).as("p99"),
        col("n"))

  // ST15 typed surface. k/value are Options: a change op with no key
  // in props or a NULL payload must flow through the state machine
  // (grouped under the null key / carried as-is), not NPE the encoder.
  final case class ChangeOp(
      user_id: Long,
      k: Option[Long],
      ts_us: Long,
      event_id: Long,
      event_type: String,
      value: Option[Double]
  )

  // public: Catalyst's state Encoder generates constructor calls
  final case class CompactState(
      ts_us: Long,
      event_id: Long,
      op: String,
      value: Option[Double],
      nOps: Long
  )

  final case class CompactRow(
      user_id: Long,
      k: Option[Long],
      last_ts_us: Long,
      last_op: String,
      last_value: Option[Double],
      n_ops: Long,
      is_tombstone: Boolean
  )

  /** ST15: streaming changelog compaction — q65's CDC reduce
    * (last-writer-wins per (user_id, k), 'error' as the delete
    * tombstone) maintained continuously. Per-key state is O(1) and
    * ORDER-FREE: the running (ts_us, event_id)-lexicographic max plus
    * the op count — the same unique-total-order struct-max q65
    * aggregates in one shot, folded across micro-batches as keyed
    * state, so arrival order and batch boundaries cannot change the
    * fixpoint (the spec feeds the log ts-interleaved to pin exactly
    * that). Update mode: every key a batch touches re-emits its
    * refreshed current row; a tombstoned key emits is_tombstone=true
    * (a MERGE-style sink deletes on it) rather than vanishing,
    * because the tombstone must keep suppressing older upserts that
    * arrive late. No timeout: current state IS the product. At scale
    * the state store shards by key exactly as q65's shuffle would,
    * each op touches one O(1) record, and emitted rows per trigger
    * are bounded by keys-touched, not log size.
    */
  def changelogCompactStream(spark: SparkSession, ops: DataFrame): Dataset[CompactRow] = {
    import spark.implicits._
    ops
      .select(
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[ChangeOp]
      .groupByKey(o => (o.user_id, o.k))
      .mapGroupsWithState[CompactState, CompactRow](GroupStateTimeout.NoTimeout) {
        case ((uid, k), batchOps, state) =>
          var s = state.getOption
            .getOrElse(CompactState(Long.MinValue, Long.MinValue, "", None, 0L))
          batchOps.foreach { o =>
            val newer = o.ts_us > s.ts_us ||
              (o.ts_us == s.ts_us && o.event_id > s.event_id)
            s =
              if (newer) CompactState(o.ts_us, o.event_id, o.event_type, o.value, s.nOps + 1)
              else s.copy(nOps = s.nOps + 1)
          }
          state.update(s)
          CompactRow(uid, k, s.ts_us, s.op, s.value, s.nOps, s.op == "error")
      }
  }

  /** ST16: streaming container-invariant raster dup candidates — the
    * multimodal twin of ST6, closing the same ingestion-time question
    * for media: "is this incoming payload's RASTER BODY already in
    * the corpus, under ANY container?" Each incoming payload is
    * banded PER ROW through m08's exact derivation
    * ([[graft.operators.Multimodal.rasterBandKeys]]: X12 structural
    * walk + byte-8-gram mod-16 sketch + X8 minhash + md5 band
    * hashes) — stateless, so the query is append-mode legal and the
    * persisted index IS the state. The join is a stream-static
    * equi-join on (band, bh); identical bodies have identical
    * sketches, so a re-containered duplicate of ANY indexed asset
    * collides on all 4 bands no matter which container either side
    * arrived in. Output: (doc_id, band, corpus_id) candidates —
    * downstream drops, quarantines, or exact-verifies (m08's
    * array_intersect on full gram sets) the pairs. At 100 TB the
    * index is the same hive-partitioned (band, pfx) layout ST6
    * probes, so each micro-batch touches only matching buckets.
    */
  def rasterDupCandidatesStream(newPayloads: DataFrame, index: DataFrame): DataFrame =
    graft.operators.Multimodal.rasterBandKeys(newPayloads, "doc_id", "payload")
      .join(index.select(col("doc_id").as("corpus_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .where(col("doc_id") =!= col("corpus_id"))
      .select(col("doc_id"), col("band"), col("corpus_id"))

  /** ST16's write half: streaming maintenance of the persisted raster
    * band index — the same routed `:append` sink and manifest-
    * resolved versioned layout as [[appendBandIndexStream]], so one
    * write surface serves text and media indexes alike (and the same
    * replay caveat applies: a replayed micro-batch's duplicate band
    * keys are harmless to probe semantics and reclaimed at the next
    * compaction).
    */
  def appendRasterBandIndexStream(
      keptPayloads: DataFrame,
      path: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    routedStreamSink(
      graft.operators.Multimodal.rasterBandKeys(keptPayloads, "doc_id", "payload")
        .withColumn("pfx", substring(col("bh"), 1, 1)),
      graft.sinks.RoutedSink.standard(),
      _ => "parquet-append:" +
        graft.operators.IndexLayout.resolveDir(keptPayloads.sparkSession, path) +
        ":by:band+pfx")

  /** ST26: streaming NOVELTY scoring at ingestion — t30 served from
    * O52's stored gram counts, per micro-batch: each incoming doc is
    * scored "how much of you is new vs EVERYTHING ingested before
    * you" (exact ppm — GramIndex.noveltyFromIndex, covered = exists
    * in the store, the against-the-past-only semantics), the scores
    * append through the routed sink, and THEN the batch's own counts
    * append into the index, so the next batch's novelty accounts for
    * this one. Trigger-level exactly-once exactly as ST24 (the ledger
    * marker skips a replayed trigger whole — a re-scored batch would
    * otherwise read its own appended grams and report ~0 novelty for
    * everything; the score append is batch-keyed stage-then-move, so
    * the pre-commit crash window cannot duplicate score rows either).
    * Index is the state; the stream holds none.
    */
  /** ST26's per-trigger body — the gramProbeTrigger two-phase
    * discipline with the novelty scorer in phase 1 (a replayed score
    * after the moves would read ~0 novelty for everything).
    */
  private[graft] def noveltyTrigger(
      df0: org.apache.spark.sql.DataFrame, batchId: Long,
      indexPath: String, outPath: String): Unit = {
    val spark = df0.sparkSession
    if (!graft.operators.GramIndex.appendCommitted(spark, indexPath, batchId)) {
      val df = df0.cache()
      try {
        if (!graft.operators.GramIndex.outputCommitted(spark, indexPath, batchId)) {
          val idx = graft.operators.GramIndex.readGramIndex(spark, indexPath)
          graft.sinks.RoutedSink.standard().write(
            s"parquet-append-batch:$outPath:id:$batchId",
            graft.operators.GramIndex.noveltyFromIndex(df, idx))
          graft.operators.GramIndex.commitOutput(spark, indexPath, batchId)
        }
        graft.operators.GramIndex.appendGramIndex(df, indexPath, batchId)
      } finally df.unpersist()
    }
  }

  def noveltyStream(
      docStream: DataFrame,
      indexPath: String,
      outPath: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        noveltyTrigger(batch.toDF(), batchId, indexPath, outPath)
    }

  /** ST27: the end-to-end streaming CURATION loop — the composition
    * the single-signal streams (ST12 decontamination, ST24 repeated
    * intervals, ST26 novelty) exist to feed, run as ONE per-trigger
    * decision: each micro-batch of documents gets its admission
    * verdict from O56 (quality gate first — failing docs never cost
    * gram work and never touch the index; then the novelty gate
    * against the stored O52 counts), the full verdict frame appends
    * through the routed sink (the audit trail: every doc's fate and
    * the numbers behind it), and THEN only the ADMITTED docs' gram
    * counts append into the index — so the next batch's novelty is
    * measured against the curated corpus, not against spam it
    * rejected (a rejected doc's content stays "novel": if a clean
    * version arrives later it is judged on its own merits).
    * Trigger-level exactly-once exactly as ST24/ST26: the ledger
    * marker skips a replayed trigger whole (a re-curated batch would
    * read its own admitted grams and reject everything as restated),
    * and the verdict append is batch-keyed stage-then-move, so a
    * driver death between the audit write and the ledger commit
    * cannot duplicate verdict rows — admission counts read from the
    * audit trail stay exact under any crash. Index is the state; the
    * stream holds none.
    *
    * OPERATIONAL COUPLING (retention): the append phase re-reads the
    * admitted ids from `outPath`'s batch-keyed files, so the audit
    * directory's retention MUST outlive the index ledger's `outdone`
    * markers — a TTL/cleanup of outPath that outpaces the ledger (or
    * an out dir on a separately-managed filesystem) turns a replay of
    * the crash window into a LOUD, permanent stream failure (by
    * design: recomputing the verdicts post-append would flip them).
    * Recovery when the audit files are verifiably gone AND the index
    * append verifiably did not happen (no `batch-N` marker, no staged
    * files): delete the `outdone-N` marker under the index epoch's
    * `_appends/` to force a full phase-1 recompute of that batch.
    */
  /** ST27's per-trigger body — two-phase like gramProbeTrigger, with
    * one extra subtlety: the index append depends on the VERDICTS
    * (admitted docs only), and a replay after the append's file moves
    * must not recompute them (the index already holds the batch's
    * admitted grams — every verdict would flip to rejected_novelty
    * and even the appended set would diverge). The batch-keyed output
    * files ARE the durable phase-1 verdicts, so the append phase
    * always reads the admitted ids back from them.
    */
  private[graft] def curateTrigger(
      df0: org.apache.spark.sql.DataFrame, batchId: Long,
      indexPath: String, outPath: String,
      minWords: Long, minUniqPpm: Long, minNoveltyPpm: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df0.sparkSession
    if (!graft.operators.GramIndex.appendCommitted(spark, indexPath, batchId)) {
      val df = df0.cache()
      try {
        if (!graft.operators.GramIndex.outputCommitted(spark, indexPath, batchId)) {
          val idx = graft.operators.GramIndex.readGramIndex(spark, indexPath)
          graft.sinks.RoutedSink.standard().write(
            s"parquet-append-batch:$outPath:id:$batchId",
            graft.operators.Curation.curateBatch(
              df, idx, minWords, minUniqPpm, minNoveltyPpm))
          graft.operators.GramIndex.commitOutput(spark, indexPath, batchId)
        }
        val verdicts = graft.operators.IndexLayout
          .readStagedBatch(spark, outPath, batchId)
          .getOrElse(sys.error(
            s"curateTrigger: outdone marker present for batch $batchId but its " +
              "output files are missing — was the sink directory cleaned?"))
        val admitted = df.join(
          verdicts.where(col("verdict") === "admitted").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        graft.operators.GramIndex.appendGramIndex(admitted, indexPath, batchId)
      } finally df.unpersist()
    }
  }

  def curateStream(
      docStream: DataFrame,
      indexPath: String,
      outPath: String,
      minWords: Long = 5L,
      minUniqPpm: Long = 350000L,
      minNoveltyPpm: Long = 100000L
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        curateTrigger(batch.toDF(), batchId, indexPath, outPath,
          minWords, minUniqPpm, minNoveltyPpm)
    }

  /** ST25: streaming PERCEPTUAL near-dup at ingestion — the O54 twin
    * of ST24's probe-then-append loop, closing the image modality's
    * live path: each micro-batch of (doc_id, payload) assets is
    * probed against the persisted perceptual band index (AvgHash60
    * bands broadcast, (band, pfx) buckets DPP-pruned, exact
    * Hamming ≤ 3 verify — batch-bounded at any corpus size), the
    * verified near-dup pairs append through the routed sink, and
    * THEN the batch's own band keys append into the index — later
    * batches see earlier ones, and no batch matches itself (the
    * probe's new_id != idx_id guard only fires across the split
    * because the batch is probed BEFORE it is appended). The index is
    * the state; the stream holds none. The WHOLE TRIGGER is replay
    * exactly-once (the ST24 discipline): the append itself is
    * replay-harmless (band keys are a SET the probe's distinct
    * absorbs), but a re-PROBE after the batch's keys are indexed
    * would emit near-dup pairs BETWEEN assets of the same batch —
    * rows the probe-before-append contract excludes — so a replayed
    * trigger finds its ledger marker and skips entirely; the pair
    * append itself is batch-keyed stage-then-move, closing the
    * pre-commit crash window for the output rows as well.
    */
  /** ST25's per-trigger body — two-phase like gramProbeTrigger: a
    * crash between appendPerceptualIndex and the batch marker used to
    * let the replay re-probe against its own appended band keys
    * (intra-batch pairs, overwriting the correct output files). The
    * append itself stays a plain key append (replay lands duplicate
    * keys the probe's distinct absorbs and compaction reclaims —
    * the documented O54 contract).
    */
  private[graft] def perceptualTrigger(
      df0: org.apache.spark.sql.DataFrame, batchId: Long,
      indexPath: String, outPath: String): Unit = {
    val spark = df0.sparkSession
    if (!graft.operators.Multimodal.perceptualAppendCommitted(spark, indexPath, batchId)) {
      val df = df0.cache()
      try {
        if (!graft.operators.Multimodal.perceptualOutputCommitted(spark, indexPath, batchId)) {
          val idx = graft.operators.Multimodal.readPerceptualIndex(spark, indexPath)
          graft.sinks.RoutedSink.standard().write(
            s"parquet-append-batch:$outPath:id:$batchId",
            graft.operators.Multimodal.probePerceptualIndex(df, "doc_id", "payload", idx))
          graft.operators.Multimodal.commitPerceptualOutput(spark, indexPath, batchId)
        }
        graft.operators.Multimodal.appendPerceptualIndex(df, "doc_id", "payload", indexPath)
        graft.operators.Multimodal.commitPerceptualAppend(spark, indexPath, batchId)
      } finally df.unpersist()
    }
  }

  def perceptualProbeStream(
      assetStream: DataFrame,
      indexPath: String,
      outPath: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    assetStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        perceptualTrigger(batch.toDF(), batchId, indexPath, outPath)
    }

  /** ST28: streaming FRAME-LEVEL video dedup at ingestion — the O57
    * twin of ST25's probe-then-append loop, closing the video
    * modality's live path: each micro-batch of (doc_id, payload)
    * ISO-BMFF containers is probed against the persisted frame index
    * (hash60 frame keys broadcast, pfx buckets DPP-pruned, the
    * FrameDfCap boilerplate exclusion applied on the UNION document
    * frequency — batch-bounded at any corpus size), the shared-frame
    * pairs append through the routed sink, and THEN the batch's own
    * frame keys append into the index. Replay discipline is exactly
    * ST25's: the trigger is two-phase exactly-once (batch marker
    * skips whole; `outdone` marker skips the probe and re-drives only
    * the idempotent set-semantics append), and the pair output is
    * batch-keyed stage-then-move. The index is the state; the stream
    * holds none.
    */
  private[graft] def frameDupTrigger(
      df0: org.apache.spark.sql.DataFrame, batchId: Long,
      indexPath: String, outPath: String): Unit = {
    val spark = df0.sparkSession
    if (!graft.operators.Multimodal.frameAppendCommitted(spark, indexPath, batchId)) {
      val df = df0.cache()
      try {
        if (!graft.operators.Multimodal.frameOutputCommitted(spark, indexPath, batchId)) {
          val idx = graft.operators.Multimodal.readFrameIndex(spark, indexPath)
          graft.sinks.RoutedSink.standard().write(
            s"parquet-append-batch:$outPath:id:$batchId",
            graft.operators.Multimodal.probeFrameIndex(df, idx))
          graft.operators.Multimodal.commitFrameOutput(spark, indexPath, batchId)
        }
        graft.operators.Multimodal.appendFrameIndex(df, indexPath)
        graft.operators.Multimodal.commitFrameAppend(spark, indexPath, batchId)
      } finally df.unpersist()
    }
  }

  def frameDupStream(
      videoStream: DataFrame,
      indexPath: String,
      outPath: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    videoStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        frameDupTrigger(batch.toDF(), batchId, indexPath, outPath)
    }

  /** ST29: the CRAWL INGESTION loop end-to-end — raw WARC archives
    * landing in a directory become curated, admitted corpus content
    * in one per-trigger decision chain: S8 parses the records
    * in-task, t35's provenance gate drops blocked/invalid domains
    * BEFORE any extraction work, t34 extracts text from the HTTP
    * entities, and the batch then runs ST27's admission trigger
    * (O56 verdicts against the stored O52 counts → batch-keyed audit
    * trail → admitted-only gram appends). Everything upstream of the
    * admission probe is batch-bounded per-row work; the probe is
    * bucket-pruned. Exactly-once is ST27's two-phase ledger verbatim
    * — this stream ADDS no state and no new replay window (the
    * prep chain is deterministic: magic-scan parsing, a
    * (path, offset)-ordered recrawl choice, pure columnar extraction
    * — a replayed trigger recomputes the identical doc frame).
    */
  private[graft] def crawlIngestTrigger(
      archives: org.apache.spark.sql.DataFrame, batchId: Long,
      indexPath: String, outPath: String,
      allow: Seq[String], block: Seq[String],
      minWords: Long, minUniqPpm: Long, minNoveltyPpm: Long): Unit = {
    import org.apache.spark.sql.functions.col
    // replay short-circuit BEFORE constructing the prep plan: the
    // ledger check costs one file stat, but building crawlDocs costs
    // real driver work (the lineage cut plans the query at
    // construction) — a replayed trigger must stay a no-op-priced
    // no-op (round 16; measured 15 s → ledger-stat after this guard)
    if (graft.operators.GramIndex.appendCommitted(
        archives.sparkSession, indexPath, batchId)) return
    val docs = graft.operators.CrawlIngest
      .crawlDocs(graft.sources.Warc.records(archives).toDF(), allow, block)
      .select(col("doc_id"), col("text"))
    curateTrigger(docs, batchId, indexPath, outPath,
      minWords, minUniqPpm, minNoveltyPpm)
  }

  def crawlIngestStream(
      archiveStream: DataFrame,
      indexPath: String,
      outPath: String,
      allow: Seq[String] = Nil,
      block: Seq[String] = Nil,
      minWords: Long = 5L,
      minUniqPpm: Long = 350000L,
      minNoveltyPpm: Long = 100000L
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    archiveStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        crawlIngestTrigger(batch.toDF(), batchId, indexPath, outPath,
          allow, block, minWords, minUniqPpm, minNoveltyPpm)
    }

  // ST17 state/output. `counters` is the Misra-Gries survivor map —
  // its size is capped at kCounters by construction, so per-window
  // state is O(kCounters) regardless of how many distinct users the
  // window sees (the whole point at 100 TB: a window over a hot hour
  // can hold billions of distinct keys; the exact-count map cannot).
  final case class TopKState(counters: Map[Long, Long], n: Long)

  final case class TopKRow(
      w_start: java.sql.Timestamp,
      user_id: Long,
      cnt_lb: Long, // MG lower bound: c_true - n_w/(k+1) <= cnt_lb <= c_true
      n_w: Long,
      rank: Int
  )

  /** ST17: streaming per-window top-k heavy hitters — t24's
    * Misra-Gries sketch AS the streaming state (the q64/ST14
    * pairing, applied to frequency instead of rank). Keyed by the
    * 5-minute window start; each micro-batch folds its rows into the
    * window's MG counters — sequential feeding across batches IS MG
    * over the concatenated window stream, so batch boundaries and
    * arrival order cannot weaken the guarantee: any user with true
    * window count > n_w/(kCounters+1) survives, and every survivor's
    * counter is within n_w/(kCounters+1) below its true count. At
    * watermark past window close the top `topK` survivors emit by
    * (cnt_lb desc, user asc) with the window total — append-mode
    * semantics, state removed. kCounters trades certainty for state:
    * production sizes it so the k-th hitter clears the bound
    * (t24's provable certificate, evaluated downstream against n_w).
    */
  def windowedTopKStream(
      spark: SparkSession,
      events: DataFrame,
      kCounters: Int = 64,
      topK: Int = 10
  ): Dataset[TopKRow] = {
    import spark.implicits._
    val winMs = 5L * 60 * 1000
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => math.floorDiv(e.ts.getTime, winMs) * winMs)
      .flatMapGroupsWithState[TopKState, TopKRow](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (wStart, evs, state: GroupState[TopKState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          s.counters.toSeq
            .sortBy { case (u, c) => (-c, u) }
            .take(topK)
            .iterator.zipWithIndex.map { case ((u, c), i) =>
              TopKRow(new java.sql.Timestamp(wStart), u, c, s.n, i + 1)
            }
        } else {
          val prev = state.getOption.getOrElse(TopKState(Map.empty, 0L))
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          m ++= prev.counters
          var n = prev.n
          evs.foreach { e =>
            n += 1
            m.get(e.user_id) match {
              case Some(c) => m.update(e.user_id, c + 1L)
              case None if m.size < kCounters => m.update(e.user_id, 1L)
              case None => // decrement-all; collect deaths, then remove
                val dead = List.newBuilder[Long]
                m.toList.foreach { case (k, c) =>
                  if (c == 1L) dead += k else m.update(k, c - 1L)
                }
                dead.result().foreach(m.remove)
            }
          }
          state.update(TopKState(m.toMap, n))
          // rows below the watermark never reach the operator, so the
          // window end is strictly above the current watermark here
          state.setTimeoutTimestamp(wStart + winMs)
          Iterator.empty
        }
      }
  }

  /** ST19: sliding-window rates — the ops dashboard shape tumbling
    * windows can't serve (a 10-min view refreshed every 5: each
    * event belongs to TWO overlapping windows, so alert latency is
    * half the window without halving the smoothing span). Native
    * `window(slide)` keeps the overlap in the grouping expression —
    * state is per (window, type) exactly like ST1, each input row
    * just expands to windowLen/slide assignments before the keyed
    * agg (map-side, no extra shuffle) — and append mode emits each
    * window once at watermark close. Values in exact cents (the q66
    * discipline) so stream == batch bit-for-bit.
    */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("sum_cents"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_cents"))

  /** ST20: NATIVE session windows — `session_window(ts, gap)` is the
    * built-in form of what ST2 hand-rolls with
    * flatMapGroupsWithState (and q22 computes in batch): Spark
    * merges gap-close events into one growing window per key, the
    * state store holds open sessions, and append mode emits a
    * session once the watermark passes its end + gap. Kept NEXT TO
    * ST2 deliberately: the custom sessionizer exists because
    * production variants need per-session logic (caps, emit-early,
    * custom merge) the native form can't express — but when plain
    * gap-sessionization is all that's asked, this is the plan to
    * use (no per-event state machine, codegen agg, AQE-free state
    * sharding by key). The spec pins all three formulations against
    * each other: native batch == q22's window-lag batch, and the
    * streamed emission matches batch native on every closed session.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  // ST18 state/output: 3 longs per SOURCE (not per doc) — admission
  // control state is O(#sources) at any corpus size.
  final case class CapState(admitted_tokens: Long, n_seen: Long, n_admitted: Long)

  final case class AdmitRow(
      doc_id: Long,
      source: String,
      n_tokens: Long,
      cum_before: Long // exclusive running total at admission time
  )

  /** ST18: streaming per-source token-budget admission — t25's
    * domain cap enforced at INGESTION time instead of by a batch
    * re-pass (the shape a crawl frontier actually needs: stop
    * pulling from an over-crawled source the moment its budget
    * fills, don't ingest-then-discard). Same greedy-fill rule as
    * t25: a doc is admitted while the source's EXCLUSIVE admitted
    * total is under `cap` (final doc may overshoot by < its own
    * length); a rejected doc leaves the budget untouched, so a later
    * smaller doc can still fill remaining headroom. Decisions are
    * immediate and FINAL (append mode, no watermark — the ST7
    * packing precedent), keyed state is three longs per source.
    * Order contract: arrival order across triggers, doc_id order
    * WITHIN a trigger (the iterator's shuffle order is not
    * deterministic; sorting inside the group pins replayability for
    * a given batch decomposition). Where t25 is the reproducible
    * SAMPLE (seeded-hash order over the full corpus), ST18 is the
    * online BUDGET — run t25 at the epoch rewrite to re-draw fairly.
    */
  def sourceCapStream(
      spark: SparkSession,
      docs: DataFrame,
      cap: Long = 2000L
  ): Dataset[AdmitRow] = {
    import spark.implicits._
    docs.selectExpr("doc_id", "source", "n_tokens")
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[CapState, AdmitRow](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (src, it, state: GroupState[CapState]) =>
        var s = state.getOption.getOrElse(CapState(0L, 0L, 0L))
        val out = List.newBuilder[AdmitRow]
        it.toSeq.sortBy(_._1).foreach { case (id, _, nt) =>
          if (s.admitted_tokens < cap) {
            out += AdmitRow(id, src, nt, s.admitted_tokens)
            s = CapState(s.admitted_tokens + nt, s.n_seen + 1, s.n_admitted + 1)
          } else s = s.copy(n_seen = s.n_seen + 1)
        }
        state.update(s)
        out.result().iterator
      }
  }

  /** Batch twin of [[streamStreamJoin]] (no watermarks) for
    * stream-vs-batch verification.
    */
  def streamStreamJoin_batchEquivalent(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(
      clicks,
      expr("p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 1 HOUR")
    )
  }
}
