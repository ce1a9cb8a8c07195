package graft.operators

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** O56 Curation + ST27 curateStream: the admission composition —
  * stored == rescan, verdict-order semantics, and the streaming loop
  * appending ADMITTED docs only.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.load(spark, sfDir, "documents")

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

  test("curateBatch over the stored O52 counts == the oracle-gated t33 rescan on the same split") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curidx").toString
    GramIndex.writeGramIndex(docs.where($"doc_id" < 400), dir, gram = 8, nBuckets = 16)
    val stored = keyed(Curation.curateBatch(
      docs.where($"doc_id" >= 400).select($"doc_id", $"text"),
      GramIndex.readGramIndex(spark, dir)))
    val rescan = keyed(graft.SparkEntry.queries("t33_curate_admission")(spark, sfDir))
    assert(stored == rescan && stored.nonEmpty,
      s"stored verdicts != rescan verdicts (${stored.size} vs ${rescan.size})")
    // the thresholds must actually discriminate on the test corpus:
    // every verdict class populated
    val classes = rescan.map(_._5)
    assert(classes == Set("admitted", "rejected_quality", "rejected_novelty"),
      s"verdict classes degenerate on the test corpus: $classes")
  }

  test("verdict order semantics: quality first (-1 novelty, no gram work), novelty second, sub-gram docs fully novel") {
    val corpusText = docs.where($"doc_id" === 0).select($"text").head.getString(0)
    val corpus = Seq((0L, corpusText)).toDF("doc_id", "text")
    val batch = Seq(
      400L -> corpusText, // passes quality, fully covered -> rejected_novelty, 0 ppm
      401L -> (1 to 40).map(i => s"zzq$i").mkString(" "), // fresh -> admitted, 1e6
      402L -> (1 to 10).map(_ => "a").mkString(" "), // 1/10 uniq -> rejected_quality even though its grams are novel
      403L -> "p q r s" // 4 words -> rejected_quality (minWords)
    ).toDF("doc_id", "text")
    val v = Curation.curateAgainstCorpus(batch, corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(v(400L) == ((0L, "rejected_novelty")), s"verbatim copy: ${v(400L)}")
    assert(v(401L) == ((1000000L, "admitted")), s"fresh doc: ${v(401L)}")
    assert(v(402L) == ((-1L, "rejected_quality")), s"spam doc: ${v(402L)}")
    assert(v(403L) == ((-1L, "rejected_quality")), s"short doc: ${v(403L)}")
    // a quality-passing doc SHORTER than the gram width has nothing to
    // cover and counts fully novel (reachable only with minWords
    // below ~4: X15 inserts a space id per word boundary, so 5+ words
    // always reach 8 ids)
    val tiny = Seq(500L -> "x y z").toDF("doc_id", "text")
    val vt = Curation.curateAgainstCorpus(tiny, corpus, minWords = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(vt(500L) == ((1000000L, "admitted")), s"sub-gram doc: ${vt(500L)}")
  }

  test("ST27 curateStream == sequential replay; ONLY admitted docs' grams enter the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curstream").toString
    GramIndex.writeGramIndex(docs.where($"doc_id" < 300), s"$dir/idx", gram = 8, nBuckets = 8)
    val b1 = docs.where($"doc_id" >= 300 && $"doc_id" < 400).select($"doc_id", $"text")
    // batch 2 re-submits a batch-1 doc's content under a new id: if
    // that doc was ADMITTED in batch 1, the copy must now be
    // rejected_novelty purely via batch 1's appended counts
    val b2 = docs.where($"doc_id" >= 400).select($"doc_id", $"text")
      .unionByName(docs.where($"doc_id" === 350)
        .select(lit(888888L).as("doc_id"), $"text"))
    b1.coalesce(1).write.parquet(s"$dir/in/f1")
    Thread.sleep(1100)
    b2.coalesce(1).write.parquet(s"$dir/in/f2")
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
    val q = graft.streaming.Streams.curateStream(stream, s"$dir/idx", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    val streamed = keyed(spark.read.parquet(s"$dir/out"))
    // sequential replay: curate + append admitted, batch by batch
    val rdir = java.nio.file.Files.createTempDirectory("graft-curreplay").toString
    GramIndex.writeGramIndex(docs.where($"doc_id" < 300), s"$rdir/idx", gram = 8, nBuckets = 8)
    def step(b: org.apache.spark.sql.DataFrame, id: Long) = {
      val v = Curation.curateBatch(b, GramIndex.readGramIndex(spark, s"$rdir/idx"))
      val adm = b.join(v.where($"verdict" === "admitted").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      val out = keyed(v)
      GramIndex.appendGramIndex(adm, s"$rdir/idx", batchId = id)
      out
    }
    val r1 = step(b1, 0L)
    val r2 = step(b2, 1L)
    assert(streamed == (r1 ++ r2) && streamed.nonEmpty,
      s"streamed=${streamed.size} replay=${(r1 ++ r2).size}")
    val copy = streamed.find(_._1 == 888888L).get
    val orig = r1.find(_._1 == 350L).get
    if (orig._5 == "admitted")
      assert(copy._4 == 0L && copy._5 == "rejected_novelty",
        s"copy of admitted batch-1 content not rejected as restated: $copy")
    // admitted-only appends, structurally: the streamed index's gram
    // rows == the replay's (which by construction appended admitted
    // docs only), both ways
    val si = GramIndex.readGramIndex(spark, s"$dir/idx").grams
    val ri = GramIndex.readGramIndex(spark, s"$rdir/idx").grams
    assert(si.except(ri).isEmpty && ri.except(si).isEmpty,
      "streamed index state != admitted-only replay index state")
    // and the rejected docs' unique grams are genuinely absent: a
    // quality-rejected doc in the stream must not have covered its
    // own future copies (its grams never entered)
    val rejected = streamed.filter(_._5 == "rejected_quality")
    assert(rejected.nonEmpty, "test corpus produced no quality rejections in the stream")
  }

  test("trigger crash window: a replay AFTER the index file moves but BEFORE the batch marker converges exactly") {
    // the window the two-phase ledger exists for: appendGramIndex's
    // moves make the batch's counts reader-visible, then the driver
    // dies before the batch marker lands. A single-marker replay
    // would re-probe against an index already holding the batch
    // (every verdict flips to rejected_novelty, singleton grams read
    // as repeated) and OVERWRITE the correct batch-keyed outputs.
    def markerOf(idxPath: String, id: Long) = new org.apache.hadoop.fs.Path(
      IndexLayout.resolveDir(spark, s"$idxPath/grams") + "/_appends",
      f"batch-$id%020d")
    def eraseMarker(idxPath: String, id: Long): Unit = {
      val p = markerOf(idxPath, id)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        p.toUri, spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(p, false), s"no marker to erase at $p")
    }
    def gramsOfIdx(idxPath: String) = GramIndex.readGramIndex(spark, idxPath).grams
      .select(col("bucket").cast("long"), col("g"), col("c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-crashwin").toString
    GramIndex.writeGramIndex(docs.where($"doc_id" < 300), s"$dir/idx", gram = 8, nBuckets = 8)
    val b1 = docs.where($"doc_id" >= 300 && $"doc_id" < 350).select($"doc_id", $"text")
    graft.streaming.Streams.curateTrigger(
      b1, 0L, s"$dir/idx", s"$dir/out", 5L, 350000L, 100000L)
    val out0 = keyed(spark.read.parquet(s"$dir/out"))
    val idx0 = gramsOfIdx(s"$dir/idx")
    eraseMarker(s"$dir/idx", 0L) // the crash state: files moved, marker gone
    assert(!GramIndex.appendCommitted(spark, s"$dir/idx", 0L))
    graft.streaming.Streams.curateTrigger(
      b1, 0L, s"$dir/idx", s"$dir/out", 5L, 350000L, 100000L)
    assert(keyed(spark.read.parquet(s"$dir/out")) == out0,
      "replay in the crash window changed the verdict outputs")
    assert(gramsOfIdx(s"$dir/idx") == idx0,
      "replay in the crash window changed the index's net counts")
    assert(GramIndex.appendCommitted(spark, s"$dir/idx", 0L))
    // same window for the ST24 probe trigger on a fresh setup
    val dir2 = java.nio.file.Files.createTempDirectory("graft-crashwin2").toString
    GramIndex.writeGramIndex(docs.where($"doc_id" < 300), s"$dir2/idx", gram = 8, nBuckets = 8)
    graft.streaming.Streams.gramProbeTrigger(b1, 0L, s"$dir2/idx", s"$dir2/out")
    val p0 = spark.read.parquet(s"$dir2/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    eraseMarker(s"$dir2/idx", 0L)
    graft.streaming.Streams.gramProbeTrigger(b1, 0L, s"$dir2/idx", s"$dir2/out")
    val p1 = spark.read.parquet(s"$dir2/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(p1 == p0,
      "replayed probe emitted false repeated intervals from the batch's own counts")
  }

  test("parquet-append-batch is exactly-once: a replayed write rewrites the same files, never doubling rows") {
    // the crash window the route closes: the driver dies BETWEEN the
    // audit write and the trigger's ledger commit, so the replay
    // re-runs the whole trigger including the output write — with
    // plain mode(append) every verdict/probe row would double
    val out = java.nio.file.Files.createTempDirectory("graft-eoappend").toString
    val rows = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    graft.sinks.RoutedSink.standard().write(s"parquet-append-batch:$out:id:7", rows)
    // simulated replay of the SAME batch id (content deterministic)
    graft.sinks.RoutedSink.standard().write(s"parquet-append-batch:$out:id:7", rows)
    val got = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(spark.read.parquet(out).count() == 2L && got == Set((1L, "a"), (2L, "b")),
      "replayed batch-keyed append duplicated rows")
    // a DIFFERENT batch id appends alongside
    graft.sinks.RoutedSink.standard().write(
      s"parquet-append-batch:$out:id:8", Seq((3L, "c")).toDF("id", "v"))
    assert(spark.read.parquet(out).count() == 3L)
    // the REAL crash window: some of a batch's files moved, then the
    // driver died mid-move — the replay's pre-cleanup must converge
    // to the identical end state (delete this attempt's files, move
    // the full staged set again), never a partial double
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    val moved = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.startsWith("out-00000000000000000007-"))
    assert(moved.nonEmpty)
    fs.delete(moved.head.getPath, false) // simulate a lost half-move
    graft.sinks.RoutedSink.standard().write(s"parquet-append-batch:$out:id:7", rows)
    val after = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == Set((1L, "a"), (2L, "b"), (3L, "c")) &&
      spark.read.parquet(out).count() == 3L,
      "mid-move crash replay did not converge to the exact end state")
  }
}
