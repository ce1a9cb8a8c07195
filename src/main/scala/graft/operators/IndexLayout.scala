package graft.operators

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-directory + manifest layout shared by the persisted band
  * index (O24/O28) and the persisted ANN index (O29).
  *
  * Round 5 published compactions by a two-rename directory swap, which
  * has a window where a racing reader sees NO directory and no crash
  * recovery at all (a death between the renames loses the live index
  * to a `__pre_compact` sibling). This layout closes both holes the
  * way table formats do:
  *
  *  - data lives in immutable version directories `path/v00001`,
  *    `path/v00002`, ... — a rewrite builds the next version OFF to
  *    the side and the live data is never touched;
  *  - a one-line manifest file `path/_CURRENT` names the live version;
  *    readers resolve it at read time ([[resolveDir]]);
  *  - publishing = atomically replacing the manifest ([[publish]]):
  *    write `_CURRENT.tmp`, then an atomic rename over `_CURRENT`
  *    (POSIX rename on file://, FileContext OVERWRITE rename — atomic
  *    at the NameNode — on HDFS). A reader sees the old pointer or the
  *    new pointer, never a missing one;
  *  - a crash before publish leaves an unreferenced version directory,
  *    deleted by [[recover]] on the next maintenance entry; a crash
  *    after publish leaves a stale retired version, deleted by
  *    [[gcVersions]];
  *  - retired versions are kept for `keep` publish cycles before GC —
  *    the grace window for readers that resolved the manifest just
  *    before a flip (at 100 TB, size `keep` to cover the longest
  *    query's runtime across compaction cadences).
  *
  * Tombstones (takedown / retention deletion — a real obligation for a
  * 100 TB training corpus) live beside the versions in
  * `path/_tombstones` as plain parquet id files: [[addTombstones]]
  * appends, the read paths mask pending ids immediately, and
  * compaction applies them permanently — it snapshots the tombstone
  * FILES it read and deletes exactly those after publish, so ids
  * arriving mid-compaction survive to the next cycle.
  *
  * Legacy compatibility: a pre-round-6 index (hive dirs directly under
  * `path`, no manifest) still reads — [[resolveDir]] falls back to
  * `path` — and [[ensureVersioned]] migrates it in place by renaming
  * the children into `v00001` (metadata-only) before the first
  * versioned compaction.
  */
object IndexLayout {

  val ManifestName = "_CURRENT"
  val TombstoneDirName = "_tombstones"

  private val VersionRe = "^v(\\d{5})$".r

  private def hfs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Current version name from the manifest, None for a legacy or
    * empty layout.
    */
  def currentVersion(spark: SparkSession, path: String): Option[String] = {
    val fs = hfs(spark, path)
    val mf = new Path(path, ManifestName)
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      try {
        val v = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
        if (v.isEmpty) None else Some(v)
      } finally in.close()
    }
  }

  /** The directory holding the CURRENT data: `path/<version>` when a
    * manifest exists, `path` itself for a legacy unversioned layout.
    */
  def resolveDir(spark: SparkSession, path: String): String =
    currentVersion(spark, path).map(v => s"$path/$v").getOrElse(path)

  private def versionNumber(v: String): Int = v match {
    case VersionRe(n) => n.toInt
    case other => throw new IllegalArgumentException(s"bad index version name '$other'")
  }

  private def versionName(n: Int): String = f"v$n%05d"

  /** The version name a new rewrite should build into. */
  def nextVersion(spark: SparkSession, path: String): String =
    versionName(currentVersion(spark, path).map(versionNumber).getOrElse(0) + 1)

  /** Atomically flip the manifest to `version` (see class doc). */
  def publish(spark: SparkSession, path: String, version: String): Unit = {
    val fs = hfs(spark, path)
    val tmp = new Path(path, ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(path, ManifestName)
    val qTmp = fs.makeQualified(tmp)
    val qDst = fs.makeQualified(dst)
    if (qTmp.toUri.getScheme == "file") {
      // POSIX rename(2): atomic, replaces the destination
      java.nio.file.Files.move(
        java.nio.file.Paths.get(qTmp.toUri.getPath),
        java.nio.file.Paths.get(qDst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val fc = FileContext.getFileContext(qTmp.toUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(qTmp, qDst, Options.Rename.OVERWRITE)
    }
  }

  /** Migrate a legacy in-place layout (hive dirs directly under
    * `path`, no manifest) to `v00001` via child renames — metadata
    * operations only, no data rewrite. No-op when a manifest already
    * exists. Call [[recover]] FIRST so an unpublished version dir from
    * a crashed rewrite is not mistaken for data.
    */
  def ensureVersioned(spark: SparkSession, path: String): Unit =
    if (currentVersion(spark, path).isEmpty) {
      val fs = hfs(spark, path)
      val root = new Path(path)
      if (fs.exists(root)) {
        val v1 = new Path(root, versionName(1))
        val kids = fs.listStatus(root).filter { st =>
          val n = st.getPath.getName
          n != TombstoneDirName && !n.startsWith(ManifestName) &&
            !n.startsWith("_") && !n.startsWith(".") &&
            VersionRe.findFirstIn(n).isEmpty
        }
        fs.mkdirs(v1)
        kids.foreach(st => fs.rename(st.getPath, new Path(v1, st.getPath.getName)))
        publish(spark, path, versionName(1))
      }
    }

  /** Crash recovery, run on entry to any compaction:
    *  - legacy `path__compacting` staging dirs → delete (incomplete
    *    pre-round-6 rewrite);
    *  - legacy `path__pre_compact` retired dirs → restore if the live
    *    path lost its data to the crash, else delete;
    *  - version dirs NEWER than the manifest (or any version dir when
    *    no manifest exists) → delete: a rewrite that died before its
    *    publish, invisible to readers and safe to drop.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    val compacting = new Path(path + "__compacting")
    if (fs.exists(compacting)) fs.delete(compacting, true)
    val retired = new Path(path + "__pre_compact")
    if (fs.exists(retired)) {
      val live = new Path(path)
      val liveHasData = fs.exists(live) && fs.listStatus(live).nonEmpty
      if (!liveHasData) {
        if (fs.exists(live)) fs.delete(live, true)
        fs.rename(retired, live)
      } else fs.delete(retired, true)
    }
    val cur = currentVersion(spark, path).map(versionNumber).getOrElse(0)
    val root = new Path(path)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        st.getPath.getName match {
          case VersionRe(n) if n.toInt > cur => fs.delete(st.getPath, true)
          case _ => ()
        }
      }
  }

  /** Delete retired versions older than the `keep` most recent below
    * the current one — the reader grace window (see class doc).
    */
  def gcVersions(spark: SparkSession, path: String, keep: Int): Unit =
    currentVersion(spark, path).foreach { curName =>
      val cur = versionNumber(curName)
      val fs = hfs(spark, path)
      fs.listStatus(new Path(path)).foreach { st =>
        st.getPath.getName match {
          case VersionRe(n) if n.toInt < cur - keep => fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }

  /** Versions present on disk and at-or-below the published
    * `_CURRENT`, oldest first (the current one last) — i.e. the
    * SNAPSHOTS a reader may pin: retired versions survive for the
    * [[gcVersions]] grace window, and anything ABOVE current is a
    * crash orphan (an unpublished half-write), never a snapshot.
    */
  def listVersions(spark: SparkSession, path: String): Seq[String] =
    currentVersion(spark, path).map(versionNumber).map { cur =>
      val fs = hfs(spark, path)
      fs.listStatus(new Path(path)).toSeq
        .map(_.getPath.getName)
        .collect { case v @ VersionRe(n) if n.toInt <= cur => (n.toInt, v) }
        .sortBy(_._1).map(_._2)
    }.getOrElse(Seq.empty)

  /** Resolve a PINNED version's directory — snapshot reads within the
    * retention window (a loader holds one epoch stable while the next
    * publishes; an A/B readback compares two epochs). Fails loudly for
    * a version that was GC'd, never existed, or sits above `_CURRENT`
    * (a crash orphan is not a snapshot) — silently falling back to
    * current would be a wrong-data bug in a reproducibility surface.
    */
  def resolveDirAt(spark: SparkSession, path: String, version: String): String = {
    val vs = listVersions(spark, path)
    require(vs.contains(version),
      s"version '$version' is not a readable snapshot of $path " +
        s"(retained: ${if (vs.isEmpty) "none — unversioned layout" else vs.mkString(", ")})")
    s"$path/$version"
  }

  /** Write a small per-version metadata file (e.g. the O40 shard
    * layout's `_LAYOUT` parameters) under `dir`. Same create-then-
    * atomic-rename discipline as [[publish]], so a racing reader sees
    * the whole file or none.
    */
  def writeMeta(spark: SparkSession, dir: String, name: String, content: String): Unit = {
    val fs = hfs(spark, dir)
    val tmp = new Path(dir, name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, name)
    val qTmp = fs.makeQualified(tmp)
    if (qTmp.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(qTmp.toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val fc = FileContext.getFileContext(qTmp.toUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(qTmp, dst, Options.Rename.OVERWRITE)
    }
  }

  /** Read a metadata file written by [[writeMeta]]; None if absent. */
  def readMeta(spark: SparkSession, dir: String, name: String): Option[String] = {
    val fs = hfs(spark, dir)
    val p = new Path(dir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  // ---------------------------------------------------------------
  // Batch-keyed idempotent appends (day-2 ingestion under an
  // at-least-once driver: Structured Streaming's foreachBatch replays
  // a micro-batch whose checkpoint commit didn't land — a naive
  // `mode("append")` write would then double its rows, which for a
  // COUNT-carrying index silently inflates counts). The contract
  // here makes a replay a structural no-op:
  //
  //  1. a ledger marker `epochDir/_appends/batch-<id>` records a
  //     COMPLETED append — present means the whole sequence below
  //     finished, so a replay returns immediately;
  //  2. data lands via stage-then-move: the batch writes to a private
  //     staging dir (overwrite mode — a crashed half-stage is simply
  //     rewritten), then each part file MOVES (metadata-only rename)
  //     into the live hive dirs under a DETERMINISTIC name
  //     `batch<id>-<k>.parquet`, and the move is preceded by deleting
  //     any `batch<id>-*` already there — so a crash at ANY point
  //     (mid-stage, mid-move, post-move-pre-marker) replays to the
  //     exact same end state, never a doubled row;
  //  3. the marker is created last, atomically.
  //
  // Compactions must carry the `_appends` ledger into the new epoch
  // ([[copyAppendLedger]]): a replay arriving AFTER its batch was
  // compacted into the base finds the marker and stays a no-op.
  // ---------------------------------------------------------------

  /** Corpus-proportional bucket count shared by the bucket-partitioned
    * indexes (O51 postings/terms, O52 grams): ~2^20 rows of the
    * driving unit per bucket (tens of MB on disk), floor 16 (below it
    * buckets are merely oversized — probes read |key buckets| dirs
    * regardless), capped at 2^18 dirs (a filesystem-metadata bound;
    * past the cap per-bucket volume grows linearly again but stays
    * partition-prunable). Power of two so regrows re-split cleanly.
    * ONE definition: gram and lex epochs size under the same rule.
    */
  def autoBuckets(n: Long): Int = {
    val target = math.max(1L, n >> 20)
    var b = 16
    while (b < target && b < (1 << 18)) b <<= 1
    b
  }

  private val AppendLedgerDir = "_appends"

  /** `kind` namespaces the ledger: streaming ingestion appends use the
    * default `"batch"` (ids = micro-batch ids from the engine's
    * checkpoint counter); takedown deltas use `"takedown"` (ids from
    * the retention system) — the two id spaces are independent, so a
    * takedown can never be masked by a same-numbered ingestion batch.
    */
  private def markerPath(dir: String, batchId: Long, kind: String): Path =
    new Path(new Path(dir, AppendLedgerDir), f"$kind-$batchId%020d")

  /** True when `batchId` already appended into this epoch (replay). */
  def appendCommitted(spark: SparkSession, dir: String, batchId: Long,
      kind: String = "batch"): Boolean =
    hfs(spark, dir).exists(markerPath(dir, batchId, kind))

  /** Record `batchId` as durably appended (create-last, atomic). */
  def commitAppend(spark: SparkSession, dir: String, batchId: Long,
      kind: String = "batch"): Unit = {
    val fs = hfs(spark, dir)
    val p = markerPath(dir, batchId, kind)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(Array.emptyByteArray) finally out.close()
  }

  /** Stage-then-move a hive-partitioned batch into `destDir` under
    * replay-deterministic file names (see the block comment above).
    * `data` must carry `partCol`; the staged layout mirrors the
    * destination's `partCol=value` dirs. Call [[commitAppend]] after
    * ALL stores of the epoch have appended.
    */
  def stageMoveAppend(
      data: DataFrame,
      destDir: String,
      partCol: String,
      batchId: Long,
      kind: String = "batch"): Unit = {
    val spark = data.sparkSession
    val fs = hfs(spark, destDir)
    val stage = new Path(destDir, f".stage-$kind-$batchId%020d")
    data.write.mode("overwrite").partitionBy(partCol).parquet(stage.toString)
    val prefix = f"$kind-$batchId%020d-"
    val parts = fs.listStatus(stage)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
    parts.foreach { pd =>
      val dest = new Path(destDir, pd.getPath.getName)
      fs.mkdirs(dest)
      // replay cleanup: a crashed earlier attempt may have moved some
      // files already — the deterministic prefix identifies exactly
      // this batch's files, so deleting them restores a clean slate
      fs.listStatus(dest)
        .filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, false))
      val files = fs.listStatus(pd.getPath)
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .sortBy(_.getPath.getName)
      files.zipWithIndex.foreach { case (st, i) =>
        val dst = new Path(dest, f"$prefix$i%05d.parquet")
        // Hadoop FileSystem.rename reports most failures (destination
        // re-created by a racing zombie driver replaying the same
        // batchId, source vanished) by returning FALSE, not throwing —
        // dropping it would let the stage delete below destroy the
        // unmoved file and commitAppend mark the batch durable: silent
        // permanent count loss. Fail loudly; the single-writer
        // contract makes this unreachable in a correct deployment.
        require(fs.rename(st.getPath, dst),
          s"stageMoveAppend: rename ${st.getPath} -> $dst failed (a " +
            "concurrent writer on the same batchId? the append is NOT " +
            "durable; re-drive it under the single-writer contract)")
      }
    }
    fs.delete(stage, true)
  }

  /** Flat (unpartitioned) variant of [[stageMoveAppend]] for OUTPUT
    * appends — the exactly-once audit-trail write the ledger-guarded
    * streams (ST24/ST25/ST26/ST27) pair with their index appends: a
    * plain `mode("append")` duplicates the batch's output rows when
    * the driver dies between the output write and the ledger commit
    * (the replay re-runs the whole trigger), while this lands the
    * batch's files under deterministic `<kind><id>-<k>.parquet` names
    * with replay pre-cleanup — a replayed write converges to the
    * identical end state, never a doubled row. Requires deterministic
    * batch content across replays (true for the probe/verdict frames:
    * the index only advances at the ledger commit).
    */
  def stageMoveAppendFlat(
      data: DataFrame,
      destDir: String,
      batchId: Long,
      kind: String = "out"): Unit = {
    val spark = data.sparkSession
    val fs = hfs(spark, destDir)
    val stage = new Path(destDir, f".stage-$kind-$batchId%020d")
    data.write.mode("overwrite").parquet(stage.toString)
    val prefix = f"$kind-$batchId%020d-"
    val dest = new Path(destDir)
    fs.mkdirs(dest)
    fs.listStatus(dest)
      .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
      .foreach(st => fs.delete(st.getPath, false))
    val files = fs.listStatus(stage)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.getName)
    files.zipWithIndex.foreach { case (st, i) =>
      val dst = new Path(dest, f"$prefix$i%05d.parquet")
      require(fs.rename(st.getPath, dst),
        s"stageMoveAppendFlat: rename ${st.getPath} -> $dst failed (a " +
          "concurrent writer on the same batchId? re-drive under the " +
          "single-writer contract)")
    }
    fs.delete(stage, true)
  }

  /** Read back EXACTLY `batchId`'s files written by
    * [[stageMoveAppendFlat]] (None when none exist) — the durable
    * phase-1 state a two-phase trigger's replay consumes: after a
    * crash between the index append's file moves and the batch
    * marker, the replay must NOT recompute probe-derived values (the
    * index already holds the batch's own rows) — it reads the
    * batch-keyed output it already wrote instead.
    */
  def readStagedBatch(
      spark: SparkSession,
      destDir: String,
      batchId: Long,
      kind: String = "out"): Option[DataFrame] = {
    val fs = hfs(spark, destDir)
    val dest = new Path(destDir)
    if (!fs.exists(dest)) None
    else {
      val prefix = f"$kind-$batchId%020d-"
      val files = fs.listStatus(dest)
        .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
        .map(_.getPath.toString)
      if (files.isEmpty) None else Some(spark.read.parquet(files.toIndexedSeq: _*))
    }
  }

  /** Carry the append ledger from `fromDir` into `toDir` — part of a
    * compaction's publish sequence, BEFORE the `_CURRENT` flip, so a
    * replayed batch that was already merged into the compacted base
    * still finds its marker and stays a no-op.
    *
    * Compaction is also where the ledger's growth is reclaimed: an
    * `outdone-N` marker (the two-phase triggers' phase-1 record) is
    * only ever consulted when `batch-N` is ABSENT — every trigger
    * checks the batch marker first and skips whole when it exists —
    * so a subsumed `outdone-N` is dead weight that would otherwise be
    * recopied into every future epoch forever (one small file per
    * streamed trigger, unbounded for a long-running stream). Dropping
    * it here is safe by that precedence and bounds the ledger at one
    * marker per batch plus the in-flight crash window's pair.
    */
  def copyAppendLedger(spark: SparkSession, fromDir: String, toDir: String): Unit = {
    val fs = hfs(spark, fromDir)
    val src = new Path(fromDir, AppendLedgerDir)
    if (fs.exists(src)) {
      val dst = new Path(toDir, AppendLedgerDir)
      fs.mkdirs(dst)
      val names = fs.listStatus(src).map(_.getPath.getName)
      val nameSet = names.toSet
      names.foreach { name =>
        val subsumed = name.startsWith("outdone-") &&
          nameSet.contains("batch-" + name.stripPrefix("outdone-"))
        if (!subsumed) {
          val out = fs.create(new Path(dst, name), true)
          try out.write(Array.emptyByteArray) finally out.close()
        }
      }
    }
  }

  /** Fail-loud guard for the append race the epoch lifecycle cannot
    * itself close: between resolving the CURRENT epoch and finishing
    * an append, a concurrent rewrite/compaction may publish a NEW
    * epoch (and GC the old one) — the appended rows would then sit in
    * a retired/deleted directory, silently invisible to readers.
    * Appenders call this AFTER their writes: if the epoch moved, the
    * append's durability is unknowable and the caller must re-drive
    * it against the new epoch — a loud error, never silent loss.
    */
  def requireStillCurrent(spark: SparkSession, root: String, dir: String, op: String): Unit = {
    val now = resolveDir(spark, root)
    require(now == dir,
      s"$op: epoch moved during append ($dir -> $now) — a concurrent " +
        "rewrite/compaction published a new epoch, so the appended rows " +
        "landed in a retired directory; re-drive the append (single-writer " +
        "contract: serialize appends with rewrites/compactions)")
  }

  /** Register ids for deletion: append them (distinct, as a single
    * `outName` long column) to `path/_tombstones`. Read paths mask
    * them immediately; the next compaction applies them permanently
    * and reclaims the files.
    */
  def addTombstones(ids: DataFrame, idCol: String, outName: String, path: String): Unit =
    ids.select(col(idCol).cast("long").as(outName)).distinct()
      .write.mode("append").parquet(s"$path/$TombstoneDirName")

  /** Tombstone parquet files present right now. Compaction snapshots
    * this list, applies exactly these files, and deletes exactly these
    * files after publish — ids appended mid-compaction survive.
    */
  def tombstoneFiles(spark: SparkSession, path: String): Seq[Path] = {
    val fs = hfs(spark, path)
    val dir = new Path(path, TombstoneDirName)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .toSeq
  }

  /** The pending tombstone id set as a one-column frame named
    * `outName`; empty frame when none exist.
    */
  def readTombstones(spark: SparkSession, path: String, outName: String): DataFrame = {
    val files = tombstoneFiles(spark, path)
    if (files.isEmpty) spark.range(0).select(col("id").as(outName))
    else spark.read.parquet(files.map(_.toString): _*).select(col(outName))
  }

  /** True when any tombstone id file is pending. */
  def hasTombstones(spark: SparkSession, path: String): Boolean =
    tombstoneFiles(spark, path).nonEmpty

  /** Delete a consumed tombstone-file snapshot (and the directory
    * itself once empty, so the read paths' existence probe stays
    * cheap and the no-tombstone plan shape returns).
    */
  def deleteTombstoneFiles(spark: SparkSession, path: String, files: Seq[Path]): Unit = {
    val fs = hfs(spark, path)
    files.foreach(f => fs.delete(f, false))
    val dir = new Path(path, TombstoneDirName)
    if (fs.exists(dir) && fs.listStatus(dir).forall(st =>
        st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith(".")))
      fs.delete(dir, true)
  }
}
