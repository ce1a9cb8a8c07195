package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One parsed WARC record (ISO 28500): the raw-crawl container format
  * web corpora actually arrive in. `payload` is the record body
  * verbatim (for response records: the HTTP message — status line +
  * headers + entity — exactly as captured); `truncated` marks a
  * record whose declared Content-Length ran past the end of the file
  * (a killed crawler, a partial copy) — surfaced, never silently
  * dropped, so the caller decides.
  */
final case class WarcRecord(
    path: String,
    offset: Long,
    warc_type: String,
    record_id: String,
    target_uri: String,
    warc_date: String,
    content_length: Long,
    payload: Array[Byte],
    truncated: Boolean
)

/** S8: record-framed WARC reader on the m02/m04 structural-walk
  * discipline — header lines + length-delimited payloads, walked
  * byte-exactly from [[Sources.binaryFiles]] rows. No external
  * library; the framing is simple enough that a structural parser is
  * both the fastest and the most auditable option (and the spec
  * feeds it handcrafted archives including truncation and
  * inter-record garbage).
  *
  * Scale shape: WARC is NOT splittable below the file (records are
  * back-to-back, gzip members at best), and crawlers shard archives
  * at ~1 GB precisely so that FILE-level parallelism is the unit of
  * work — a 100 TB crawl is ~100k files fanned out one-per-task, the
  * same contract as [[Sources.wholeText]]. Per-record work inside a
  * task is a forward-only walk, O(bytes). `.gz` archives (including
  * multi-member/record-level gzip, the CommonCrawl layout) are
  * decompressed in-task.
  */
object Warc {

  private val Magic = "WARC/".getBytes("US-ASCII")

  /** The record magic, exposed for the fuzz spec's emission bound. */
  private[sources] def MagicBytes: Array[Byte] = Magic

  private def bytesIndexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    // GZIPInputStream consumes concatenated members (record-gzip).
    // A corrupt/truncated archive stops HERE, not the job: whatever
    // decompressed before the corruption point is parsed (the walk's
    // own truncation handling then surfaces the partial tail) — the
    // same contract as a truncated plain archive; one bad file in a
    // 100k-file crawl must cost its records, not the pipeline.
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 4))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 65536)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    } catch { case _: java.io.IOException => /* keep what decompressed */ }
    out.toByteArray
  }

  private val HeaderEnd = "\r\n\r\n".getBytes("US-ASCII")

  /** Walk one archive's bytes into records. Leading/inter-record
    * garbage is skipped by scanning to the next `WARC/` magic; a
    * record whose payload runs past the file end is emitted with
    * `truncated = true` (payload = whatever bytes exist) and ends the
    * walk; a record with a MISSING/unparseable Content-Length is
    * emitted truncated with an empty payload and the walk RESYNCS on
    * the next magic — one malformed header must not swallow the rest
    * of a 1 GB archive.
    */
  def parseWarc(path: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val bytes = if (path.endsWith(".gz")) gunzip(raw) else raw
    // total decompression failure: NOTHING survived of a nonempty
    // archive — surface ONE sentinel truncated record (offset 0,
    // length -1, empty payload) so the loss is countable in the data
    // (`where truncated`) instead of the file silently vanishing
    if (path.endsWith(".gz") && raw.nonEmpty && bytes.isEmpty)
      return Iterator.single(WarcRecord(
        path, 0L, "", "", "", "", -1L, Array.emptyByteArray, truncated = true))
    new Iterator[WarcRecord] {
      private var pos = bytesIndexOf(bytes, Magic, 0)
      private var done = pos < 0

      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        val start = pos
        val hdrEnd = bytesIndexOf(bytes, HeaderEnd, start)
        if (hdrEnd < 0) {
          // header itself truncated: emit what we can, stop
          done = true
          val text = new String(bytes, start, bytes.length - start, "UTF-8")
          val f = fields(text)
          return WarcRecord(path, start.toLong, f.getOrElse("warc-type", ""),
            f.getOrElse("warc-record-id", ""), f.getOrElse("warc-target-uri", ""),
            f.getOrElse("warc-date", ""), -1L, Array.emptyByteArray, truncated = true)
        }
        val f = fields(new String(bytes, start, hdrEnd - start, "UTF-8"))
        val len = f.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
        val payloadStart = hdrEnd + 4
        val remaining = (bytes.length - payloadStart).toLong
        if (len < 0) {
          // missing/unparseable Content-Length: the record's extent is
          // unknowable, but the REST of the archive isn't — flag this
          // record (empty payload: claiming bytes would be a guess)
          // and RESYNC on the next magic instead of swallowing the
          // remaining records as one giant payload
          pos = bytesIndexOf(bytes, Magic, payloadStart)
          if (pos < 0) done = true
          WarcRecord(path, start.toLong, f.getOrElse("warc-type", ""),
            f.getOrElse("warc-record-id", ""), f.getOrElse("warc-target-uri", ""),
            f.getOrElse("warc-date", ""), -1L, Array.emptyByteArray, truncated = true)
        } else {
          // compare in the subtraction form: an adversarial
          // Content-Length near Long.MaxValue must read as truncated,
          // not overflow payloadStart + len into a negative copy range
          val truncated = len > remaining
          val payloadEnd = if (truncated) bytes.length else payloadStart + len.toInt
          val payload = java.util.Arrays.copyOfRange(
            bytes, math.min(payloadStart, bytes.length), payloadEnd)
          if (truncated) done = true
          else {
            pos = bytesIndexOf(bytes, Magic, payloadEnd)
            if (pos < 0) done = true
          }
          WarcRecord(path, start.toLong, f.getOrElse("warc-type", ""),
            f.getOrElse("warc-record-id", ""), f.getOrElse("warc-target-uri", ""),
            f.getOrElse("warc-date", ""), len, payload, truncated)
        }
      }
    }
  }

  private def fields(header: String): Map[String, String] =
    header.split("\r\n").iterator.drop(1) // first line = WARC/x.y version
      .flatMap { line =>
        val i = line.indexOf(':')
        if (i <= 0) None
        else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
      }.toMap

  /** The Dataset form: binary archive rows → parsed records,
    * partition-wise (one task per file — the WARC parallelism unit).
    */
  def records(archives: DataFrame): Dataset[WarcRecord] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, b) => parseWarc(p, b) })
  }

  // -----------------------------------------------------------------
  // Streaming walk (round 16): removes the whole-file byte-array
  // bound. [[parseWarc]] holds the decompressed archive in ONE
  // Array[Byte] — a hard 2 GiB JVM cliff and a per-task memory cost
  // of O(archive). The streaming walk below holds O(one record):
  // a bounded scan buffer for magic/header search plus the current
  // record's payload. Offsets are Long and byte-identical to the
  // array walk's (both count decompressed bytes from 0), and every
  // malformed-input contract is preserved: magic resync, missing
  // Content-Length → truncated+resync, payload past EOF → truncated
  // tail, corrupt .gz → whatever decompressed then the partial-tail
  // handling, total .gz failure on a nonempty file → the countable
  // sentinel record. One bounded divergence: a record whose HEADER
  // block exceeds 1 MiB without a blank line is cut there instead of
  // at archive end (the array walk would scan to EOF) — real WARC
  // headers are < 1 KiB; an unbounded header is an attack, not data.
  // A SINGLE record's payload must still fit a JVM array — inherent
  // to the Array[Byte] row model; WARC records are page-sized.
  // -----------------------------------------------------------------

  private val MaxHeaderBytes = 1 << 20

  /** Bounded-buffer byte scanner over an InputStream: discarding
    * needle search (O(needle) memory), bounded lookahead search,
    * exact-N take. IOExceptions read as EOF — a corrupt tail costs
    * its records, not the task (the gunzip contract).
    */
  private final class ByteScan(in: java.io.InputStream) {
    private var buf = new Array[Byte](1 << 16)
    private var start = 0
    private var end = 0
    private var base = 0L // absolute stream offset of buf(start)

    def absPos: Long = base
    def avail: Int = end - start

    private def fill(): Boolean = {
      if (start > 0) {
        System.arraycopy(buf, start, buf, 0, end - start)
        end -= start; start = 0
      }
      if (end == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      val n = try in.read(buf, end, buf.length - end)
        catch { case _: java.io.IOException => -1 }
      if (n > 0) { end += n; true } else false
    }

    def consume(n: Int): Unit = { start += n; base += n }

    private def indexOfFrom(needle: Array[Byte], fromRel: Int): Int = {
      var i = start + math.max(fromRel, 0)
      val limit = end - needle.length
      while (i <= limit) {
        var j = 0
        while (j < needle.length && buf(i + j) == needle(j)) j += 1
        if (j == needle.length) return i - start
        i += 1
      }
      -1
    }

    /** Discard bytes until `needle` sits at relative 0; false at EOF.
      * Keeps at most needle.length-1 carry bytes while scanning.
      */
    def skipTo(needle: Array[Byte]): Boolean = {
      while (true) {
        val rel = indexOfFrom(needle, 0)
        if (rel >= 0) { consume(rel); return true }
        val keep = math.min(avail, needle.length - 1)
        consume(avail - keep)
        if (!fill()) { consume(avail); return false }
      }
      false
    }

    /** Relative index of `needle`, buffering up to maxBuffer bytes of
      * lookahead; -1 if not found within the bound or before EOF
      * (the buffer then holds everything read — the caller's
      * truncated-header text).
      */
    def findBounded(needle: Array[Byte], maxBuffer: Int): Int = {
      var searchedTo = 0
      while (true) {
        val rel = indexOfFrom(needle, searchedTo)
        if (rel >= 0) return rel
        searchedTo = math.max(0, avail - needle.length + 1)
        if (avail >= maxBuffer) return -1
        if (!fill()) return -1
      }
      -1
    }

    /** Copy of the first n buffered bytes (no consume). */
    def peek(n: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, start, start + math.min(n, avail))

    /** Consume exactly n bytes (buffered first, then direct stream
      * reads); returns fewer at EOF — the truncation signal.
      */
    def take(n: Long): Array[Byte] = {
      val len = math.min(n, (Int.MaxValue - 8).toLong).toInt
      val out = new Array[Byte](len)
      var copied = math.min(avail, len)
      System.arraycopy(buf, start, out, 0, copied)
      consume(copied)
      while (copied < len) {
        val m = try in.read(out, copied, len - copied)
          catch { case _: java.io.IOException => -1 }
        if (m <= 0) return java.util.Arrays.copyOf(out, copied)
        copied += m; base += m
      }
      out
    }
  }

  /** Streaming twin of [[parseWarc]]: identical records and offsets,
    * O(record) memory instead of O(archive) — see the block comment
    * above for the contract. The caller owns closing `rawIn` (the
    * Dataset form closes on iterator exhaustion).
    */
  def parseWarcStream(path: String, rawIn: java.io.InputStream): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(rawIn, 1)
    val firstByte = pb.read()
    if (firstByte < 0) return Iterator.empty
    pb.unread(firstByte)
    val gz = path.endsWith(".gz")
    val in: java.io.InputStream =
      if (!gz) pb
      else try new java.util.zip.GZIPInputStream(pb, 65536)
      catch {
        case _: java.io.IOException =>
          // nothing decompressible at all: the countable sentinel
          return Iterator.single(WarcRecord(
            path, 0L, "", "", "", "", -1L, Array.emptyByteArray, truncated = true))
      }
    val bs = new ByteScan(in)
    val found = bs.skipTo(Magic)
    if (!found && gz && bs.absPos == 0L)
      // gz header parsed but ZERO bytes decompressed from a nonempty
      // file — same sentinel as the array walk (decompressed-but-
      // magicless archives stay an empty iterator there too)
      return Iterator.single(WarcRecord(
        path, 0L, "", "", "", "", -1L, Array.emptyByteArray, truncated = true))
    new Iterator[WarcRecord] {
      private var done = !found
      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        val recOffset = bs.absPos
        val hdrEnd = bs.findBounded(HeaderEnd, MaxHeaderBytes)
        if (hdrEnd < 0) {
          done = true
          val text = new String(bs.peek(bs.avail), "UTF-8")
          val f = fields(text)
          WarcRecord(path, recOffset, f.getOrElse("warc-type", ""),
            f.getOrElse("warc-record-id", ""), f.getOrElse("warc-target-uri", ""),
            f.getOrElse("warc-date", ""), -1L, Array.emptyByteArray, truncated = true)
        } else {
          val f = fields(new String(bs.peek(hdrEnd), "UTF-8"))
          bs.consume(hdrEnd + 4)
          val len = f.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
          if (len < 0) {
            if (!bs.skipTo(Magic)) done = true
            WarcRecord(path, recOffset, f.getOrElse("warc-type", ""),
              f.getOrElse("warc-record-id", ""), f.getOrElse("warc-target-uri", ""),
              f.getOrElse("warc-date", ""), -1L, Array.emptyByteArray, truncated = true)
          } else {
            val payload = bs.take(len)
            val truncated = payload.length < len
            if (truncated) done = true
            else if (!bs.skipTo(Magic)) done = true
            WarcRecord(path, recOffset, f.getOrElse("warc-type", ""),
              f.getOrElse("warc-record-id", ""), f.getOrElse("warc-target-uri", ""),
              f.getOrElse("warc-date", ""), len, payload, truncated)
          }
        }
      }
    }
  }

  /** Streaming Dataset form: archives by PATH (no whole-file bytes in
    * any row), one task per file, O(record) task memory — the shape
    * for oversized archives the [[records]] byte-array contract
    * can't hold. Streams open per-file via the Hadoop filesystem of
    * each path and close on iterator exhaustion.
    */
  def recordsStreamed(
      spark: SparkSession, paths: Seq[String]): Dataset[WarcRecord] = {
    import spark.implicits._
    // executor-side Hadoop conf: the DRIVER's configuration shipped
    // via the core bridge — `spark.hadoop.*` overrides (S3/GCS
    // credentials, endpoints) must reach the task-side FileSystem,
    // not a bare defaults object
    val confF = org.apache.spark.graftbridge.SparkCoreBridge
      .hadoopConfFactory(spark.sparkContext)
    val nParts = math.max(1, paths.size)
    spark.createDataset(paths).repartition(nParts)
      .mapPartitions { it =>
        // streams opened by this partition close on TASK COMPLETION,
        // not just iterator exhaustion — a limit()/take() consumer
        // stops pulling mid-file and must not leak descriptors
        val open = new scala.collection.mutable.ArrayBuffer[java.io.InputStream]()
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          open.foreach(s => try s.close() catch { case _: Exception => })
        }
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(confF())
          val in = fs.open(hp)
          open += in
          val inner = parseWarcStream(p, in)
          new Iterator[WarcRecord] {
            private var closed = false
            override def hasNext: Boolean = {
              val h = inner.hasNext
              if (!h && !closed) { closed = true; try in.close() catch { case _: Exception => } }
              h
            }
            override def next(): WarcRecord = inner.next()
          }
        }
      }
  }

  // ---------------------------------------------------------------
  // WET writer: the conversion half of S8 — extracted text back into
  // record-framed archives (the WARC/WET layout downstream corpus
  // consumers read), so the crawl pipeline is symmetric: archives in,
  // curated text archives out.
  // ---------------------------------------------------------------

  /** One WET-style `conversion` record per row, written through the
    * text sink (each row's record string is byte-complete and
    * self-framing: Content-Length counts the UTF-8 OCTETS of the
    * text, so payloads may contain anything — including the `WARC/`
    * magic — and still parse back exactly; the single `\n` the text
    * sink appends between rows is inter-record padding the S8 reader
    * skips by magic resync, a tolerance its spec pins). URI/date
    * header values are stripped of CR/LF (header-injection guard: a
    * crafted url must not fabricate records). Partitioning is the
    * caller's: files shard one-per-partition, the WARC parallelism
    * contract in reverse — repartition to the shard count you want.
    * Roundtrip pinned by WarcSpec (writeWet → [[Sources.warc]] →
    * byte-equal texts).
    */
  def writeWet(
      df: DataFrame,
      path: String,
      urlCol: String = "url",
      dateCol: Option[String] = None,
      textCol: String = "text"): Unit = {
    import org.apache.spark.sql.functions._
    def hdr(c: org.apache.spark.sql.Column) = regexp_replace(c, "[\r\n]", "")
    val date = dateCol.map(c => hdr(col(c))).getOrElse(lit("1970-01-01T00:00:00Z"))
    val text = coalesce(col(textCol), lit(""))
    df.select(concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        hdr(coalesce(col(urlCol), lit(""))),
        lit("\r\nWARC-Date: "), date,
        lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        octet_length(text).cast("string"),
        lit("\r\n\r\n"), text, lit("\r\n")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
