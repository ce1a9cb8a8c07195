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
}
