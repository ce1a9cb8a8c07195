package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzz guard for the S8 WARC walk (the ParserFuzzSpec discipline):
  * on arbitrary byte soup — including soup stamped with real
  * `WARC/` magics, hostile Content-Length values and truncation
  * points — parseWarc must terminate, never throw, and every emitted
  * record's offset/payload must be in-bounds.
  */
class WarcFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(19L + i)))

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 500).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private val magicStamped: Gen[Array[Byte]] =
    bytesGen.map("WARC/".getBytes("US-ASCII") ++ _)

  private val hostileHeader: Gen[Array[Byte]] = for {
    len <- Gen.oneOf("9223372036854775800", "-5", "abc", "", "007",
      "99999999999999999999999999")
    tail <- bytesGen
  } yield (s"WARC/1.0\r\nContent-Length: $len\r\n\r\n").getBytes("UTF-8") ++ tail

  // a VALID record with fuzz appended — the resync path
  private val validThenSoup: Gen[Array[Byte]] = bytesGen.map { soup =>
    val payload = "ok body".getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8") ++ soup
  }

  private def check(name: String, g: Gen[Array[Byte]]): Unit =
    samples(g).zipWithIndex.foreach { case (bytes, i) =>
      val recs =
        try Warc.parseWarc(s"fuzz-$name-$i.warc", bytes).toList
        catch { case e: Throwable =>
          fail(s"$name[$i] threw ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      recs.foreach { r =>
        assert(r.offset >= 0 && r.offset <= bytes.length, s"$name[$i] offset OOB")
        assert(r.payload.length <= bytes.length, s"$name[$i] payload larger than input")
      }
      // termination sanity: a walk can emit at most one record per
      // magic occurrence
      assert(recs.size <= 1 + bytes.sliding(5).count(_.sameElements(Warc.MagicBytes)),
        s"$name[$i] emitted ${recs.size} records")
    }

  test("arbitrary byte soup: no throw, bounded emission") { check("soup", bytesGen) }

  test("corrupt/truncated .gz archives: parse what decompressed, never throw") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 7\r\n\r\n" +
      "ok body\r\n\r\n").getBytes("UTF-8")
    val whole = gz(rec)
    val cases: Seq[Array[Byte]] =
      samples(bytesGen, 50) ++ // raw soup under a .gz name
        Seq(
          whole.take(whole.length / 2), // truncated member
          whole ++ "NOT GZIP TRAILER SOUP".getBytes("UTF-8"), // corrupt 2nd member
          Array[Byte](0x1f, 0x8b.toByte, 8, 0) // bare gzip magic
        )
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val recs =
        try Warc.parseWarc(s"fuzz-gz-$i.warc.gz", bytes).toList
        catch { case e: Throwable =>
          fail(s"gz[$i] threw ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      assert(recs.forall(_.offset >= 0))
    }
    // the member BEFORE the corruption still yields its record
    val partial = Warc.parseWarc("p.warc.gz",
      whole ++ "GARBAGE".getBytes("UTF-8")).toList
    assert(partial.exists(r => !r.truncated &&
      new String(r.payload, "UTF-8") == "ok body"),
      s"intact leading member lost: $partial")
  }
  test("magic-stamped soup: the deep parse path") { check("magic", magicStamped) }
  test("hostile Content-Length values") { check("hostile", hostileHeader) }
  test("a valid record followed by soup still parses the record") {
    samples(validThenSoup, 100).foreach { bytes =>
      val recs = Warc.parseWarc("v.warc", bytes).toList
      assert(recs.exists(r => r.warc_type == "response" && !r.truncated &&
        new String(r.payload, "UTF-8") == "ok body"),
        "the leading valid record was lost to trailing soup")
    }
  }

  // ------------------------------------------------------------
  // Streaming-walk parity (round 16): parseWarcStream must emit
  // RECORD-IDENTICAL output to parseWarc on every fuzz class — the
  // stream fed in 7-byte trickles so the bounded-buffer refill path
  // is exercised at every boundary.
  // ------------------------------------------------------------

  /** An InputStream that yields at most 7 bytes per read call. */
  private final class Trickle(bytes: Array[Byte]) extends java.io.InputStream {
    private var pos = 0
    override def read(): Int =
      if (pos >= bytes.length) -1 else { pos += 1; bytes(pos - 1) & 0xFF }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(7, math.min(len, bytes.length - pos))
      System.arraycopy(bytes, pos, b, off, n)
      pos += n; n
    }
  }

  private def key(r: WarcRecord) = (r.offset, r.warc_type, r.record_id,
    r.target_uri, r.warc_date, r.content_length,
    r.payload.toSeq, r.truncated)

  private def parityCheck(name: String, g: Gen[Array[Byte]], suffix: String = ".warc"): Unit =
    samples(g, 150).zipWithIndex.foreach { case (bytes, i) =>
      val p = s"parity-$name-$i$suffix"
      val arr = Warc.parseWarc(p, bytes).toList.map(key)
      val str = Warc.parseWarcStream(p, new Trickle(bytes)).toList.map(key)
      assert(arr == str, s"$name[$i]: stream walk diverged from array walk\n" +
        s"array:  ${arr.take(3)}\nstream: ${str.take(3)}")
    }

  test("stream parity: byte soup") { parityCheck("soup", bytesGen) }
  test("stream parity: magic-stamped soup") { parityCheck("magic", magicStamped) }
  test("stream parity: hostile Content-Length") { parityCheck("hostile", hostileHeader) }
  test("stream parity: valid record + soup") { parityCheck("valid", validThenSoup) }

  test("stream parity: corrupt/truncated .gz classes incl. the sentinel") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 7\r\n\r\n" +
      "ok body\r\n\r\n").getBytes("UTF-8")
    val whole = gz(rec)
    val cases = samples(bytesGen, 40) ++ Seq(
      whole, whole.take(whole.length / 2),
      whole ++ "NOT GZIP TRAILER SOUP".getBytes("UTF-8"),
      Array[Byte](0x1f, 0x8b.toByte, 8, 0),
      Array.emptyByteArray)
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val p = s"parity-gz-$i.warc.gz"
      val arr = Warc.parseWarc(p, bytes).toList.map(key)
      val str = Warc.parseWarcStream(p, new Trickle(bytes)).toList.map(key)
      assert(arr == str, s"gz[$i]: stream walk diverged (${arr.size} vs ${str.size})")
    }
  }
}
