package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level tests for the structural image parser: handcrafted
  * format-correct files with known dimensions, independent of the
  * corpus framing (so the parser can't be "right" just by mirroring
  * imagePayloads' construction).
  */
class ImageParseSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def be32(v: Int) = bytes(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
  private def be16(v: Int) = bytes(v >>> 8, v & 0xff)
  private def le16(v: Int) = bytes(v & 0xff, v >>> 8)

  test("PNG: IHDR behind the magic, big-endian dims") {
    val ihdrData = be32(640) ++ be32(480) ++ bytes(8, 6, 0, 0, 0)
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ ihdrData ++ be32(0) ++
      "pixel-data".getBytes("US-ASCII")
    val d = Multimodal.parseImage(1L, png)
    assert((d.format, d.width, d.height) == (("png", 640, 480)))
    assert(d.n_bytes == png.length)
  }

  test("PNG: IHDR found even behind a preceding ancillary chunk") {
    // not spec-legal ordering, but proves the walk reads chunk lengths
    val junk = be32(3) ++ "tEXt".getBytes("US-ASCII") ++ bytes(1, 2, 3) ++ be32(0)
    val ihdr = be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(12) ++ be32(34) ++ bytes(8, 6, 0, 0, 0) ++ be32(0)
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++ junk ++ ihdr
    val d = Multimodal.parseImage(2L, png)
    assert((d.format, d.width, d.height) == (("png", 12, 34)))
  }

  test("JPEG: SOF0 behind an APP0 segment (real marker walk, not a fixed offset)") {
    val app0 = bytes(0xff, 0xe0) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ bytes(0) ++ bytes(1, 2, 0) ++ be16(72) ++ be16(72) ++ bytes(0, 0)
    val sof0 = bytes(0xff, 0xc0) ++ be16(17) ++ bytes(8) ++ be16(600) ++ be16(800) ++
      bytes(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val jpg = bytes(0xff, 0xd8) ++ app0 ++ sof0 ++ bytes(0xff, 0xd9)
    val d = Multimodal.parseImage(3L, jpg)
    assert((d.format, d.width, d.height) == (("jpeg", 800, 600)))
  }

  test("JPEG: SOF2 (progressive) also yields dimensions") {
    val sof2 = bytes(0xff, 0xc2) ++ be16(17) ++ bytes(8) ++ be16(10) ++ be16(20) ++
      bytes(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val jpg = bytes(0xff, 0xd8) ++ sof2
    val d = Multimodal.parseImage(4L, jpg)
    assert((d.format, d.width, d.height) == (("jpeg", 20, 10)))
  }

  test("GIF87a and GIF89a: little-endian logical screen dims") {
    for (ver <- Seq("GIF87a", "GIF89a")) {
      val gif = ver.getBytes("US-ASCII") ++ le16(320) ++ le16(200) ++ bytes(0, 0, 0)
      val d = Multimodal.parseImage(5L, gif)
      assert((d.format, d.width, d.height) == (("gif", 320, 200)), ver)
    }
  }

  test("unknown / truncated payloads decode safely, not throw") {
    assert(Multimodal.parseImage(6L, "just some text".getBytes("UTF-8")).format == "unknown")
    assert(Multimodal.parseImage(7L, Array.emptyByteArray).format == "unknown")
    val d = Multimodal.parseImage(8L, bytes(0xff, 0xd8, 0xff)) // JPEG SOI then truncation
    assert(d.format == "jpeg" && d.width == 0 && d.height == 0)
  }

  test("byte-moment features: mean/var/min/max over payload bytes") {
    val d = Multimodal.parseImage(9L, bytes(0, 100, 200))
    assert(d.feature(0) == 100.0)
    assert(math.abs(d.feature(1) - (20000.0 / 3)) < 1e-9)
    assert(d.feature(2) == 0.0 && d.feature(3) == 200.0)
  }

  private def le32(v: Int) =
    bytes(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)

  private def fmtChunk(ch: Int, sr: Int, bits: Int): Array[Byte] = {
    val ba = ch * bits / 8
    "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(ch) ++
      le32(sr) ++ le32(sr * ba) ++ le16(ba) ++ le16(bits)
  }

  private def wav(pre: Array[Byte], ch: Int, sr: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
    val chunks = pre ++ fmtChunk(ch, sr, bits) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) bytes(0) else Array.emptyByteArray)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  }

  test("WAV: fmt + data fields, integer duration") {
    val d = Multimodal.parseAudio(10L, wav(Array.emptyByteArray, 2, 44100, 16, new Array[Byte](44100 * 4 + 2)))
    assert((d.format, d.channels, d.sample_rate, d.bits) == (("wav", 2, 44100, 16)))
    assert(d.n_samples == 44100L && d.duration_ms == 1000L)
  }

  test("WAV: fmt found behind a preceding LIST chunk (real chunk walk)") {
    val list = "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII")
    val d = Multimodal.parseAudio(11L, wav(list, 1, 8000, 16, new Array[Byte](800)))
    assert((d.format, d.channels, d.sample_rate) == (("wav", 1, 8000)))
    assert(d.n_samples == 400L && d.duration_ms == 50L)
  }

  test("WAV: odd-size chunk before fmt is padded to even (RIFF spec)") {
    // a 3-byte chunk occupies 4 data bytes; a parser that skips only 3
    // lands mid-stream and misses fmt
    val odd = "junk".getBytes("US-ASCII") ++ le32(3) ++ bytes(1, 2, 3, 0)
    val d = Multimodal.parseAudio(12L, wav(odd, 1, 16000, 16, new Array[Byte](320)))
    assert((d.format, d.channels, d.sample_rate) == (("wav", 1, 16000)))
  }

  test("WAV: non-RIFF / truncated payloads decode safely") {
    assert(Multimodal.parseAudio(13L, "just some text".getBytes("UTF-8")).format == "unknown")
    assert(Multimodal.parseAudio(14L, Array.emptyByteArray).format == "unknown")
    val noData = "RIFF".getBytes("US-ASCII") ++ le32(12) ++ "WAVE".getBytes("US-ASCII") ++ fmtChunk(1, 8000, 16)
    assert(Multimodal.parseAudio(15L, noData).format == "unknown") // fmt but no data chunk
  }
}
