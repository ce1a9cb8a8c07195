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

  test("PCM windows: known samples fold to exact sum_sq/peak/ms_q") {
    // mono, 6 samples, window=4: [3, -4, 0, 32767] then [-32768, 1]
    val data = le16(3) ++ le16(-4 & 0xffff) ++ le16(0) ++ le16(32767) ++
      le16(-32768 & 0xffff) ++ le16(1)
    val ws = Multimodal.parsePcmWindows(30L, wav(Array.emptyByteArray, 1, 8000, 16, data), winFrames = 4)
    assert(ws.map(w => (w.win, w.n_samp, w.sum_sq, w.peak, w.ms_q)) == Seq(
      (0L, 4L, 9L + 16L + 0L + 32767L * 32767L, 32767L, (25L + 32767L * 32767L) / 4),
      (1L, 2L, 32768L * 32768L + 1L, 32768L, (32768L * 32768L + 1L) / 2)
    ))
  }

  test("PCM windows: stereo interleave folds both channels per frame") {
    // 2 channels × 3 frames: L=[100, -200, 300], R=[1, 2, -3]
    val data = le16(100) ++ le16(1) ++ le16(-200 & 0xffff) ++ le16(2) ++
      le16(300) ++ le16(-3 & 0xffff)
    val ws = Multimodal.parsePcmWindows(31L, wav(Array.emptyByteArray, 2, 44100, 16, data), winFrames = 2)
    assert(ws.map(w => (w.win, w.n_samp, w.sum_sq, w.peak)) == Seq(
      (0L, 4L, 10000L + 1 + 40000L + 4, 200L),
      (1L, 2L, 90000L + 9, 300L)
    ))
  }

  test("PCM windows: data behind a LIST chunk; trailing partial frame ignored") {
    val list = "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII")
    // stereo: 1 whole frame (4 bytes) + 3 trailing bytes
    val data = le16(7) ++ le16(-7 & 0xffff) ++ bytes(9, 9, 9)
    val ws = Multimodal.parsePcmWindows(32L, wav(list, 2, 8000, 16, data), winFrames = 4)
    assert(ws == Seq(Multimodal.PcmWindow(32L, 0L, 2L, 98L, 7L, 49L)))
  }

  test("PCM windows: non-WAV, non-16-bit and truncated-data payloads yield no rows") {
    assert(Multimodal.parsePcmWindows(33L, "just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parsePcmWindows(34L, wav(Array.emptyByteArray, 1, 8000, 8, bytes(1, 2, 3, 4))).isEmpty)
    // data size field claims 8 bytes, only 2 present: clamp, fold the 1 real frame
    val lying = "RIFF".getBytes("US-ASCII") ++ le32(100) ++ "WAVE".getBytes("US-ASCII") ++
      fmtChunk(1, 8000, 16) ++ "data".getBytes("US-ASCII") ++ le32(8) ++ le16(5)
    val ws = Multimodal.parsePcmWindows(35L, lying)
    assert(ws == Seq(Multimodal.PcmWindow(35L, 0L, 1L, 25L, 5L, 25L)))
  }

  // ----- ISO-BMFF / MP4 (handcrafted, independent of videoPayloads) -----

  private def be64(v: Long) = be32((v >>> 32).toInt) ++ be32(v.toInt)
  private def box(tag: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ tag.getBytes("US-ASCII") ++ payload
  private val matrix36 =
    be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x10000) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000)
  private val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200))

  private def mvhdV0(ts: Int, dur: Int) = box("mvhd",
    bytes(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur) ++
      be32(0x10000) ++ be16(0x100) ++ be16(0) ++ new Array[Byte](8) ++
      matrix36 ++ new Array[Byte](24) ++ be32(2))
  private def tkhdV0(w: Int, h: Int) = box("tkhd",
    bytes(0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(500) ++
      new Array[Byte](8) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      matrix36 ++ be32(w << 16) ++ be32(h << 16))

  test("MP4: box walk finds mvhd/tkhd even with a free box first and trak before mvhd") {
    val moov = box("moov", box("trak", tkhdV0(1280, 720)) ++ mvhdV0(1000, 2500))
    val mp4 = ftyp ++ box("free", new Array[Byte](11)) ++ moov ++
      box("mdat", "frames".getBytes("US-ASCII"))
    val d = Multimodal.parseVideo(16L, mp4)
    assert((d.format, d.width, d.height) == (("mp4", 1280, 720)))
    assert(d.timescale == 1000L && d.duration_ms == 2500L)
  }

  test("MP4: version-1 mvhd/tkhd (64-bit times) parse at the shifted offsets") {
    val mvhd1 = box("mvhd",
      bytes(1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++ be32(90000) ++ be64(180000L) ++
        be32(0x10000) ++ be16(0x100) ++ be16(0) ++ new Array[Byte](8) ++
        matrix36 ++ new Array[Byte](24) ++ be32(2))
    val tkhd1 = box("tkhd",
      bytes(1, 0, 0, 7) ++ be64(0L) ++ be64(0L) ++ be32(1) ++ be32(0) ++ be64(180000L) ++
        new Array[Byte](8) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
        matrix36 ++ be32(320 << 16) ++ be32(240 << 16))
    val d = Multimodal.parseVideo(17L, ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1)))
    assert((d.format, d.width, d.height) == (("mp4", 320, 240)))
    assert(d.timescale == 90000L && d.duration_ms == 2000L)
  }

  test("MP4: a largesize (size==1) mdat before moov is skipped via its 64-bit size") {
    val data = "0123456789".getBytes("US-ASCII")
    val mdatLarge = be32(1) ++ "mdat".getBytes("US-ASCII") ++ be64(16L + data.length) ++ data
    val mp4 = ftyp ++ mdatLarge ++ box("moov", mvhdV0(600, 300) ++ box("trak", tkhdV0(64, 48)))
    val d = Multimodal.parseVideo(18L, mp4)
    assert((d.format, d.width, d.height) == (("mp4", 64, 48)))
    assert(d.duration_ms == 500L)
  }

  test("MP4: non-MP4 / truncated / corrupt-size payloads decode safely") {
    assert(Multimodal.parseVideo(19L, "just some text".getBytes("UTF-8")).format == "unknown")
    assert(Multimodal.parseVideo(20L, Array.emptyByteArray).format == "unknown")
    assert(Multimodal.parseVideo(21L, ftyp).format == "unknown") // no moov
    // zero-size non-terminal box must not loop forever
    val corrupt = ftyp ++ be32(0) ++ "free".getBytes("US-ASCII") ++ new Array[Byte](4)
    assert(Multimodal.parseVideo(22L, corrupt).format == "unknown")
  }
}
