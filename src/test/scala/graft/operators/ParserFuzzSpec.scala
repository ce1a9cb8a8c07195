package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzz guards for every structural binary parser: on ARBITRARY byte
  * soup — including soup behind valid magics, truncation points and
  * hostile size fields — a 100 TB ingest parser must return a
  * well-formed "unknown"/empty result, never throw and never emit an
  * out-of-bounds offset. (Raw ScalaCheck generators with fixed
  * seeds, like PatternPropSpec — the scalatest bridge isn't on the
  * offline classpath.)
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  // byte soup stamped with a real magic: forces the deep parse path
  private def magicked(magic: Array[Int]): Gen[Array[Byte]] =
    bytesGen.map { b =>
      val out = new Array[Byte](magic.length + b.length)
      magic.indices.foreach(i => out(i) = magic(i).toByte)
      System.arraycopy(b, 0, out, magic.length, b.length)
      out
    }

  private val magics = Seq(
    "png" -> Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a),
    "jpeg" -> Array(0xff, 0xd8),
    "gif" -> Array('G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt, '9'.toInt, 'a'.toInt),
    "riff" -> Array('R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt),
    "ftyp" -> Array(0, 0, 0, 16, 'f'.toInt, 't'.toInt, 'y'.toInt, 'p'.toInt)
  )

  private def allInputs: Seq[Array[Byte]] =
    samples(bytesGen) ++ magics.flatMap { case (_, m) => samples(magicked(m), 120) }

  test("parseImage / parseAudio / parseVideo never throw on byte soup") {
    allInputs.foreach { b =>
      val d = Multimodal.parseImage(1L, b)
      assert(d.n_bytes == b.length)
      Multimodal.parseAudio(2L, b)
      Multimodal.parseVideo(3L, b)
    }
  }

  test("parsePcmWindows never throws; windows are consistent integer folds") {
    allInputs.foreach { b =>
      val ws = Multimodal.parsePcmWindows(6L, b, winFrames = 8)
      ws.foreach { w =>
        assert(w.n_samp > 0 && w.sum_sq >= 0 && w.peak >= 0 && w.peak <= 32768)
        assert(w.ms_q == w.sum_sq / w.n_samp)
        assert(w.sum_sq <= w.n_samp * w.peak * w.peak)
      }
      assert(ws.map(_.win) == ws.indices.map(_.toLong))
    }
  }

  test("parseFrames emits only in-bounds, non-overlapping ranges") {
    allInputs.foreach { b =>
      val frames = Multimodal.parseFrames(4L, b)
      frames.foreach { f =>
        assert(f.f_size >= 0 && f.f_offset >= 0,
          s"negative range ${f.f_offset}/${f.f_size} on ${b.length}B input")
      }
      // consecutive samples from one chunk must be contiguous
      frames.sliding(2).foreach {
        case Seq(a, c) => assert(c.f_offset == a.f_offset + a.f_size)
        case _ =>
      }
    }
  }

  test("parseThumb finds the body behind a progressive (SOF2) frame header") {
    // FFD8 + APP0 + SOF2 + body: the pre-round-8 walk only matched
    // SOF0, so a progressive JPEG yielded zero cells
    def seg(marker: Int, payload: Array[Int]): Array[Int] =
      Array(0xff, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xff) ++ payload
    val app0 = seg(0xe0, Array.fill(14)(0x4a))
    val sof2 = seg(0xc2, Array(8, 0, 32, 0, 64, 3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val body = Array.tabulate(160)(i => (i * 7) % 251)
    val jpeg = (Array(0xff, 0xd8) ++ app0 ++ sof2 ++ body).map(_.toByte)
    val cells = Multimodal.parseThumb(9L, jpeg)
    assert(cells.size == 16, s"expected 16 grid cells, got ${cells.size}")
    assert(cells.map(_.n_b).sum == body.length,
      s"cells must tile exactly the post-SOF body (${body.length}B)")
    // and the header parse agrees on the progressive dimensions
    val d = Multimodal.parseImage(9L, jpeg)
    assert(d.format == "jpeg" && d.width == 64 && d.height == 32, d.toString)
  }

  // minimal ISO-BMFF builders for the multi-trak tests
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ tag.getBytes("US-ASCII") ++ body
  }
  private def hdlr(typ: String) = box("hdlr",
    be32(0), be32(0), typ.getBytes("US-ASCII"), new Array[Byte](12))
  private def stbl(uniform: Long, n: Long, chunk0: Long) = box("stbl",
    box("stsz", be32(0), be32(uniform), be32(n)),
    box("stco", be32(0), be32(1), be32(chunk0)))
  private def trak(handler: String, uniform: Long, n: Long, chunk0: Long) =
    box("trak", box("mdia", hdlr(handler),
      box("minf", stbl(uniform, n, chunk0))))

  test("parseFrames indexes the VIDEO trak of a multi-track MP4, not the first trak") {
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200)) ++
      box("moov",
        trak("soun", 11, 2, 100), // audio FIRST — the old code indexed this
        trak("vide", 7, 3, 200)) ++
      new Array[Byte](120) // pad so the video chunk offsets are in-file
    val frames = Multimodal.parseFrames(10L, mp4)
    assert(frames.map(f => (f.frame_idx, f.f_offset, f.f_size)) ==
      Seq((0L, 200L, 7L), (1L, 207L, 7L), (2L, 214L, 7L)),
      s"expected the video trak's 3x7B samples at 200, got $frames")
    // the audio trak contributes nothing, and the single video trak
    // reports its moov ordinal (1), not a renumbered 0
    assert(frames.map(_.trak_idx).distinct == Seq(1L), frames.toString)
  }

  test("a TWO-video-trak MP4 emits per-trak frame runs with distinct trak_idx") {
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200)) ++
      box("moov",
        trak("soun", 11, 2, 100),  // audio: never indexed
        trak("vide", 7, 2, 200),   // main video
        trak("vide", 5, 3, 300)) ++ // e.g. a thumbnail/preview track
      new Array[Byte](250)
    val frames = Multimodal.parseFrames(11L, mp4)
    assert(frames.map(f => (f.trak_idx, f.frame_idx, f.f_offset, f.f_size)) ==
      Seq((1L, 0L, 200L, 7L), (1L, 1L, 207L, 7L),
        (2L, 0L, 300L, 5L), (2L, 1L, 305L, 5L), (2L, 2L, 310L, 5L)),
      s"both video traks must emit, frame_idx restarting per trak; got $frames")
  }

  test("parseVideo reports the FIRST VIDEO trak's dims when audio precedes it") {
    def tkhd(w: Int, h: Int) = box("tkhd",
      new Array[Byte](76), // version 0 fixed payload before width/height
      be32(w.toLong << 16), be32(h.toLong << 16))
    def trakWith(handler: String, w: Int, h: Int) =
      box("trak", tkhd(w, h), box("mdia", hdlr(handler)))
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(2000))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200)) ++
      box("moov",
        mvhd,
        trakWith("soun", 0, 0),     // audio first, dims zero
        trakWith("vide", 640, 360), // the dims that must win
        trakWith("vide", 128, 72))  // second video trak ignored for dims
    val d = Multimodal.parseVideo(12L, mp4)
    assert(d.format == "mp4" && d.width == 640 && d.height == 360,
      s"expected the first VIDEO trak's 640x360, got $d")
    assert(d.timescale == 1000L && d.duration_ms == 2000L, d.toString)
  }

  test("parseThumb cells stay inside the payload and tile contiguously") {
    allInputs.foreach { b =>
      val cells = Multimodal.parseThumb(5L, b)
      cells.foreach { c =>
        assert(c.n_b > 0 && c.sum_b >= 0 && c.px >= 0 && c.px <= 255)
      }
      if (cells.nonEmpty) {
        assert(cells.map(_.n_b).sum <= b.length)
        assert(cells.map(_.px).forall(p => p == (cells.find(_.px == p).get.sum_b /
          cells.find(_.px == p).get.n_b)))
      }
    }
  }
}
