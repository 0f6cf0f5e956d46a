package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, JpegCodec, VideoCodec}

/** Round-20: the production seams the r19 verdict ranked next —
  * table-less Motion-JPEG (Annex-K default Huffman tables), progressive
  * subsampled color (the web's progressive-4:2:0 default), interlaced
  * Y4M field-split de-interlacing, AVI 'rec ' grouped movi lists +
  * JUNK alignment chunks, and the Long-safe movi size walk. */
class R20CodecSpec extends AnyFunSuite {

  private def frame(f: Int)(x: Int, y: Int): Int =
    (x * 13 + y * 29 + f * 41 + 5) % 256

  private def rgbAt(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 31 + 3) % 256, (x * 17 + y * 5 + 11) % 256,
      (x * 3 + y * 13 + 101) % 256)

  // ---- interlaced Y4M ------------------------------------------------

  test("It streams field-split: top field first, exact rows") {
    val frames = (0 until 2).map(f => frame(f) _)
    val dec = VideoCodec.decodeY4mFrames(
      VideoCodec.encodeY4m(8, 8, frames, chroma = "420", interlace = "t"))
    assert(dec.length == 4) // 2 stored pictures × 2 fields
    for (f <- 0 until 2; par <- 0 until 2; fy <- 0 until 4; x <- 0 until 8) {
      val r = dec(2 * f + par)
      assert(r.width == 8 && r.height == 4)
      assert(r.lumaSum3(fy * 8 + x) == 3 * frame(f)(x, 2 * fy + par),
        s"f=$f par=$par ($x,$fy)")
    }
  }

  test("Ib streams yield the bottom field first") {
    val dec = VideoCodec.decodeY4mFrames(
      VideoCodec.encodeY4m(8, 8, Seq(frame(0) _), chroma = "mono",
        interlace = "b"))
    assert(dec.length == 2)
    // field 0 = odd stored rows, field 1 = even
    for (fy <- 0 until 4; x <- 0 until 8) {
      assert(dec(0).lumaSum3(fy * 8 + x) == 3 * frame(0)(x, 2 * fy + 1))
      assert(dec(1).lumaSum3(fy * 8 + x) == 3 * frame(0)(x, 2 * fy))
    }
  }

  test("Im mixed mode and odd-height interlace fail loudly by name") {
    val e1 = intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(
        ("YUV4MPEG2 W8 H8 F25:1 Im A1:1 Cmono\nFRAME\n" + "x" * 64)
          .getBytes("US-ASCII"))
    }
    assert(e1.getMessage.contains("Im unsupported"))
    val e2 = intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(
        ("YUV4MPEG2 W8 H7 F25:1 It A1:1 Cmono\nFRAME\n" + "x" * 56)
          .getBytes("US-ASCII"))
    }
    assert(e2.getMessage.contains("even height"))
    intercept[IllegalArgumentException] {
      VideoCodec.encodeY4m(8, 7, Seq(frame(0) _), chroma = "mono",
        interlace = "t")
    }
  }

  test("progressive streams are unchanged by the interlace machinery") {
    val frames = (0 until 2).map(f => frame(f) _)
    val dec = VideoCodec.decodeY4mFrames(
      VideoCodec.encodeY4m(8, 8, frames, chroma = "420"))
    assert(dec.length == 2)
    for (f <- 0 until 2; y <- 0 until 8; x <- 0 until 8)
      assert(dec(f).lumaSum3(y * 8 + x) == 3 * frame(f)(x, y))
  }

  // ---- AVI rec lists + JUNK -------------------------------------------

  test("'rec ' grouped + JUNK-padded AVI decodes bit-equal to flat") {
    val frames = (0 until 5).map(f => frame(f) _)
    val flat = VideoCodec.decodeAviFrames(
      VideoCodec.encodeAvi(10, 6, frames))
    for (group <- Seq(1, 2, 5); junk <- Seq(false, true)) {
      val dec = VideoCodec.decodeAviFrames(VideoCodec.encodeAvi(10, 6,
        frames, recGroup = group, junkPad = junk))
      assert(dec.length == 5, s"group=$group junk=$junk")
      for (f <- 0 until 5)
        assert(dec(f).lumaSum3.toSeq == flat(f).lumaSum3.toSeq,
          s"group=$group junk=$junk f=$f")
    }
  }

  test("rec grouping works for MJPG frames too") {
    val frames = (0 until 3).map(f => frame(f) _)
    val flat = VideoCodec.decodeAviFrames(
      VideoCodec.encodeAvi(8, 8, frames, codec = "MJPG"))
    val dec = VideoCodec.decodeAviFrames(VideoCodec.encodeAvi(8, 8,
      frames, codec = "MJPG", recGroup = 2, junkPad = true))
    for (f <- 0 until 3)
      assert(dec(f).lumaSum3.toSeq == flat(f).lumaSum3.toSeq, s"f=$f")
  }

  test("non-'rec ' movi LISTs and foreign movi chunks stay fail-loud") {
    val enc = VideoCodec.encodeAvi(8, 8, Seq(frame(0) _), recGroup = 1)
    // corrupt the inner 'rec ' fourcc to 'xxxx'
    def find(pat: String, from: Int = 0): Int = {
      val p = pat.getBytes("US-ASCII")
      (from to enc.length - p.length).find(i =>
        p.indices.forall(j => enc(i + j) == p(j))).getOrElse(
        fail(s"'$pat' not found"))
    }
    val recAt = find("rec ")
    val bad = enc.clone()
    "xxxx".getBytes("US-ASCII").copyToArray(bad, recAt)
    val e = intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(bad)
    }
    assert(e.getMessage.contains("movi LIST 'xxxx' unsupported"))
  }

  test("a crafted near-2^31 movi chunk size fails by name, not by overflow") {
    val enc = VideoCodec.encodeAvi(8, 8, Seq(frame(0) _))
    // find the '00db' frame chunk and plant 0x7ffffffd as its size: the
    // Int-narrowed sum p + 8 + sz would wrap negative and pass a naive
    // <= moviEnd check (the r19 ADVICE finding)
    def find(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      (0 to enc.length - p.length).find(i =>
        p.indices.forall(j => enc(i + j) == p(j))).getOrElse(
        fail(s"'$pat' not found"))
    }
    val at = find("00db") + 4
    val bad = enc.clone()
    val sz = 0x7ffffffdL
    for (k <- 0 until 4) bad(at + k) = ((sz >> (8 * k)) & 0xff).toByte
    val e = intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(bad)
    }
    assert(e.getMessage.contains("truncated AVI frame chunk"))
  }

  // ---- table-less Motion-JPEG ------------------------------------------

  test("stripDht removes exactly the DHT segments (gray: 216 bytes)") {
    val jpg = JpegCodec.encode(8, 8, frame(0) _)
    val stripped = JpegCodec.stripDht(jpg)
    // DC luma DHT = 2+2+1+16+12 = 33 bytes, AC luma = 2+2+1+16+162 = 183
    assert(jpg.length - stripped.length == 216)
    // color adds the chroma pair: 33 + 2+2+1+16+162 = another 216
    val cjpg = JpegCodec.encodeColor(8, 8, rgbAt _)
    assert(cjpg.length - JpegCodec.stripDht(cjpg).length == 432)
  }

  test("DHT-stripped frames decode bit-equal under the MJPEG convention") {
    for ((enc, name) <- Seq(
        (JpegCodec.encode(8, 8, frame(0) _), "gray"),
        (JpegCodec.encodeColor(8, 8, rgbAt _), "color444"),
        (JpegCodec.encodeColor420(16, 16, rgbAt _), "color420"))) {
      val full = JpegCodec.decode(enc)
      val viaDefaults = JpegCodec.decode(JpegCodec.stripDht(enc),
        mjpegDefaultTables = true)
      assert(viaDefaults.lumaSum3.toSeq == full.lumaSum3.toSeq, name)
    }
  }

  test("outside the MJPG context missing tables still fail loudly") {
    val stripped = JpegCodec.stripDht(JpegCodec.encode(8, 8, frame(0) _))
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(stripped)
    }
    assert(e.getMessage.contains("missing DC Huffman table"))
  }

  test("a table-less PROGRESSIVE frame is rejected by name even under " +
      "the MJPEG convention") {
    // the Annex-K defaults are the BASELINE interchange tables; no
    // MJPEG producer emits progressive frames, so a progressive frame
    // that also omits its tables is corruption, not the convention
    val prog = JpegCodec.stripDht(JpegCodec.encodeProgressive(8, 8,
      frame(0) _))
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(prog, mjpegDefaultTables = true)
    }
    assert(e.getMessage.contains("baseline-only"), e.getMessage)
    // without the MJPG flag the plain message still names the gap
    val e2 = intercept[IllegalArgumentException] {
      JpegCodec.decode(prog)
    }
    assert(e2.getMessage.contains("Huffman table"), e2.getMessage)
  }

  test("table-less MJPG AVI decodes bit-equal to the table-carrying one") {
    val frames = (0 until 3).map(f => frame(f) _)
    val withTables = VideoCodec.decodeAviFrames(
      VideoCodec.encodeAvi(8, 8, frames, codec = "MJPG"))
    val enc = VideoCodec.encodeAvi(8, 8, frames, codec = "MJPG",
      stripTables = true)
    val dec = VideoCodec.decodeAviFrames(enc)
    for (f <- 0 until 3)
      assert(dec(f).lumaSum3.toSeq == withTables(f).lumaSum3.toSeq, s"f=$f")
    // and the stripped container is really smaller by 3 × 216
    val full = VideoCodec.encodeAvi(8, 8, frames, codec = "MJPG")
    assert(full.length - enc.length == 3 * 216)
  }

  // ---- progressive subsampled color -----------------------------------

  test("progressive 4:2:0 decodes bit-equal to sequential 4:2:0") {
    // dims exercise: exact MCU multiple, sub-MCU (padded ≠ ceil grid
    // on the luma), non-multiple-of-16, and odd dims
    for ((w, h) <- Seq((16, 16), (8, 8), (24, 16), (17, 9), (40, 24))) {
      val seqDec = JpegCodec.decode(JpegCodec.encodeColor420(w, h, rgbAt _))
      val progDec = JpegCodec.decode(
        JpegCodec.encodeProgressiveColor420(w, h, rgbAt _))
      assert(progDec.width == w && progDec.height == h)
      assert(progDec.lumaSum3.toSeq == seqDec.lumaSum3.toSeq, s"${w}x$h")
    }
  }

  test("progressive 4:2:2 and 4:1:1 decode bit-equal to sequential") {
    val w = 20; val h = 12
    val seq422 = JpegCodec.decode(JpegCodec.encodeColor422(w, h, rgbAt _))
    val prog422 = JpegCodec.decode(
      JpegCodec.encodeProgressiveColorSub(w, h, rgbAt _, 2, 1))
    assert(prog422.lumaSum3.toSeq == seq422.lumaSum3.toSeq, "422")
    val seq411 = JpegCodec.decode(JpegCodec.encodeColor411(w, h, rgbAt _))
    val prog411 = JpegCodec.decode(
      JpegCodec.encodeProgressiveColorSub(w, h, rgbAt _, 4, 1))
    assert(prog411.lumaSum3.toSeq == seq411.lumaSum3.toSeq, "411")
  }

  test("multi-band progressive 4:2:0 stays bit-equal") {
    val seqDec = JpegCodec.decode(JpegCodec.encodeColor420(24, 16, rgbAt _))
    val progDec = JpegCodec.decode(JpegCodec.encodeProgressiveColor420(
      24, 16, rgbAt _, bands = Seq((1, 2), (3, 9), (10, 63))))
    assert(progDec.lumaSum3.toSeq == seqDec.lumaSum3.toSeq)
  }

  test("1x1 progressive containers are unchanged (regression)") {
    val g = JpegCodec.decode(JpegCodec.encodeProgressive(17, 9, frame(0) _))
    val gs = JpegCodec.decode(JpegCodec.encode(17, 9, frame(0) _))
    assert(g.lumaSum3.toSeq == gs.lumaSum3.toSeq, "gray prog")
    val sa = JpegCodec.decode(
      JpegCodec.encodeProgressiveSA(17, 9, frame(0) _, al = 2))
    assert(sa.lumaSum3.toSeq == gs.lumaSum3.toSeq, "gray SA")
    val c = JpegCodec.decode(JpegCodec.encodeProgressiveColor(10, 6, rgbAt _))
    val cs = JpegCodec.decode(JpegCodec.encodeColor(10, 6, rgbAt _))
    assert(c.lumaSum3.toSeq == cs.lumaSum3.toSeq, "color444 prog")
  }

  test("unsupported progressive sampling fails by name") {
    // craft a 3x3-sampled SOF2 via the encoder's validation
    intercept[IllegalArgumentException] {
      JpegCodec.encodeProgressiveColorSub(8, 8, rgbAt _, 3, 3)
    }
  }
}
