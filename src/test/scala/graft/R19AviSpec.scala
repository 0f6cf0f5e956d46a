package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{JpegCodec, VideoCodec}

/** Round-19: AVI (RIFF) — the second video container family.
  * Uncompressed DIB frames must round-trip byte-exactly (incl. the
  * 4-byte row padding and bottom-up order); MJPG frames must decode
  * BIT-EQUAL to the direct JPEG decode of the same frame; malformed
  * containers stay fail-loud by name. */
class R19AviSpec extends AnyFunSuite {

  private def frame(f: Int)(x: Int, y: Int): Int =
    (x * 13 + y * 29 + f * 41 + 5) % 256

  test("DIB frames round-trip byte-exactly, padded rows + bottom-up") {
    val frames = (0 until 3).map(f => frame(f) _)
    // 10×6: row 30 bytes → padded to 32, exercising the alignment walk
    val dec = VideoCodec.decodeAviFrames(
      VideoCodec.encodeAvi(10, 6, frames))
    assert(dec.length == 3)
    for (f <- 0 until 3; y <- 0 until 6; x <- 0 until 10)
      assert(dec(f).lumaSum3(y * 10 + x) == 3 * frame(f)(x, y),
        s"f=$f ($x,$y)")
  }

  test("container byte length is exact at 8x8 x 3 DIB frames") {
    // the closed form the mm_avi_frames oracle banks: RIFF(12) +
    // LIST hdrl(8+4+64+124) + LIST movi(8+4+3*(8+192)) = 824
    val enc = VideoCodec.encodeAvi(8, 8, (0 until 3).map(f => frame(f) _))
    assert(enc.length == 824)
  }

  test("MJPG frames decode bit-equal to the direct JPEG decode") {
    val frames = (0 until 3).map(f => frame(f) _)
    val dec = VideoCodec.decodeAviFrames(
      VideoCodec.encodeAvi(8, 8, frames, codec = "MJPG"))
    assert(dec.length == 3)
    for (f <- 0 until 3) {
      val direct = JpegCodec.decode(JpegCodec.encode(8, 8, frames(f)))
      assert(dec(f).lumaSum3.toSeq == direct.lumaSum3.toSeq, s"f=$f")
    }
  }

  test("top-down DIB (negative biHeight) decodes unflipped") {
    // craft a foreign top-down AVI: negate biHeight in the strf and
    // reverse each frame's row blocks — the decode must equal the
    // original bottom-up decode exactly
    val w = 8; val h = 8
    val enc = VideoCodec.encodeAvi(w, h, Seq(frame(0) _, frame(1) _))
    def find(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      (0 to enc.length - p.length).find(i =>
        p.indices.forall(j => enc(i + j) == p(j))).getOrElse(
        fail(s"'$pat' not found"))
    }
    val td = enc.clone()
    val strfH = find("strf") + 8 + 8
    val negH = -h
    for (k <- 0 until 4) td(strfH + k) = ((negH >> (8 * k)) & 0xff).toByte
    val rowLen = w * 3
    var p = 12
    // reverse rows inside every 00db payload
    while (p + 8 <= td.length) {
      if (new String(td, p, 4, "US-ASCII") == "00db") {
        val base = p + 8
        for (y <- 0 until h / 2; k <- 0 until rowLen) {
          val a = base + y * rowLen + k
          val b = base + (h - 1 - y) * rowLen + k
          val t = td(a); td(a) = td(b); td(b) = t
        }
        p = base + rowLen * h
      } else if (new String(td, p, 4, "US-ASCII") == "LIST") p += 12
      else {
        val sz = ((td(p + 4) & 0xffL) | ((td(p + 5) & 0xffL) << 8) |
          ((td(p + 6) & 0xffL) << 16) | ((td(p + 7) & 0xffL) << 24))
        p += 8 + (sz + (sz & 1)).toInt
      }
    }
    val a = VideoCodec.decodeAviFrames(enc)
    val b = VideoCodec.decodeAviFrames(td)
    for (f <- a.indices)
      assert(a(f).lumaSum3.toSeq == b(f).lumaSum3.toSeq, s"f=$f")
    // a strf height that is NEITHER h nor -h fails loudly
    val bad = enc.clone()
    for (k <- 0 until 4) bad(strfH + k) = (((h + 1) >> (8 * k)) & 0xff).toByte
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(bad) }.getMessage.contains("disagrees"))
  }

  test("fail-loud: magic, audio stream, unknown compression, coding " +
      "mismatch, truncation") {
    val ok = VideoCodec.encodeAvi(8, 8, Seq(frame(0) _))
    def find(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      (0 to ok.length - p.length).find(i =>
        p.indices.forall(j => ok(i + j) == p(j))).getOrElse(
        fail(s"'$pat' not found"))
    }
    val badMagic = ok.clone(); badMagic(0) = 'X'
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(badMagic) }.getMessage.contains("magic"))
    // audio stream type rejected by name
    val auds = ok.clone()
    "auds".getBytes("US-ASCII").copyToArray(auds, find("vids"))
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(auds) }.getMessage.contains("auds"))
    // unknown biCompression fourcc (strf offset 16: after 'strf'+size
    // comes biSize(4)+biWidth(4)+biHeight(4)+planes/bits(4))
    val badComp = ok.clone()
    "XVID".getBytes("US-ASCII").copyToArray(badComp, find("strf") + 8 + 16)
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(badComp) }.getMessage.contains("XVID"))
    // frame chunk id disagreeing with the declared coding
    val mixed = ok.clone()
    "00dc".getBytes("US-ASCII").copyToArray(mixed, find("00db"))
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeAviFrames(mixed) }.getMessage.contains("disagrees"))
    // every truncation is controlled
    for (n <- Seq(6, 20, 100, ok.length - 1, ok.length - 50))
      intercept[IllegalArgumentException] {
        VideoCodec.decodeAviFrames(java.util.Arrays.copyOf(ok, n)) }
  }
}
