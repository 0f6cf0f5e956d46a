package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, TiffCodec}

/** Round-18 follow-on formats: PBM bitmaps (P1/P4), TIFF planar
  * configuration 2, and animated GIF89a frame decode. */
class R18FormatsSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 29 + y * 53 + 7) % 256
    (v, (v * 5) % 256, (v * 11) % 256)
  }

  test("P4/P1 bitmaps round-trip with the Netpbm polarity (1 = black)") {
    val bit = (x: Int, y: Int) => ((x * 3 + y * 7 + 1) % 5) < 2
    // widths crossing byte boundaries: 8 (exact), 13 (5 pad bits), 16, 1
    for ((w, h) <- Seq((8, 4), (13, 7), (16, 3), (1, 9));
         ascii <- Seq(false, true)) {
      val r = ImageCodec.decode(ImageCodec.encodePbm(w, h, bit, ascii))
      assert(r.width == w && r.height == h, s"${w}x$h ascii=$ascii")
      for (y <- 0 until h; x <- 0 until w)
        assert(r.lumaSum3(y * w + x) == (if (bit(x, y)) 0 else 765),
          s"${w}x$h ascii=$ascii ($x,$y)")
    }
    // P4 row padding is per ROW: a 13-wide image must not borrow bits
    // across rows (encoded size pins it: 2 bytes/row)
    val enc = ImageCodec.encodePbm(13, 7, bit)
    val headerLen = "P4\n13 7\n".length
    assert(enc.length == headerLen + 2 * 7)
  }

  test("TIFF planar configuration 2 decodes equal to chunky") {
    val ref = TiffCodec.decode(TiffCodec.encode(9, 7, px))
    for (comp <- Seq(1, 5, 32773); beo <- Seq(false, true);
         rps <- Seq(0, 3)) {
      val r = TiffCodec.decode(TiffCodec.encode(9, 7, px,
        compression = comp, bigEndian = beo, rowsPerStrip = rps,
        planar = 2))
      assert(r.lumaSum3.toSeq == ref.lumaSum3.toSeq,
        s"comp=$comp be=$beo rps=$rps")
    }
    // planar + predictor: differencing distance is 1 WITHIN a plane —
    // a chunky-distance (3) implementation would corrupt every pixel
    val rp = TiffCodec.decode(TiffCodec.encode(20, 10, px,
      compression = 5, predictor = 2, planar = 2, rowsPerStrip = 4))
    val refp = TiffCodec.decode(TiffCodec.encode(20, 10, px))
    assert(rp.lumaSum3.toSeq == refp.lumaSum3.toSeq)
    // gray planar and tiled planar are out of the spec'd subset
    intercept[IllegalArgumentException] {
      TiffCodec.encode(8, 8, px, gray = true, planar = 2) }
    intercept[IllegalArgumentException] {
      TiffCodec.encode(32, 32, px, tileW = 16, tileH = 16, planar = 2) }
  }

  test("animated GIF89a: every frame decodes; single-frame APIs see " +
      "frame 0") {
    val frames = (0 until 4).map { f =>
      (x: Int, y: Int) => (x * 11 + y * 17 + f * 31 + 3) % 256
    }
    val enc = ImageCodec.encodeGifAnimated(10, 8, frames, delayCs = 5)
    val dec = ImageCodec.decodeGifFrames(enc)
    assert(dec.length == 4)
    for (f <- 0 until 4; y <- 0 until 8; x <- 0 until 10)
      assert(dec(f).lumaSum3(y * 10 + x) == 3 * frames(f)(x, y),
        s"frame $f ($x,$y)")
    // the single-image decode (and the kernel behind every mm_* query)
    // sees frame 0 — the standard thumbnail projection
    val first = ImageCodec.decode(enc)
    assert(first.lumaSum3.toSeq == dec(0).lumaSum3.toSeq)
    // a plain 87a image is a 1-frame animation
    val plain = ImageCodec.encodeGif(6, 6, (x, y) => (x + y) % 256)
    assert(ImageCodec.decodeGifFrames(plain).length == 1)
  }

  test("16-bit Netpbm: P5/P6/P2/P3 at maxval 65535 project the high " +
      "byte") {
    val ref = ImageCodec.decode(ImageCodec.encodeBmp(9, 7, px))
    for (gray <- Seq(false); ascii <- Seq(false, true)) {
      val r = ImageCodec.decode(ImageCodec.encodePnm16(9, 7, px,
        gray = gray, ascii = ascii))
      assert(r.lumaSum3.toSeq == ref.lumaSum3.toSeq,
        s"gray=$gray ascii=$ascii")
    }
    val g = (x: Int, y: Int) => { val v = (x * 7 + y * 31 + 2) % 256
      (v, v, v) }
    val refG = ImageCodec.decode(ImageCodec.encodePgm(9, 7,
      (x, y) => g(x, y)._1))
    for (ascii <- Seq(false, true)) {
      val r = ImageCodec.decode(ImageCodec.encodePnm16(9, 7, g,
        gray = true, ascii = ascii))
      assert(r.lumaSum3.toSeq == refG.lumaSum3.toSeq, s"ascii=$ascii")
    }
    // other maxvals stay rejected by name
    assert(intercept[IllegalArgumentException] {
      ImageCodec.decode("P5\n2 2\n1023\n".getBytes("US-ASCII") ++
        new Array[Byte](8)) }.getMessage.contains("maxval"))
  }

  test("16-bit BMP: 555 and 565 round-trip through bit replication") {
    def e5(q: Int) = (q << 3) | (q >> 2)
    def e6(q: Int) = (q << 2) | (q >> 4)
    val r555 = ImageCodec.decode(ImageCodec.encodeBmp16(9, 7, px))
    val r565 = ImageCodec.decode(ImageCodec.encodeBmp16(9, 7, px,
      use565 = true))
    for (y <- 0 until 7; x <- 0 until 9) {
      val (r, g, b) = px(x, y)
      assert(r555.lumaSum3(y * 9 + x) ==
        e5(r >> 3) + e5(g >> 3) + e5(b >> 3), s"555 ($x,$y)")
      assert(r565.lumaSum3(y * 9 + x) ==
        e5(r >> 3) + e6(g >> 2) + e5(b >> 3), s"565 ($x,$y)")
    }
    // unsupported BI_BITFIELDS masks fail loudly (patch red mask)
    val ok = ImageCodec.encodeBmp16(8, 8, px, use565 = true)
    val bad = ok.clone(); bad(54) = 0x55
    assert(intercept[IllegalArgumentException] {
      ImageCodec.decode(bad) }.getMessage.contains("masks"))
  }

  test("4-bit palette BMP: uncompressed and RLE4") {
    val idx = (x: Int, y: Int) => (x * 5 + y * 3 + (x * y) % 2) % 16
    for (rle <- Seq(false, true); (w, h) <- Seq((9, 7), (8, 8), (1, 5))) {
      val r = ImageCodec.decode(ImageCodec.encodeBmp4(w, h, idx, rle))
      assert(r.width == w && r.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(r.lumaSum3(y * w + x) == 3 * (idx(x, y) * 17),
          s"rle=$rle ${w}x$h ($x,$y)")
    }
  }

  test("animated GIF fail-loud: partial frames, missing trailer") {
    val frames = Seq((x: Int, y: Int) => (x + y) % 256)
    val ok = ImageCodec.encodeGifAnimated(8, 8, frames)
    // truncate the trailer
    intercept[IllegalArgumentException] {
      ImageCodec.decodeGifFrames(java.util.Arrays.copyOf(ok,
        ok.length - 1)) }
    // patch the first image descriptor's left offset to 1: partial
    // frame — compositing is rejected by name
    val bad = ok.clone()
    var p = 13 + 768 // header + screen + global table
    while ((bad(p) & 0xff) == 0x21) {
      p += 2
      while ((bad(p) & 0xff) != 0) p += 1 + (bad(p) & 0xff)
      p += 1
    }
    assert((bad(p) & 0xff) == 0x2c)
    bad(p + 1) = 1
    assert(intercept[IllegalArgumentException] {
      ImageCodec.decodeGifFrames(bad) }.getMessage.contains("compositing"))
  }
}
