package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ImageCodec

/** Round-18: palette PNG (color type 3 + PLTE) and 16-bit depth (gray
  * and truecolor) — the two most common real-world PNG shapes the r17
  * tier rejected.  Indices must go THROUGH the PLTE (inverted-palette
  * proof), 16-bit samples must project via the HIGH byte (the encoder
  * writes a deliberately different low byte), and both shapes must
  * survive all five row filters and Adam7. */
class R18PngSpec extends AnyFunSuite {

  private def gray(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 19 + y * 47 + 9) % 256
    (v, v, v)
  }

  private def px(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 23 + y * 59 + 13) % 256
    (v, (v * 3) % 256, (v * 7) % 256)
  }

  test("palette indices go THROUGH the PLTE") {
    val inverted = Array.tabulate(256)(i => (255 - i, 255 - i, 255 - i))
    val idxPx = (x: Int, y: Int) => { val i = (x + y * 9) % 256; (i, i, i) }
    val r = ImageCodec.decode(ImageCodec.encodePng(9, 7, idxPx,
      colorType = 3, palette = inverted))
    for (y <- 0 until 7; x <- 0 until 9) {
      val i = (x + y * 9) % 256
      assert(r.lumaSum3(y * 9 + x) == 3 * (255 - i), s"($x,$y)")
    }
  }

  test("palette identity == gray across filters and Adam7") {
    val identity = Array.tabulate(256)(i => (i, i, i))
    val ref = ImageCodec.decode(ImageCodec.encodePng(11, 13, gray,
      colorType = 0))
    for (f <- 0 to 4; il <- Seq(false, true)) {
      val r = ImageCodec.decode(ImageCodec.encodePng(11, 13, gray,
        colorType = 3, filter = f, interlace = il, palette = identity))
      assert(r.lumaSum3.toSeq == ref.lumaSum3.toSeq, s"f=$f adam7=$il")
    }
  }

  test("16-bit projects via the HIGH byte, gray and truecolor") {
    // the encoder's low byte is (v*131+17)%256 ≠ v for most v: a
    // decoder reading the wrong byte of the pair cannot match
    val refG = ImageCodec.decode(ImageCodec.encodePng(10, 6, gray,
      colorType = 0))
    val refC = ImageCodec.decode(ImageCodec.encodePng(10, 6, px,
      colorType = 2))
    for (f <- 0 to 4; il <- Seq(false, true)) {
      val g16 = ImageCodec.decode(ImageCodec.encodePng(10, 6, gray,
        colorType = 0, filter = f, interlace = il, depth = 16))
      val c16 = ImageCodec.decode(ImageCodec.encodePng(10, 6, px,
        colorType = 2, filter = f, interlace = il, depth = 16))
      assert(g16.lumaSum3.toSeq == refG.lumaSum3.toSeq, s"g f=$f il=$il")
      assert(c16.lumaSum3.toSeq == refC.lumaSum3.toSeq, s"c f=$f il=$il")
    }
  }

  test("fail-loud: PLTE rules and unsupported combinations") {
    val identity = Array.tabulate(256)(i => (i, i, i))
    // palette at 16-bit is out of spec for this codec
    intercept[IllegalArgumentException] {
      ImageCodec.encodePng(8, 8, gray, colorType = 3, depth = 16,
        palette = identity) }
    // palette without a palette argument / palette on non-3
    intercept[IllegalArgumentException] {
      ImageCodec.encodePng(8, 8, gray, colorType = 3) }
    intercept[IllegalArgumentException] {
      ImageCodec.encodePng(8, 8, gray, colorType = 0, palette = identity) }
    // a type-3 stream with its PLTE chunk renamed (CRC re-fixed) must
    // be refused as palette-without-PLTE
    val ok = ImageCodec.encodePng(8, 8, gray, colorType = 3,
      palette = identity)
    val plteAt = {
      var p = 8; var at = -1
      while (at < 0) {
        val len = java.nio.ByteBuffer.wrap(ok, p, 4).getInt
        if (new String(ok, p + 4, 4, "US-ASCII") == "PLTE") at = p
        else p += 12 + len
      }
      at
    }
    val bad = ok.clone()
    bad(plteAt + 4) = 'p' // "pLTE": ancillary, skipped
    val crc = {
      val c = new java.util.zip.CRC32
      c.update(bad, plteAt + 4, 4 + 768)
      c.getValue.toInt
    }
    java.nio.ByteBuffer.wrap(bad, plteAt + 8 + 768, 4).putInt(crc)
    assert(intercept[IllegalArgumentException] {
      ImageCodec.decode(bad) }.getMessage.contains("PLTE"))
  }
}
