package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ImageCodec

/** PNG codec edge cases (bulk correctness = the DuckDB oracle replay of
  * mm_png_decode / mm_png_ahash_banded): every row filter round-trips,
  * gray and truecolor agree with the BMP decode of the same pixels,
  * chunk CRC corruption and truncated IDAT fail loudly, ancillary chunks
  * are skipped, unsupported shapes rejected. */
class R16PngSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 31 + y * 57 + 11) % 256
    (v, (v * 3) % 256, (v * 7) % 256)
  }

  private def gray(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 13 + y * 41 + 5) % 256
    (v, v, v)
  }

  test("every filter type round-trips to the BMP-decoded raster (RGB)") {
    val ref = ImageCodec.decode(ImageCodec.encodeBmp(7, 5, px))
    for (f <- 0 to 4) {
      val r = ImageCodec.decode(ImageCodec.encodePng(7, 5, px,
        colorType = 2, filter = f))
      assert(r.width === ref.width && r.height === ref.height)
      assert(r.lumaSum3.toSeq === ref.lumaSum3.toSeq, s"filter $f")
    }
  }

  test("Adam7 interlacing round-trips bit-exactly for every filter") {
    // dims chosen to make passes partial/empty: 1×1 (passes 2-7 empty),
    // 3×3, 5×7 (sub-8 so late passes dominate), 8×8, 13×11
    for ((w, h) <- Seq((1, 1), (3, 3), (5, 7), (8, 8), (13, 11));
         f <- 0 to 4; ct <- Seq(0, 2)) {
      val pxf: (Int, Int) => (Int, Int, Int) =
        if (ct == 0) gray else px
      val plain = ImageCodec.decode(ImageCodec.encodePng(w, h, pxf,
        colorType = ct, filter = f))
      val inter = ImageCodec.decode(ImageCodec.encodePng(w, h, pxf,
        colorType = ct, filter = f, interlace = true))
      assert(inter.width == w && inter.height == h)
      assert(inter.lumaSum3.toSeq == plain.lumaSum3.toSeq,
        s"Adam7 drift at ${w}x$h filter $f ct $ct")
    }
    // the interlaced fixture matches the sequential fixture's raster
    val src = "adam7 interlace fixture".getBytes("US-ASCII")
    val a = ImageCodec.decode(ImageCodec.grayPng(8, 8, src, 2, 3,
      interlace = true))
    val b = ImageCodec.decode(ImageCodec.grayPng(8, 8, src, 2, 3))
    assert(a.lumaSum3.toSeq == b.lumaSum3.toSeq)
    // truncated interlaced IDAT still fails loudly (the stream-length
    // accounting covers the 7-pass layout)
    val ok = ImageCodec.encodePng(13, 11, px, 2, 4, interlace = true)
    val idatAt = (12 until ok.length - 4).find(i =>
      new String(ok, i, 4, "US-ASCII") == "IDAT").get
    val lenOff = idatAt - 4
    val oldLen = java.nio.ByteBuffer.wrap(ok, lenOff, 4).getInt
    // halve the IDAT (genuinely losing deflate data, not just the zlib
    // Adler tail) and fix the chunk CRC so only the inflate accounting
    // can object
    val keep = oldLen / 2
    val cut = new java.io.ByteArrayOutputStream
    cut.write(ok, 0, lenOff)
    val nl = java.nio.ByteBuffer.allocate(4).putInt(keep).array()
    cut.write(nl, 0, 4)
    cut.write(ok, idatAt, 4 + keep)
    val crcIn = new java.util.zip.CRC32
    crcIn.update(ok, idatAt, 4 + keep)
    cut.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crcIn.getValue.toInt).array(), 0, 4)
    cut.write(ok, idatAt + 4 + oldLen + 4, ok.length - (idatAt + 4 + oldLen + 4))
    val e = intercept[IllegalArgumentException](
      ImageCodec.decode(cut.toByteArray))
    assert(e.getMessage.contains("IDAT"))
  }

  test("gray color type agrees with truecolor for gray content") {
    val a = ImageCodec.decode(ImageCodec.encodePng(8, 8, gray,
      colorType = 0, filter = 4))
    val b = ImageCodec.decode(ImageCodec.encodePng(8, 8, gray,
      colorType = 2, filter = 1))
    assert(a.lumaSum3.toSeq === b.lumaSum3.toSeq)
  }

  test("corrupt chunk CRC and corrupt IDAT byte fail loudly") {
    val ok = ImageCodec.encodePng(6, 6, px)
    // flip a byte inside the IHDR data -> CRC mismatch
    val bad = ok.clone(); bad(16) = (bad(16) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](ImageCodec.decode(bad))
    assert(e.getMessage.contains("CRC"))
    // truncate: drop IEND + half the IDAT payload, re-walk fails
    val cut = java.util.Arrays.copyOf(ok, ok.length - 20)
    intercept[Exception](ImageCodec.decode(cut))
  }

  test("ancillary chunks are walked over (CRC-checked) without effect") {
    val ok = ImageCodec.encodePng(4, 4, gray, colorType = 0)
    // splice a tEXt chunk between IHDR (8 + 25 bytes) and IDAT
    val text = "comment".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream
    out.write(ok, 0, 33)
    val be = java.nio.ByteBuffer.allocate(4)
    out.write(be.putInt(0, text.length).array(), 0, 4)
    out.write("tEXt".getBytes("US-ASCII"), 0, 4)
    out.write(text, 0, text.length)
    val payload = "tEXt".getBytes("US-ASCII") ++ text
    val c = new java.util.zip.CRC32; c.update(payload)
    out.write(be.putInt(0, c.getValue.toInt).array(), 0, 4)
    out.write(ok, 33, ok.length - 33)
    val r = ImageCodec.decode(out.toByteArray)
    assert(r.lumaSum3.toSeq === ImageCodec.decode(ok).lumaSum3.toSeq)
  }

  test("unsupported shapes fail loudly; magic sniff routes PNG") {
    intercept[IllegalArgumentException](
      ImageCodec.encodePng(4, 4, px, colorType = 6))
    intercept[IllegalArgumentException](
      ImageCodec.encodePng(4, 4, px, filter = 5))
    // gray+alpha color type in IHDR rejected at decode (palette became
    // a supported type in r18 — its missing-PLTE failure is separate)
    val ok = ImageCodec.encodePng(4, 4, px)
    val ga = ok.clone(); ga(25) = 4.toByte // color type byte
    // fix the IHDR CRC so the color-type check (not CRC) fires
    val c = new java.util.zip.CRC32; c.update(ga, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(ga, 12 + 4 + 13, 4).putInt(c.getValue.toInt)
    val e = intercept[IllegalArgumentException](ImageCodec.decode(ga))
    assert(e.getMessage.contains("color type"))
    // type 3 without a PLTE is the palette tier's own fail-loud shape
    val pal = ok.clone(); pal(25) = 3.toByte
    val c2 = new java.util.zip.CRC32; c2.update(pal, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(pal, 12 + 4 + 13, 4).putInt(c2.getValue.toInt)
    assert(intercept[IllegalArgumentException](
      ImageCodec.decode(pal)).getMessage.contains("PLTE"))
    assert(ImageCodec.decode(ok).width === 4)
  }

  test("grayPng pixel map matches grayFromBytes (same text, same raster)") {
    val src = "the quick brown fox".getBytes("UTF-8")
    val png = ImageCodec.decode(ImageCodec.grayPng(8, 8, src, 0, 3))
    val bmp = ImageCodec.decode(ImageCodec.grayFromBytes(8, 8, src,
      asPpm = false))
    assert(png.lumaSum3.toSeq === bmp.lumaSum3.toSeq)
  }
}
