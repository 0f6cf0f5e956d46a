package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ImageCodec

/** GIF87a/LZW codec edge cases (bulk correctness = the DuckDB oracle
  * replay of mm_gif_*): round trips vs the BMP decode including the
  * KwKwK case and a dictionary-reset-sized image, real compression on
  * repetitive input, structural fail-loud (no CRC in GIF — the PNG tier
  * is the checksummed one), 89a-extension skipping. */
class R16GifSpec extends AnyFunSuite {

  private def gray(v: (Int, Int) => Int): (Int, Int) => (Int, Int, Int) =
    (x, y) => { val g = v(x, y); (g, g, g) }

  test("interlaced GIF de-interlaces to the sequential decode") {
    val f = (x: Int, y: Int) => (x * 37 + y * 91 + 13) % 256
    // heights hitting every pass-boundary shape: 1 (pass 1 only), 2, 5,
    // 8, 13
    for (h <- Seq(1, 2, 5, 8, 13)) {
      val seq = ImageCodec.decode(ImageCodec.encodeGif(9, h, f))
      val il = ImageCodec.decode(ImageCodec.encodeGif(9, h, f,
        interlace = true))
      assert(il.lumaSum3.toSeq == seq.lumaSum3.toSeq, s"h=$h")
    }
  }

  test("local color table overrides an adversarially inverted global") {
    val f = (x: Int, y: Int) => (x * 29 + y * 53 + 7) % 256
    val ref = ImageCodec.decode(ImageCodec.encodeGif(8, 8, f))
    // localTable=true inverts the GLOBAL table — correct decode must
    // read the local one
    val viaLocal = ImageCodec.decode(ImageCodec.encodeGif(8, 8, f,
      localTable = true))
    assert(viaLocal.lumaSum3.toSeq == ref.lumaSum3.toSeq)
    // both flags compose
    val both = ImageCodec.decode(ImageCodec.encodeGif(8, 8, f,
      interlace = true, localTable = true))
    assert(both.lumaSum3.toSeq == ref.lumaSum3.toSeq)
  }

  test("round-trips vs BMP for mixed content") {
    val f = (x: Int, y: Int) => (x * 37 + y * 91 + 13) % 256
    val a = ImageCodec.decode(ImageCodec.encodeGif(9, 7, f))
    val b = ImageCodec.decode(ImageCodec.encodeBmp(9, 7, gray(f)))
    assert(a.width === 9 && a.height === 7)
    assert(a.lumaSum3.toSeq === b.lumaSum3.toSeq)
  }

  test("KwKwK pattern (ababab...) round-trips exactly") {
    // alternating two pixels forces the code==nextCode decode branch
    val f = (x: Int, y: Int) => if ((y * 8 + x) % 2 == 0) 97 else 98
    val a = ImageCodec.decode(ImageCodec.encodeGif(8, 8, f))
    val b = ImageCodec.decode(ImageCodec.encodeBmp(8, 8, gray(f)))
    assert(a.lumaSum3.toSeq === b.lumaSum3.toSeq)
  }

  test("large repetitive image exercises width growth + dict reset") {
    // 128x128 = 16384 pixels with long runs: the dictionary passes
    // 512/1024/2048 (width 9->12) and hits the 4096 clear/reset
    val f = (x: Int, y: Int) => (x / 7 + y / 11) % 256
    val enc = ImageCodec.encodeGif(128, 128, f)
    val a = ImageCodec.decode(enc)
    val b = ImageCodec.decode(ImageCodec.encodeBmp(128, 128, gray(f)))
    assert(a.lumaSum3.toSeq === b.lumaSum3.toSeq)
    // and LZW actually compresses: payload well under 1 byte/pixel + table
    assert(enc.length < 128 * 128 / 2 + 768 + 32, s"no compression: ${enc.length}")
  }

  test("truncation and structural corruption fail loudly") {
    val ok = ImageCodec.encodeGif(8, 8, (x, y) => (x * 5 + y) % 256)
    intercept[Exception] {
      ImageCodec.decode(java.util.Arrays.copyOf(ok, ok.length - 12)) }
    val badMagic = ok.clone(); badMagic(3) = '9'.toByte; badMagic(4) = '9'.toByte
    intercept[IllegalArgumentException] { ImageCodec.decode(badMagic) }
  }

  test("89a extension blocks are skipped to the image descriptor") {
    val ok = ImageCodec.encodeGif(4, 4, (x, y) => x * 16 + y)
    // splice a GIF89a-style application extension after the color table:
    // 0x21 0xFF, one 11-byte sub-block, terminator — and relabel to 89a
    val head = 13 + 768
    val ext = Array[Byte](0x21.toByte, 0xff.toByte, 11) ++
      "NETSCAPE2.0".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = ok.take(head) ++ ext ++ ok.drop(head)
    spliced(4) = '9'.toByte // GIF89a
    val a = ImageCodec.decode(spliced)
    assert(a.lumaSum3.toSeq === ImageCodec.decode(ok).lumaSum3.toSeq)

    // an extension TRUNCATED mid-sub-block must fail with the codec's
    // descriptive require, not a raw ArrayIndexOutOfBoundsException
    // (the sub-block walk bounds-checks every introducer byte)
    val truncated = spliced.take(head + 2)           // introducer + label only
    val exA = intercept[IllegalArgumentException] {
      ImageCodec.decode(truncated) }
    assert(exA.getMessage.contains("truncated GIF extension"))
    val midBlock = spliced.take(head + 8)            // cut inside the sub-block
    val exB = intercept[IllegalArgumentException] {
      ImageCodec.decode(midBlock) }
    assert(exB.getMessage.contains("truncated GIF extension"))
  }

  test("grayGif matches grayFromBytes pixel map") {
    val src = "pack the bins pack the bins pack".getBytes("UTF-8")
    val g = ImageCodec.decode(ImageCodec.grayGif(8, 8, src))
    val r = ImageCodec.decode(ImageCodec.grayFromBytes(8, 8, src, asPpm = true))
    assert(g.lumaSum3.toSeq === r.lumaSum3.toSeq)
  }
}
