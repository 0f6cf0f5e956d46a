package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TiffCodec

/** Round-18: tiled TIFF (§15) and palette TIFF (photometric 3 +
  * ColorMap).  Tiles must agree byte-for-byte with the strip decode of
  * the same pixels across tile sizes, byte orders, compressions and
  * the predictor, including non-divisible edge tiles; the palette path
  * must actually run indices THROUGH the ColorMap (proven with an
  * adversarial permuted palette), and malformed tile grammar stays
  * fail-loud. */
class R18TiffSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 29 + y * 53 + 7) % 256
    (v, (v * 5) % 256, (v * 11) % 256)
  }

  private def gray(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 17 + y * 43 + 3) % 256
    (v, v, v)
  }

  test("tiled decode equals strip decode across shapes and edges") {
    // dims chosen to exercise exact-fit (32x16), ragged right (20),
    // ragged bottom (36), and both (23x39)
    for ((w, h) <- Seq((32, 16), (20, 36), (23, 39), (8, 8));
         (tw, th) <- Seq((16, 16), (32, 16), (16, 32));
         comp <- Seq(1, 5, 32773); beo <- Seq(false, true)) {
      val ref = TiffCodec.decode(TiffCodec.encode(w, h, px,
        compression = 1))
      val r = TiffCodec.decode(TiffCodec.encode(w, h, px,
        compression = comp, bigEndian = beo, tileW = tw, tileH = th))
      assert(r.width == w && r.height == h)
      assert(r.lumaSum3.toSeq == ref.lumaSum3.toSeq,
        s"${w}x$h tiles ${tw}x$th comp=$comp be=$beo")
    }
  }

  test("tiled + predictor 2 round-trips (per-tile-row differencing)") {
    val ref = TiffCodec.decode(TiffCodec.encode(40, 40, px,
      compression = 1))
    val r = TiffCodec.decode(TiffCodec.encode(40, 40, px,
      compression = 5, predictor = 2, tileW = 16, tileH = 16))
    assert(r.lumaSum3.toSeq == ref.lumaSum3.toSeq)
    // gray too (spp = 1 differencing)
    val refG = TiffCodec.decode(TiffCodec.encode(40, 40, gray,
      gray = true, compression = 1))
    val rG = TiffCodec.decode(TiffCodec.encode(40, 40, gray, gray = true,
      compression = 5, predictor = 2, tileW = 32, tileH = 16))
    assert(rG.lumaSum3.toSeq == refG.lumaSum3.toSeq)
  }

  test("palette indices go THROUGH the ColorMap") {
    // adversarial palette: index i -> inverted gray (255-i); if the
    // decoder ignored the map (treated indices as gray), sums would be
    // 3i, not 3(255-i)
    val inverted = Array.tabulate(256)(i => (255 - i, 255 - i, 255 - i))
    val idxPx = (x: Int, y: Int) => {
      val i = (x + y * 8) % 256; (i, i, i)
    }
    val r = TiffCodec.decode(TiffCodec.encode(8, 8, idxPx,
      palette = inverted))
    for (y <- 0 until 8; x <- 0 until 8) {
      val i = (x + y * 8) % 256
      assert(r.lumaSum3(y * 8 + x) == 3 * (255 - i), s"($x,$y)")
    }
    // identity gray palette == gray photometric, and survives tiling,
    // LZW, and both byte orders
    val identity = Array.tabulate(256)(i => (i, i, i))
    val refG = TiffCodec.decode(TiffCodec.encode(24, 24, gray,
      gray = true))
    for (beo <- Seq(false, true); comp <- Seq(1, 5)) {
      val p = TiffCodec.decode(TiffCodec.encode(24, 24, gray,
        palette = identity, compression = comp, bigEndian = beo,
        tileW = 16, tileH = 16))
      assert(p.lumaSum3.toSeq == refG.lumaSum3.toSeq,
        s"palette be=$beo comp=$comp")
    }
  }

  test("non-16-multiple tile dims are rejected, encode and decode") {
    intercept[IllegalArgumentException] {
      TiffCodec.encode(8, 8, px, tileW = 8, tileH = 16) }
    intercept[IllegalArgumentException] {
      TiffCodec.encode(8, 8, px, tileW = 16, tileH = 24) }
    // patch a valid tiled stream's TileWidth (tag 322) to 8: the
    // decoder must refuse rather than mis-stride the tile rows
    val ok = TiffCodec.encode(20, 20, px, tileW = 16, tileH = 16)
    def u16le(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val ifd = u16le(ok, 4) | (u16le(ok, 6) << 16)
    val n = u16le(ok, ifd)
    val bad = ok.clone()
    var patched = false
    for (i <- 0 until n) {
      val e = ifd + 2 + 12 * i
      if (u16le(ok, e) == 322) { bad(e + 8) = 8; patched = true }
    }
    assert(patched, "no TileWidth entry found")
    assert(intercept[IllegalArgumentException] {
      TiffCodec.decode(bad) }.getMessage.contains("16"))
  }

  test("encoder guards: dims over SHORT range, bad palette") {
    intercept[IllegalArgumentException] {
      TiffCodec.encode(65536, 8, px) }
    intercept[IllegalArgumentException] {
      TiffCodec.encode(8, 8, px, palette = Array((0, 0, 0))) }
  }

  test("palette without ColorMap / ColorMap without palette fail loudly") {
    // strip the ColorMap entry's photometric back to 1: ColorMap on a
    // non-palette photometric must be refused
    val ok = TiffCodec.encode(8, 8, gray,
      palette = Array.tabulate(256)(i => (i, i, i)))
    def u16le(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val ifd = u16le(ok, 4) | (u16le(ok, 6) << 16)
    val n = u16le(ok, ifd)
    val bad = ok.clone()
    for (i <- 0 until n) {
      val e = ifd + 2 + 12 * i
      if (u16le(ok, e) == 262) bad(e + 8) = 1 // photometric -> BlackIsZero
    }
    assert(intercept[IllegalArgumentException] {
      TiffCodec.decode(bad) }.getMessage.contains("ColorMap"))
  }
}
