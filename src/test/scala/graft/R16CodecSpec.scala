package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, MultimodalOps}

/** Hand-fixture checks for the real BMP/PPM codec (the corpus-level check
  * is the mm_real_* oracle trio, whose features the DuckDB side recomputes
  * from the source text, never the bytes): BGR order, bottom-up rows, row
  * padding, PPM comments, fail-loud unsupported shapes, non-divisible
  * pooling grids, and the kernel-swap seam. */
class R16CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("BMP: bottom-up BGR rows with padding decode to top-down sums") {
    // 2×2 distinct RGB corners: (x,y)=(0,0) red, (1,0) green,
    // (0,1) blue, (1,1) white
    val img = ImageCodec.encodeBmp(2, 2, {
      case (0, 0) => (255, 0, 0)
      case (1, 0) => (0, 255, 0)
      case (0, 1) => (0, 0, 255)
      case _      => (255, 255, 255)
    })
    // container invariants: magic, 54-byte header + 2 padded 8-byte rows
    assert(img(0) == 'B'.toByte && img(1) == 'M'.toByte)
    assert(img.length == 54 + 8 * 2)
    // bottom-up storage: first stored row is y=1 (blue, white), BGR order
    assert((img(54) & 0xff, img(55) & 0xff, img(56) & 0xff) == ((255, 0, 0)))
    // row padding bytes are zero
    assert(img(60) == 0 && img(61) == 0)
    val r = ImageCodec.decode(img)
    assert(r.width == 2 && r.height == 2)
    assert(r.lumaSum3.toSeq == Seq(255, 255, 255, 765))
  }

  test("BMP r17 shapes: 8-bit palette, top-down, RLE8 round-trip") {
    val g = (x: Int, y: Int) => (x * 29 + y * 53 + 7) % 256
    val ref = ImageCodec.decode(
      ImageCodec.encodeBmp(9, 7, (x, y) => (g(x, y), g(x, y), g(x, y))))
    // 8-bit palette, bottom-up
    val p8 = ImageCodec.decode(ImageCodec.encodeBmp8(9, 7, g))
    assert(p8.lumaSum3.toSeq == ref.lumaSum3.toSeq)
    // top-down (negative height) — both 8-bit and crafted content agree
    val td = ImageCodec.decode(ImageCodec.encodeBmp8(9, 7, g,
      topDown = true))
    assert(td.lumaSum3.toSeq == ref.lumaSum3.toSeq)
    // RLE8 on runny content compresses and round-trips
    val runny = (x: Int, y: Int) => if (x < 20) 7 else (x + y) % 256
    val refR = ImageCodec.decode(ImageCodec.encodeBmp(40, 12,
      (x, y) => (runny(x, y), runny(x, y), runny(x, y))))
    val rleBytes = ImageCodec.encodeBmp8(40, 12, runny, rle = true)
    val plainBytes = ImageCodec.encodeBmp8(40, 12, runny)
    assert(rleBytes.length < plainBytes.length, "RLE8 should compress runs")
    assert(ImageCodec.decode(rleBytes).lumaSum3.toSeq ==
      refR.lumaSum3.toSeq)
    // mixed content (forces absolute mode + encoded singles)
    val noisy = (x: Int, y: Int) => (x * 37 + y * 91 + 13) % 251
    val refN = ImageCodec.decode(ImageCodec.encodeBmp(13, 5,
      (x, y) => (noisy(x, y), noisy(x, y), noisy(x, y))))
    assert(ImageCodec.decode(ImageCodec.encodeBmp8(13, 5, noisy,
      rle = true)).lumaSum3.toSeq == refN.lumaSum3.toSeq)
    // top-down RLE8 is invalid by spec — encoder and decoder both refuse
    intercept[IllegalArgumentException] {
      ImageCodec.encodeBmp8(4, 4, g, topDown = true, rle = true) }
  }

  test("Netpbm r17 variants: P5/P2/P3 agree with P6 for gray content") {
    val g = (x: Int, y: Int) => (x * 29 + y * 53 + 7) % 256
    val f = (x: Int, y: Int) => (g(x, y), g(x, y), g(x, y))
    val ref = ImageCodec.decode(ImageCodec.encodePpm(9, 7, f))
    val p5 = ImageCodec.decode(ImageCodec.encodePgm(9, 7, g))
    assert(p5.lumaSum3.toSeq == ref.lumaSum3.toSeq, "P5")
    val p2 = ImageCodec.decode(ImageCodec.encodePnmAscii(9, 7, f,
      gray = true))
    assert(p2.lumaSum3.toSeq == ref.lumaSum3.toSeq, "P2")
    val p3 = ImageCodec.decode(ImageCodec.encodePnmAscii(9, 7, f,
      gray = false))
    assert(p3.lumaSum3.toSeq == ref.lumaSum3.toSeq, "P3")
    // P4 (bitmap) is supported since r18 — an all-zero-bit image is all
    // white (the Netpbm polarity); P7 stays rejected by name
    val p4 = ImageCodec.decode("P4\n8 8\n".getBytes("US-ASCII") ++
      new Array[Byte](8))
    assert(p4.lumaSum3.forall(_ == 765))
    val e = intercept[IllegalArgumentException] {
      ImageCodec.decode("P7\n8 8\n255\n".getBytes("US-ASCII") ++
        new Array[Byte](64)) }
    assert(e.getMessage.contains("P7") || e.getMessage.contains("magic"))
    // ASCII sample above maxval fails loudly
    intercept[IllegalArgumentException] {
      ImageCodec.decode("P2\n1 1\n255\n300\n".getBytes("US-ASCII")) }
  }

  test("PPM: header with comments parses; triplets decode top-down") {
    val base = ImageCodec.encodePpm(2, 1, {
      case (0, _) => (10, 20, 30)
      case _      => (1, 2, 3)
    })
    val r = ImageCodec.decode(base)
    assert(r.width == 2 && r.height == 1 && r.lumaSum3.toSeq == Seq(60, 6))
    // a '#' comment between header tokens must be skipped
    val withComment = ("P6\n# a comment\n2 1\n# more\n255\n"
      .getBytes("US-ASCII") ++ base.drop(base.length - 6))
    val r2 = ImageCodec.decode(withComment)
    assert(r2.lumaSum3.toSeq == Seq(60, 6))
  }

  test("unsupported shapes fail loudly, never misread") {
    val ok = ImageCodec.encodeBmp(2, 2, (_, _) => (1, 1, 1))
    intercept[IllegalArgumentException] {
      ImageCodec.decode("GIF89a".getBytes("US-ASCII")) }
    intercept[IllegalArgumentException] {       // truncated pixel data
      ImageCodec.decode(ok.dropRight(4)) }
    // an 8-bit claim on a paletteless 24-bit file: the (supported since
    // r17) palette path still fails loudly on the missing table
    val bpp8 = ok.clone(); bpp8(28) = 8
    intercept[IllegalArgumentException] { ImageCodec.decode(bpp8) }
    // RLE8 is 8-bit-only: claiming it on 24-bit data fails by name
    val rle = ok.clone(); rle(30) = 1           // BI_RLE8
    assert(intercept[IllegalArgumentException] {
      ImageCodec.decode(rle) }.getMessage.contains("compression"))
    // 2-bit bpp stays rejected (16/4-bit became supported in r18)
    val bpp2 = ok.clone(); bpp2(28) = 2
    intercept[IllegalArgumentException] { ImageCodec.decode(bpp2) }
    intercept[IllegalArgumentException] {       // non-255/65535 maxval
      ImageCodec.decode(("P6\n1 1\n1023\n" + "\u0000" * 6)
        .getBytes("ISO-8859-1")) }
  }

  test("kernel: block means exact on divisible AND non-divisible grids") {
    // 4×2 gray ramp 0,10,20,30 / 40,50,60,70 — 2×1 grid: halves
    val img = ImageCodec.encodeBmp(4, 2, (x, y) => {
      val v = (y * 4 + x) * 10; (v, v, v)
    })
    val k = ImageCodec.kernel(2, 1)
    val f = k(7L, img)
    assert(f.doc_id == 7L && f.width == 4 && f.height == 2)
    // left cell mean(0,10,40,50)=25, right mean(20,30,60,70)=45
    assert(f.features.toSeq == Seq(25.0, 45.0))
    // 3-wide grid over 4 columns: floor boundaries 0,1,2,4 — cells of
    // width 1,1,2: means {0,40}=20, {10,50}=30, {20,30,60,70}=45
    val f3 = ImageCodec.kernel(3, 1)(7L, img)
    assert(f3.features.toSeq == Seq(20.0, 30.0, 45.0))
    // grid wider than the image: floor(k·1/2)=0,0 ⇒ first cell empty
    val img1 = ImageCodec.encodePpm(1, 1, (_, _) => (9, 9, 9))
    val f2 = ImageCodec.kernel(2, 1)(1L, img1)
    assert(f2.features.toSeq == Seq(0.0, 9.0))
  }

  test("seam: the real kernel drives the SAME downstream as the stub") {
    import spark.implicits._
    val rows = Seq(
      (0L, "aaaaaaaabbbbbbbb"), (1L, "aaaaaaaabbbbbbbb"),  // identical
      (2L, "zzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    val toImg = org.apache.spark.sql.functions.udf(
      (id: Long, t: String) =>
        ImageCodec.grayFromBytes(4, 4, t.getBytes("UTF-8"), id % 2 == 1))
    val d = rows.withColumn("payload",
      toImg($"doc_id", $"text"))
    val dec = MultimodalOps.decodeWith(d, $"payload", $"doc_id",
      ImageCodec.kernel(2, 2)).toDF()
    // identical pixels through DIFFERENT containers (BMP vs PPM) give
    // identical features — the container never leaks into the seam
    val byId = dec.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](4)).toMap
    assert(byId(0L) == byId(1L))
    assert(byId(0L) != byId(2L))
    // and the downstream near-dup stage pairs exactly the identical two
    val pairs = MultimodalOps.aHashPairs(dec, $"doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && !pairs.contains((0L, 2L)) &&
      !pairs.contains((1L, 2L)))
  }

  test("asciiBytes: one byte per CODEPOINT, non-printables become '?'") {
    // 'é' (2 UTF-8 bytes), tab, and a supplementary char (4 UTF-8 bytes,
    // 2 UTF-16 units) each collapse to ONE '?' — matching SQL's
    // substr/length codepoint indexing, never the byte or UTF-16 count
    val s = "aéb\tc" + new String(Character.toChars(0x1F600)) + "d"
    val out = MultimodalOps.asciiBytes(s)
    assert(new String(out, "US-ASCII") === "a?b?c?d")
    assert(out.length === s.codePointCount(0, s.length))
  }

  test("wavFromBytes: source byte that would wrap 16-bit PCM fails loud") {
    val ok = graft.ops.AudioCodec.wavFromBytes(16000, 8,
      Array.fill(8)(203.toByte)) // (203-76)*256 = 32512 — the max
    assert(ok.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      graft.ops.AudioCodec.wavFromBytes(16000, 8,
        Array.fill(8)(204.toByte)) // would be 32768 > Short.MaxValue
    }
    assert(e.getMessage.contains("overflows"))
  }
}
