package graft.ops

/** Dependency-free image codec for the two classic uncompressed raster
  * formats — 24-bit BI_RGB BMP and binary PPM (P6) — written from their
  * public format specifications (the Windows BITMAPINFOHEADER layout and
  * the netpbm P6 grammar).  This is the REAL (non-stub) kernel behind the
  * [[MultimodalOps.DecodeKernel]] seam: decode → block-mean luminance
  * features → aHash / near-dup / resize run on actual pixel data.
  *
  * Everything is integer until the final per-cell mean (one IEEE double
  * division of an integer sum), so features are engine-exact and the SQL
  * oracle can replay them from the source bytes.  Unsupported shapes
  * (compressed BMP, bit depths ≠ 24, 16-bit PPM, top-down BMP) fail
  * loudly — a decoder silently misreading pixels would poison every
  * downstream fingerprint.
  */
object ImageCodec {

  /** Decoded raster: dims + row-major top-down per-pixel channel sums
    * (r+g+b per pixel — the only pixel statistic the feature grid needs,
    * kept integer). */
  final case class Raster(width: Int, height: Int, lumaSum3: Array[Int])

  // ---- encoders (fixture/query side: deterministic bytes, no codec) ----

  /** 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * bottom-up rows, BGR byte order, rows padded to 4 bytes). `rgb(x, y)`
    * is top-down row-major, channels 0..255. */
  def encodeBmp(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int))
      : Array[Byte] = {
    require(w > 0 && h > 0, "bad dims")
    val stride = (w * 3 + 3) / 4 * 4
    val dataSize = stride * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + dataSize).putInt(0).putInt(54) // size, reserved, offset
    out.putInt(40).putInt(w).putInt(h)             // DIB size, w, h (+h ⇒ bottom-up)
    out.putShort(1).putShort(24)                   // planes, bpp
    out.putInt(0).putInt(dataSize)                 // BI_RGB, image size
    out.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    for (fileRow <- 0 until h) {
      val y = h - 1 - fileRow                      // bottom-up storage
      for (x <- 0 until w) {
        val (r, g, b) = rgb(x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- w * 3 until stride) out.put(0.toByte)
    }
    out.array()
  }

  /** Binary PPM (P6): ASCII header `P6 <w> <h> 255`, then w·h RGB
    * triplets, top-down row-major. */
  def encodePpm(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int))
      : Array[Byte] = {
    require(w > 0 && h > 0, "bad dims")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      out(p) = r.toByte; out(p + 1) = g.toByte; out(p + 2) = b.toByte
      p += 3
    }
    out
  }

  /** Gray image whose pixel (x, y) is `src(((y·w + x) mod src.length))`
    * — the deterministic "encode the document as pixels" fixture both
    * the query and its SQL oracle compute independently. */
  def grayFromBytes(w: Int, h: Int, src: Array[Byte], asPpm: Boolean)
      : Array[Byte] = {
    require(src.nonEmpty, "empty source bytes")
    val f = (x: Int, y: Int) => {
      val v = src((y * w + x) % src.length) & 0xff
      (v, v, v)
    }
    if (asPpm) encodePpm(w, h, f) else encodeBmp(w, h, f)
  }

  // ---- decoder -----------------------------------------------------------

  /** Sniff the magic and decode: BMP ("BM") or PPM ("P6").  Returns dims
    * plus per-pixel integer r+g+b sums, top-down row-major. */
  def decode(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 2, "truncated image")
    if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) decodeBmp(bytes)
    else if (bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte)
      decodePpm(bytes)
    else throw new IllegalArgumentException(
      f"unknown image magic 0x${bytes(0)}%02x${bytes(1)}%02x " +
        "(BMP and binary PPM supported)")
  }

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def i16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def decodeBmp(b: Array[Byte]): Raster = {
    require(b.length >= 54, "truncated BMP header")
    val dataOff = i32(b, 10)
    val dibSize = i32(b, 14)
    require(dibSize >= 40, s"BMP core-header (size $dibSize) unsupported")
    val w = i32(b, 18)
    val h = i32(b, 22)
    require(w > 0, s"bad BMP width $w")
    require(h > 0, s"top-down BMP (height $h) unsupported")
    require(i16(b, 26) == 1, "BMP planes must be 1")
    val bpp = i16(b, 28)
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    require(i32(b, 30) == 0, "compressed BMP unsupported (BI_RGB only)")
    val stride = (w * 3 + 3) / 4 * 4
    require(b.length >= dataOff + stride * h, "truncated BMP pixel data")
    val sums = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowOff = dataOff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val p = rowOff + x * 3
        sums(y * w + x) =
          (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    Raster(w, h, sums)
  }

  private def decodePpm(b: Array[Byte]): Raster = {
    // header grammar: "P6", then whitespace-separated w, h, maxval with
    // '#' comments, then ONE whitespace byte before the binary triplets
    var p = 2
    def skipWs(): Unit = {
      var go = true
      while (go && p < b.length) {
        val c = b(p).toChar
        if (c == '#') { while (p < b.length && b(p) != '\n') p += 1 }
        else if (c.isWhitespace) p += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      val s = p
      while (p < b.length && (b(p) >= '0' && b(p) <= '9')) p += 1
      require(p > s, "bad PPM header integer")
      new String(b, s, p - s, "US-ASCII").toInt
    }
    val w = int(); val h = int(); val maxv = int()
    require(w > 0 && h > 0, s"bad PPM dims ${w}x$h")
    require(maxv == 255, s"only maxval 255 PPM supported, got $maxv")
    p += 1 // the single whitespace after maxval
    require(b.length >= p + w * h * 3, "truncated PPM pixel data")
    val sums = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      sums(i) = (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
      p += 3
      i += 1
    }
    Raster(w, h, sums)
  }

  // ---- the real DecodeKernel ----------------------------------------------

  /** Block-mean luminance features over a gridW×gridH partition of the
    * decoded image (cell boundaries `floor(k·dim/grid)` — the standard
    * pooling map), features row-major.  Integer sums, ONE double division
    * per cell: for a gray image the cell mean is exactly the pixel-value
    * mean, bit-reproducible in SQL.  This is the production-shaped swap-in
    * for [[MultimodalOps.stubKernel]] — same record, real pixels. */
  def kernel(gridW: Int, gridH: Int): MultimodalOps.DecodeKernel =
    (docId, bytes) => {
      require(gridW > 0 && gridH > 0, "bad grid")
      val r = decode(bytes)
      val feats = new Array[Double](gridW * gridH)
      var gy = 0
      while (gy < gridH) {
        val y0 = gy * r.height / gridH
        val y1 = (gy + 1) * r.height / gridH
        var gx = 0
        while (gx < gridW) {
          val x0 = gx * r.width / gridW
          val x1 = (gx + 1) * r.width / gridW
          var sum = 0L
          var cnt = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += r.lumaSum3(y * r.width + x)
              cnt += 1
              x += 1
            }
            y += 1
          }
          feats(gy * gridW + gx) =
            if (cnt == 0) 0.0 else sum.toDouble / (3.0 * cnt)
          gx += 1
        }
        gy += 1
      }
      MultimodalOps.MediaFeatures(docId, bytes.length.toLong,
        r.width, r.height, feats)
    }
}
