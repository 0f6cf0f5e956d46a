package graft.ops

/** Dependency-free BASELINE SEQUENTIAL JPEG codec (grayscale, one
  * component), written from the public JPEG specification (ITU-T T.81:
  * marker grammar, Annex K example quantization/Huffman tables, the
  * DECODE/RECEIVE/EXTEND procedures of §F.2.2) and the JFIF container
  * note.  This is the tier's first LOSSY codec: encode→decode is exact
  * for DC-only content but inexact in general (quantized DCT), so its
  * oracle queries are TOLERANCE/INVARIANT gauges rather than the
  * hash-exact text replays the five lossless codecs use — per-pixel
  * |error| bounded by a quality-derived constant, and exact-duplicate
  * inputs (identical bytes ⇒ identical decode) must still pair at
  * hamming 0 through the banded-aHash stage.
  *
  * Supported: baseline DCT (SOF0), 8-bit, single component, 1×1
  * sampling, no restart intervals.  Everything else — progressive
  * (SOF2), arithmetic coding, multi-component scans, 12-bit precision,
  * DRI≠0 — fails loudly with a descriptive message: a decoder silently
  * misreading entropy-coded data would poison every downstream
  * fingerprint (the ImageCodec fail-loud contract).
  */
object JpegCodec {

  // ---- Annex K.1: luminance quantization table (zigzag-NATURAL order,
  //      row-major 8×8) ----
  private val BaseQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** libjpeg's quality→scale mapping (public IJG convention): q<50 ⇒
    * 5000/q, else 200−2q; each entry (base·scale+50)/100 clamped to
    * [1,255]. */
  private def scaledQuant(quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality out of [1,100]")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    BaseQuant.map { b =>
      math.min(255, math.max(1, (b * scale + 50) / 100))
    }
  }

  // ---- zigzag order: ZigZag(i) = natural (row-major) index of the i-th
  //      zigzag position ----
  private[graft] val ZigZag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 until 15) {
      // diagonal s runs between (x, y) with x + y = s; direction alternates
      val range = if (s % 2 == 0) (s to 0 by -1) else (0 to s)
      for (y <- range) {
        val x = s - y
        if (x < 8 && y < 8) { out(i) = y * 8 + x; i += 1 }
      }
    }
    out
  }

  // ---- Annex K.3.3: typical Huffman tables for luminance ----
  // BITS = number of codes of each length 1..16; HUFFVAL = symbols in
  // code order.
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman code assignment (spec §C.2): codes of each length
    * in symbol order, doubling between lengths.  Returns symbol →
    * (code, length). */
  private def buildEncodeTable(bits: Array[Int],
      vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        out += ((vals(k) & 0xff) -> (code, l))
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Decoder-side tables for the spec's DECODE procedure (§F.2.2.3):
    * per-length (mincode, maxcode, valptr) over the same canonical
    * assignment. */
  private final class DecodeTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        if (bits(l - 1) == 0) {
          maxCode(l) = -1 // no codes of this length
        } else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        // canonical-code validity (spec C.2): the running code must fit
        // in l bits, else a corrupt DHT would index past the value array
        require(code <= (1 << l), "invalid JPEG Huffman table (BITS overflow)")
        code <<= 1
      }
    }
    def value(l: Int, code: Int): Int =
      vals(valPtr(l) + code - minCode(l)) & 0xff
  }

  // ---- DCT (double-precision reference transform; 8×8 blocks only, so
  //      the O(64²) direct form is fine and unambiguous) ----
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Forward DCT of a level-shifted 8×8 block (spec A.3.3). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * C(u) * C(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT (spec A.3.3). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += C(u) * C(v) * coef(v * 8 + u) * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- bit I/O with FF byte stuffing (spec §B.1.1.5) ----
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) flushByte()
        i -= 1
      }
    }
    private def flushByte(): Unit = {
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
      acc = 0
      nBits = 0
    }
    /** pad the final partial byte with 1-bits (spec: fill with 1s). */
    def finish(): Unit =
      if (nBits > 0) { acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1); nBits = 8; flushByte() }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < data.length, "truncated JPEG scan data")
        acc = data(pos) & 0xff
        pos += 1
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** EXTEND (spec §F.2.2.1): map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // ---- encoder ----

  /** Baseline grayscale JPEG: SOI, JFIF APP0, DQT (quality-scaled K.1),
    * SOF0 (8-bit, one component, 1×1), DHT (K.3.3 DC+AC), SOS, entropy
    * data, EOI.  `gray(x, y)` is top-down row-major 0..255; edge blocks
    * replicate the last row/column (the standard edge-extension). */
  def encode(w: Int, h: Int, gray: (Int, Int) => Int,
      quality: Int = 90): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, "bad dims")
    val quant = scaledQuant(quality)
    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    marker(0xd8) // SOI
    seg(0xe0, "JFIF ".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0)) // v1.1, no density/thumb
    seg(0xdb, Array[Byte](0) ++ // Pq=0 (8-bit), Tq=0; entries in ZIGZAG order
      ZigZag.map(n => quant(n).toByte))
    seg(0xc0, Array[Byte](8, // precision
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      1, // one component
      1, 0x11, 0)) // id=1, sampling 1×1, quant table 0
    seg(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals) // DC class
    seg(0xc4, Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals) // AC class
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // one comp, DC0/AC0, full spectral
    val bw = new BitWriter(out)
    var prevDc = 0
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    val block = new Array[Double](64)
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val px = math.min(w - 1, bx * 8 + x)
          val py = math.min(h - 1, by * 8 + y)
          val v = gray(px, py)
          require(v >= 0 && v <= 255, s"gray($px,$py)=$v out of [0,255]")
          block(y * 8 + x) = v - 128.0
          x += 1
        }
        y += 1
      }
      val coef = fdct(block)
      // quantize in zigzag order; round half away from zero
      val q = new Array[Int](64)
      var i = 0
      while (i < 64) {
        val n = ZigZag(i)
        val c = coef(n) / quant(n)
        q(i) = math.round(c).toInt
        i += 1
      }
      // DC
      val diff = q(0) - prevDc
      prevDc = q(0)
      val s = bitSize(diff)
      val (dcCode, dcLen) = dcEnc(s)
      bw.put(dcCode, dcLen)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC with run-length
      var run = 0
      var k = 1
      while (k < 64) {
        if (q(k) == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = acEnc(0xf0); bw.put(zc, zl); run -= 16
          }
          val sz = bitSize(q(k))
          val (ac, al) = acEnc((run << 4) | sz)
          bw.put(ac, al)
          bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acEnc(0x00); bw.put(ec, el) } // EOB
    }
    bw.finish()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Gray JPEG whose pixel map is the shared text→raster fixture formula
    * (pixel (x, y) = src[(y·w + x) mod len] — [[ImageCodec.grayFromBytes]]'s
    * map in a lossy container). */
  def grayJpeg(w: Int, h: Int, src: Array[Byte],
      quality: Int = 90): Array[Byte] = {
    require(src.nonEmpty, "empty source bytes")
    encode(w, h, (x, y) => src((y * w + x) % src.length) & 0xff, quality)
  }

  // ---- decoder ----

  def decode(b: Array[Byte]): ImageCodec.Raster = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "bad JPEG signature")
    var p = 2
    var w = 0; var h = 0
    var sawSof = false
    var quant: Array[Int] = null // natural order
    var dcTab: DecodeTable = null
    var acTab: DecodeTable = null
    var scanStart = -1
    def u16(off: Int): Int = {
      require(off + 1 < b.length, "truncated JPEG segment")
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    }
    while (scanStart < 0) {
      require(p + 1 < b.length, "truncated JPEG (no SOS)")
      require((b(p) & 0xff) == 0xff, f"expected marker, got 0x${b(p)}%02x")
      val m = b(p + 1) & 0xff
      p += 2
      m match {
        case 0xd9 => throw new IllegalArgumentException("JPEG EOI before SOS")
        case 0x01 => () // TEM, standalone
        case x if x >= 0xd0 && x <= 0xd7 => () // RSTn, standalone
        case 0xc0 => // SOF0 baseline
          val len = u16(p)
          require(len >= 11 && p + len <= b.length, "truncated SOF0")
          require((b(p + 2) & 0xff) == 8, "only 8-bit JPEG supported")
          h = u16(p + 3); w = u16(p + 5)
          require(w > 0 && h > 0, s"bad JPEG dims ${w}x$h")
          val nComp = b(p + 7) & 0xff
          require(nComp == 1,
            s"only single-component (grayscale) JPEG supported, got $nComp")
          require((b(p + 9) & 0xff) == 0x11,
            "only 1x1 sampling supported")
          require((b(p + 10) & 0xff) == 0, "component must use quant table 0")
          sawSof = true
          p += len
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) unsupported")
        case x if (x >= 0xc1 && x <= 0xcf) && x != 0xc4 && x != 0xc8 &&
            x != 0xcc =>
          throw new IllegalArgumentException(
            f"JPEG SOF 0x$x%02x unsupported (baseline SOF0 only)")
        case 0xc8 | 0xcc => throw new IllegalArgumentException(
          "arithmetic-coded JPEG unsupported")
        case 0xdb => // DQT (possibly several tables in one segment)
          val len = u16(p)
          // len < 2 would stop `p` advancing — a crafted header must
          // fail loudly, not hang the decoder
          require(len >= 2 && p + len <= b.length, "truncated DQT")
          var q = p + 2
          while (q < p + len) {
            val pqtq = b(q) & 0xff
            require((pqtq >> 4) == 0, "16-bit quant tables unsupported")
            require(q + 65 <= p + len, "truncated DQT table")
            if ((pqtq & 0x0f) == 0) {
              quant = new Array[Int](64)
              var i = 0
              while (i < 64) { quant(ZigZag(i)) = b(q + 1 + i) & 0xff; i += 1 }
            }
            q += 65
          }
          p += len
        case 0xc4 => // DHT (possibly several tables)
          val len = u16(p)
          require(len >= 2 && p + len <= b.length, "truncated DHT")
          var q = p + 2
          while (q < p + len) {
            val tcth = b(q) & 0xff
            require(q + 17 <= p + len, "truncated DHT header")
            val bits = Array.tabulate(16)(i => b(q + 1 + i) & 0xff)
            val n = bits.sum
            require(q + 17 + n <= p + len, "truncated DHT values")
            val vals = java.util.Arrays.copyOfRange(b, q + 17, q + 17 + n)
            if ((tcth >> 4) == 0 && (tcth & 0x0f) == 0)
              dcTab = new DecodeTable(bits, vals)
            else if ((tcth >> 4) == 1 && (tcth & 0x0f) == 0)
              acTab = new DecodeTable(bits, vals)
            q += 17 + n
          }
          p += len
        case 0xdd =>
          val len = u16(p)
          require(len == 4 && p + len <= b.length, "truncated DRI")
          require(u16(p + 2) == 0, "JPEG restart intervals unsupported")
          p += len
        case 0xda => // SOS
          val len = u16(p)
          require(len >= 8 && p + len <= b.length, "truncated SOS")
          require((b(p + 2) & 0xff) == 1, "multi-component scan unsupported")
          require((b(p + 4) & 0xff) == 0x00, "scan must use DC 0 / AC 0")
          require((b(p + 5) & 0xff) == 0 && (b(p + 6) & 0xff) == 63,
            "partial spectral selection unsupported")
          scanStart = p + len
        case _ => // APPn, COM, others with a length field: skip
          val len = u16(p)
          require(len >= 2 && p + len <= b.length, "truncated JPEG segment")
          p += len
      }
    }
    require(sawSof, "JPEG SOS before SOF0")
    require(quant != null, "JPEG missing quant table 0")
    require(dcTab != null && acTab != null, "JPEG missing Huffman tables")
    // unstuff entropy-coded bytes up to the next marker
    val ent = new java.io.ByteArrayOutputStream()
    var q = scanStart
    var done = false
    while (!done) {
      require(q < b.length, "truncated JPEG scan (no EOI)")
      val v = b(q) & 0xff
      if (v != 0xff) { ent.write(v); q += 1 }
      else {
        require(q + 1 < b.length, "truncated JPEG scan (dangling FF)")
        val nxt = b(q + 1) & 0xff
        if (nxt == 0x00) { ent.write(0xff); q += 2 } // stuffed data byte
        else if (nxt == 0xd9) done = true // EOI
        else throw new IllegalArgumentException(
          f"unexpected marker 0x$nxt%02x inside JPEG scan")
      }
    }
    val br = new BitReader(ent.toByteArray)
    def huffDecode(t: DecodeTable): Int = {
      var code = br.bit()
      var l = 1
      while (l < 16 && (t.maxCode(l) == -1 || code > t.maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      require(t.maxCode(l) != -1 && code <= t.maxCode(l),
        "invalid JPEG Huffman code")
      t.value(l, code)
    }
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    val luma = new Array[Int](w * h)
    var prevDc = 0
    val qcoef = new Array[Double](64)
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      java.util.Arrays.fill(qcoef, 0.0)
      val s = huffDecode(dcTab)
      require(s <= 11, s"DC size $s out of baseline range")
      prevDc += extend(br.receive(s), s)
      qcoef(0) = prevDc.toDouble * quant(0)
      var k = 1
      while (k < 64) {
        val rs = huffDecode(acTab)
        val r = rs >> 4
        val sz = rs & 0x0f
        if (sz == 0) {
          if (rs == 0x00) k = 64 // EOB
          else if (rs == 0xf0) k += 16 // ZRL
          else throw new IllegalArgumentException(
            f"invalid JPEG AC symbol 0x$rs%02x")
        } else {
          k += r
          require(k < 64, "JPEG AC run past block end")
          val n = ZigZag(k)
          qcoef(n) = extend(br.receive(sz), sz).toDouble * quant(n)
          k += 1
        }
      }
      val px = idct(qcoef)
      var y = 0
      while (y < 8) {
        val iy = by * 8 + y
        var x = 0
        while (x < 8) {
          val ix = bx * 8 + x
          if (ix < w && iy < h) {
            val v = math.max(0, math.min(255,
              math.round(px(y * 8 + x) + 128.0).toInt))
            luma(iy * w + ix) = 3 * v // Raster carries r+g+b sums
          }
          x += 1
        }
        y += 1
      }
    }
    ImageCodec.Raster(w, h, luma)
  }

  /** Worst-case per-pixel reconstruction error bound for [[encode]] at
    * `quality` — quantization can move each zigzag coefficient by at most
    * quant/2, the IDCT basis magnitudes are ≤ C(u)C(v)/4 per pixel, plus
    * 0.5 for the final integer rounding.  The closed form is loose; this
    * returns the bound the gauge queries assert (validated empirically in
    * R17JpegSpec over adversarial fixtures). */
  def pixelErrorBound(quality: Int): Double = {
    val quant = scaledQuant(quality)
    var s = 0.0
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        s += 0.25 * C(u) * C(v) * quant(v * 8 + u) / 2.0
        v += 1
      }
      u += 1
    }
    s + 0.5
  }
}
