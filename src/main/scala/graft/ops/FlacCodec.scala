package graft.ops

/** Dependency-free FLAC codec, written from the public FLAC format
  * specification (xiph.org): the fLaC magic + STREAMINFO metadata
  * block (with the raw-PCM MD5 the decoder VERIFIES — the container's
  * end-to-end integrity anchor), fixed-blocking frames with the 14-bit
  * sync code, UTF-8-coded frame numbers, CRC-8 (poly 0x07) header
  * checksums and CRC-16 (poly 0x8005) frame checksums, and per-channel
  * subframes: CONSTANT, VERBATIM, FIXED predictors of order 0–4, and
  * LPC of order 1–32 (Levinson-Durbin analysis + 12-bit QLP
  * quantization on the encode side; general precision/shift/
  * coefficient decode — the subframe kind real FLAC files mostly use),
  * all with Rice-coded residuals (zigzag fold, unary quotient of
  * 0-bits + terminating 1, 4-bit parameters with the 0b1111 raw-width
  * escape, 2^p partitions).
  *
  * This is the LOSSLESS compressed audio container — the audio analog
  * of the PNG tier: decode(encode(x)) == x bit-for-bit REGARDLESS of
  * predictor quality (the decoder replays the exact integer
  * prediction), so the oracle queries replay features hash-exactly
  * from the text that generated the samples.  Scope: mono AND stereo
  * 16-bit — stereo with all four spec channel assignments (independent
  * L/R and the L/S, R/S, M/S decorrelation modes, the side channel
  * coded at 17 bits per §9.1.4; real-world FLAC is overwhelmingly
  * stereo in these modes), plus a per-frame cost-based auto mode (the
  * policy real encoders use), and WASTED BITS (flag + unary k−1,
  * subframe coded at bps−k then shifted — how real encoders code
  * quiet/quantized content; the fixture signal's ×256 samples shrink
  * 8 bits/sample under it).  >2 channels and negative
  * LPC shifts are rejected BY NAME — a decoder silently
  * misreading entropy-coded residuals would poison every downstream
  * fingerprint.  No external FLAC implementation exists in this
  * container, so the conformance anchors are the published artifacts
  * themselves: the CRC polynomials, the zigzag/Rice/UTF-8 codings, the
  * predictor recurrences, and the MD5 of the raw channel data.
  */
object FlacCodec {

  // ---- CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005) --------

  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    for (i <- 0 until 256) {
      var c = i
      for (_ <- 0 until 8)
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
      t(i) = c
    }
    t
  }

  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    for (i <- 0 until 256) {
      var c = i << 8
      for (_ <- 0 until 8)
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
        else (c << 1) & 0xffff
      t(i) = c
    }
    t
  }

  private def crc8(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) { c = Crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }

  private def crc16(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) {
      c = ((c << 8) & 0xffff) ^ Crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  // ---- MSB-first bit I/O ---------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var acc = 0L
    private var n = 0
    def put(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 57, s"put $bits bits")
      acc = (acc << bits) | (v & ((1L << bits) - 1))
      n += bits
      while (n >= 8) {
        out.write(((acc >> (n - 8)) & 0xff).toInt)
        n -= 8
      }
    }
    def putUnary(q: Int): Unit = { // q zeros then a terminating 1
      var r = q
      while (r >= 32) { put(0, 32); r -= 32 }
      put(1, r + 1)
    }
    def align(): Unit = if (n > 0) put(0, 8 - n)
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); out.toByteArray }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var n = 0
    def bits(k: Int): Long = {
      require(k >= 0 && k <= 57, s"read $k bits")
      while (n < k) {
        require(pos < b.length, "truncated FLAC stream")
        acc = (acc << 8) | (b(pos) & 0xff)
        pos += 1
        n += 8
      }
      n -= k
      (acc >> n) & ((1L << k) - 1)
    }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) {
        q += 1
        require(q < (1 << 24), "runaway FLAC unary code")
      }
      q
    }
    def align(): Unit = { val r = n % 8; if (r != 0) bits(r) }
    def aligned: Boolean = n % 8 == 0
  }

  // ---- fixed predictors (spec: orders 0-4, binomial coefficients) ----------

  private def residual(x: Array[Int], i: Int, order: Int): Int =
    order match {
      case 0 => x(i)
      case 1 => x(i) - x(i - 1)
      case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
      case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
      case _ => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
    }

  private def restore(x: Array[Int], i: Int, order: Int, r: Int): Int =
    order match {
      case 0 => r
      case 1 => r + x(i - 1)
      case 2 => r + 2 * x(i - 1) - x(i - 2)
      case 3 => r + 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
      case _ => r + 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
    }

  // ---- LPC analysis (Levinson-Durbin over the autocorrelation —
  //      the classic textbook recursion; any coefficient set is
  //      LOSSLESS here because the decoder replays the exact integer
  //      prediction, so analysis quality only affects size) ----------------

  /** Real-valued LPC coefficients a(0..order−1) predicting
    * x[i] ≈ Σ a(j)·x[i−1−j]. */
  private def levinsonDurbin(x: Array[Int], order: Int): Array[Double] = {
    val n = x.length
    val r = new Array[Double](order + 1)
    for (lag <- 0 to order) {
      var s = 0.0
      var i = lag
      while (i < n) { s += x(i).toDouble * x(i - lag); i += 1 }
      r(lag) = s
    }
    val a = new Array[Double](order)
    var err = r(0)
    if (err <= 0) return a // silent block: all-zero predictor
    for (m <- 0 until order) {
      var acc = r(m + 1)
      for (j <- 0 until m) acc -= a(j) * r(m - j)
      val k = acc / err
      a(m) = k
      var j = 0
      while (j < m / 2 + (m % 2)) { // reflect in place
        val tmp = a(j)
        a(j) = tmp - k * a(m - 1 - j)
        if (j != m - 1 - j) a(m - 1 - j) = a(m - 1 - j) - k * tmp
        j += 1
      }
      err *= 1 - k * k
      if (err <= 0) return a
    }
    a
  }

  /** Quantize LPC coefficients to `precision`-bit integers with a
    * common right-shift (the spec's QLP form): the LARGEST shift that
    * keeps every coefficient in range, with error-feedback rounding
    * (each coefficient's rounding error is carried into the next — the
    * standard trick that keeps the quantized filter's response close
    * to the ideal one).  Returns (coeffs, shift). */
  private def quantizeLpc(a: Array[Double],
      precision: Int): (Array[Int], Int) = {
    val maxA = a.map(math.abs).foldLeft(1e-9)(math.max)
    val lim = 1 << (precision - 1)
    var shift = 0
    while (shift < 15 && maxA * (1L << (shift + 1)) <= lim - 1) shift += 1
    var errAcc = 0.0
    val c = a.map { v =>
      val ideal = v * (1L << shift) + errAcc
      val q = math.max(-lim, math.min(lim - 1, math.round(ideal).toInt))
      errAcc = ideal - q
      q
    }
    (c, shift)
  }

  /** Integer LPC prediction for sample i (spec: truncated arithmetic —
    * Long accumulator, arithmetic right shift). */
  private def lpcPredict(x: Array[Int], i: Int, c: Array[Int],
      shift: Int): Int = {
    var s = 0L
    var j = 0
    while (j < c.length) { s += c(j).toLong * x(i - 1 - j); j += 1 }
    (s >> shift).toInt
  }

  private def zigzag(r: Int): Long = ((r.toLong << 1) ^ (r >> 31)) & 0xffffffffL

  private def unzigzag(u: Long): Int = (((u >>> 1) ^ -(u & 1)).toInt)

  /** MD5 of the raw little-endian sample bytes (the STREAMINFO anchor
    * both the encoder and its own verifier must compute identically). */
  private def md5Of(samples: Array[Short]): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    java.security.MessageDigest.getInstance("MD5").digest(raw)
  }

  /** UTF-8-style coded number (the frame-number coding of §9.1.5). */
  private def putUtf8(bw: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), "frame number out of range")
    if (v < 0x80) bw.put(v, 8)
    else {
      // count continuation bytes needed
      var k = 1
      while (v >= (1L << (if (k == 1) 11 else 5 * k + 6))) k += 1
      // leading byte: k+1 ones, a zero, then the top bits
      val topBits = 6 - k
      bw.put((0xff << (topBits + 1)) & 0xff | ((v >> (6 * k)) &
        ((1 << topBits) - 1)).toInt, 8)
      for (j <- (k - 1) to 0 by -1)
        bw.put(0x80L | ((v >> (6 * j)) & 0x3f), 8)
    }
  }

  private def readUtf8(br: BitReader): Long = {
    val b0 = br.bits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var k = 0
      var mask = 0x40
      while ((b0 & mask) != 0) { k += 1; mask >>= 1 }
      require(k >= 1 && k <= 6, s"bad FLAC UTF-8 lead byte $b0")
      var v = (b0 & (mask - 1)).toLong
      for (_ <- 0 until k) {
        val c = br.bits(8).toInt
        require((c & 0xc0) == 0x80, "bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3f)
      }
      v
    }
  }

  // ---- encoder -------------------------------------------------------------

  /** Encode mono 16-bit PCM as fixed-predictor FLAC.  Per frame the
    * encoder picks CONSTANT for flat blocks, otherwise the fixed order
    * 0–4 minimizing total |residual| (the classic estimator), with one
    * Rice partition and the parameter fit to the mean magnitude. */
  /** `lpcOrder` > 0 encodes non-constant blocks as LPC subframes of
    * that order (Levinson-Durbin analysis, 12-bit QLP quantization);
    * 0 keeps the fixed-predictor policy.  Either way the stream is
    * lossless — the decoder replays the exact integer prediction. */
  /** Residual coding shared by the FIXED and LPC paths: method 0
    * (4-bit Rice), partition order 0, parameter fit to the mean. */
  private def emitResidual(fw: BitWriter, res: Array[Int]): Unit = {
    fw.put(0, 2); fw.put(0, 4)
    val mean = if (res.isEmpty) 0L
    else res.map(r => zigzag(r)).sum / math.max(1, res.length)
    var param = 0
    while (param < 14 && (1L << (param + 1)) < mean + 1) param += 1
    fw.put(param.toLong, 4)
    res.foreach { r =>
      val u = zigzag(r)
      fw.putUnary((u >>> param).toInt)
      if (param > 0) fw.put(u, param)
    }
  }

  /** One channel's subframe at `bps0` bits per sample (17 for a stereo
    * SIDE channel per spec §9.1.4, else 16): CONSTANT for flat blocks,
    * LPC of `lpcOrder` when requested, best FIXED order otherwise.
    * `detectWasted` strips common trailing zero bits (flag 1 + unary
    * k−1, subframe coded at bps−k) — the spec's wasted-bits form. */
  private def writeSubframe(fw: BitWriter, x0: Array[Int], bps0: Int,
      lpcOrder: Int, detectWasted: Boolean = false): Unit = {
    val n = x0.length
    val constant = x0.forall(_ == x0(0))
    val wasted =
      if (constant || !detectWasted) 0
      else {
        var k = bps0 - 1
        var any = false
        var i = 0
        while (i < n) {
          if (x0(i) != 0) {
            any = true
            k = math.min(k, java.lang.Integer.numberOfTrailingZeros(x0(i)))
          }
          i += 1
        }
        if (any) k else 0
      }
    val (x, bps) =
      if (wasted == 0) (x0, bps0)
      else (x0.map(_ >> wasted), bps0 - wasted)
    val mask = (1L << bps) - 1
    def header(typeCode: Int): Unit = {
      fw.put(0, 1); fw.put(typeCode.toLong, 6)
      if (wasted == 0) fw.put(0, 1)
      else { fw.put(1, 1); fw.putUnary(wasted - 1) }
    }
    if (constant) {
      header(0) // CONSTANT
      fw.put(x(0).toLong & mask, bps)
    } else if (lpcOrder > 0 && n > lpcOrder) {
      val order = lpcOrder
      val precision = 15 // max legal (precM1 = 14; 15 is invalid)
      val (c, shift) = quantizeLpc(levinsonDurbin(x, order), precision)
      header(32 + order - 1) // LPC
      for (j <- 0 until order) fw.put(x(j).toLong & mask, bps)
      fw.put((precision - 1).toLong, 4)
      fw.put(shift.toLong, 5)
      c.foreach(v => fw.put(v.toLong & ((1L << precision) - 1), precision))
      emitResidual(fw, Array.tabulate(n - order)(j =>
        x(j + order) - lpcPredict(x, j + order, c, shift)))
    } else {
      // best fixed order by total |residual| (orders capped by n)
      val maxOrder = math.min(4, n - 1)
      val costs = (0 to maxOrder).map { o =>
        var s = 0L
        var i = o
        while (i < n) { s += math.abs(residual(x, i, o).toLong); i += 1 }
        (s, o)
      }
      val order = costs.min._2
      header(8 + order) // FIXED
      for (j <- 0 until order) fw.put(x(j).toLong & mask, bps)
      emitResidual(fw, Array.tabulate(n - order)(j =>
        residual(x, j + order, order)))
    }
  }

  /** fLaC magic + STREAMINFO for `channels` 16-bit channels of
    * `totalSamples` inter-channel samples, with the raw-PCM MD5. */
  private def writeHeader(out: java.io.ByteArrayOutputStream,
      sampleRate: Int, channels: Int, blockSize: Int, totalSamples: Long,
      md5: Array[Byte]): Unit = {
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    val si = new BitWriter
    // the spec's 16..65535 range applies to all frames EXCEPT a shorter
    // final frame, which is excluded from the min — so min == max here
    si.put(blockSize.toLong, 16) // min block size
    si.put(blockSize.toLong, 16) // max block size
    si.put(0, 24); si.put(0, 24) // frame sizes unknown
    si.put(sampleRate.toLong, 20)
    si.put((channels - 1).toLong, 3)
    si.put(15, 5) // bits per sample - 1
    si.put(totalSamples, 36)
    val siBytes = si.bytes
    out.write(0x80) // last-metadata flag | type 0
    out.write(0); out.write(0); out.write(siBytes.length + 16)
    out.write(siBytes, 0, siBytes.length)
    out.write(md5, 0, 16)
  }

  /** One frame: header (sync, codes, UTF-8 frame number, CRC-8), the
    * channel subframes bit-contiguous (aligned only at frame end per
    * spec), CRC-16 over the whole frame. */
  private def writeFrame(out: java.io.ByteArrayOutputStream, f: Long,
      n: Int, chanCode: Int, subframes: Seq[(Array[Int], Int)],
      lpcOrder: Int, detectWasted: Boolean = false): Unit = {
    val bw = new BitWriter
    bw.put(0x3ffe, 14) // sync
    bw.put(0, 1)       // reserved
    bw.put(0, 1)       // fixed blocking
    bw.put(7, 4)       // block size: 16-bit value - 1 follows
    bw.put(0, 4)       // sample rate: from STREAMINFO
    bw.put(chanCode.toLong, 4)
    bw.put(4, 3)       // sample size: 16 bits
    bw.put(0, 1)       // reserved
    putUtf8(bw, f)
    bw.put((n - 1).toLong, 16)
    val headerBytes = bw.bytes // aligned: 5 header bytes + utf8 + 2
    val fw = new BitWriter
    subframes.foreach { case (x, bps) =>
      writeSubframe(fw, x, bps, lpcOrder, detectWasted) }
    fw.align()
    val bodyBytes = fw.bytes
    val withCrc8 = headerBytes :+ crc8(headerBytes, 0,
      headerBytes.length).toByte
    val frame = withCrc8 ++ bodyBytes
    val c16 = crc16(frame, 0, frame.length)
    out.write(frame, 0, frame.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
  }

  def encode(sampleRate: Int, samples: Array[Short],
      blockSize: Int = 256, lpcOrder: Int = 0,
      detectWasted: Boolean = false): Array[Byte] = {
    require(lpcOrder >= 0 && lpcOrder <= 32, s"bad LPC order $lpcOrder")
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(samples.nonEmpty, "no samples")
    require(blockSize >= 16 && blockSize <= 65535, "bad block size")
    val out = new java.io.ByteArrayOutputStream
    writeHeader(out, sampleRate, 1, blockSize, samples.length.toLong,
      md5Of(samples))
    val nFrames = (samples.length + blockSize - 1) / blockSize
    for (f <- 0 until nFrames) {
      val i0 = f * blockSize
      val n = math.min(blockSize, samples.length - i0)
      val x = Array.tabulate(n)(j => samples(i0 + j).toInt)
      writeFrame(out, f.toLong, n, chanCode = 0, Seq((x, 16)), lpcOrder,
        detectWasted)
    }
    out.toByteArray
  }

  /** Per-channel order-2 residual magnitude — the standard per-frame
    * cost estimator real encoders use to pick the stereo mode. */
  private def stereoCost(x: Array[Int]): Long = {
    var s = 0L
    if (x.length < 3) { x.foreach(v => s += math.abs(v.toLong)); s }
    else {
      var i = 2
      while (i < x.length) {
        s += math.abs(x(i).toLong - 2 * x(i - 1) + x(i - 2)); i += 1
      }
      s
    }
  }

  /** Encode stereo 16-bit PCM.  `mode` is the spec channel assignment:
    * "lr" = independent, "ls" = left/side, "rs" = right/side, "ms" =
    * mid/side, or "auto" = per-frame minimum of the four order-2
    * residual cost estimates (the policy real encoders use — flat
    * decorrelated frames land on ms/ls, uncorrelated ones on lr).  Side
    * subframes are coded at 17 bits per spec §9.1.4; mid = (L+R)>>1
    * (floor), side = L−R, reconstructed exactly via the spec's
    * `(mid<<1 | side&1)` bit trick — every mode is lossless. */
  def encodeStereo(sampleRate: Int, left: Array[Short],
      right: Array[Short], blockSize: Int = 256, mode: String = "auto",
      lpcOrder: Int = 0, detectWasted: Boolean = false): Array[Byte] = {
    require(lpcOrder >= 0 && lpcOrder <= 32, s"bad LPC order $lpcOrder")
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(left.nonEmpty && left.length == right.length,
      "stereo channels must be non-empty and equal-length")
    require(blockSize >= 16 && blockSize <= 65535, "bad block size")
    require(Set("lr", "ls", "rs", "ms", "auto")(mode),
      s"bad stereo mode '$mode' (lr/ls/rs/ms/auto)")
    val interleaved = new Array[Short](left.length * 2)
    for (i <- left.indices) {
      interleaved(2 * i) = left(i); interleaved(2 * i + 1) = right(i)
    }
    val out = new java.io.ByteArrayOutputStream
    writeHeader(out, sampleRate, 2, blockSize, left.length.toLong,
      md5Of(interleaved))
    val nFrames = (left.length + blockSize - 1) / blockSize
    for (f <- 0 until nFrames) {
      val i0 = f * blockSize
      val n = math.min(blockSize, left.length - i0)
      val l = Array.tabulate(n)(j => left(i0 + j).toInt)
      val r = Array.tabulate(n)(j => right(i0 + j).toInt)
      val s = Array.tabulate(n)(j => l(j) - r(j))
      val m = Array.tabulate(n)(j => (l(j) + r(j)) >> 1)
      val frameMode =
        if (mode != "auto") mode
        else {
          val cl = stereoCost(l); val cr = stereoCost(r)
          val cs = stereoCost(s); val cm = stereoCost(m)
          Seq((cl + cr, "lr"), (cl + cs, "ls"), (cs + cr, "rs"),
            (cm + cs, "ms")).minBy(t => (t._1, t._2))._2
        }
      val (code, subframes) = frameMode match {
        case "lr" => (1, Seq((l, 16), (r, 16)))
        case "ls" => (8, Seq((l, 16), (s, 17)))
        case "rs" => (9, Seq((s, 17), (r, 16)))
        case _    => (10, Seq((m, 16), (s, 17)))
      }
      writeFrame(out, f.toLong, n, code, subframes, lpcOrder,
        detectWasted)
    }
    out.toByteArray
  }

  private def fixtureChannel(nSamples: Int, src: Array[Byte], mult: Int,
      add: Int): Array[Short] =
    Array.tabulate(nSamples) { i =>
      val v = src((i * mult + add) % src.length) & 0xff
      require(v <= 203, s"flac fixture: source byte $v overflows the " +
        "(v-76)*256 map")
      ((v - 76) * 256).toShort
    }

  /** [[AudioCodec.wavFromBytes]]'s fixture signal in the FLAC
    * container. */
  def flacFromBytes(sampleRate: Int, nSamples: Int, src: Array[Byte],
      blockSize: Int = 64, lpcOrder: Int = 0,
      detectWasted: Boolean = false): Array[Byte] = {
    require(src.nonEmpty, "empty source bytes")
    encode(sampleRate, fixtureChannel(nSamples, src, 7, 3), blockSize,
      lpcOrder, detectWasted)
  }

  /** Stereo fixture: L is the WAV fixture map (7i+3), R a second
    * independent walk (11i+5) over the same bytes — so the SQL oracle
    * can replay the (L+R)>>1 downmix exactly. */
  def flacStereoFromBytes(sampleRate: Int, nSamples: Int,
      src: Array[Byte], blockSize: Int = 64, mode: String = "auto",
      lpcOrder: Int = 0): Array[Byte] = {
    require(src.nonEmpty, "empty source bytes")
    encodeStereo(sampleRate, fixtureChannel(nSamples, src, 7, 3),
      fixtureChannel(nSamples, src, 11, 5), blockSize, mode, lpcOrder)
  }

  // ---- decoder -------------------------------------------------------------

  /** One subframe at `bps` bits per sample (17 for a stereo SIDE
    * channel): CONSTANT / VERBATIM / FIXED / LPC with partitioned-Rice
    * residuals. */
  private def readSubframe(br: BitReader, blockSize: Int,
      bps0: Int): Array[Int] = {
    def signed(v: Long, w: Int): Int = ((v << (64 - w)) >> (64 - w)).toInt
    require(br.bits(1) == 0, "subframe padding bit set")
    val sfType = br.bits(6).toInt
    // wasted bits (spec: flag 1 + unary-coded k−1): the subframe is
    // coded at bps−k and every sample shifts left k on the way out —
    // how real encoders code quiet/quantized content
    val wasted =
      if (br.bits(1) == 0) 0
      else br.unary() + 1
    require(wasted < bps0, s"wasted bits $wasted >= bits/sample $bps0")
    val bps = bps0 - wasted
    val x = new Array[Int](blockSize)
    // partitioned-Rice residual shared by FIXED and LPC: `predict`
    // returns the prediction for sample i from the already-restored
    // history
    def decodeResidual(order: Int, predict: Int => Int): Unit = {
      val method = br.bits(2).toInt
      require(method == 0 || method == 1,
        s"reserved FLAC residual method $method")
      val pBits = if (method == 0) 4 else 5
      val escape = (1 << pBits) - 1
      val partOrder = br.bits(4).toInt
      val nParts = 1 << partOrder
      require(blockSize % nParts == 0,
        "partition order does not divide block size")
      var i = order
      for (part <- 0 until nParts) {
        val count = (blockSize >> partOrder) -
          (if (part == 0) order else 0)
        require(count >= 0, "partition underflow")
        val param = br.bits(pBits).toInt
        if (param == escape) {
          val w = br.bits(5).toInt
          for (_ <- 0 until count) {
            val raw = br.bits(w)
            x(i) = predict(i) + (if (w == 0) 0 else signed(raw, w))
            i += 1
          }
        } else {
          for (_ <- 0 until count) {
            val q = br.unary()
            val u = (q.toLong << param) |
              (if (param > 0) br.bits(param) else 0L)
            x(i) = predict(i) + unzigzag(u)
            i += 1
          }
        }
      }
      require(i == blockSize, "residual count mismatch")
    }
    if (sfType == 0) { // CONSTANT
      java.util.Arrays.fill(x, signed(br.bits(bps), bps))
    } else if (sfType == 1) { // VERBATIM
      for (i <- 0 until blockSize) x(i) = signed(br.bits(bps), bps)
    } else if (sfType >= 8 && sfType <= 12) { // FIXED order 0-4
      val order = sfType - 8
      require(order <= blockSize, "fixed order exceeds block")
      for (i <- 0 until order) x(i) = signed(br.bits(bps), bps)
      decodeResidual(order, i => restore(x, i, order, 0))
    } else if (sfType >= 32) { // LPC, order 1-32
      val order = sfType - 32 + 1
      require(order <= blockSize, "LPC order exceeds block")
      for (i <- 0 until order) x(i) = signed(br.bits(bps), bps)
      val precM1 = br.bits(4).toInt
      require(precM1 != 15, "invalid LPC coefficient precision 15")
      val precision = precM1 + 1
      val shiftRaw = br.bits(5).toInt
      // 5-bit signed: 16..31 are negative shifts — pathological, no
      // real encoder writes them
      require(shiftRaw < 16, "negative LPC shift unsupported")
      val c = Array.tabulate(order)(_ => signed(br.bits(precision),
        precision))
      decodeResidual(order, i => lpcPredict(x, i, c, shiftRaw))
    } else {
      throw new IllegalArgumentException(
        s"reserved FLAC subframe type $sfType")
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { x(i) = x(i) << wasted; i += 1 }
    }
    x
  }

  /** Full decode: (sampleRate, channels, channel-interleaved samples).
    * Mono and stereo; stereo frames may use any of the four spec
    * channel assignments (independent 1, left/side 8, right/side 9,
    * mid/side 10 — side subframes read at 17 bits), mixed freely
    * across frames.  The STREAMINFO MD5 is verified over the decoded
    * interleaved PCM — the container's end-to-end integrity anchor. */
  def decodeFull(b: Array[Byte]): (Int, Int, Array[Short]) = {
    require(b.length >= 42, "truncated FLAC stream")
    require(new String(b, 0, 4, "US-ASCII") == "fLaC", "bad FLAC magic")
    var p = 4
    var sampleRate = -1
    var channels = -1
    var totalSamples = -1L
    var md5: Array[Byte] = null
    var last = false
    var maxBlock = -1
    while (!last) {
      require(p + 4 <= b.length, "truncated FLAC metadata header")
      val h = b(p) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
        (b(p + 3) & 0xff)
      require(p + 4 + len <= b.length, "truncated FLAC metadata block")
      require(typ != 127, "invalid FLAC metadata type 127")
      if (typ == 0) {
        require(len == 34, s"bad STREAMINFO length $len")
        val br = new BitReader(b, p + 4)
        val minB = br.bits(16).toInt
        maxBlock = br.bits(16).toInt
        require(minB >= 16 && maxBlock >= minB,
          s"bad STREAMINFO block sizes $minB/$maxBlock")
        br.bits(24); br.bits(24) // frame sizes
        sampleRate = br.bits(20).toInt
        require(sampleRate > 0, "bad FLAC sample rate")
        val chM1 = br.bits(3).toInt
        require(chM1 <= 1,
          s"only mono/stereo FLAC supported (got ${chM1 + 1} channels)")
        channels = chM1 + 1
        require(br.bits(5) == 15, "only 16-bit FLAC supported")
        totalSamples = br.bits(36)
        md5 = java.util.Arrays.copyOfRange(b, p + 4 + 18, p + 4 + 34)
      }
      p += 4 + len
    }
    require(sampleRate > 0, "FLAC missing STREAMINFO")
    require(totalSamples > 0 && totalSamples <= (Int.MaxValue / 2),
      "bad FLAC total sample count")
    val samples = new Array[Short](totalSamples.toInt * channels)
    var got = 0L
    var frameIdx = 0L
    while (got < totalSamples) {
      val frameStart = p
      val br = new BitReader(b, p)
      require(br.bits(14) == 0x3ffe, "bad FLAC frame sync")
      require(br.bits(1) == 0, "reserved frame bit set")
      require(br.bits(1) == 0,
        "variable-blocking FLAC unsupported (fixed blocking only)")
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chan = br.bits(4).toInt
      if (channels == 1)
        require(chan == 0,
          s"mono stream frame carries channel assignment $chan")
      else
        require(chan == 1 || (chan >= 8 && chan <= 10),
          s"stereo frame channel assignment $chan unsupported " +
            "(independent 1 or decorrelated 8/9/10)")
      val ssCode = br.bits(3).toInt
      require(ssCode == 4, "only 16-bit FLAC frames supported")
      require(br.bits(1) == 0, "reserved frame bit set")
      val num = readUtf8(br)
      require(num == frameIdx, s"frame number $num != expected $frameIdx")
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException(
          s"reserved FLAC block size code $bsCode")
      }
      srCode match {
        case 0 => () // from STREAMINFO
        case 12 => br.bits(8)
        case 13 | 14 => br.bits(16)
        case 15 => throw new IllegalArgumentException(
          "invalid FLAC sample rate code 15")
        case _ => () // table codes carry no extra bytes
      }
      require(blockSize <= maxBlock, "frame block size exceeds STREAMINFO")
      require(got + blockSize <= totalSamples,
        s"FLAC frames exceed STREAMINFO total ($got + $blockSize)")
      val headerLen = br.pos - frameStart
      val hcrc = br.bits(8).toInt
      require(hcrc == crc8(b, frameStart, headerLen),
        "FLAC frame header CRC-8 mismatch")
      // subframes: the spec's side channel (the difference signal)
      // carries one extra bit — assignment 8 sides ch1, 9 sides ch0,
      // 10 sides ch1
      def store(i: Int, ch: Int, v: Int): Unit = {
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"decoded sample $v out of 16-bit range")
        samples((got.toInt + i) * channels + ch) = v.toShort
      }
      if (channels == 1) {
        val x = readSubframe(br, blockSize, 16)
        for (i <- 0 until blockSize) store(i, 0, x(i))
      } else {
        val (bps0, bps1) = chan match {
          case 1  => (16, 16)
          case 8  => (16, 17)
          case 9  => (17, 16)
          case _  => (16, 17)
        }
        val c0 = readSubframe(br, blockSize, bps0)
        val c1 = readSubframe(br, blockSize, bps1)
        chan match {
          case 1 => // independent L, R
            for (i <- 0 until blockSize) {
              store(i, 0, c0(i)); store(i, 1, c1(i))
            }
          case 8 => // left/side: R = L - S
            for (i <- 0 until blockSize) {
              store(i, 0, c0(i)); store(i, 1, c0(i) - c1(i))
            }
          case 9 => // side/right: L = R + S
            for (i <- 0 until blockSize) {
              store(i, 0, c1(i) + c0(i)); store(i, 1, c1(i))
            }
          case _ => // mid/side: the spec's lossless bit trick
            for (i <- 0 until blockSize) {
              val side = c1(i)
              val m2 = (c0(i).toLong << 1) | (side & 1L)
              store(i, 0, ((m2 + side) >> 1).toInt)
              store(i, 1, ((m2 - side) >> 1).toInt)
            }
        }
      }
      br.align()
      val bodyEnd = br.pos
      val c16 = (br.bits(8).toInt << 8) | br.bits(8).toInt
      require(c16 == crc16(b, frameStart, bodyEnd - frameStart),
        "FLAC frame CRC-16 mismatch")
      got += blockSize
      frameIdx += 1
      p = br.pos
    }
    // the stream-level integrity anchor: MD5 of the raw little-endian
    // (interleaved) sample bytes must match STREAMINFO's
    require(java.util.Arrays.equals(md5Of(samples), md5),
      "FLAC MD5 mismatch: decoded audio differs from STREAMINFO digest")
    (sampleRate, channels, samples)
  }

  /** (sampleRate, samples) with stereo downmixed (L+R)>>1 — the
    * [[AudioCodec]] stereo-WAV convention, so the fLaC dispatch feeds
    * the same mono kernel regardless of channel count. */
  def decode(b: Array[Byte]): (Int, Array[Short]) = {
    val (rate, channels, s) = decodeFull(b)
    if (channels == 1) (rate, s)
    else (rate, Array.tabulate(s.length / 2)(i =>
      ((s(2 * i) + s(2 * i + 1)) >> 1).toShort))
  }

  /** Exact stereo decode: (sampleRate, left, right).  Rejects mono. */
  def decodeStereo(b: Array[Byte]): (Int, Array[Short], Array[Short]) = {
    val (rate, channels, s) = decodeFull(b)
    require(channels == 2, "decodeStereo on a mono FLAC stream")
    (rate, Array.tabulate(s.length / 2)(i => s(2 * i)),
      Array.tabulate(s.length / 2)(i => s(2 * i + 1)))
  }
}
