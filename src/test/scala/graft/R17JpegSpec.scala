package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, JpegCodec, MultimodalOps}

/** Baseline-JPEG codec fixtures — the R16PngSpec shape for the first
  * LOSSY tier: round-trip TOLERANCE (not hash-exactness: post-DCT the
  * encoder's quantization moves pixels), DC-only exactness, structural
  * fail-loud shapes, and corruption TOTALITY.  JPEG has no CRC, so the
  * PNG "every byte flip throws" property cannot hold — a flipped entropy
  * bit is legal data that decodes to different pixels; the JPEG totality
  * contract is weaker and stated exactly: every single-byte flip either
  * decodes to a well-formed raster or throws the codec's
  * IllegalArgumentException, never an uncontrolled error. */
class R17JpegSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, f: (Int, Int) => Int,
      q: Int): (ImageCodec.Raster, Int) = {
    val r = JpegCodec.decode(JpegCodec.encode(w, h, f, q))
    assert(r.width == w && r.height == h)
    var m = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(r.lumaSum3(y * w + x) / 3 - f(x, y))
      if (d > m) m = d
    }
    (r, m)
  }

  test("zigzag order matches the published T.81 scan sequence") {
    val std = Array(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42,
      49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52, 45,
      38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    assert(JpegCodec.ZigZag.toSeq == std.toSeq)
  }

  test("uniform images round-trip exactly (DC-only blocks)") {
    // exactness needs the DC quant step ≤ 8: the DC coefficient is
    // 8·(v−128), so dequantized error ≤ step/2 → ≤ step/16 < 0.5 px.
    // q90's step is 3, q75's is 8; q50's is 16 and can be off by 1.
    for (v <- Seq(0, 7, 128, 200, 255); q <- Seq(75, 90, 95)) {
      val (_, err) = roundTrip(8, 8, (_, _) => v, q)
      assert(err == 0, s"uniform $v at q$q: err $err")
    }
    for (v <- Seq(0, 7, 200)) {
      val (_, err) = roundTrip(8, 8, (_, _) => v, 50)
      assert(err <= 1, s"uniform $v at q50: err $err")
    }
  }

  test("round-trip error stays within the quality bound, incl. edge blocks") {
    val fixtures: Seq[(Int, Int, (Int, Int) => Int)] = Seq(
      (8, 8, (x, y) => (x * 32 + y * 4) % 256),
      (8, 8, (x, y) => if ((x + y) % 2 == 0) 0 else 255), // worst high-freq
      (16, 12, (x, y) => ((x * 37 + y * 91 + 13) * 31) % 256), // non-multiple-of-8
      (24, 8, (x, y) => (x * x + y * 17) % 256),
      (8, 8, (x, y) => {
        val s = MultimodalOps.asciiBytes(
          "The quick brown fox jumps over the lazy dog 0123456789")
        s((y * 8 + x) % s.length) & 0xff
      }))
    for ((w, h, f) <- fixtures; q <- Seq(75, 90, 95)) {
      val bound = JpegCodec.pixelErrorBound(q)
      val (_, err) = roundTrip(w, h, f, q)
      assert(err <= bound, s"${w}x$h at q$q: err $err > bound $bound")
      // and the corpus gauge constant holds at its quality
      if (q == 90) assert(err <= 32, s"${w}x$h at q90: err $err > gauge 32")
    }
  }

  test("identical inputs give identical bytes — the hamming-0 invariant") {
    val src = MultimodalOps.asciiBytes("same text same raster")
    val a = JpegCodec.grayJpeg(8, 8, src)
    val b = JpegCodec.grayJpeg(8, 8, src)
    assert(java.util.Arrays.equals(a, b))
  }

  test("byte stuffing round-trips (a sweep that emits 0xFF scan bytes)") {
    // 50 deterministic pseudo-random images: with ~1/256 odds per scan
    // byte, the sweep exercises the FF→FF00 stuff/unstuff path many
    // times; a stuffing bug would corrupt the bit stream and blow the
    // error bound (or throw)
    var sawStuffed = false
    for (i <- 1 to 50) {
      val f = (x: Int, y: Int) =>
        (((x * 2654435761L + y * 40503L + i * 97L) >>> 7) % 256).toInt
      val enc = JpegCodec.encode(16, 16, f, 90)
      // any FF00 after SOS is a stuffed data byte (FF00 never occurs in
      // the marker segments our encoder writes)
      if (enc.sliding(2).exists(p => (p(0) & 0xff) == 0xff && p(1) == 0))
        sawStuffed = true
      val bound = JpegCodec.pixelErrorBound(90)
      val r = JpegCodec.decode(enc)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(math.abs(r.lumaSum3(y * 16 + x) / 3 - f(x, y)) <= bound)
    }
    assert(sawStuffed, "sweep never emitted a stuffed FF — not exercised")
  }

  test("structural corruption fails loudly with descriptive errors") {
    val ok = JpegCodec.encode(8, 8, (x, y) => (x * 5 + y * 11) % 256, 90)
    // truncation at EVERY prefix length: loud, never uncontrolled
    for (n <- 2 until ok.length) {
      val ex = intercept[IllegalArgumentException] {
        JpegCodec.decode(java.util.Arrays.copyOf(ok, n))
      }
      assert(ex.getMessage != null)
    }
    // bad signature
    intercept[IllegalArgumentException] {
      JpegCodec.decode(Array[Byte](0, 1, 2, 3)) }
    // a baseline stream relabeled SOF2 routes to the progressive
    // walker, whose scan-header validation rejects the sequential
    // full-spectral SOS (progressive DC and AC cannot share a scan)
    val prog = ok.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val ex2 = intercept[IllegalArgumentException] { JpegCodec.decode(prog) }
    assert(ex2.getMessage.contains("DC scan must have Se = 0"))
    // arithmetic coding rejected by name
    val arith = ok.clone(); arith(sofAt + 1) = 0xc9.toByte
    val ex3 = intercept[IllegalArgumentException] { JpegCodec.decode(arith) }
    assert(ex3.getMessage.contains("unsupported"))
    // a crafted segment length < 2 must fail loudly, not loop forever
    // (len < 2 would stop the marker-walk cursor from advancing)
    val dqtAt = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xdb).get
    val shortLen = ok.clone()
    shortLen(dqtAt + 2) = 0; shortLen(dqtAt + 3) = 1
    val ex4 = intercept[IllegalArgumentException] {
      JpegCodec.decode(shortLen) }
    assert(ex4.getMessage.contains("DQT"))
  }

  test("corruption totality: every single-byte flip is controlled") {
    val ok = JpegCodec.encode(8, 8, (x, y) => (x * 29 + y * 53) % 256, 90)
    for (i <- ok.indices) {
      val bad = ok.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      try {
        val r = JpegCodec.decode(bad)
        // decoded without error: must still be a well-formed raster
        assert(r.width > 0 && r.height > 0 &&
          r.lumaSum3.length == r.width * r.height)
      } catch {
        case _: IllegalArgumentException => () // the codec's loud path
        case e: Throwable =>
          fail(s"flip at $i escaped the codec's error contract: $e")
      }
    }
  }

  test("ImageCodec.decode dispatches FFD8 to the JPEG decoder") {
    val src = MultimodalOps.asciiBytes("dispatch me")
    val viaDispatch = ImageCodec.decode(JpegCodec.grayJpeg(8, 8, src))
    val direct = JpegCodec.decode(JpegCodec.grayJpeg(8, 8, src))
    assert(viaDispatch.lumaSum3.toSeq == direct.lumaSum3.toSeq)
  }

  test("restart intervals round-trip; out-of-sequence markers fail") {
    // 32×24 = 12 MCUs, interval 3 → 4 restart segments, markers D0..D2
    val f = (x: Int, y: Int) => (x * 13 + y * 41) % 256
    val enc = JpegCodec.encode(32, 24, f, 90, restartInterval = 3)
    assert(enc.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7),
      "encoder emitted no RST markers")
    val r = JpegCodec.decode(enc)
    val bound = JpegCodec.pixelErrorBound(90)
    for (y <- 0 until 24; x <- 0 until 32)
      assert(math.abs(r.lumaSum3(y * 32 + x) / 3 - f(x, y)) <= bound)
    // and the restart stream must equal the no-restart stream pixelwise
    // (restart only resets predictors/alignment, never pixel content)
    val plain = JpegCodec.decode(JpegCodec.encode(32, 24, f, 90))
    assert(r.lumaSum3.toSeq == plain.lumaSum3.toSeq)
    // corrupt the FIRST RST marker's index → out-of-sequence, loud
    val rstAt = (0 until enc.length - 1).find(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xd0).get
    val bad = enc.clone(); bad(rstAt + 1) = 0xd5.toByte
    val ex = intercept[IllegalArgumentException] { JpegCodec.decode(bad) }
    assert(ex.getMessage.contains("restart marker out of sequence"))
    // RST markers with DRI absent → loud
    val noDri = JpegCodec.encode(8, 8, f, 90) // 1 MCU, no DRI
    val driAt = (0 until enc.length - 1).find(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xdd).get
    val stripped = enc.take(driAt) ++ enc.drop(driAt + 6) // remove DRI seg
    val ex2 = intercept[IllegalArgumentException] {
      JpegCodec.decode(stripped) }
    assert(ex2.getMessage.contains("DRI said none"))
    assert(noDri.length > 0)
  }

  test("color JPEG round-trips within tolerance and converts YCbCr") {
    val f = (x: Int, y: Int) =>
      ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 91 + y) % 256)
    val enc = JpegCodec.encodeColor(16, 16, f, 90)
    val r = JpegCodec.decode(enc)
    assert(r.width == 16 && r.height == 16)
    // chroma error compounds through quantization (coarser table) and
    // the BT.601 inverse; gauge the r+g+b SUM per pixel
    for (y <- 0 until 16; x <- 0 until 16) {
      val (er, eg, eb) = f(x, y)
      val d = math.abs(r.lumaSum3(y * 16 + x) - (er + eg + eb))
      assert(d <= 96, s"color err $d at ($x,$y)") // empirical q90 gauge ×3 ch
    }
    // gray content through the color path ≈ the gray path (YCbCr of
    // (v,v,v) is (v,128,128) — chroma blocks are DC-only uniform)
    val g = (x: Int, y: Int) => (x * 16 + y * 8) % 256
    val viaColor = JpegCodec.decode(
      JpegCodec.encodeColor(8, 8, (x, y) => (g(x, y), g(x, y), g(x, y)), 90))
    val viaGray = JpegCodec.decode(JpegCodec.encode(8, 8, g, 90))
    for (i <- 0 until 64)
      assert(math.abs(viaColor.lumaSum3(i) - viaGray.lumaSum3(i)) <= 6,
        s"gray-content color drifted at $i")
  }

  test("color + restart intervals compose; uniform color is DC-exact") {
    val f = (x: Int, y: Int) => ((x * 7 + y * 3) % 256, 90, 200)
    val withRst = JpegCodec.decode(
      JpegCodec.encodeColor(24, 16, f, 90, restartInterval = 2))
    val plain = JpegCodec.decode(JpegCodec.encodeColor(24, 16, f, 90))
    assert(withRst.lumaSum3.toSeq == plain.lumaSum3.toSeq)
    // uniform color: every block DC-only in all three components — the
    // YCbCr forward/inverse round trip is the only error source (±1/ch)
    val u = JpegCodec.decode(
      JpegCodec.encodeColor(8, 8, (_, _) => (200, 30, 90), 95))
    for (i <- 0 until 64)
      assert(math.abs(u.lumaSum3(i) - (200 + 30 + 90)) <= 3,
        s"uniform color err at $i: ${u.lumaSum3(i)}")
  }

  test("progressive decode equals sequential decode bit-exactly") {
    // entropy coding is lossless over the same quantized coefficients,
    // so EVERY band split and quality must reproduce the sequential
    // pixels exactly — including odd dims (edge-replicated blocks)
    val fs: Seq[(Int, Int) => Int] = Seq(
      (x, y) => (x * 32 + y * 4) % 256,
      (x, y) => if ((x + y) % 2 == 0) 0 else 255,
      (x, y) => {
        val s = MultimodalOps.asciiBytes("progressive fox 0123456789")
        s((y * 16 + x) % s.length) & 0xff
      })
    for (f <- fs; q <- Seq(50, 90, 95);
         bands <- Seq(Seq((1, 63)), Seq((1, 5), (6, 63)),
           Seq((1, 2), (3, 8), (9, 30), (31, 63)))) {
      val seqR = JpegCodec.decode(JpegCodec.encode(16, 16, f, q))
      val progR = JpegCodec.decode(
        JpegCodec.encodeProgressive(16, 16, f, q, bands))
      assert(seqR.lumaSum3.toSeq == progR.lumaSum3.toSeq,
        s"q$q bands=$bands diverged")
    }
    val odd = JpegCodec.decode(
      JpegCodec.encodeProgressive(13, 11, fs.head, 90))
    val oddSeq = JpegCodec.decode(JpegCodec.encode(13, 11, fs.head, 90))
    assert(odd.lumaSum3.toSeq == oddSeq.lumaSum3.toSeq)
  }

  test("EOBRUN spans many blocks (the r>0 path) and still matches") {
    // 64×64 uniform = 64 blocks, every AC band all-zero: the whole AC
    // scan collapses to one EOBn with r = 6 — the multi-block run path
    val u = (_: Int, _: Int) => 77
    val prog = JpegCodec.encodeProgressive(64, 64, u, 90)
    val seqEnc = JpegCodec.encode(64, 64, u, 90)
    assert(JpegCodec.decode(prog).lumaSum3.toSeq ==
      JpegCodec.decode(seqEnc).lumaSum3.toSeq)
    // and a sparse image: one bright pixel per block row → runs broken
    // by coefficient blocks, EOBRUN restarts between them
    val sparse = (x: Int, y: Int) => if (x % 16 == 3 && y % 16 == 5) 250 else 40
    assert(JpegCodec.decode(JpegCodec.encodeProgressive(64, 64, sparse, 90))
      .lumaSum3.toSeq ==
      JpegCodec.decode(JpegCodec.encode(64, 64, sparse, 90)).lumaSum3.toSeq)
  }

  test("successive approximation reconstructs sequential bit-exactly") {
    // SA delivers each coefficient's bits over multiple scans (DC: raw
    // bit planes; AC: newly-significant (run,1)+sign symbols with
    // buffered correction bits and EOB runs carrying skipped blocks'
    // corrections).  Decoding ALL scans must equal the sequential
    // decode exactly — every Al depth, band split, and the adversarial
    // shapes (checker = max AC energy, sparse = long EOB runs with
    // mid-run corrections)
    val fs: Seq[(Int, Int) => Int] = Seq(
      (x, y) => (x * 32 + y * 4) % 256,
      (x, y) => if ((x + y) % 2 == 0) 0 else 255,
      (x, y) => if (x % 16 == 3 && y % 16 == 5) 250 else 40)
    for (f <- fs; q <- Seq(50, 90); al <- Seq(1, 2, 3);
         bands <- Seq(Seq((1, 63)), Seq((1, 5), (6, 63)))) {
      val seqR = JpegCodec.decode(JpegCodec.encode(32, 32, f, q))
      val saR = JpegCodec.decode(
        JpegCodec.encodeProgressiveSA(32, 32, f, q, bands, al))
      assert(seqR.lumaSum3.toSeq == saR.lumaSum3.toSeq,
        s"q$q al=$al bands=$bands diverged")
    }
    // odd dims through SA
    val odd = JpegCodec.decode(
      JpegCodec.encodeProgressiveSA(13, 11, fs.head, 90, al = 2))
    val oddSeq = JpegCodec.decode(JpegCodec.encode(13, 11, fs.head, 90))
    assert(odd.lumaSum3.toSeq == oddSeq.lumaSum3.toSeq)
    // SA truncation stays controlled at every prefix
    val sa = JpegCodec.encodeProgressiveSA(8, 8,
      (x, y) => (x * 9 + y * 31) % 256, 90, al = 2)
    for (n <- 2 until sa.length) {
      intercept[IllegalArgumentException] {
        JpegCodec.decode(java.util.Arrays.copyOf(sa, n)) }
    }
    // non-contiguous approximation (Ah != Al + 1) is rejected by name
    val sosAts = (0 until sa.length - 1).filter(i =>
      (sa(i) & 0xff) == 0xff && (sa(i + 1) & 0xff) == 0xda)
    val bad = sa.clone(); bad(sosAts.last + 9) = 0x30.toByte // Ah=3,Al=0
    val ex = intercept[IllegalArgumentException] { JpegCodec.decode(bad) }
    assert(ex.getMessage.contains("non-contiguous"))
  }

  test("progressive fail-loud shapes: refinement scans, color, DRI, truncation") {
    val prog = JpegCodec.encodeProgressive(8, 8,
      (x, y) => (x * 9 + y * 31) % 256, 90)
    // every truncation prefix is controlled
    for (n <- 2 until prog.length) {
      intercept[IllegalArgumentException] {
        JpegCodec.decode(java.util.Arrays.copyOf(prog, n)) }
    }
    // a NON-CONTIGUOUS approximation header (Ah ≠ Al + 1) is rejected
    // by name: flip the LAST SOS header's Ah/Al byte (header is 8
    // bytes: FF DA len(2) ns(1) comp(2) Ss Se AhAl)
    val sosAts = (0 until prog.length - 1).filter(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xda)
    val lastSos = sosAts.last
    val refine = prog.clone(); refine(lastSos + 9) = 0x31.toByte // Ah=3,Al=1
    val ex = intercept[IllegalArgumentException] { JpegCodec.decode(refine) }
    assert(ex.getMessage.contains("non-contiguous"))
    // SOF2 claiming 3 components over a 1-component stream: the header
    // itself is now too short for its claim — still controlled
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc2).get
    val color = prog.clone(); color(sofAt + 9) = 3
    val ex2 = intercept[IllegalArgumentException] { JpegCodec.decode(color) }
    assert(ex2.getMessage.contains("SOF2"))
    // DRI ≠ 0 in progressive is rejected by name
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x02).map(_.toByte)
    val withDri = prog.take(sofAt) ++ dri ++ prog.drop(sofAt)
    val ex3 = intercept[IllegalArgumentException] {
      JpegCodec.decode(withDri) }
    assert(ex3.getMessage.contains("progressive"))
  }

  test("progressive COLOR decode equals sequential color bit-exactly") {
    val f = (x: Int, y: Int) =>
      ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 91 + y) % 256)
    for ((w, h) <- Seq((8, 8), (16, 16), (13, 11))) {
      val seq = JpegCodec.decode(JpegCodec.encodeColor(w, h, f, 90))
      val prog = JpegCodec.decode(JpegCodec.encodeProgressiveColor(w, h, f,
        90))
      assert(prog.width == w && prog.height == h)
      assert(prog.lumaSum3.toSeq == seq.lumaSum3.toSeq,
        s"progressive color drifted at ${w}x$h")
      // multiple AC bands deliver the same coefficients
      val banded = JpegCodec.decode(JpegCodec.encodeProgressiveColor(w, h,
        f, 90, bands = Seq((1, 2), (3, 20), (21, 63))))
      assert(banded.lumaSum3.toSeq == seq.lumaSum3.toSeq)
    }
    // fixture wrapper matches the sequential color fixture
    val src = "progressive color fixture".getBytes("US-ASCII")
    val viaProg = JpegCodec.decode(JpegCodec.progColorJpeg(8, 8, src))
    val viaSeq = JpegCodec.decode(JpegCodec.colorJpeg(8, 8, src))
    assert(viaProg.lumaSum3.toSeq == viaSeq.lumaSum3.toSeq)
  }

  test("progressive color fail-loud: subsampling, interleaved AC scans") {
    val f = (x: Int, y: Int) => (x * 30 % 256, y * 30 % 256, 128)
    val prog = JpegCodec.encodeProgressiveColor(8, 8, f, 90)
    // flip Y's sampling to 3×3 (not a supported geometry — 2×2 became
    // the progressive-4:2:0 FEATURE in r20): rejected by name
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc2).get
    val sub = prog.clone(); sub(sofAt + 11) = 0x33.toByte
    val ex = intercept[IllegalArgumentException] { JpegCodec.decode(sub) }
    assert(ex.getMessage.contains("unsupported progressive chroma"))
    // rewrite an AC scan header to claim 3 components: spec G.1.1
    // forbids interleaved AC scans — rejected by name.  The second SOS
    // is the first AC scan (header: FF DA len ns (cs tt)… Ss Se AhAl);
    // claiming ns=3 shifts Ss into the table bytes, so craft a full
    // 3-component header in place by splicing
    val sosAts = (0 until prog.length - 1).filter(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xda)
    val acSos = sosAts(1)
    val acLen = ((prog(acSos + 2) & 0xff) << 8) | (prog(acSos + 3) & 0xff)
    val ss = prog(acSos + 7) & 0xff
    val se = prog(acSos + 8) & 0xff
    val spliced = prog.take(acSos) ++
      Array(0xff, 0xda, 0x00, 12, 3, 1, 0x00, 2, 0x00, 3, 0x00, ss, se,
        0).map(_.toByte) ++ prog.drop(acSos + 2 + acLen)
    val ex2 = intercept[IllegalArgumentException] {
      JpegCodec.decode(spliced) }
    assert(ex2.getMessage.contains("single-component"))
    // truncation totality holds for the color container too
    for (n <- 2 until prog.length by 7) {
      intercept[IllegalArgumentException] {
        JpegCodec.decode(java.util.Arrays.copyOf(prog, n)) }
    }
  }

  test("unsupported subsampling geometries are rejected by name") {
    // craft: set Y's sampling to 3×1 / 1×2 / 4×2 — geometries the
    // decoder does not implement must be rejected, not silently
    // misparsed
    val enc = JpegCodec.encodeColor(8, 8,
      (x, y) => (x * 30 % 256, y * 30 % 256, 128), 90)
    val sofAt = (0 until enc.length - 1).find(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0).get
    // byte layout from the marker: FF C0 len(2) prec(1) h(2) w(2)
    // ncomp(1), then per comp (id, sampling, tq) — Y's sampling byte is
    // marker+11
    for (hv <- Seq(0x31, 0x12, 0x42)) {
      val bad = enc.clone(); bad(sofAt + 11) = hv.toByte
      val ex = intercept[IllegalArgumentException] { JpegCodec.decode(bad) }
      assert(ex.getMessage.contains("subsampling"), f"0x$hv%02x")
    }
  }

  test("4:2:2 and 4:1:1 round-trip: the broadcast and NTSC-DV shapes") {
    val f = (x: Int, y: Int) =>
      ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 91 + y) % 256)
    // horizontal-only downsampling: payload sizes order 444 > 422 > 411
    // on chroma-detailed content — at w ≥ 32 so the 4:1:1 MCU (32 px
    // wide) carries no padded luma blocks that would mask the saving
    val enc444 = JpegCodec.encodeColor(32, 16, f, 90)
    val enc422 = JpegCodec.encodeColor422(32, 16, f, 90)
    val enc411 = JpegCodec.encodeColor411(32, 16, f, 90)
    assert(enc422.length < enc444.length && enc411.length < enc422.length)
    for (enc <- Seq(enc422, enc411)) {
      val r = JpegCodec.decode(enc)
      assert(r.width == 32 && r.height == 16)
    }
    // gray content: uniform chroma survives any horizontal decimation,
    // so both geometries track the pure-gray path within rounding
    val g = (x: Int, y: Int) => (x * 16 + y * 8) % 256
    val viaGray = JpegCodec.decode(JpegCodec.encode(16, 16, g, 90))
    for (mk <- Seq(JpegCodec.encodeColor422 _, JpegCodec.encodeColor411 _)) {
      val via = JpegCodec.decode(
        mk(16, 16, (x, y) => (g(x, y), g(x, y), g(x, y)), 90, 0))
      for (i <- 0 until 256)
        assert(math.abs(via.lumaSum3(i) - viaGray.lumaSum3(i)) <= 6,
          s"gray-content drift at $i")
    }
    // uniform color: constant chroma planes downsample losslessly —
    // DC-only, so only the YCbCr round trip contributes (±1/channel)
    for (mk <- Seq(JpegCodec.encodeColor422 _, JpegCodec.encodeColor411 _)) {
      val u = JpegCodec.decode(mk(8, 8, (_, _) => (200, 30, 90), 95, 0))
      for (i <- 0 until 64)
        assert(math.abs(u.lumaSum3(i) - 320) <= 3, s"uniform err at $i")
    }
    // odd dims (partial MCUs: 4:1:1 MCU is 32 px wide) + restart compose
    val odd = JpegCodec.decode(JpegCodec.encodeColor411(13, 11, f, 90))
    assert(odd.width == 13 && odd.height == 11)
    val withRst = JpegCodec.decode(
      JpegCodec.encodeColor422(48, 16, f, 90, restartInterval = 2))
    val plain = JpegCodec.decode(JpegCodec.encodeColor422(48, 16, f, 90))
    assert(withRst.lumaSum3.toSeq == plain.lumaSum3.toSeq)
  }

  test("4:2:0 round-trips: luma crisp, chroma smeared but bounded") {
    val f = (x: Int, y: Int) =>
      ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 91 + y) % 256)
    val enc420 = JpegCodec.encodeColor420(16, 16, f, 90)
    val enc444 = JpegCodec.encodeColor(16, 16, f, 90)
    assert(enc420.length < enc444.length,
      "4:2:0 must be smaller than 4:4:4 on chroma-detailed content")
    val r = JpegCodec.decode(enc420)
    assert(r.width == 16 && r.height == 16)
    // gray-content 4:2:0 ≈ gray path exactly as 4:4:4 does (uniform
    // chroma planes survive downsampling unchanged)
    val g = (x: Int, y: Int) => (x * 16 + y * 8) % 256
    val via420 = JpegCodec.decode(JpegCodec.encodeColor420(16, 16,
      (x, y) => (g(x, y), g(x, y), g(x, y)), 90))
    val viaGray = JpegCodec.decode(JpegCodec.encode(16, 16, g, 90))
    for (i <- 0 until 256)
      assert(math.abs(via420.lumaSum3(i) - viaGray.lumaSum3(i)) <= 6,
        s"gray-content 4:2:0 drifted at $i")
    // uniform color: DC-only everywhere — downsampling a constant is
    // lossless, so the YCbCr round trip is the only error (±1/channel)
    val u = JpegCodec.decode(
      JpegCodec.encodeColor420(8, 8, (_, _) => (200, 30, 90), 95))
    for (i <- 0 until 64)
      assert(math.abs(u.lumaSum3(i) - 320) <= 3, s"uniform 420 err at $i")
    // odd dims exercise the padded-MCU + edge-replication path
    val odd = JpegCodec.decode(JpegCodec.encodeColor420(13, 11, f, 90))
    assert(odd.width == 13 && odd.height == 11)
    // restart intervals compose with 4:2:0 MCUs identically
    val withRst = JpegCodec.decode(
      JpegCodec.encodeColor420(48, 16, f, 90, restartInterval = 2))
    val plain = JpegCodec.decode(JpegCodec.encodeColor420(48, 16, f, 90))
    assert(withRst.lumaSum3.toSeq == plain.lumaSum3.toSeq)
  }
}
