package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FlacCodec

/** FLAC fixed-predictor-subset fixtures — the lossless compressed audio
  * container (the PNG discipline for sound): bit-exact round trips
  * across block sizes and signal shapes, the MD5 stream anchor, CRC-8/
  * CRC-16 corruption detection, multi-byte UTF-8 frame numbers, and
  * fail-loud rejection of the out-of-subset shapes (LPC, stereo). */
class R17FlacSpec extends AnyFunSuite {

  private def sine(n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (math.sin(i * 0.05) * 9000 + math.sin(i * 0.31) * 2500).toInt.toShort)

  test("bit-exact round trip across block sizes and signal shapes") {
    val shapes = Seq(
      sine(1000),                                        // smooth
      Array.tabulate(1000)(i =>
        (((i * 2654435761L >> 11) & 0xffff) - 32768).toShort), // noise
      Array.fill(1000)(1234.toShort),                    // constant
      Array.tabulate(1000)(i => (i * 13 - 6500).toShort), // linear ramp
      Array.tabulate(40)(i => (i * 1000 - 20000).toShort)) // short
    for (sig <- shapes; bs <- Seq(64, 256, 333)) {
      val enc = FlacCodec.encode(44100, sig, blockSize = bs)
      val (rate, dec) = FlacCodec.decode(enc)
      assert(rate == 44100)
      assert(dec.toSeq == sig.toSeq, s"n=${sig.length} bs=$bs")
    }
    // Short extremes survive the sign handling
    val ext = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1,
      Short.MinValue, Short.MaxValue) ++ sine(100)
    assert(FlacCodec.decode(FlacCodec.encode(8000, ext))._2.toSeq ==
      ext.toSeq)
  }

  test("compression is real: smooth signals beat raw PCM; constant tiny") {
    val smooth = sine(4000)
    val enc = FlacCodec.encode(44100, smooth)
    assert(enc.length < smooth.length * 2,
      s"FLAC ${enc.length} vs raw ${smooth.length * 2}")
    val const = FlacCodec.encode(44100, Array.fill(4000)(77.toShort))
    assert(const.length < 300, s"constant blocks should be tiny: ${const.length}")
  }

  test("multi-byte UTF-8 frame numbers: > 127 frames round-trip") {
    // 150 frames of 16 samples: frame numbers cross the 1-byte limit
    val sig = sine(2400)
    val enc = FlacCodec.encode(8000, sig, blockSize = 16)
    assert(FlacCodec.decode(enc)._2.toSeq == sig.toSeq)
  }

  test("LPC subframes: bit-exact round trips across orders and shapes") {
    val shapes = Seq(
      sine(1500),
      Array.tabulate(1500)(i =>
        (((i * 2654435761L >> 11) & 0xffff) - 32768).toShort), // noise
      Array.tabulate(1500)(i => (i * 13 - 9000).toShort),      // ramp
      Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1) ++
        sine(200))                                             // extremes
    for (sig <- shapes; order <- Seq(1, 2, 8, 32)) {
      val enc = FlacCodec.encode(44100, sig, blockSize = 256,
        lpcOrder = order)
      val (_, dec) = FlacCodec.decode(enc)
      assert(dec.toSeq == sig.toSeq, s"n=${sig.length} order=$order")
    }
    // LPC genuinely predicts: on an AR(2) process whose poles sit far
    // from the difference-filter zeros (fixed predictors are the
    // (1−z⁻¹)^k filters), order-8 LPC must beat the fixed encode —
    // on pure sines fixed-4 is already near-optimal, so THIS is the
    // signal class LPC exists for
    val ar = {
      val x = new Array[Short](4000)
      var a = 1000.0; var b = 0.0
      for (i <- 0 until 4000) {
        val noise = (((i * 2654435761L >> 13) & 0xff) - 128).toDouble * 4
        val v = 1.6 * a - 0.89 * b + noise
        b = a; a = v
        x(i) = math.max(-30000, math.min(30000, v)).toInt.toShort
      }
      x
    }
    val lpc = FlacCodec.encode(44100, ar, lpcOrder = 8)
    val fixed = FlacCodec.encode(44100, ar)
    assert(lpc.length < ar.length * 2)
    assert(lpc.length < fixed.length,
      s"order-8 LPC (${lpc.length}) should beat fixed (${fixed.length})" +
        " on an AR(2) signal")
    // the fixture wrapper exposes the LPC policy
    val src = "lpc fixture".getBytes("US-ASCII")
    val viaLpc = FlacCodec.decode(
      FlacCodec.flacFromBytes(16000, 256, src, lpcOrder = 8))._2
    val viaFixed = FlacCodec.decode(
      FlacCodec.flacFromBytes(16000, 256, src))._2
    assert(viaLpc.toSeq == viaFixed.toSeq)
    // negative LPC shift is rejected by name: craft by flipping the
    // shift field's top bit in a 1-frame stream — easier via encode of
    // a tiny block then bit surgery is brittle; instead assert the
    // decoder's guard directly through a corrupt-byte sweep: every
    // single-byte corruption of an LPC stream stays controlled
    val ok = FlacCodec.encode(8000, sine(300), blockSize = 256,
      lpcOrder = 4)
    for (p <- 42 until ok.length by 5; bit <- Seq(0, 7)) {
      val bad = ok.clone(); bad(p) = (bad(p) ^ (1 << bit)).toByte
      try { FlacCodec.decode(bad); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("fixture signal matches the WAV fixture map") {
    val src = "flac container fixture".getBytes("US-ASCII")
    val (rate, dec) = FlacCodec.decode(
      FlacCodec.flacFromBytes(16000, 256, src))
    assert(rate == 16000 && dec.length == 256)
    for (i <- 0 until 256)
      assert(dec(i) == ((src((i * 7 + 3) % src.length) & 0xff) - 76) * 256)
  }

  test("corruption fails loudly: header CRC-8, frame CRC-16, MD5, magic") {
    val sig = sine(600)
    val ok = FlacCodec.encode(22050, sig, blockSize = 128)
    // magic
    val badMagic = ok.clone(); badMagic(0) = 'g'
    assert(intercept[IllegalArgumentException] {
      FlacCodec.decode(badMagic) }.getMessage.contains("magic"))
    // find the first frame: metadata is 4 + 4 + 34 bytes
    val frame0 = 42
    assert((ok(frame0) & 0xff) == 0xff && (ok(frame0 + 1) & 0xf8) == 0xf8,
      "frame sync not where expected")
    // flip a header byte (block size field) -> CRC-8 catches it
    val badHdr = ok.clone(); badHdr(frame0 + 5) = (badHdr(frame0 + 5) ^ 1).toByte
    val e1 = intercept[IllegalArgumentException] {
      FlacCodec.decode(badHdr) }
    assert(e1.getMessage.contains("CRC") || e1.getMessage.contains("sync") ||
      e1.getMessage.contains("frame"), e1.getMessage)
    // flip a residual byte mid-frame -> CRC-16 (or a structural check)
    val badBody = ok.clone()
    badBody(frame0 + 20) = (badBody(frame0 + 20) ^ 0x10).toByte
    val e2 = intercept[IllegalArgumentException] {
      FlacCodec.decode(badBody) }
    assert(e2.getMessage.nonEmpty)
    // every single-byte truncation is controlled
    for (n <- 4 until ok.length by 3) {
      intercept[IllegalArgumentException] {
        FlacCodec.decode(java.util.Arrays.copyOf(ok, n)) }
    }
  }

  test("out-of-subset shapes are rejected by name") {
    val ok = FlacCodec.encode(8000, sine(64), blockSize = 64)
    // claim 3 channels in STREAMINFO (channels-1 lives in bits 3..1 of
    // byte 12 of the 34-byte block at offset 8) — r18 supports stereo,
    // so the by-name rejection moves to >2 channels
    val surround = ok.clone()
    surround(8 + 12) = (surround(8 + 12) | 0x04).toByte
    assert(intercept[IllegalArgumentException] {
      FlacCodec.decode(surround) }.getMessage.contains("mono/stereo"))
    // a STREAMINFO claiming stereo over mono frames is a channel-
    // assignment mismatch the frame parser catches
    val stereoClaim = ok.clone()
    stereoClaim(8 + 12) = (stereoClaim(8 + 12) | 0x02).toByte
    assert(intercept[IllegalArgumentException] {
      FlacCodec.decode(stereoClaim) }.getMessage.contains("assignment"))
  }
}
