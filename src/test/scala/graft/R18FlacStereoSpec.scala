package graft

import graft.ops.FlacCodec
import org.scalatest.funsuite.AnyFunSuite

/** Round-18: stereo FLAC — all four spec channel assignments
  * (independent L/R plus the L/S, R/S, M/S decorrelation modes with
  * 17-bit side subframes) must round-trip BIT-EXACTLY, in FIXED and
  * LPC subframes, including the ±32767/∓32768 extremes where the side
  * channel needs its 17th bit.  Lossless means mode choice affects
  * only size, never samples — asserted by decoding every mode to the
  * same PCM. */
class R18FlacStereoSpec extends AnyFunSuite {

  private def sineL(n: Int): Array[Short] =
    Array.tabulate(n)(i => (8000 * math.sin(i / 13.0)).toInt.toShort)
  private def sineR(n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (7000 * math.sin(i / 13.0 + 0.2) + 500 * math.cos(i / 3.0))
        .toInt.toShort)

  test("every stereo mode round-trips bit-exactly (FIXED and LPC)") {
    val l = sineL(700); val r = sineR(700) // non-multiple of blockSize
    for (mode <- Seq("lr", "ls", "rs", "ms", "auto");
         lpc <- Seq(0, 8)) {
      val enc = FlacCodec.encodeStereo(44100, l, r, blockSize = 256,
        mode = mode, lpcOrder = lpc)
      val (rate, dl, dr) = FlacCodec.decodeStereo(enc)
      assert(rate == 44100, s"mode=$mode lpc=$lpc")
      assert(dl.toSeq == l.toSeq, s"left mismatch mode=$mode lpc=$lpc")
      assert(dr.toSeq == r.toSeq, s"right mismatch mode=$mode lpc=$lpc")
    }
  }

  test("decorrelation saves bytes on correlated channels") {
    // R tracks L closely: the side channel is small, so ls/ms beat lr
    val l = sineL(4000)
    val r = Array.tabulate(4000)(i => (l(i) + (i % 7) - 3).toShort)
    val lr = FlacCodec.encodeStereo(44100, l, r, mode = "lr").length
    val ls = FlacCodec.encodeStereo(44100, l, r, mode = "ls").length
    val auto = FlacCodec.encodeStereo(44100, l, r, mode = "auto").length
    assert(ls < lr, s"side coding should shrink correlated stereo: $ls vs $lr")
    assert(auto <= lr, s"auto must not lose to lr: $auto vs $lr")
  }

  test("17-bit side extremes round-trip (L=-32768, R=32767)") {
    // side = L-R = -65535 needs all 17 bits; mid = -1
    val l = Array.fill[Short](64)(Short.MinValue)
    val r = Array.fill[Short](64)(Short.MaxValue)
    for (mode <- Seq("ls", "rs", "ms")) {
      val (_, dl, dr) = FlacCodec.decodeStereo(
        FlacCodec.encodeStereo(8000, l, r, blockSize = 16, mode = mode))
      assert(dl.toSeq == l.toSeq && dr.toSeq == r.toSeq, s"mode=$mode")
    }
    // alternating extremes defeat CONSTANT and stress every predictor
    val l2 = Array.tabulate[Short](128)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue)
    val r2 = Array.tabulate[Short](128)(i =>
      if (i % 3 == 0) Short.MaxValue else Short.MinValue)
    for (mode <- Seq("lr", "ls", "rs", "ms"); lpc <- Seq(0, 4)) {
      val (_, dl, dr) = FlacCodec.decodeStereo(FlacCodec.encodeStereo(
        8000, l2, r2, blockSize = 32, mode = mode, lpcOrder = lpc))
      assert(dl.toSeq == l2.toSeq && dr.toSeq == r2.toSeq,
        s"mode=$mode lpc=$lpc")
    }
  }

  test("forced modes write their spec channel-assignment codes") {
    val l = sineL(256); val r = sineR(256)
    // frame header: byte 3 of the frame = [chan(4) | ss(3) | res(1)];
    // first frame starts right after the 42-byte fLaC+STREAMINFO
    def chanCode(mode: String): Int = {
      val enc = FlacCodec.encodeStereo(8000, l, r, blockSize = 256,
        mode = mode)
      (enc(42 + 3) & 0xf0) >> 4
    }
    assert(chanCode("lr") == 1)
    assert(chanCode("ls") == 8)
    assert(chanCode("rs") == 9)
    assert(chanCode("ms") == 10)
  }

  test("decode downmixes stereo (L+R)>>1 — the AudioCodec convention") {
    val l = sineL(300); val r = sineR(300)
    val (_, mono) = FlacCodec.decode(
      FlacCodec.encodeStereo(16000, l, r, mode = "ms"))
    assert(mono.length == 300)
    for (i <- 0 until 300)
      assert(mono(i) == ((l(i) + r(i)) >> 1).toShort, s"i=$i")
    // and the audio dispatch sees the same thing
    val (_, viaDispatch) = graft.ops.AudioCodec.decodeAudio(
      FlacCodec.encodeStereo(16000, l, r, mode = "auto"))
    assert(viaDispatch.toSeq == mono.toSeq)
  }

  test("fail-loud shapes: bad args and corrupted stereo streams") {
    val l = sineL(64); val r = sineR(64)
    intercept[IllegalArgumentException] {
      FlacCodec.encodeStereo(8000, l, r.take(63), blockSize = 16) }
    intercept[IllegalArgumentException] {
      FlacCodec.encodeStereo(8000, l, r, mode = "xy") }
    intercept[IllegalArgumentException] {
      FlacCodec.decodeStereo(FlacCodec.encode(8000, l, blockSize = 16)) }
    // single-byte corruption of a stereo LPC stream stays controlled
    val ok = FlacCodec.encodeStereo(8000, sineL(300), sineR(300),
      blockSize = 256, mode = "auto", lpcOrder = 4)
    for (p <- 42 until ok.length by 5; bit <- Seq(0, 7)) {
      val bad = ok.clone(); bad(p) = (bad(p) ^ (1 << bit)).toByte
      try { FlacCodec.decode(bad); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
