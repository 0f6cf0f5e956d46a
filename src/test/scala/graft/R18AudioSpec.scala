package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AudioCodec, FlacCodec}

/** Round-18 audio follow-ons: FLAC wasted bits (the spec's
  * quiet-content form) and WAVE_FORMAT_EXTENSIBLE (how modern WAV
  * writers wrap PCM). */
class R18AudioSpec extends AnyFunSuite {

  private def sine(n: Int): Array[Short] =
    Array.tabulate(n)(i => (9000 * math.sin(i / 11.0)).toInt.toShort)

  test("FLAC wasted bits: x256 content shrinks ~8 bits/sample and " +
      "round-trips bit-exactly") {
    // every sample a multiple of 256 => 8 common trailing zero bits
    val sig = Array.tabulate[Short](1000)(i =>
      (((i * 37 + 11) % 200 - 100) * 256).toShort)
    val plain = FlacCodec.encode(44100, sig, blockSize = 256)
    val wastedF = FlacCodec.encode(44100, sig, blockSize = 256,
      detectWasted = true)
    assert(FlacCodec.decode(wastedF)._2.toSeq == sig.toSeq)
    assert(wastedF.length < plain.length - 500,
      s"wasted-bits coding should shrink x256 content: " +
        s"${wastedF.length} vs ${plain.length}")
    // LPC + wasted together
    val wastedL = FlacCodec.encode(44100, sig, blockSize = 256,
      lpcOrder = 8, detectWasted = true)
    assert(FlacCodec.decode(wastedL)._2.toSeq == sig.toSeq)
    // odd samples => no wasted bits, stream decodes identically
    val odd = Array.tabulate[Short](300)(i => (2 * i + 1).toShort)
    assert(FlacCodec.decode(FlacCodec.encode(8000, odd,
      detectWasted = true))._2.toSeq == odd.toSeq)
    // stereo with wasted side/mid channels, every mode
    val l = Array.tabulate[Short](500)(i => ((i % 50) * 512).toShort)
    val r = Array.tabulate[Short](500)(i => ((i % 50) * 512 + 256).toShort)
    for (mode <- Seq("lr", "ls", "rs", "ms", "auto")) {
      val (_, dl, dr) = FlacCodec.decodeStereo(FlacCodec.encodeStereo(
        8000, l, r, mode = mode, detectWasted = true))
      assert(dl.toSeq == l.toSeq && dr.toSeq == r.toSeq, s"mode=$mode")
    }
  }

  test("WAVE_FORMAT_EXTENSIBLE wraps PCM: mono and stereo decode") {
    val mono = sine(300)
    val (rate, s) = AudioCodec.decodeAudio(
      AudioCodec.encodeWavExtensible(16000, 1, mono))
    assert(rate == 16000 && s.toSeq == mono.toSeq)
    // stereo: the (L+R)>>1 downmix convention
    val l = sine(200)
    val r = Array.tabulate[Short](200)(i => (l(i) / 2 + 100).toShort)
    val inter = new Array[Short](400)
    for (i <- 0 until 200) { inter(2 * i) = l(i); inter(2 * i + 1) = r(i) }
    val (_, st) = AudioCodec.decodeAudio(
      AudioCodec.encodeWavExtensible(16000, 2, inter))
    assert(st.length == 200)
    for (i <- 0 until 200)
      assert(st(i) == ((l(i) + r(i)) >> 1).toShort, s"i=$i")
  }

  test("AU and AIFF round-trip; stereo downmixes; fail-loud shapes") {
    val sig = sine(300)
    val (ar, as) = AudioCodec.decodeAudio(AudioCodec.encodeAu(8000, sig))
    assert(ar == 8000 && as.toSeq == sig.toSeq)
    val (fr, fs) = AudioCodec.decodeAudio(AudioCodec.encodeAiff(8000, sig))
    assert(fr == 8000 && fs.toSeq == sig.toSeq)
    // μ-law AU decodes through the shared G.711 tables: encode's codes
    // must invert to the table midpoints
    val (_, us) = AudioCodec.decodeAu(AudioCodec.encodeAu(8000, sig,
      ulaw = true))
    for (i <- sig.indices)
      assert(us(i) == AudioCodec.ulawDecode(AudioCodec.ulawEncode(sig(i))))
    // fail-loud: bad magic, unsupported encoding, truncation
    intercept[IllegalArgumentException] {
      AudioCodec.decodeAu("snd.".getBytes("US-ASCII") ++
        new Array[Byte](20)) }
    val badEnc = AudioCodec.encodeAu(8000, sig).clone()
    badEnc(15) = 2 // 8-bit linear PCM: unsupported by name
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAu(badEnc) }.getMessage.contains("encoding"))
    val okAiff = AudioCodec.encodeAiff(8000, sig)
    for (n <- Seq(10, 40, okAiff.length - 3)) {
      intercept[IllegalArgumentException] {
        AudioCodec.decodeAiff(java.util.Arrays.copyOf(okAiff, n)) }
    }
    // 24-bit AIFF rejected by name (patch COMM sampleSize at 12+8+6)
    val bad24 = okAiff.clone(); bad24(12 + 8 + 7) = 24
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAiff(bad24) }.getMessage.contains("16-bit"))
    // crafted near-2^31 lengths must fail the (subtraction-form) bound
    // checks, not wrap Int arithmetic into out-of-bounds reads
    val hugeChunk = okAiff.clone() // COMM length at offset 16 (BE)
    hugeChunk(16) = 0x7f.toByte; hugeChunk(17) = 0xff.toByte
    hugeChunk(18) = 0xff.toByte; hugeChunk(19) = 0xf0.toByte
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAiff(hugeChunk) }.getMessage.contains("truncated"))
    val okAu = AudioCodec.encodeAu(8000, sig)
    val hugeAu = okAu.clone() // data size at offset 8 (BE)
    hugeAu(8) = 0x7f.toByte; hugeAu(9) = 0xff.toByte
    hugeAu(10) = 0xff.toByte; hugeAu(11) = 0xf0.toByte
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAu(hugeAu) }.getMessage.contains("truncated"))
    // crafted frame count: COMM numSampleFrames at 12+8+2 (BE)
    val hugeFrames = okAiff.clone()
    hugeFrames(22) = 0x40.toByte
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAiff(hugeFrames) }.getMessage.contains("frame"))
  }

  test("EXTENSIBLE fail-loud: bad GUID, non-PCM sub-format, padded " +
      "containers") {
    val ok = AudioCodec.encodeWavExtensible(16000, 1, sine(64))
    // fmt chunk data starts at offset 20; GUID tail begins at 20+26
    val badGuid = ok.clone(); badGuid(20 + 30) = 0x55
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAudio(badGuid) }.getMessage.contains("GUID"))
    // sub-format 3 (IEEE float) at the GUID's first 16 bits
    val badSub = ok.clone(); badSub(20 + 24) = 3
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAudio(badSub) }.getMessage.contains("sub-format"))
    // validBits 12 != container 16: padded containers unsupported
    val badValid = ok.clone(); badValid(20 + 18) = 12
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeAudio(badValid) }.getMessage.contains("validBits"))
  }
}
