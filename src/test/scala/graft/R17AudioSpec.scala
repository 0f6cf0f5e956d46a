package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AudioCodec

/** Lossy-audio codec fixtures — the R17JpegSpec discipline applied to
  * sound: G.711 μ-law/A-law companding carries a CLOSED-FORM
  * reconstruction bound (midpoint of a 2^(seg+3)-wide cell ⇒ |err| ≤
  * 2^(seg+2) ≤ 512), swept here over EVERY 16-bit sample value; IMA
  * ADPCM is adaptive (no closed form on adversarial input) but stores
  * each block's first sample VERBATIM — the exact anchor asserted per
  * block.  Fail-loud shapes for the new container forms round it out. */
class R17AudioSpec extends AnyFunSuite {

  test("G.711 μ-law: closed-form 512 bound over every 16-bit value") {
    var worst = 0
    var s = Short.MinValue.toInt
    while (s <= Short.MaxValue) {
      val d = AudioCodec.ulawDecode(AudioCodec.ulawEncode(s.toShort))
      val e = math.abs(d - s)
      if (e > worst) worst = e
      // the clip region [32635, 32767] adds at most 132 on top
      assert(e <= 512 + 132, s"ulaw err $e at $s")
      if (math.abs(s) <= 32635) assert(e <= 512, s"ulaw err $e at $s")
      s += 1
    }
    assert(worst > 256, "bound suspiciously slack — table broken?")
    // zero and sign behavior
    assert(AudioCodec.ulawDecode(AudioCodec.ulawEncode(0)) == 0)
    assert(AudioCodec.ulawDecode(AudioCodec.ulawEncode(-1000)) < 0)
    assert(AudioCodec.ulawDecode(AudioCodec.ulawEncode(1000)) > 0)
  }

  test("G.711 A-law: closed-form 512 bound over every 16-bit value") {
    var s = Short.MinValue.toInt
    while (s <= Short.MaxValue) {
      val d = AudioCodec.alawDecode(AudioCodec.alawEncode(s.toShort))
      val e = math.abs(d - s)
      assert(e <= 512, s"alaw err $e at $s")
      // the linear segment is 16-step quantized: |err| ≤ 8 below 256
      if (math.abs(s) < 256) assert(e <= 8, s"alaw linear err $e at $s")
      s += 1
    }
  }

  test("G.711 WAV containers round-trip through decodeWav") {
    val sig = Array.tabulate(300)(i =>
      (math.sin(i * 0.1) * 12000).toInt.toShort)
    for ((enc, tag) <- Seq(
        (AudioCodec.encodeWavUlaw(8000, sig), "ulaw"),
        (AudioCodec.encodeWavAlaw(8000, sig), "alaw"))) {
      val (rate, dec) = AudioCodec.decodeWav(enc)
      assert(rate == 8000 && dec.length == 300, tag)
      for (i <- sig.indices)
        assert(math.abs(dec(i) - sig(i)) <= 512, s"$tag sample $i")
    }
    // odd sample count exercises the RIFF pad byte
    val odd = AudioCodec.encodeWavUlaw(8000, sig.take(299))
    assert(odd.length % 2 == 0, "RIFF chunks must stay word-aligned")
    assert(AudioCodec.decodeWav(odd)._2.length == 299)
  }

  test("IMA ADPCM: block anchors exact, state tracks across blocks") {
    // > 1 block (505 samples/block at the 256-byte default align)
    val n = 1300
    val sig = Array.tabulate(n)(i =>
      (math.sin(i * 0.05) * 9000 + math.sin(i * 0.31) * 2500).toInt.toShort)
    val enc = AudioCodec.encodeWavAdpcm(44100, sig)
    val (rate, dec) = AudioCodec.decodeWav(enc)
    assert(rate == 44100)
    assert(dec.length == n, "fact chunk must trim the padded tail")
    val spb = AudioCodec.imaSamplesPerBlock(256)
    // every block-start sample is stored verbatim in the block header
    for (b <- 0 until (n + spb - 1) / spb)
      assert(dec(b * spb) == sig(b * spb), s"block $b anchor")
    // a smooth signal tracks away from anchors too: slope ≤ ~1200/sample
    // ⇒ step adapts to ~1500, transient crest error a few×step — a
    // dynamics sanity gauge, not a closed form
    var worst = 0
    for (i <- sig.indices) worst = math.max(worst, math.abs(dec(i) - sig(i)))
    assert(worst <= 6000, s"smooth-signal ADPCM err $worst")
    // single-sample file: one block, header-only content
    val one = AudioCodec.decodeWav(
      AudioCodec.encodeWavAdpcm(8000, Array(1234.toShort)))._2
    assert(one.toSeq == Seq(1234.toShort))
    // custom block align changes the geometry, not the anchors
    val enc64 = AudioCodec.encodeWavAdpcm(8000, sig, blockAlign = 64)
    val dec64 = AudioCodec.decodeWav(enc64)._2
    assert(dec64.length == n)
    val spb64 = AudioCodec.imaSamplesPerBlock(64)
    for (b <- 0 until (n + spb64 - 1) / spb64)
      assert(dec64(b * spb64) == sig(b * spb64), s"align-64 block $b anchor")
  }

  test("PCM breadth: stereo downmix, 8-bit expansion, 24-bit truncation") {
    val sig = Array.tabulate(200)(i =>
      (math.sin(i * 0.07) * 11000).toInt.toShort)
    // identical channels: downmix == mono exactly
    val (r1, d1) = AudioCodec.decodeWav(
      AudioCodec.encodeWavStereo(48000, sig, sig))
    assert(r1 == 48000 && d1.toSeq == sig.toSeq)
    // distinct channels: (L + R) >> 1 floor semantics, incl. negatives
    val left = Array[Short](100, -101, 32767, -32768)
    val right = Array[Short](201, -100, 32767, -32768)
    val d2 = AudioCodec.decodeWav(
      AudioCodec.encodeWavStereo(8000, left, right))._2
    assert(d2.toSeq == Seq[Short](150, -101, 32767, -32768),
      s"downmix ${d2.toSeq}")
    // 8-bit: exact on 256-multiples, quantized otherwise
    val coarse = sig.map(s => ((s >> 8) << 8).toShort)
    val d3 = AudioCodec.decodeWav(AudioCodec.encodeWav8(8000, coarse))._2
    assert(d3.toSeq == coarse.toSeq)
    // 24-bit: top-16 truncation recovers sig when encoded as s << 8
    val d4 = AudioCodec.decodeWav(
      AudioCodec.encodeWav24(96000, sig.map(_.toInt << 8)))._2
    assert(d4.toSeq == sig.toSeq)
    // negative 24-bit values sign-extend correctly
    val d5 = AudioCodec.decodeWav(AudioCodec.encodeWav24(8000,
      Array(-(1 << 23), (1 << 23) - 1, -256, 255)))._2
    assert(d5.toSeq == Seq[Short](-32768, 32767, -1, 0))
  }

  test("fail-loud shapes: bad tags, bit depths, corrupt ADPCM headers") {
    val sig = Array.tabulate(64)(i => (i * 100).toShort)
    val pcm = AudioCodec.encodeWav(8000, sig)
    // unsupported format tag (2 = MS ADPCM) named in the error
    val badTag = pcm.clone(); badTag(20) = 2
    val e1 = intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(badTag) }
    assert(e1.getMessage.contains("format tag"))
    // G.711 must be 8-bit: lie about the bit depth
    val ulaw = AudioCodec.encodeWavUlaw(8000, sig)
    val badBits = ulaw.clone(); badBits(34) = 16
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(badBits) }.getMessage.contains("8 bits"))
    // ADPCM: step index out of range fails loudly
    val adpcm = AudioCodec.encodeWavAdpcm(8000, sig)
    val badIdx = adpcm.clone(); badIdx(60 + 2) = 100
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(badIdx) }.getMessage.contains("step index"))
    // ADPCM: samplesPerBlock inconsistent with blockAlign
    val badSpb = adpcm.clone(); badSpb(38) = 7
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(badSpb) }.getMessage.contains("samplesPerBlock"))
    // ADPCM: data not a whole number of blocks
    val shortData = java.util.Arrays.copyOf(adpcm, adpcm.length - 4)
    // shrink the data chunk length field to match the truncation
    val dataLenOff = 56 // RIFF(12)+fmt(28)+fact(12)+"data"(4)
    val newLen = 256 - 4
    shortData(dataLenOff) = (newLen & 0xff).toByte
    shortData(dataLenOff + 1) = ((newLen >> 8) & 0xff).toByte
    // RIFF size field too
    val riffLen = shortData.length - 8
    shortData(4) = (riffLen & 0xff).toByte
    shortData(5) = ((riffLen >> 8) & 0xff).toByte
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(shortData) }.getMessage.contains("blocks"))
  }
}
