package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AudioCodec

/** Hand-fixture checks for the real PCM WAV codec (the corpus-level check
  * is the mm_wav_* oracle pair, whose envelope the DuckDB side recomputes
  * from the source text, never the bytes): chunk-walk correctness,
  * unknown-chunk skipping with word alignment, sign-preserving 16-bit
  * reads, fail-loud unsupported shapes, frame pooling. */
class R16WavSpec extends AnyFunSuite {

  test("encode/decode round-trips samples incl. negative + extremes") {
    val s = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 300,
      -300)
    val bytes = AudioCodec.encodeWav(8000, s)
    assert(bytes.length == 44 + 14)
    val (rate, out) = AudioCodec.decodeWav(bytes)
    assert(rate == 8000 && out.toSeq == s.toSeq)
  }

  test("unknown chunks (LIST) before data are skipped with word alignment") {
    val base = AudioCodec.encodeWav(16000, Array[Short](5, -5, 7))
    // splice an odd-length LIST chunk between fmt and data: 3-byte body
    // must be padded to 4 in the walk
    val head = base.slice(0, 36)          // RIFF..fmt chunk end
    val tail = base.slice(36, base.length) // data chunk
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // len=3 + pad byte
    val spliced = head ++ list ++ tail
    // fix the RIFF size field (bytes 4..7) to cover the splice
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate, out) = AudioCodec.decodeWav(spliced)
    assert(rate == 16000 && out.toSeq == Seq[Short](5, -5, 7))
  }

  test("unsupported shapes fail loudly, never misread") {
    val ok = AudioCodec.encodeWav(8000, Array[Short](1, 2, 3, 4))
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav("OggS....".getBytes("US-ASCII") ++
        new Array[Byte](40)) }
    // stereo and 8-bit are SUPPORTED shapes since r17 — but a crafted
    // flip of just the channel/depth field leaves the block align
    // inconsistent with the claimed frame size, and re-slicing the data
    // under the new layout would be a silent misread: the consistency
    // check must reject both
    val stereo = ok.clone(); stereo(22) = 2
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(stereo) }.getMessage.contains("block align"))
    val eightBit = ok.clone(); eightBit(34) = 8
    assert(intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(eightBit) }.getMessage.contains("block align"))
    val floatFmt = ok.clone(); floatFmt(20) = 3 // IEEE float tag
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(floatFmt) }
    intercept[IllegalArgumentException] {       // truncated data chunk
      AudioCodec.decodeWav(ok.dropRight(3)) }
  }

  test("frame-energy kernel: exact means, floor-boundary pooling") {
    // 6 samples, 2 frames: |.|-means (1+2+3)/3=2 and (4+5+6)/3=5
    val wav = AudioCodec.encodeWav(8000,
      Array[Short](1, -2, 3, -4, 5, -6))
    val f = AudioCodec.kernel(2)(9L, wav)
    assert(f.doc_id == 9L && f.sample_rate == 8000 && f.n_samples == 6L)
    assert(f.features.toSeq == Seq(2.0, 5.0))
    // 4 frames over 6 samples: floor boundaries 0,1,3,4,6
    val f4 = AudioCodec.kernel(4)(9L, wav)
    assert(f4.features.toSeq == Seq(1.0, 2.5, 4.0, 5.5))
  }

  test("deterministic signal generator matches its documented formula") {
    val src = "abc".getBytes("UTF-8")
    val wav = AudioCodec.wavFromBytes(16000, 5, src)
    val (_, s) = AudioCodec.decodeWav(wav)
    val expect = (0 until 5).map(i =>
      (((src((i * 7 + 3) % 3) & 0xff) - 76) * 256).toShort)
    assert(s.toSeq == expect)
  }
}
