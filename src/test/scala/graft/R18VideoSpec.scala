package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VideoCodec

/** Round-18: Y4M (YUV4MPEG2) — the tier's first VIDEO container.
  * Luma planes must round-trip byte-exactly per frame under every
  * chroma tag (the tag only changes the plane sizes the decoder has to
  * walk), and malformed streams stay fail-loud. */
class R18VideoSpec extends AnyFunSuite {

  private def frame(f: Int)(x: Int, y: Int): Int =
    (x * 13 + y * 29 + f * 41 + 5) % 256

  test("luma round-trips per frame under mono/420/444 chroma") {
    val frames = (0 until 4).map(f => frame(f) _)
    for (chroma <- Seq("mono", "420", "444")) {
      val dec = VideoCodec.decodeY4mFrames(
        VideoCodec.encodeY4m(10, 8, frames, chroma = chroma))
      assert(dec.length == 4, chroma)
      for (f <- 0 until 4; y <- 0 until 8; x <- 0 until 10)
        assert(dec(f).lumaSum3(y * 10 + x) == 3 * frame(f)(x, y),
          s"$chroma f=$f ($x,$y)")
    }
    // C420 spec variants parse to the same plane geometry (byte splice,
    // NOT a String round trip — that would mangle plane bytes >= 0x80)
    val enc = VideoCodec.encodeY4m(10, 8, frames, chroma = "420")
    val idx = new String(enc.take(64), "ISO-8859-1").indexOf("C420jpeg")
    assert(idx > 0)
    val v2 = enc.take(idx) ++ "C420mpeg2".getBytes("US-ASCII") ++
      enc.drop(idx + 8)
    assert(VideoCodec.decodeY4mFrames(v2)
      .head.lumaSum3.toSeq == VideoCodec.decodeY4mFrames(enc)
      .head.lumaSum3.toSeq)
  }

  test("fail-loud: bad magic, interlaced, odd C420 dims, truncation, " +
      "unknown chroma") {
    val frames = Seq(frame(0) _)
    intercept[IllegalArgumentException] {
      VideoCodec.encodeY4m(9, 8, frames, chroma = "420") } // odd width
    intercept[IllegalArgumentException] {
      VideoCodec.encodeY4m(8, 8, frames, chroma = "410") }
    val ok = VideoCodec.encodeY4m(8, 8, frames, chroma = "444")
    val badMagic = ok.clone(); badMagic(0) = 'X'
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(badMagic) }.getMessage.contains("magic"))
    // It is a FEATURE since r20 (field-split de-interlace: one stored
    // picture → two half-height fields); Im stays fail-loud by name
    val interlaced = new String(ok, "US-ASCII").replaceFirst("Ip", "It")
    assert(VideoCodec.decodeY4mFrames(interlaced.getBytes("US-ASCII"))
      .map(r => (r.width, r.height)) == Seq((8, 4), (8, 4)))
    val mixed = new String(ok, "US-ASCII").replaceFirst("Ip", "Im")
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(mixed.getBytes("US-ASCII")) }
      .getMessage.contains("Im unsupported"))
    val badChroma = new String(ok, "US-ASCII").replaceFirst("C444", "C410")
    assert(intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(badChroma.getBytes("US-ASCII")) }
      .getMessage.contains("chroma"))
    // every truncation is controlled (a chroma-size slip would
    // desynchronize the FRAME marker — also IllegalArgumentException)
    for (n <- Seq(5, 20, ok.length - 1, ok.length - 100)) {
      intercept[IllegalArgumentException] {
        VideoCodec.decodeY4mFrames(java.util.Arrays.copyOf(ok, n)) }
    }
    // a stream whose chroma tag lies about the plane sizes fails at
    // the next frame marker instead of silently misreading
    val two = VideoCodec.encodeY4m(8, 8, Seq(frame(0) _, frame(1) _),
      chroma = "444")
    val lied = new String(two, "US-ASCII").replaceFirst("C444", "C420")
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(lied.getBytes("US-ASCII")) }
  }
}
