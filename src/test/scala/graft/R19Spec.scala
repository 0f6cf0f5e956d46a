package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, VideoCodec}

/** Round-19: Y4M C422/C411 chroma, and GIF disposal-method
  * compositing (partial frames, GIF89a §23). */
class R19Spec extends AnyFunSuite {

  private def frame(f: Int)(x: Int, y: Int): Int =
    (x * 13 + y * 29 + f * 41 + 5) % 256

  test("luma round-trips under C422 and C411 chroma") {
    val frames = (0 until 3).map(f => frame(f) _)
    for (chroma <- Seq("422", "411")) {
      val dec = VideoCodec.decodeY4mFrames(
        VideoCodec.encodeY4m(12, 7, frames, chroma = chroma))
      assert(dec.length == 3, chroma)
      for (f <- 0 until 3; y <- 0 until 7; x <- 0 until 12)
        assert(dec(f).lumaSum3(y * 12 + x) == 3 * frame(f)(x, y),
          s"$chroma f=$f ($x,$y)")
    }
    // C422 carries HALF-WIDTH FULL-HEIGHT planes — sizes differ from
    // both 420 and 444, so a tag lie desynchronizes the frame walk
    val two = VideoCodec.encodeY4m(8, 8, frames.take(2), chroma = "422")
    val lie420 = new String(two, "ISO-8859-1").replaceFirst("C422", "C420")
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4mFrames(lie420.getBytes("ISO-8859-1")) }
    // dim grammar: C422 needs even width, C411 width % 4
    intercept[IllegalArgumentException] {
      VideoCodec.encodeY4m(9, 8, frames, chroma = "422") }
    intercept[IllegalArgumentException] {
      VideoCodec.encodeY4m(10, 8, frames, chroma = "411") }
  }

  test("C411 plane sizes: container length is exact") {
    val frames = Seq(frame(0) _)
    val w = 16; val h = 4
    val enc411 = VideoCodec.encodeY4m(w, h, frames, chroma = "411")
    val encMono = VideoCodec.encodeY4m(w, h, frames, chroma = "mono")
    // same header length up to the tag name (C411 vs Cmono: 4 vs 5
    // chars), same luma; 411 adds 2 quarter-width full-height planes
    val cPlanes = 2 * (w / 4) * h
    assert(enc411.length == encMono.length - 1 + cPlanes)
  }

  // reference composite: apply the GIF89a disposal + transparency
  // model directly
  private def referenceComposite(w: Int, h: Int,
      frames: Seq[ImageCodec.GifFrame], bg: Int): Seq[Array[Int]] = {
    val canvas = Array.fill(w * h)(bg)
    frames.map { f =>
      val before = canvas.clone()
      for (v <- 0 until f.h; u <- 0 until f.w
           if !f.transparent.contains(f.px(u, v)))
        canvas((f.top + v) * w + f.left + u) = f.px(u, v)
      val shown = canvas.clone()
      f.disposal match {
        case 2 =>
          for (v <- 0 until f.h; u <- 0 until f.w)
            canvas((f.top + v) * w + f.left + u) = bg
        case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      shown
    }
  }

  test("GIF disposal compositing: methods 1/2/3 over partial frames") {
    def p(seed: Int)(u: Int, v: Int): Int = (u * 31 + v * 7 + seed) % 256
    val frames = Seq(
      ImageCodec.GifFrame(0, 0, 8, 8, 1, p(3)),
      ImageCodec.GifFrame(2, 2, 4, 4, 2, p(57)),
      ImageCodec.GifFrame(0, 4, 4, 4, 3, p(91)),
      ImageCodec.GifFrame(4, 0, 4, 4, 1, p(140)),
      // a frame AFTER a disposal-1 partial frame: composites over the
      // left-in-place patch, not the base
      ImageCodec.GifFrame(3, 3, 2, 2, 1, p(200)))
    val bg = 17
    val enc = ImageCodec.encodeGifAnimatedComposite(8, 8, frames,
      background = bg)
    val dec = ImageCodec.decodeGifComposited(enc)
    val ref = referenceComposite(8, 8, frames, bg)
    assert(dec.length == frames.length)
    for (f <- frames.indices) {
      assert(dec(f).width == 8 && dec(f).height == 8)
      for (i <- 0 until 64)
        assert(dec(f).lumaSum3(i) == 3 * ref(f)(i),
          s"frame $f pixel $i")
    }
    // the FIRST frame's disposal must be honored too (a decoder that
    // swallows the GCE following the NETSCAPE block would silently
    // leave frame 0 in place) — disposal 2 on a full-screen frame 0
    // makes frame 1 composite over pure background
    val frames2 = Seq(
      ImageCodec.GifFrame(0, 0, 8, 8, 2, p(9)),
      ImageCodec.GifFrame(1, 1, 3, 3, 1, p(77)))
    val dec2 = ImageCodec.decodeGifComposited(
      ImageCodec.encodeGifAnimatedComposite(8, 8, frames2,
        background = 5))
    val ref2 = referenceComposite(8, 8, frames2, 5)
    for (f <- frames2.indices; i <- 0 until 64)
      assert(dec2(f).lumaSum3(i) == 3 * ref2(f)(i), s"frame $f pixel $i")
  }

  test("composited decode of full-screen disposal-1 animation equals " +
      "the independent per-frame decode") {
    val fs = (0 until 3).map(f => frame(f) _)
    val enc = ImageCodec.encodeGifAnimated(8, 8, fs)
    val indep = ImageCodec.decodeGifFrames(enc)
    val comp = ImageCodec.decodeGifComposited(enc)
    assert(indep.length == comp.length)
    for (f <- indep.indices)
      assert(indep(f).lumaSum3.toSeq == comp(f).lumaSum3.toSeq, s"f=$f")
  }

  test("transparent indexes leave the canvas untouched, at index " +
      "granularity, through disposal") {
    def p(seed: Int)(u: Int, v: Int): Int = (u * 31 + v * 7 + seed) % 256
    val T = 31
    val frames = Seq(
      // opaque base
      ImageCodec.GifFrame(0, 0, 8, 8, 1, p(3)),
      // full-screen overlay with a (x+y)%3 hole lattice
      ImageCodec.GifFrame(0, 0, 8, 8, 1,
        (x, y) => if ((x + y) % 3 == 0) T else p(60)(x, y),
        transparent = Some(T)),
      // partial transparent patch with DISPOSAL 3: shown over the
      // overlay, then un-drawn for the next frame
      ImageCodec.GifFrame(2, 2, 4, 4, 3,
        (u, v) => if ((u + v) % 2 == 0) T else p(120)(u, v),
        transparent = Some(T)),
      // opaque partial frame after the restore
      ImageCodec.GifFrame(4, 4, 3, 3, 1, p(200)))
    val bg = 9
    val dec = ImageCodec.decodeGifComposited(
      ImageCodec.encodeGifAnimatedComposite(8, 8, frames,
        background = bg))
    val ref = referenceComposite(8, 8, frames, bg)
    for (f <- frames.indices; i <- 0 until 64)
      assert(dec(f).lumaSum3(i) == 3 * ref(f)(i), s"frame $f pixel $i")
    // index granularity: a frame whose OPAQUE pixel value equals the
    // transparent index's palette color must still draw (holes are
    // indexes, not colors) — pixel value T drawn by an opaque frame
    val opaque = Seq(
      ImageCodec.GifFrame(0, 0, 8, 8, 1, (_, _) => T),
      ImageCodec.GifFrame(0, 0, 8, 8, 1, (x, y) => if (x == 0) 200 else T,
        transparent = Some(200)))
    val dec2 = ImageCodec.decodeGifComposited(
      ImageCodec.encodeGifAnimatedComposite(8, 8, opaque))
    for (i <- 0 until 64) {
      assert(dec2(0).lumaSum3(i) == 3 * T)
      assert(dec2(1).lumaSum3(i) == 3 * T, s"pixel $i") // 200 is a hole
    }
  }

  test("fail-loud: reserved disposal, rect escape, bad transparent " +
      "index") {
    // rect escapes the logical screen
    intercept[IllegalArgumentException] {
      ImageCodec.encodeGifAnimatedComposite(8, 8,
        Seq(ImageCodec.GifFrame(5, 5, 4, 4, 1, (_, _) => 0))) }
    // disposal outside 1..3
    intercept[IllegalArgumentException] {
      ImageCodec.encodeGifAnimatedComposite(8, 8,
        Seq(ImageCodec.GifFrame(0, 0, 8, 8, 4, (_, _) => 0))) }
    // transparent index outside the palette
    intercept[IllegalArgumentException] {
      ImageCodec.encodeGifAnimatedComposite(8, 8,
        Seq(ImageCodec.GifFrame(0, 0, 8, 8, 1, (_, _) => 0,
          transparent = Some(256)))) }
  }
}
