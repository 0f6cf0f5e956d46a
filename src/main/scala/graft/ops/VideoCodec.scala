package graft.ops

/** Dependency-free Y4M (YUV4MPEG2) codec, written from the public
  * yuv4mpeg stream description — the raw-video interchange format
  * (ffmpeg/mjpegtools lingua franca) and the tier's first VIDEO
  * container: an ASCII stream header (`YUV4MPEG2 W<w> H<h> F<n>:<d>
  * [Ip] [A<n>:<d>] [C<tag>]\n`), then per frame an ASCII `FRAME`
  * marker and the raw planes — Y (w·h bytes) followed by Cb/Cr whose
  * sizes the chroma tag fixes (C420*: quarter-size each; C422:
  * half-width full-height — the broadcast default; C411: quarter-width
  * full-height — the DV tape family; C444: full-size; Cmono: absent).
  *
  * Features pool the LUMA plane (the standard video-fingerprint
  * practice); the chroma planes are still WALKED at their tag-exact
  * sizes — a size slip desynchronizes the next FRAME marker and fails
  * loudly, so the geometry is self-validating.  Lossless container
  * (raw planes), so the oracle queries replay per-frame features
  * hash-exactly from the text that generated the luma.  Interlaced
  * content (It/Ib/Im), other chroma tags, and parameter-less headers
  * fail loudly by name. */
object VideoCodec {

  /** Encode gray frames as Y4M: luma = frame(x, y), chroma (when the
    * tag carries planes) = a deterministic fill ((x·7+y·13+plane) mod
    * 256) so decoders that misread plane sizes cannot resync.  `chroma`
    * ∈ "mono" (Cmono), "420" (C420jpeg), "422" (C422), "411" (C411)
    * or "444" (C444). */
  def encodeY4m(w: Int, h: Int, frames: Seq[(Int, Int) => Int],
      fpsN: Int = 25, fpsD: Int = 1, chroma: String = "420"): Array[Byte] = {
    require(w > 0 && h > 0, "bad dims")
    require(frames.nonEmpty, "no frames")
    require(fpsN > 0 && fpsD > 0, "bad frame rate")
    val tag = chroma match {
      case "mono" => "Cmono"
      case "420"  => "C420jpeg"
      case "422"  => "C422"
      case "411"  => "C411"
      case "444"  => "C444"
      case other => throw new IllegalArgumentException(
        s"bad chroma '$other' (mono/420/422/411/444)")
    }
    if (chroma == "420")
      require(w % 2 == 0 && h % 2 == 0, "C420 needs even dims")
    if (chroma == "422") require(w % 2 == 0, "C422 needs even width")
    if (chroma == "411") require(w % 4 == 0, "C411 needs width % 4 == 0")
    val out = new java.io.ByteArrayOutputStream
    out.write(s"YUV4MPEG2 W$w H$h F$fpsN:$fpsD Ip A1:1 $tag\n"
      .getBytes("US-ASCII"))
    val (cw, ch) = chroma match {
      case "mono" => (0, 0)
      case "420"  => (w / 2, h / 2)
      case "422"  => (w / 2, h)
      case "411"  => (w / 4, h)
      case _      => (w, h)
    }
    frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      for (y <- 0 until h; x <- 0 until w) out.write(f(x, y) & 0xff)
      for (plane <- 0 until (if (chroma == "mono") 0 else 2);
           y <- 0 until ch; x <- 0 until cw)
        out.write((x * 7 + y * 13 + plane) & 0xff)
    }
    out.toByteArray
  }

  /** Decode every frame's LUMA plane to a Raster (sums = 3·Y, the
    * gray convention of [[ImageCodec.Raster]]). */
  def decodeY4mFrames(b: Array[Byte]): IndexedSeq[ImageCodec.Raster] = {
    // header line up to '\n'
    var eol = 0
    while (eol < b.length && b(eol) != '\n') eol += 1
    require(eol < b.length, "truncated Y4M header")
    val header = new String(b, 0, eol, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"),
      s"bad Y4M magic '${header.take(9)}'")
    var w = -1; var h = -1; var chroma = "420" // spec default C420
    var fpsSeen = false
    // fail-loud integer grammar: an over-long digit run would escape as
    // NumberFormatException instead of the codec's contract exception
    def num(s: String, what: String): Int = {
      require(s.nonEmpty && s.length <= 9 && s.forall(_.isDigit),
        s"bad Y4M $what '$s'")
      s.toInt
    }
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = num(p.tail, "width")
        case 'H' => h = num(p.tail, "height")
        case 'F' =>
          val parts = p.tail.split(':')
          require(parts.length == 2, s"bad Y4M frame rate $p")
          require(num(parts(0), "fps") > 0 && num(parts(1), "fps") > 0,
            s"bad Y4M frame rate $p")
          fpsSeen = true
        case 'I' => require(p == "Ip",
          s"interlaced Y4M unsupported ($p — progressive only)")
        case 'A' => () // pixel aspect: informational
        case 'C' => chroma = p.tail match {
          case "mono" => "mono"
          case "420" | "420jpeg" | "420mpeg2" | "420paldv" => "420"
          case "422" => "422"
          case "411" => "411"
          case "444" => "444"
          case other => throw new IllegalArgumentException(
            s"unsupported Y4M chroma tag C$other")
        }
        case 'X' => () // extension parameters: informational
        case c => throw new IllegalArgumentException(
          s"unknown Y4M header parameter '$c'")
      }
    }
    require(w > 0 && h > 0, s"Y4M missing/bad dims ${w}x$h")
    // crafted dims must fail loudly, not wrap the plane-size arithmetic
    require(w <= 65535 && h <= 65535 && w.toLong * h * 3 <= Int.MaxValue,
      s"Y4M dims ${w}x$h too large")
    require(fpsSeen, "Y4M missing frame rate")
    if (chroma == "420")
      require(w % 2 == 0 && h % 2 == 0, "C420 needs even dims")
    if (chroma == "422") require(w % 2 == 0, "C422 needs even width")
    if (chroma == "411") require(w % 4 == 0, "C411 needs width % 4 == 0")
    val lumaLen = w * h
    val chromaLen = chroma match {
      case "mono" => 0
      case "420"  => 2 * (w / 2) * (h / 2)
      case "422"  => 2 * (w / 2) * h
      case "411"  => 2 * (w / 4) * h
      case _      => 2 * w * h
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[ImageCodec.Raster]
    var p = eol + 1
    while (p < b.length) {
      // FRAME marker (optional parameters up to '\n' are walked over)
      require(p + 5 <= b.length &&
        new String(b, p, 5, "US-ASCII") == "FRAME",
        s"bad Y4M frame marker at $p")
      p += 5
      while (p < b.length && b(p) != '\n') p += 1
      require(p < b.length, "truncated Y4M frame header")
      p += 1
      require(p.toLong + lumaLen + chromaLen <= b.length,
        s"truncated Y4M frame ${frames.length}")
      val sums = new Array[Int](lumaLen)
      var i = 0
      while (i < lumaLen) { sums(i) = 3 * (b(p + i) & 0xff); i += 1 }
      frames += ImageCodec.Raster(w, h, sums)
      p += lumaLen + chromaLen
    }
    require(frames.nonEmpty, "Y4M has no frames")
    frames.toIndexedSeq
  }
}
