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
  * hash-exactly from the text that generated the luma.
  *
  * INTERLACED streams (It top-field-first / Ib bottom-field-first) are
  * DE-INTERLACED BY FIELD SPLITTING: each stored picture weaves two
  * temporally-distinct fields line-by-line (top field = even luma rows,
  * bottom = odd rows), so decoding the woven picture as one frame would
  * poison every temporal fingerprint with comb artifacts — instead each
  * stored picture yields TWO half-height frames in field order (It:
  * top field first; Ib: bottom first), the standard "bob" de-interlace
  * for broadcast-sourced corpora.  Im (mixed, per-frame interlacing)
  * stays fail-loud by name, as do other chroma tags and parameter-less
  * headers. */
object VideoCodec {

  /** Encode gray frames as Y4M: luma = frame(x, y), chroma (when the
    * tag carries planes) = a deterministic fill ((x·7+y·13+plane) mod
    * 256) so decoders that misread plane sizes cannot resync.  `chroma`
    * ∈ "mono" (Cmono), "420" (C420jpeg), "422" (C422), "411" (C411)
    * or "444" (C444).  `interlace` ∈ "p" (progressive), "t"/"b"
    * (interlaced: each `frames` entry is the WOVEN picture carrying
    * both fields — even rows one field, odd rows the other — exactly
    * as broadcast muxers store it). */
  def encodeY4m(w: Int, h: Int, frames: Seq[(Int, Int) => Int],
      fpsN: Int = 25, fpsD: Int = 1, chroma: String = "420",
      interlace: String = "p"): Array[Byte] = {
    require(w > 0 && h > 0, "bad dims")
    require(frames.nonEmpty, "no frames")
    require(fpsN > 0 && fpsD > 0, "bad frame rate")
    require(interlace == "p" || interlace == "t" || interlace == "b",
      s"bad interlace '$interlace' (p/t/b)")
    if (interlace != "p")
      require(h % 2 == 0, "interlaced Y4M needs even height")
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
    out.write(s"YUV4MPEG2 W$w H$h F$fpsN:$fpsD I$interlace A1:1 $tag\n"
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
    * gray convention of [[ImageCodec.Raster]]).  Progressive (Ip, the
    * default) streams yield one w×h Raster per stored FRAME marker;
    * interlaced It/Ib streams are de-interlaced by FIELD SPLITTING —
    * each stored picture yields two w×(h/2) Rasters in field order
    * (see the object doc), so downstream per-frame fingerprints see
    * temporally-pure fields, never woven combs.  Im fails loudly. */
  def decodeY4mFrames(b: Array[Byte]): IndexedSeq[ImageCodec.Raster] = {
    // header line up to '\n'
    var eol = 0
    while (eol < b.length && b(eol) != '\n') eol += 1
    require(eol < b.length, "truncated Y4M header")
    val header = new String(b, 0, eol, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"),
      s"bad Y4M magic '${header.take(9)}'")
    var w = -1; var h = -1; var chroma = "420" // spec default C420
    var interlace = "p" // spec default: progressive when I absent
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
        case 'I' => interlace = p.tail match {
          case "p" | "t" | "b" => p.tail
          // Im means the interlacing VARIES per frame (signaled in each
          // FRAME header) — deferred: a wrong per-frame guess would
          // silently weave or split the wrong rows
          case other => throw new IllegalArgumentException(
            s"Y4M interlace mode I$other unsupported (Ip/It/Ib)")
        }
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
    if (interlace != "p")
      require(h % 2 == 0, "interlaced Y4M needs even height")
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
      if (interlace == "p") {
        val sums = new Array[Int](lumaLen)
        var i = 0
        while (i < lumaLen) { sums(i) = 3 * (b(p + i) & 0xff); i += 1 }
        frames += ImageCodec.Raster(w, h, sums)
      } else {
        // field split ("bob" de-interlace): even stored rows are the
        // TOP field, odd rows the BOTTOM; output order follows the
        // stream's field dominance (It: top first, Ib: bottom first)
        val fh = h / 2
        def field(parity: Int): ImageCodec.Raster = {
          val sums = new Array[Int](w * fh)
          var fy = 0
          while (fy < fh) {
            val src = p + (2 * fy + parity) * w
            var x = 0
            while (x < w) { sums(fy * w + x) = 3 * (b(src + x) & 0xff); x += 1 }
            fy += 1
          }
          ImageCodec.Raster(w, fh, sums)
        }
        if (interlace == "t") { frames += field(0); frames += field(1) }
        else { frames += field(1); frames += field(0) }
      }
      p += lumaLen + chromaLen
    }
    require(frames.nonEmpty, "Y4M has no frames")
    frames.toIndexedSeq
  }

  // ---- AVI (RIFF) — the second video container family -----------------
  //
  // Written from the public Microsoft RIFF/AVI layout (the same RIFF
  // grammar as the WAV tier, with LIST nesting): RIFF('AVI '
  // LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' frame
  // chunks)).  Two frame codings: '00db' uncompressed bottom-up
  // 24-bit BGR DIB rows padded to 4 bytes (lossless — hash-exact
  // replay), and '00dc' MJPG = one baseline JPEG per frame chained
  // through [[JpegCodec]] (Motion-JPEG, the classic capture format;
  // the in-row oracle asserts the AVI path decodes BIT-EQUAL to the
  // direct JPEG decode).  Real-muxer movi grammar is honored: 'rec '
  // LISTs group frames for interleaved playback (DV capture) and are
  // walked as nested chunk sequences, and JUNK alignment chunks
  // (ffmpeg/VirtualDub padding) are skipped — both inside movi and at
  // the top level.  MJPG frames may omit their DHT segments (the
  // MJPEG-in-AVI convention: the decoder supplies the T.81 Annex-K
  // defaults — [[JpegCodec.decode]]'s mjpeg flag), and that fallback
  // is confined to this container: a bare JPEG with missing tables
  // still fails loudly.  Audio streams, >1 stream, and unknown
  // biCompression are rejected by name.

  private def u32le(b: Array[Byte], o: Int): Long = {
    require(o >= 0 && o + 4 <= b.length, s"truncated AVI u32 at $o")
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }
  private def fourcc(b: Array[Byte], o: Int): String = {
    require(o >= 0 && o + 4 <= b.length, s"truncated AVI fourcc at $o")
    new String(b, o, 4, "US-ASCII")
  }

  /** Encode gray frames as a single-video-stream AVI.  `codec` ∈ "DIB"
    * (uncompressed bottom-up 24-bit BGR, lossless) or "MJPG" (one
    * baseline JPEG per frame at `quality`).  `recGroup` > 0 wraps every
    * that-many frames in a 'rec ' LIST (the DV-capture interleaved
    * layout); `junkPad` writes a 12-byte JUNK alignment chunk before
    * each frame (the ffmpeg/VirtualDub padding convention); MJPG +
    * `stripTables` omits each frame's DHT segments (the MJPEG-in-AVI
    * convention — decoders supply the Annex-K defaults). */
  def encodeAvi(w: Int, h: Int, frames: Seq[(Int, Int) => Int],
      codec: String = "DIB", fps: Int = 25, quality: Int = 90,
      recGroup: Int = 0, junkPad: Boolean = false,
      stripTables: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, "bad dims")
    require(frames.nonEmpty, "no frames")
    require(fps > 0, "bad fps")
    require(codec == "DIB" || codec == "MJPG", s"bad codec '$codec'")
    require(recGroup >= 0, "bad recGroup")
    require(!stripTables || codec == "MJPG",
      "stripTables is the MJPG table-less convention")
    val rowLen = (w * 3 + 3) & ~3
    val frameBytes: Seq[Array[Byte]] = frames.map { f =>
      if (codec == "MJPG") {
        val jpg = JpegCodec.encode(w, h, f, quality)
        if (stripTables) JpegCodec.stripDht(jpg) else jpg
      } else {
        val d = new Array[Byte](rowLen * h)
        for (y <- 0 until h; x <- 0 until w) {
          val v = (f(x, y) & 0xff).toByte
          val o = (h - 1 - y) * rowLen + 3 * x // bottom-up BGR
          d(o) = v; d(o + 1) = v; d(o + 2) = v
        }
        d
      }
    }
    val out = new java.io.ByteArrayOutputStream
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val maxFrame = frameBytes.map(_.length).max
    // chunk sizes (chunk = 8-byte header + payload, word-aligned)
    def padded(n: Int): Int = n + (n & 1)
    def frameCost(fb: Array[Byte]): Int =
      (if (junkPad) 12 else 0) + 8 + padded(fb.length)
    val groups: Seq[Seq[Array[Byte]]] =
      if (recGroup > 0) frameBytes.grouped(recGroup).toSeq
      else Seq(frameBytes)
    val moviContent = 4 + groups.map { g =>
      val frames = g.map(frameCost).sum
      if (recGroup > 0) 12 + frames else frames // LIST hdr + 'rec '
    }.sum
    val strlContent = 4 + (8 + 56) + (8 + 40)
    val hdrlContent = 4 + (8 + 56) + (8 + strlContent)
    val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent)
    tag("RIFF"); u32(riffContent); tag("AVI ")
    tag("LIST"); u32(hdrlContent); tag("hdrl")
    tag("avih"); u32(56)
    u32(1000000L / fps); u32(0); u32(0); u32(0) // usec/frame, maxBps, pad, flags
    u32(frameBytes.length); u32(0); u32(1); u32(maxFrame) // frames, initial, streams, bufSize
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0) // dims + reserved[4]
    tag("LIST"); u32(strlContent); tag("strl")
    tag("strh"); u32(56)
    tag("vids"); tag(if (codec == "MJPG") "MJPG" else "DIB ")
    u32(0); u16(0); u16(0); u32(0) // flags, priority, language, initialFrames
    u32(1); u32(fps); u32(0); u32(frameBytes.length) // scale, rate, start, length
    u32(maxFrame); u32(0); u32(0) // bufSize, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    tag("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24) // biSize, w, h (bottom-up), planes, bits
    if (codec == "MJPG") tag("MJPG") else u32(0) // biCompression
    u32(rowLen * h); u32(0); u32(0); u32(0); u32(0) // sizeImage, ppm×2, clrUsed/Important
    tag("LIST"); u32(moviContent); tag("movi")
    groups.foreach { g =>
      if (recGroup > 0) {
        tag("LIST"); u32(4 + g.map(frameCost).sum); tag("rec ")
      }
      g.foreach { fb =>
        if (junkPad) { tag("JUNK"); u32(4); u32(0) } // 4-byte padding
        tag(if (codec == "MJPG") "00dc" else "00db"); u32(fb.length)
        out.write(fb)
        if ((fb.length & 1) != 0) out.write(0) // word alignment
      }
    }
    out.toByteArray
  }

  /** Decode every frame of a single-video-stream AVI to Rasters
    * (sums = 3·gray for gray content, the [[ImageCodec.Raster]]
    * convention). */
  def decodeAviFrames(b: Array[Byte]): IndexedSeq[ImageCodec.Raster] = {
    require(b.length >= 12 && fourcc(b, 0) == "RIFF" &&
      fourcc(b, 8) == "AVI ", "bad AVI magic")
    val riffEnd = {
      val sz = u32le(b, 4)
      require(sz >= 4 && 8 + sz <= b.length, s"bad AVI RIFF size $sz")
      (8 + sz).toInt
    }
    var w = -1; var h = -1; var compression = ""; var bits = -1
    var strfW = -1; var strfH = 0 // biHeight SIGNED: <0 = top-down DIB
    var streams = 0
    var moviStart = -1; var moviEnd = -1
    // parse one strl list: strh must be 'vids' (audio rejected by name)
    def parseStrl(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(b, p); val sz = u32le(b, p + 4)
        require(p + 8 + sz <= end, s"truncated AVI '$id' chunk")
        id match {
          case "strh" =>
            require(sz >= 56, "short AVI stream header")
            val fccType = fourcc(b, p + 8)
            require(fccType == "vids",
              s"AVI stream type '$fccType' unsupported (video-only)")
            streams += 1
            require(streams == 1, "multi-stream AVI unsupported")
          case "strf" =>
            require(sz >= 40, "short AVI BITMAPINFOHEADER")
            strfW = u32le(b, p + 8 + 4).toInt
            strfH = u32le(b, p + 8 + 8).toInt // two's complement: sign kept
            bits = (u32le(b, p + 8 + 14) & 0xffff).toInt
            val comp = u32le(b, p + 8 + 16)
            compression =
              if (comp == 0) "DIB"
              else {
                val cc = fourcc(b, p + 8 + 16)
                require(cc == "MJPG",
                  s"AVI biCompression '$cc' unsupported (DIB/MJPG)")
                "MJPG"
              }
          case _ => ()
        }
        p += 8 + padded2(sz)
      }
    }
    def parseHdrl(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(b, p); val sz = u32le(b, p + 4)
        require(p + 8 + sz <= end, s"truncated AVI '$id' chunk")
        id match {
          case "avih" =>
            require(sz >= 56, "short AVI main header")
            w = u32le(b, p + 8 + 32).toInt
            h = u32le(b, p + 8 + 36).toInt
          case "LIST" if fourcc(b, p + 8) == "strl" =>
            parseStrl(p + 12, p + 8 + sz.toInt)
          case _ => ()
        }
        p += 8 + padded2(sz)
      }
    }
    var p = 12
    while (p + 8 <= riffEnd) {
      val id = fourcc(b, p); val sz = u32le(b, p + 4)
      require(p + 8 + sz <= riffEnd, s"truncated AVI '$id' chunk")
      if (id == "LIST") {
        fourcc(b, p + 8) match {
          case "hdrl" => parseHdrl(p + 12, p + 8 + sz.toInt)
          case "movi" => moviStart = p + 12; moviEnd = p + 8 + sz.toInt
          case _ => () // INFO etc: informational
        }
      } // JUNK / idx1 / other top-level chunks: walked over
      p += 8 + padded2(sz)
    }
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535 &&
      w.toLong * h * 3 <= Int.MaxValue, s"AVI missing/bad dims ${w}x$h")
    require(streams == 1, "AVI has no video stream header")
    require(compression.nonEmpty, "AVI has no stream format")
    require(compression == "MJPG" || bits == 24,
      s"AVI DIB bit depth $bits unsupported (24-bit only)")
    // the BITMAPINFOHEADER must agree with the main header; a NEGATIVE
    // biHeight is the spec's top-down DIB (rows stored first-to-last) —
    // honored, because silently decoding it bottom-up would flip every
    // frame (the BMP tier's row-order contract, applied per frame)
    require(strfW == w, s"AVI strf width $strfW disagrees with avih $w")
    require(strfH == h || strfH == -h,
      s"AVI strf height $strfH disagrees with avih $h")
    val topDown = strfH < 0
    require(moviStart >= 0, "AVI has no movi list")
    val rowLen = (w * 3 + 3) & ~3
    val frames = scala.collection.mutable.ArrayBuffer.empty[ImageCodec.Raster]
    // the movi chunk walk, reused verbatim for nested 'rec ' LISTs
    // (the DV-capture interleaved grouping — same grammar one level
    // down).  Sizes stay Long until AFTER the bounds check: a crafted
    // u32 near 2^31 must fail the named truncation require, not
    // overflow an Int sum and surface as a raw array exception.
    def walkFrames(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(b, p); val szL = u32le(b, p + 4)
        require(p + 8 + szL <= end, s"truncated AVI frame chunk '$id'")
        val sz = szL.toInt // safe: szL ≤ end − p − 8 ≤ Int.MaxValue
        id match {
          case "00db" | "00dc" =>
            require((id == "00db") == (compression == "DIB"),
              s"AVI frame chunk '$id' disagrees with the declared " +
                s"'$compression' coding")
            if (compression == "DIB") {
              require(sz == rowLen * h,
                s"AVI DIB frame size $sz != ${rowLen * h}")
              val sums = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                val src = p + 8 + (if (topDown) y else h - 1 - y) * rowLen
                var x = 0
                while (x < w) {
                  sums(y * w + x) = (b(src + 3 * x) & 0xff) +
                    (b(src + 3 * x + 1) & 0xff) + (b(src + 3 * x + 2) & 0xff)
                  x += 1
                }
                y += 1
              }
              frames += ImageCodec.Raster(w, h, sums)
            } else {
              // MJPG context: frames may omit DHT (the MJPEG-in-AVI
              // convention) — the decoder supplies Annex-K defaults
              val r = JpegCodec.decode(
                java.util.Arrays.copyOfRange(b, p + 8, p + 8 + sz),
                mjpegDefaultTables = true)
              require(r.width == w && r.height == h,
                s"MJPG frame ${r.width}x${r.height} != AVI dims ${w}x$h")
              frames += r
            }
          case "LIST" =>
            val lt = fourcc(b, p + 8)
            require(lt == "rec ",
              s"AVI movi LIST '$lt' unsupported ('rec ' grouping only)")
            require(depth == 0, "nested AVI 'rec ' lists unsupported")
            walkFrames(p + 12, p + 8 + sz, depth + 1)
          case "JUNK" => () // muxer alignment padding: walked over
          case other => throw new IllegalArgumentException(
            s"unexpected AVI movi chunk '$other'")
        }
        p += 8 + padded2(szL)
      }
    }
    walkFrames(moviStart, moviEnd, 0)
    require(frames.nonEmpty, "AVI has no frames")
    frames.toIndexedSeq
  }

  private def padded2(sz: Long): Int = {
    require(sz >= 0 && sz <= Int.MaxValue - 8, s"bad AVI chunk size $sz")
    (sz + (sz & 1)).toInt
  }
}
