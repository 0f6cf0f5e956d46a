package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}

/** Dependency-free audio codec for the WAV family (RIFF container,
  * mono), written from the public RIFF/WAVE format description plus the
  * public compressed-sample specs: 16-bit PCM (format tag 1 — the
  * uncompressed interchange shape), G.711 μ-law and A-law companding
  * (tags 7 and 6, ITU-T G.711 segment tables — the telephony shapes),
  * and IMA/DVI ADPCM (tag 0x11, the IMA Digital Audio compatibility
  * spec's step/index tables — the classic 4-bit adaptive codec).  The
  * audio sibling of [[ImageCodec]]: real container parsing (chunk walk,
  * unknown chunks skipped, fmt validated before data), real sample
  * reads, and a frame-energy feature kernel whose arithmetic is integer
  * until one IEEE division per frame — so the SQL oracle replays
  * features exactly from the source that generated the samples.
  *
  * The companded/adaptive tags are the tier's LOSSY audio members (the
  * JPEG discipline): decode(encode(x)) ≠ x in general, so their oracle
  * queries are tolerance gauges — G.711's reconstruction error has the
  * CLOSED-FORM bound 2^(seg+2) ≤ 512 (midpoint reconstruction of a
  * 2^(seg+3)-wide quantization cell), and IMA ADPCM carries an exact
  * anchor instead: each block header stores its first sample VERBATIM,
  * so every block-start sample must round-trip bit-exactly.
  *
  * r17/r18 widen the family: stereo PCM (downmixed (L+R)>>1), 8/24-bit
  * depths, WAVE_FORMAT_EXTENSIBLE-wrapped PCM, and the big-endian Sun
  * AU and AIFF containers (both stdlib-conformance-anchored).
  * Unsupported shapes (other format tags, other bit depths, stereo
  * under the compressed tags, truncated chunks) fail loudly — a
  * decoder silently misreading samples would poison every downstream
  * fingerprint.
  */
object AudioCodec {

  /** A decoded audio record: container stats + fixed-width frame
    * features (mean |amplitude| per frame — the energy envelope). */
  final case class AudioFeatures(doc_id: Long, byte_len: Long,
      sample_rate: Int, n_samples: Long, features: Array[Double])

  // ---- encoder (fixture/query side) ---------------------------------------

  /** Shared canonical-44-byte-header writer for every simple WAV shape
    * (one fmt layout parameterized by tag/channels/blockAlign/bits; the
    * RIFF pad byte for odd payloads handled once here).  `payload`
    * serializes the data chunk into the positioned buffer. */
  private def wavContainer(sampleRate: Int, tag: Int, channels: Int,
      blockAlign: Int, bits: Int, dataLen: Int)
      (payload: java.nio.ByteBuffer => Unit): Array[Byte] = {
    require(sampleRate > 0 && dataLen > 0, "bad wav args")
    val out = java.nio.ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + dataLen + (dataLen & 1))
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(tag.toShort).putShort(channels.toShort)
    out.putInt(sampleRate).putInt(sampleRate * blockAlign)
    out.putShort(blockAlign.toShort).putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    payload(out)
    out.array()
  }

  /** Canonical 44-byte-header PCM WAV: RIFF + fmt (PCM, mono, 16-bit) +
    * data. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty, "bad wav args")
    wavContainer(sampleRate, 1, 1, 2, 16, samples.length * 2)(out =>
      samples.foreach(out.putShort))
  }

  /** WAVE_FORMAT_EXTENSIBLE-wrapped 16-bit PCM (mono or interleaved
    * stereo) — the container modern writers emit: 40-byte fmt (tag
    * 0xFFFE, cbSize 22, validBits, channel mask, KSDATAFORMAT PCM
    * GUID) + fact + data. */
  def encodeWavExtensible(sampleRate: Int, channels: Int,
      interleaved: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && (channels == 1 || channels == 2),
      "bad wav args")
    require(interleaved.nonEmpty && interleaved.length % channels == 0,
      "sample count must divide channels")
    val dataLen = interleaved.length * 2
    val out = java.nio.ByteBuffer.allocate(12 + 48 + 12 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 48 + 12 + 8 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(40)
    out.putShort(0xfffe.toShort).putShort(channels.toShort)
    out.putInt(sampleRate).putInt(sampleRate * channels * 2)
    out.putShort((channels * 2).toShort).putShort(16)
    out.putShort(22)       // cbSize
    out.putShort(16)       // validBitsPerSample
    out.putInt(if (channels == 2) 0x3 else 0x4) // FL|FR or FC
    out.putShort(1)        // SubFormat GUID Data1 low 16 bits = PCM
    out.put(Array[Byte](0, 0, 0, 0, 0x10, 0, 0x80.toByte, 0,
      0, 0xaa.toByte, 0, 0x38, 0x9b.toByte, 0x71))
    out.put("fact".getBytes("US-ASCII")).putInt(4)
      .putInt(interleaved.length / channels)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    interleaved.foreach(out.putShort)
    out.array()
  }

  /** Deterministic mono signal from source bytes: sample i =
    * (src[(i·7 + 3) mod len] − 76) · 256 — computable independently by
    * the SQL oracle from the same source. */
  def wavFromBytes(sampleRate: Int, nSamples: Int, src: Array[Byte])
      : Array[Byte] = {
    require(src.nonEmpty, "empty source bytes")
    encodeWav(sampleRate, Array.tabulate(nSamples) { i =>
      val v = src((i * 7 + 3) % src.length) & 0xff
      // (v − 76)·256 must fit 16-bit PCM: v ≥ 204 would silently wrap
      // through toShort and diverge from the unwrapped SQL envelope —
      // fail loudly instead (the fixture queries feed printable ASCII,
      // v ≤ 126, via MultimodalOps.asciiBytes)
      require(v <= 203, s"wavFromBytes: source byte $v overflows 16-bit " +
        "PCM under the (v-76)*256 map (max 203)")
      ((v - 76) * 256).toShort
    })
  }

  // ---- G.711 companding (ITU-T G.711; the classic segment encoding) --------

  private val UlawBias = 0x84 // 132
  private val UlawClip = 32635

  /** μ-law compress one 16-bit sample to its 8-bit code (G.711 PCMU):
    * bias + segment search + 4-bit mantissa, all bits inverted on the
    * wire. */
  def ulawEncode(s: Short): Byte = {
    var x = s.toInt
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > UlawClip) x = UlawClip
    x += UlawBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    (~(sign | (exp << 4) | ((x >> (exp + 3)) & 0x0f))).toByte
  }

  /** μ-law expand one 8-bit code back to 16-bit PCM — the midpoint of
    * its quantization cell, so |expand(compress(x)) − x| ≤ 2^(seg+2)
    * ≤ 512 (the closed-form gauge bound). */
  def ulawDecode(c: Byte): Short = {
    val u = ~c & 0xff
    val exp = (u >> 4) & 7
    val x = ((((u & 0x0f) << 3) + UlawBias) << exp) - UlawBias
    (if ((u & 0x80) != 0) -x else x).toShort
  }

  /** A-law compress (G.711 PCMA): no bias, segment 0 is linear, even
    * bits inverted (XOR 0x55); sign bit 1 = positive. */
  def alawEncode(s: Short): Byte = {
    var x = s.toInt
    val sign = if (x >= 0) 0x80 else { x = -x; 0 }
    if (x > UlawClip) x = UlawClip
    val v =
      if (x < 256) x >> 4
      else {
        var exp = 7
        var mask = 0x4000
        while (exp > 1 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
        (exp << 4) | ((x >> (exp + 3)) & 0x0f)
      }
    ((v | sign) ^ 0x55).toByte
  }

  /** A-law expand — midpoint reconstruction; |error| ≤ 2^(seg+2) ≤ 512,
    * and ≤ 8 in the linear segment. */
  def alawDecode(c: Byte): Short = {
    val a = (c ^ 0x55) & 0xff
    val exp = (a >> 4) & 7
    val mant = a & 0x0f
    val x =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    (if ((a & 0x80) != 0) x else -x).toShort
  }

  // ---- IMA/DVI ADPCM (the IMA compatibility spec's published tables) -------

  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** mutable ADPCM coder state: the decoder's predictor/step index —
    * the ENCODER must run the identical reconstruction to stay in sync
    * (the spec's "decoder in the encoder" discipline). */
  private final class ImaState(var predictor: Int, var index: Int) {
    /** apply one 4-bit code: reconstruct the quantized diff, update
      * predictor (clamped) and step index; returns the new predictor. */
    def step(code: Int): Int = {
      val st = ImaStepTable(index)
      var diffq = st >> 3
      if ((code & 4) != 0) diffq += st
      if ((code & 2) != 0) diffq += st >> 1
      if ((code & 1) != 0) diffq += st >> 2
      predictor =
        if ((code & 8) != 0) math.max(-32768, predictor - diffq)
        else math.min(32767, predictor + diffq)
      index = math.max(0, math.min(88, index + ImaIndexTable(code & 7)))
      predictor
    }
    /** quantize one target sample to a 4-bit code (spec quantizer) and
      * advance the state through it. */
    def encode(sample: Int): Int = {
      var diff = sample - predictor
      var code = if (diff < 0) { diff = -diff; 8 } else 0
      var st = ImaStepTable(index)
      if (diff >= st) { code |= 4; diff -= st }
      st >>= 1
      if (diff >= st) { code |= 2; diff -= st }
      st >>= 1
      if (diff >= st) code |= 1
      step(code)
      code
    }
  }

  /** samples per mono IMA block of `blockAlign` bytes: the 4-byte
    * header carries sample 0 verbatim; each later byte carries two. */
  def imaSamplesPerBlock(blockAlign: Int): Int = (blockAlign - 4) * 2 + 1

  // ---- encoders (fixture/query side) for the compressed tags ---------------

  /** G.711 payload: tag 6/7, 8 bits per sample, one byte per frame. */
  private def encodeWavG711(sampleRate: Int, samples: Array[Short],
      tag: Int, compress: Short => Byte): Array[Byte] = {
    require(samples.nonEmpty, "bad wav args")
    wavContainer(sampleRate, tag, 1, 1, 8, samples.length)(out =>
      samples.foreach(s => out.put(compress(s))))
  }

  /** Stereo 16-bit PCM WAV (interleaved L/R frames).  Decode downmixes
    * to mono via (L + R) >> 1 (arithmetic shift = floor — the
    * SQL-replayable convention). */
  def encodeWavStereo(sampleRate: Int, left: Array[Short],
      right: Array[Short]): Array[Byte] = {
    require(left.nonEmpty, "bad wav args")
    require(left.length == right.length, "channel length mismatch")
    wavContainer(sampleRate, 1, 2, 4, 16, left.length * 4) { out =>
      for (i <- left.indices) { out.putShort(left(i)); out.putShort(right(i)) }
    }
  }

  /** 8-bit PCM WAV (the legacy UNSIGNED convention: stored byte =
    * (s >> 8) + 128; decode expands (b − 128) << 8). */
  def encodeWav8(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty, "bad wav args")
    wavContainer(sampleRate, 1, 1, 1, 8, samples.length)(out =>
      samples.foreach(s => out.put((((s >> 8) + 128) & 0xff).toByte)))
  }

  /** 24-bit PCM WAV (3-byte little-endian signed frames; decode keeps
    * the top 16 bits — sample >> 8). */
  def encodeWav24(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    require(samples.nonEmpty, "bad wav args")
    samples.foreach(s => require(s >= -(1 << 23) && s < (1 << 23),
      s"sample $s out of 24-bit range"))
    wavContainer(sampleRate, 1, 1, 3, 24, samples.length * 3) { out =>
      samples.foreach { s =>
        out.put((s & 0xff).toByte)
        out.put(((s >> 8) & 0xff).toByte)
        out.put(((s >> 16) & 0xff).toByte)
      }
    }
  }

  /** G.711 μ-law WAV (format tag 7). */
  def encodeWavUlaw(sampleRate: Int, samples: Array[Short]): Array[Byte] =
    encodeWavG711(sampleRate, samples, 7, ulawEncode)

  /** G.711 A-law WAV (format tag 6). */
  def encodeWavAlaw(sampleRate: Int, samples: Array[Short]): Array[Byte] =
    encodeWavG711(sampleRate, samples, 6, alawEncode)

  /** IMA ADPCM WAV (format tag 0x11), mono, fixed `blockAlign` bytes per
    * block: each block = 4-byte header (sample 0 verbatim + step index)
    * + two 4-bit codes per byte, low nibble first; fmt carries the
    * samplesPerBlock extension and a fact chunk carries the true sample
    * count (the compressed-WAV convention real writers follow). */
  def encodeWavAdpcm(sampleRate: Int, samples: Array[Short],
      blockAlign: Int = 256): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "bad wav args")
    // upper bound: samplesPerBlock = (blockAlign-4)*2+1 must fit the
    // 16-bit fmt-extension field, or the container is inconsistent and
    // only fails at decode time
    require(blockAlign >= 8 && blockAlign % 4 == 0 && blockAlign <= 16384,
      "bad block align")
    val spb = imaSamplesPerBlock(blockAlign)
    val nBlocks = (samples.length + spb - 1) / spb
    val dataLen = nBlocks * blockAlign
    // RIFF(12) + fmt(8+20) + fact(8+4) + data header(8) + payload
    val out = java.nio.ByteBuffer.allocate(60 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(52 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
    out.putShort(0x11).putShort(1)               // IMA ADPCM, mono
    out.putInt(sampleRate)
      .putInt(sampleRate * blockAlign / spb)     // approx byte rate
    out.putShort(blockAlign.toShort).putShort(4) // block align, bits
    out.putShort(2).putShort(spb.toShort)        // cbSize, samplesPerBlock
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val state = new ImaState(0, 0)
    var i = 0
    while (i < samples.length) {
      // block header: first sample verbatim (the exact anchor), current
      // step index carried across blocks (predictor restarts from the
      // stored sample — the spec's block independence)
      state.predictor = samples(i)
      out.putShort(samples(i))
      out.put(state.index.toByte).put(0.toByte)
      var j = 1
      while (j < spb) {
        // final partial block pads with repeats of the last sample —
        // the fact chunk trims them on decode
        def target(k: Int): Int =
          samples(math.min(samples.length - 1, i + k))
        val lo = state.encode(target(j))
        val hi = if (j + 1 < spb) state.encode(target(j + 1)) else 0
        out.put(((hi << 4) | lo).toByte)
        j += 2
      }
      i += spb
    }
    out.array()
  }

  // ---- decoder -------------------------------------------------------------

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Parse the RIFF chunk walk and return (sampleRate, 16-bit samples).
    * Unknown chunks (LIST, …) are skipped with word alignment; the fmt
    * chunk must precede data and declare a supported mono shape: 16-bit
    * PCM (tag 1), G.711 μ-law/A-law (tags 7/6 — expanded through the
    * segment tables), or IMA ADPCM (tag 0x11 — block decode, fact-chunk
    * trimmed). */
  def decodeWav(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 44, "truncated WAV header")
    require(new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var p = 12
    var rate = -1
    var tag = -1
    var channels = 1
    var bits = -1
    var blockAlign = -1
    var spb = -1
    var factSamples = -1
    while (p + 8 <= b.length) {
      val cid = new String(b, p, 4, "US-ASCII")
      val len = i32(b, p + 4)
      require(len >= 0 && p + 8 + len <= b.length,
        s"truncated '$cid' chunk")
      if (cid == "fmt ") {
        require(len >= 16, "short fmt chunk")
        tag = u16(b, p + 8)
        if (tag == 0xfffe) {
          // WAVE_FORMAT_EXTENSIBLE — how modern writers wrap PCM: the
          // real format lives in the SubFormat GUID's first 16 bits,
          // the rest of the GUID is the fixed KSDATAFORMAT tail
          require(len >= 40, "short EXTENSIBLE fmt chunk")
          val cb = u16(b, p + 24)
          require(cb >= 22, s"EXTENSIBLE cbSize $cb < 22")
          val validBits = u16(b, p + 26)
          val subTag = u16(b, p + 32)
          // GUID bytes after the 16-bit sub-tag: Data1 high half,
          // Data2, Data3, Data4 of KSDATAFORMAT_SUBTYPE_PCM
          // {xxxx0000-0000-0010-8000-00AA00389B71}
          val guidTail = Array(0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
            0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)
          for (j <- guidTail.indices)
            require((b(p + 34 + j) & 0xff) == guidTail(j),
              "bad EXTENSIBLE SubFormat GUID")
          require(subTag == 1,
            s"EXTENSIBLE sub-format $subTag unsupported (PCM only)")
          require(validBits == u16(b, p + 22),
            s"EXTENSIBLE validBits $validBits != container bits " +
              s"${u16(b, p + 22)} (padded containers unsupported)")
          tag = 1
        }
        require(tag == 1 || tag == 6 || tag == 7 || tag == 0x11,
          s"unsupported WAV format tag $tag — PCM (1, plain or " +
            "EXTENSIBLE-wrapped), A-law (6), μ-law (7), IMA ADPCM " +
            "(0x11) only")
        channels = u16(b, p + 10)
        require(channels == 1 || (channels == 2 && tag == 1),
          s"unsupported channel layout: $channels channels under tag $tag" +
            " (stereo is PCM-only; compressed tags are mono)")
        rate = i32(b, p + 12)
        blockAlign = u16(b, p + 20)
        bits = u16(b, p + 22)
        tag match {
          case 1 =>
            require(bits == 8 || bits == 16 || bits == 24,
              s"only 8/16/24-bit PCM supported, got $bits")
            // a claimed layout whose frame size disagrees with the
            // stored block align would silently re-slice the data —
            // fail loudly instead (the fail-loud contract's guard
            // against crafted channel/depth flips)
            require(blockAlign == channels * (bits / 8),
              s"block align $blockAlign inconsistent with $channels × " +
                s"$bits-bit frames")
          case 6 | 7 =>
            require(bits == 8, s"G.711 requires 8 bits, got $bits")
            require(blockAlign == 1,
              s"block align $blockAlign inconsistent with G.711 frames")
          case _ =>
            require(bits == 4, s"IMA ADPCM requires 4 bits, got $bits")
            require(len >= 20, "IMA ADPCM fmt missing samplesPerBlock")
            spb = u16(b, p + 26)
            require(blockAlign >= 8 &&
              spb == imaSamplesPerBlock(blockAlign),
              s"samplesPerBlock $spb inconsistent with block align " +
                s"$blockAlign")
        }
      } else if (cid == "fact") {
        require(len >= 4, "short fact chunk")
        factSamples = i32(b, p + 8)
      } else if (cid == "data") {
        require(rate > 0, "data chunk before fmt")
        return (rate, decodeData(b, p + 8, len, tag, bits, channels,
          blockAlign, spb, factSamples))
      }
      p += 8 + len + (len & 1)  // RIFF chunks are word-aligned
    }
    throw new IllegalArgumentException("no data chunk found")
  }

  private def decodeData(b: Array[Byte], off: Int, len: Int, tag: Int,
      bits: Int, channels: Int, blockAlign: Int, spb: Int,
      factSamples: Int): Array[Short] =
    tag match {
      case 1 =>
        val bytesPerFrame = (bits / 8) * channels
        require(len % bytesPerFrame == 0,
          s"data length $len not a whole number of $bytesPerFrame-byte" +
            " frames")
        val n = len / bytesPerFrame
        val samples = new Array[Short](n)
        // one channel sample at byte offset o, expanded to 16-bit
        def sample16(o: Int): Int = bits match {
          case 8 => ((b(o) & 0xff) - 128) << 8 // legacy unsigned bytes
          case 16 => (u16(b, o) << 16) >> 16
          case _ => // 24-bit: keep the top 16 bits
            val v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
              ((b(o + 2) & 0xff) << 16)
            ((v << 8) >> 8) >> 8
        }
        var i = 0
        while (i < n) {
          val o = off + i * bytesPerFrame
          val v =
            if (channels == 1) sample16(o)
            else (sample16(o) + sample16(o + bits / 8)) >> 1 // downmix
          samples(i) = v.toShort
          i += 1
        }
        samples
      case 6 | 7 =>
        val expand: Byte => Short = if (tag == 7) ulawDecode else alawDecode
        val samples = new Array[Short](len)
        var i = 0
        while (i < len) { samples(i) = expand(b(off + i)); i += 1 }
        samples
      case _ => // 0x11 IMA ADPCM
        require(len % blockAlign == 0,
          s"ADPCM data length $len not a whole number of $blockAlign-byte" +
            " blocks")
        val nBlocks = len / blockAlign
        val total = nBlocks * spb
        val n = if (factSamples >= 0) factSamples else total
        require(n <= total && n > total - spb,
          s"fact sample count $n inconsistent with $nBlocks blocks of $spb")
        val samples = new Array[Short](n)
        var blk = 0
        var si = 0
        while (blk < nBlocks) {
          val bo = off + blk * blockAlign
          val first = (u16(b, bo) & 0xffff).toShort
          val idx = b(bo + 2) & 0xff
          require(idx <= 88, s"ADPCM step index $idx out of [0,88]")
          require((b(bo + 3) & 0xff) == 0, "nonzero ADPCM reserved byte")
          val state = new ImaState(first, idx)
          if (si < n) samples(si) = first
          si += 1
          var j = 1
          var k = bo + 4
          while (j < spb) {
            val byte = b(k) & 0xff
            if (si < n) samples(si) = state.step(byte & 0x0f).toShort
            si += 1
            j += 1
            if (j < spb) {
              if (si < n) samples(si) = state.step(byte >> 4).toShort
              si += 1
              j += 1
            }
            k += 1
          }
          blk += 1
        }
        samples
    }

  // ---- AU (Sun/NeXT .snd — the big-endian telephony container) ------------

  private def beInt(b: Array[Byte], o: Int): Int = {
    require(o >= 0 && o + 4 <= b.length, "truncated AU/AIFF field")
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  }

  /** AU container (public Sun audio header): ".snd" magic, data offset,
    * data size, encoding, rate, channels, then samples.  Encodings 1
    * (G.711 μ-law — shared tables with WAV tag 7) and 3 (16-bit BE
    * PCM); stereo downmixes (L+R)>>1 like the WAV path. */
  def decodeAu(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 24, "truncated AU header")
    require(new String(b, 0, 4, "US-ASCII") == ".snd", "bad AU magic")
    val off = beInt(b, 4)
    val size0 = beInt(b, 8)
    val enc = beInt(b, 12)
    val rate = beInt(b, 16)
    val channels = beInt(b, 20)
    require(off >= 24 && off <= b.length, s"bad AU data offset $off")
    // size -1 (0xffffffff) means "unknown": take the rest of the file.
    // Subtraction-form bound: `off + size` overflows Int for crafted
    // sizes near 2^31, silently bypassing the addition form
    val size = if (size0 == -1) b.length - off else size0
    require(size >= 0 && size <= b.length - off, "truncated AU data")
    require(rate > 0, s"bad AU sample rate $rate")
    require(channels == 1 || channels == 2,
      s"unsupported AU channel count $channels")
    require(enc == 1 || enc == 3,
      s"unsupported AU encoding $enc (μ-law 1 and 16-bit PCM 3 only)")
    val bytesPer = if (enc == 1) 1 else 2
    require(size % (bytesPer * channels) == 0,
      "AU data size misaligned with frames")
    val n = size / (bytesPer * channels)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      def one(c: Int): Int =
        if (enc == 1) ulawDecode(b(off + i * channels + c)).toInt
        else {
          val o = off + (i * channels + c) * 2
          ((b(o) << 8) | (b(o + 1) & 0xff)).toShort.toInt
        }
      out(i) =
        (if (channels == 1) one(0) else (one(0) + one(1)) >> 1).toShort
      i += 1
    }
    (rate, out)
  }

  /** AU fixture encoder (16-bit BE PCM or μ-law, mono). */
  def encodeAu(sampleRate: Int, samples: Array[Short],
      ulaw: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "bad au args")
    val dataLen = samples.length * (if (ulaw) 1 else 2)
    val out = java.nio.ByteBuffer.allocate(24 + dataLen)
    out.put(".snd".getBytes("US-ASCII"))
    out.putInt(24).putInt(dataLen).putInt(if (ulaw) 1 else 3)
    out.putInt(sampleRate).putInt(1)
    if (ulaw) samples.foreach(s => out.put(ulawEncode(s)))
    else samples.foreach(out.putShort)
    out.array()
  }

  // ---- AIFF (the big-endian IFF container of the Mac world) ----------------

  /** 80-bit IEEE 754 extended float at `o` — how AIFF's COMM chunk
    * stores the sample rate: 1 sign + 15 exponent + 64 explicit-one
    * mantissa bits; exact for every real-world rate. */
  private def extended80(b: Array[Byte], o: Int): Int = {
    require(o + 10 <= b.length, "truncated AIFF extended float")
    val se = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    require((se & 0x8000) == 0, "negative AIFF sample rate")
    val exp = se & 0x7fff
    var mant = 0L
    for (j <- 0 until 8) mant = (mant << 8) | (b(o + 2 + j) & 0xff)
    if (exp == 0 && mant == 0L) return 0
    // value = mant · 2^(exp − 16383 − 63); rates are integral, so the
    // shift must land exactly
    val shift = exp - 16383 - 63
    require(shift <= 0 && shift > -64, s"AIFF rate exponent $exp out of range")
    val down = -shift
    require(down < 64 && (mant & ((1L << down) - 1)) == 0L,
      "non-integral AIFF sample rate unsupported")
    val v = mant >>> down
    require(v > 0 && v <= Int.MaxValue, "AIFF sample rate out of range")
    v.toInt
  }

  /** AIFF (public Audio IFF spec): big-endian FORM/AIFF with the COMM
    * chunk (channels, frame count, 16-bit sample size, 80-bit extended
    * rate) and SSND (offset/blockSize prelude, BE samples).  Stereo
    * downmixes (L+R)>>1. */
  def decodeAiff(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 12, "truncated AIFF header")
    require(new String(b, 0, 4, "US-ASCII") == "FORM" &&
      new String(b, 8, 4, "US-ASCII") == "AIFF", "not a FORM/AIFF file")
    var p = 12
    var channels = -1
    var frames = -1
    var rate = -1
    var haveComm = false
    while (p + 8 <= b.length) {
      val cid = new String(b, p, 4, "US-ASCII")
      val len = beInt(b, p + 4)
      // subtraction form: `p + 8 + len` overflows Int for crafted lens
      require(len >= 0 && len <= b.length - p - 8,
        s"truncated AIFF '$cid' chunk")
      if (cid == "COMM") {
        require(len >= 18, "short COMM chunk")
        channels = ((b(p + 8) & 0xff) << 8) | (b(p + 9) & 0xff)
        frames = beInt(b, p + 10)
        val bits = ((b(p + 14) & 0xff) << 8) | (b(p + 15) & 0xff)
        require(bits == 16, s"only 16-bit AIFF supported, got $bits")
        rate = extended80(b, p + 16)
        require(rate > 0, "bad AIFF sample rate")
        require(channels == 1 || channels == 2,
          s"unsupported AIFF channel count $channels")
        haveComm = true
      } else if (cid == "SSND") {
        require(haveComm, "SSND before COMM")
        require(len >= 8, "short SSND chunk")
        val dataOff = beInt(b, p + 8)
        require(dataOff >= 0 && dataOff <= len - 8,
          s"bad SSND offset $dataOff")
        val base = p + 16 + dataOff
        // Long arithmetic: `frames * 2 * channels` overflows Int for
        // crafted frame counts and would bypass the bound
        require(frames >= 0 &&
          base.toLong + frames.toLong * 2 * channels <= p + 8L + len,
          "AIFF frame count exceeds SSND data")
        val out = new Array[Short](frames)
        var i = 0
        while (i < frames) {
          def one(c: Int): Int = {
            val o = base + (i * channels + c) * 2
            ((b(o) << 8) | (b(o + 1) & 0xff)).toShort.toInt
          }
          out(i) =
            (if (channels == 1) one(0) else (one(0) + one(1)) >> 1).toShort
          i += 1
        }
        return (rate, out)
      }
      p += 8 + len + (len & 1) // IFF chunks are word-aligned
    }
    throw new IllegalArgumentException("no SSND chunk found")
  }

  /** AIFF fixture encoder (16-bit BE PCM, mono). */
  def encodeAiff(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "bad aiff args")
    val dataLen = 8 + samples.length * 2
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + dataLen)
    out.put("FORM".getBytes("US-ASCII")).putInt(4 + 26 + 8 + dataLen)
    out.put("AIFF".getBytes("US-ASCII"))
    out.put("COMM".getBytes("US-ASCII")).putInt(18)
    out.putShort(1).putInt(samples.length).putShort(16)
    // 80-bit extended: rate = mant·2^(exp−16383−63) with the explicit
    // leading one at bit 63
    val nlz = java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    val exp = 16383 + 63 - nlz
    val mant = sampleRate.toLong << nlz
    out.putShort(exp.toShort).putLong(mant)
    out.put("SSND".getBytes("US-ASCII")).putInt(dataLen)
    out.putInt(0).putInt(0)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Sniff the audio magic and decode: RIFF/WAVE (all supported format
    * tags), fLaC, AU (".snd") or AIFF ("FORM") — the
    * [[ImageCodec.decode]] dispatch for sound. */
  def decodeAudio(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 4, "truncated audio")
    val magic = new String(b, 0, 4, "US-ASCII")
    if (magic == "RIFF") decodeWav(b)
    else if (magic == "fLaC") FlacCodec.decode(b)
    else if (magic == ".snd") decodeAu(b)
    else if (magic == "FORM") decodeAiff(b)
    else throw new IllegalArgumentException(
      s"unknown audio magic '$magic' (RIFF/WAVE, FLAC, AU, AIFF " +
        "supported)")
  }

  // ---- the real audio kernel -----------------------------------------------

  /** Frame-energy features: the sample array splits into `frames` cells
    * (floor boundaries, the [[ImageCodec.kernel]] pooling map);
    * feature = mean |amplitude| per frame (integer |s| sums, ONE double
    * division).  Feeds the same downstream as the image tier —
    * [[MultimodalOps.aHash]] over the envelope is the audio near-dup
    * fingerprint. */
  def kernel(frames: Int): (Long, Array[Byte]) => AudioFeatures =
    (docId, bytes) => {
      require(frames > 0, "bad frame count")
      val (rate, s) = decodeAudio(bytes)
      val n = s.length
      val feats = new Array[Double](frames)
      var f = 0
      while (f < frames) {
        val i0 = f * n / frames
        val i1 = (f + 1) * n / frames
        var sum = 0L
        var i = i0
        while (i < i1) { sum += math.abs(s(i).toLong); i += 1 }
        feats(f) = if (i1 == i0) 0.0 else sum.toDouble / (i1 - i0)
        f += 1
      }
      AudioFeatures(docId, bytes.length.toLong, rate, n.toLong, feats)
    }

  /** Decode through the kernel: per-partition batched narrow map — the
    * payload bytes never leave the executor that read them (the
    * [[MultimodalOps.decodeWith]] shape for the audio record). */
  def decodeWith(df: DataFrame, payload: Column, id: Column,
      frames: Int): Dataset[AudioFeatures] = {
    val in = df.select(id.cast("long").as("doc_id"), payload.as("p"))
    implicit val enc = Encoders.product[AudioFeatures]
    val k = kernel(frames)
    in.mapPartitions(_.map(r => k(r.getLong(0), r.getAs[Array[Byte]](1))))
  }
}
