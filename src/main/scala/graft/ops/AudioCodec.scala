package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}

/** Dependency-free audio codec for PCM WAV (RIFF container, 16-bit mono
  * little-endian — the uncompressed interchange format), written from the
  * public RIFF/WAVE format description.  The audio sibling of
  * [[ImageCodec]]: real container parsing (chunk walk, unknown chunks
  * skipped, fmt validated before data), real sample reads, and a
  * frame-energy feature kernel whose arithmetic is integer until one IEEE
  * division per frame — so the SQL oracle replays features exactly from
  * the source that generated the samples.
  *
  * Unsupported shapes (stereo, non-PCM format tags, 8/24/32-bit,
  * truncated chunks) fail loudly — a decoder silently misreading samples
  * would poison every downstream fingerprint.
  */
object AudioCodec {

  /** A decoded audio record: container stats + fixed-width frame
    * features (mean |amplitude| per frame — the energy envelope). */
  final case class AudioFeatures(doc_id: Long, byte_len: Long,
      sample_rate: Int, n_samples: Long, features: Array[Double])

  // ---- encoder (fixture/query side) ---------------------------------------

  /** Canonical 44-byte-header PCM WAV: RIFF + fmt (PCM, mono, 16-bit) +
    * data. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "bad wav args")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(1)                    // PCM, mono
    out.putInt(sampleRate).putInt(sampleRate * 2)  // byte rate
    out.putShort(2).putShort(16)                   // block align, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
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

  // ---- decoder -------------------------------------------------------------

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Parse the RIFF chunk walk and return (sampleRate, 16-bit samples).
    * Unknown chunks (LIST, fact, …) are skipped with word alignment; the
    * fmt chunk must precede data and declare PCM / mono / 16-bit. */
  def decodeWav(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 44, "truncated WAV header")
    require(new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var p = 12
    var rate = -1
    while (p + 8 <= b.length) {
      val cid = new String(b, p, 4, "US-ASCII")
      val len = i32(b, p + 4)
      require(len >= 0 && p + 8 + len <= b.length,
        s"truncated '$cid' chunk")
      if (cid == "fmt ") {
        require(len >= 16, "short fmt chunk")
        require(u16(b, p + 8) == 1, "only PCM (format tag 1) supported")
        require(u16(b, p + 10) == 1, "only mono supported")
        rate = i32(b, p + 12)
        require(u16(b, p + 22) == 16, "only 16-bit samples supported")
      } else if (cid == "data") {
        require(rate > 0, "data chunk before fmt")
        require(len % 2 == 0, "odd data length for 16-bit samples")
        val n = len / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (u16(b, p + 8 + 2 * i) & 0xffff).toShort
          i += 1
        }
        return (rate, samples)
      }
      p += 8 + len + (len & 1)  // RIFF chunks are word-aligned
    }
    throw new IllegalArgumentException("no data chunk found")
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
      val (rate, s) = decodeWav(bytes)
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
