package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch UDFs.
  *
  * The decode kernels are REAL from-spec codecs behind the
  * [[DecodeKernel]] seam — [[ImageCodec]] (BMP/PPM/PNG/GIF/TIFF/JPEG),
  * [[AudioCodec]] (WAV PCM/G.711/ADPCM) and [[FlacCodec]] — each
  * oracle-gated; [[stubDecode]] remains only as the seam's synthetic
  * reference kernel (R14SeamSpec proves downstream stages are kernel-
  * agnostic).  The Spark-side plumbing is shared: binary schema,
  * per-partition batched iteration (the Scala analogue of `mapInPandas`
  * batch shape), fixed-width feature vectors, frame sampling by byte
  * ranges.
  *
  * At 100 TB the payloads dominate: every op here is a narrow map (no
  * shuffle), metadata extraction prunes to (id, meta) before any wide op,
  * and frame/feature outputs are fixed-width so downstream batching is
  * predictable.
  */
object MultimodalOps {

  /** A decoded media record: the stand-in for (pixels/samples, shape).
    * Features are double so the fake decode is exactly reproducible in the
    * SQL oracle (single IEEE division, no float double-rounding). */
  final case class MediaFeatures(doc_id: Long, byte_len: Long,
      width: Int, height: Int, features: Array[Double])

  /** Attach an opaque binary payload column (here: the utf-8 text bytes —
    * in production this column comes straight from the media store). */
  def withPayload(df: DataFrame, src: Column): DataFrame =
    df.withColumn("payload", src.cast("binary"))

  /** Typed metadata without decoding: byte length + 8-byte header (hex) —
    * the "magic number" sniff that routes payloads to decoders. */
  def metadata(df: DataFrame, payload: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
      octet_length(payload).cast("long").as("byte_len"),
      hex(substring(payload, 1, 8)).as("header_hex"))

  /** Frame sampling: `n` fixed-width byte windows starting at stride
    * boundaries, fingerprinted — the frame-extraction access pattern
    * (seek + bounded read) without a codec. */
  def frameSample(df: DataFrame, text: Column, id: Column,
      n: Int, width: Int): DataFrame =
    df.select(id.as("doc_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => md5(substring(text, (i * width) + 1, lit(width))))))
      .withColumnRenamed("pos", "frame")
      .withColumnRenamed("col", "frame_hash")

  /** Nearest-neighbour resize of a decoded record's feature grid to
    * `dim2` entries plus the new nominal dims — the pointwise,
    * shuffle-free resize contract over whatever kernel produced the
    * record (real codecs via [[ImageCodec.kernel]], or the synthetic
    * [[stubDecode]]).  Source index for target j is
    * `floor(j * dim / dim2)` — the standard nearest map. */
  def stubResize(decoded: DataFrame, w: Int, h: Int, dim2: Int): DataFrame = {
    val dim = size(col("features"))
    decoded
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))
      .withColumn("features",
        transform(sequence(lit(0), lit(dim2 - 1)),
          j => element_at(col("features"),
            floor(j * dim / lit(dim2)).cast("int") + 1)))
  }

  /** Scene-cut detection over per-frame feature grids — the temporal
    * stage of a video training-data pipeline (keyframe sampling for
    * vision-LM corpora): the L1 distance between consecutive frames'
    * feature vectors marks a cut wherever it exceeds `threshold`, the
    * first frame of every scene is its KEYFRAME, and frames are
    * labeled with a running scene id.  Distances are exact sums of
    * exact per-cell means, so the whole derivation is SQL-replayable.
    * The window partitions on the DOC key and orders by frame — frames
    * per document are bounded (seconds × fps), documents distribute,
    * so there is no Window-over-SinglePartition at any corpus size.
    * Output: (doc_id, frame, dist, is_cut, scene); dist = −1 for each
    * doc's first frame (a scene start by definition). */
  def sceneCuts(frames: DataFrame, docId: Column, frameIdx: Column,
      features: Column, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    frames
      .select(docId.cast("long").as("doc_id"),
        frameIdx.cast("long").as("frame"), features.as("__feat"))
      .withColumn("__prev", lag(col("__feat"), 1).over(w))
      .withColumn("dist",
        when(col("__prev").isNull, lit(-1.0)).otherwise(
          aggregate(zip_with(col("__feat"), col("__prev"),
            (a, b) => abs(a - b)), lit(0.0), (acc, x) => acc + x)))
      .withColumn("is_cut", col("dist") < 0 || col("dist") > threshold)
      .withColumn("scene",
        (sum(col("is_cut").cast("long")).over(w) - 1).cast("long"))
      .select("doc_id", "frame", "dist", "is_cut", "scene")
  }

  /** CLIP-level video near-dup — trimmed/re-encoded copy detection:
    * two videos are near-duplicates when their (distinct) frame-hash
    * SETS overlap, even if neither container byte-matches and the
    * copies are trimmed or reordered.  Shape: distinct (doc, key)
    * projection → equality join on the frame key (single shuffle,
    * bucket-bounded like every hash-keyed dedup tier — never
    * all-pairs) → per-pair intersection count → Jaccard against the
    * per-doc distinct-frame counts.  Output: (doc_a, doc_b, shared,
    * jaccard), doc_a < doc_b, one row per doc pair sharing ≥ 1 frame. */
  def clipOverlapPairs(frames: DataFrame, docId: Column,
      frameKey: Column): DataFrame = {
    // persisted: read three times (both join sides + the size counts)
    val dv = frames.select(docId.cast("long").as("doc_id"),
      frameKey.as("__k")).distinct().persist()
    graft.core.CacheScope.register(dv)
    val sz = dv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = dv.as("a").join(dv.as("b"),
        col("a.__k") === col("b.__k") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sz.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "__na"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "__nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        round(col("shared").cast("double") /
          (col("__na") + col("__nb") - col("shared")), 6).as("jaccard"))
  }

  /** Average-hash (aHash) perceptual fingerprint over a decoded feature
    * grid: bit j is set iff features[j] > mean(features) — the classic
    * 64-bit "is this the same image, re-encoded?" near-dup fingerprint
    * (pHash's cheap sibling), here over [[stubDecode]]'s deterministic
    * fake grid: swap the decode for a real codec, the hash is unchanged.
    * Bit weights accumulate as Σ 2^j in double (exact to 2^52, so grids
    * up to 52 cells), sequential fold — a pure narrow codegen expression,
    * no UDF, no shuffle, SQL-replayable. */
  def aHash(features: Column): Column = {
    val n = size(features)
    val mean = aggregate(features, lit(0.0),
      (a, x) => a + x) / n.cast("double")
    // integer shift + bitwise OR, not pow(2,j) double sums: doubles stop
    // being exact past bit 52 and the cast to long overflows at bit 63,
    // capping the hash at 16–32 usable bits; this form is exact for the
    // full 64 (identical values for every narrower width)
    aggregate(
      zip_with(features, sequence(lit(0), n - 1),
        (f, j) => when(f > mean,
          call_function("shiftleft", lit(1L), j.cast("int")))
          .otherwise(lit(0L))),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** Media near-duplicate pairs by identical aHash: the bucket join of the
    * dedup ladder applied to the media tier — one shuffle on the hash,
    * in-bucket id-ordered pairs, never all-pairs.  (Hamming-tolerant
    * variants band the 64 bits exactly like SimHash — see
    * [[DedupOps.simhashCandidates]]; exact-equality is the conservative
    * tier.)  Output: (doc_a, doc_b, ahash). */
  def aHashPairs(decoded: DataFrame, id: Column): DataFrame = {
    val withH = decoded.select(id.cast("long").as("doc_id"),
      aHash(col("features")).as("ahash"))
    withH.as("a").join(withH.as("b"),
        col("a.ahash") === col("b.ahash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ahash").as("ahash"))
  }

  /** Hamming-tolerant media near-dup pairs: the [[aHash]] fingerprint
    * banded SimHash-style ([[DedupOps.simhashCandidates]]'s blocking,
    * applied to the media tier) — the `bits`-bit hash splits into `bands`
    * equal slices; docs colliding on any slice are candidates, and the
    * pointwise popcount(xor) confirm keeps pairs within `maxHamming`.
    * Pigeonhole gives EXACT recall for maxHamming <= bands - 1 (that many
    * differing bits cannot touch every band), so the default 4-band/
    * Hamming-3 tier is lossless over the hash space; looser tolerances
    * must raise `bands` rather than silently drop recall (enforced).
    * One shuffle on (band, key), in-bucket id-ordered pairs, never
    * all-pairs.  SCALE RULE: the band-key cardinality is 2^(bits/bands),
    * and every bucket joins with itself — so the key width must grow
    * with the corpus.  The default 64/4 gives 16-bit band keys (~65k
    * values, the `simhash60` discipline): buckets stay near-linear at
    * corpus scale.  Narrow hashes (e.g. bits=16 → 4-bit keys, 16 values
    * per band) put n/16 of the corpus in every bucket and the candidate
    * join is Θ(n²) — fine for unit fixtures, never for a landed layout.
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b. */
  def aHashBandedPairs(decoded: DataFrame, id: Column, bits: Int = 64,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(bands > 0 && bits % bands == 0,
      s"bits=$bits must split into $bands equal bands")
    require(bits / bands < 64,
      s"band width ${bits / bands} overflows the long mask; raise bands")
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming exceeds the exact-recall bound of " +
        s"$bands-band blocking (${bands - 1}); raise bands")
    val bw = bits / bands
    val mask = (1L << bw) - 1L
    // persist the (id, hash) projection: the candidate self-join reads
    // it from BOTH sides, and without the persist Spark re-executes the
    // upstream decode kernel twice — at corpus scale the decode IS the
    // cost (CacheScope-registered; the consumer releases it after its
    // terminal action, the Bench/Verify convention)
    val withH = decoded.select(id.cast("long").as("doc_id"),
      aHash(col("features")).as("ahash")).persist()
    graft.core.CacheScope.register(withH)
    val banded = withH.select(col("doc_id"), col("ahash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), bw * b).bitwiseAND(mask).as("key"))): _*))
        .as("b"))
      .select(col("doc_id"), col("ahash"), col("b.band").as("band"),
        col("b.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ahash").as("ah_a"), col("b.ahash").as("ah_b"))
      .distinct() // (doc_a, doc_b) determine the hashes: distinct pairs
      .withColumn("hamming",
        bit_count(col("ah_a").bitwiseXOR(col("ah_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** The codec SEAM: a decode kernel maps (doc id, raw payload bytes) to
    * one decoded record — width/height plus the fixed-width feature grid.
    * Production swaps ONE serializable function here (a JNI / imageio /
    * ffmpeg call); every downstream stage — [[aHash]],
    * [[aHashBandedPairs]], [[stubResize]], frame dedup — consumes only
    * the record and is untouched by the swap (R14SeamSpec drives an
    * alternative kernel through decode→aHash→near-dup to prove it). */
  type DecodeKernel = (Long, Array[Byte]) => MediaFeatures

  /** Decode through an arbitrary kernel: per-partition batched iteration
    * (the Scala analogue of `mapInPandas` batch shape), narrow map, no
    * shuffle — the payload bytes never leave the executor that read
    * them. */
  def decodeWith(df: DataFrame, payload: Column, id: Column,
      kernel: DecodeKernel): Dataset[MediaFeatures] = {
    val in = df.select(id.cast("long").as("doc_id"), payload.as("p"))
    implicit val enc = Encoders.product[MediaFeatures]
    in.mapPartitions(_.map(r =>
      kernel(r.getLong(0), r.getAs[Array[Byte]](1))))
  }

  /** SYNTHETIC stand-in kernel — not a real codec (none exists in this
    * container): features are a deterministic md5-derived fake with the
    * REAL record shape.  Marked synthetic in SURVEY §2.8; unshippable as
    * a decoder, shippable as the seam's reference implementation. */
  // one MessageDigest per executor thread, not per record (digest()
  // resets state, so reuse is safe) — the hot-path cost the old
  // per-partition instance paid once
  private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Printable-ASCII projection of a string, ONE BYTE PER CODEPOINT:
    * chars in 0x20..0x7e pass through, everything else becomes '?'.
    * This is the shared text→bytes map for the real-codec fixture
    * queries (`mm_real_*`/`mm_wav_*`/`mm_png_*`/`graph_kcore`): the SQL
    * oracles index text by CHARACTER (`ascii(substr(text, i, 1))`,
    * `length(text)`), so the engine side must too — raw UTF-8 bytes
    * would silently diverge on the first multi-byte character (length
    * in bytes ≠ length in codepoints, and ascii() returns codepoints
    * > 255).  The SQL mirror is `regexp_replace(text, '[^ -~]', '?',
    * 'g')`.  Iterates CODEPOINTS (not UTF-16 units) so supplementary
    * characters count once, matching SQL's substr/length. */
  def asciiBytes(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    s.codePoints().forEach { cp =>
      out.write(if (cp >= 0x20 && cp <= 0x7e) cp else '?')
    }
    out.toByteArray
  }

  def stubKernel(dim: Int = 8): DecodeKernel = (docId, bytes) => {
    val digest = md5Local.get().digest(bytes)
    MediaFeatures(docId, bytes.length.toLong,
      width = 64 + (digest(0) & 0x3f), height = 64 + (digest(1) & 0x3f),
      features = Array.tabulate(dim)(j => (digest(j % 16) & 0xff) / 255.0))
  }

  def stubDecode(df: DataFrame, payload: Column, id: Column,
      dim: Int = 8): Dataset[MediaFeatures] =
    decodeWith(df, payload, id, stubKernel(dim))
}
