package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): the round-18 banding-cardinality probe — the
  * measurement behind re-landing `Tables.nearDupPairs` on the 64-bit
  * aHash.  Over a 10× corpus it derives the per-(band, key) bucket
  * populations and LSH candidate-pair counts for BOTH hash widths and
  * asserts the scale law directly:
  *
  *  - bits=16 / bands=4 → 4-bit band keys, 16 distinct values: every
  *    bucket holds ~n/16 of the corpus, candidates grow Θ(n²).  The
  *    probe asserts the max bucket exceeds n/64 — saturation is not a
  *    risk but a certainty (pigeonhole over 16 values).
  *  - bits=64 / bands=4 → 16-bit band keys (~65k values, the simhash60
  *    discipline): buckets are clique-sized + rare accidental
  *    collisions; the probe asserts the max NON-PLANTED bucket stays
  *    ≤ 1/1000 of the corpus and total candidates stay within a small
  *    multiple of true pairs.
  *
  * Run:  sbt 'Test/runMain graft.XR18Scale [nDocs]'
  * (defaults to 50 000 docs = 10× the sf0.1 documents table). */
object XR18Scale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{ImageCodec, MultimodalOps}

    // the nearDupPairs derivation shape: printable texts, a planted
    // 60-doc hamming-0 clique, BMP even / PPM odd, kernel(8,8)
    val cliqueN = 60L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      md5(concat(lit("p"),
        when(col("id") < cliqueN, lit(-1L)).otherwise(col("id"))
          .cast("string"))).as("text"))
    val toImg = udf((id: Long, text: String) =>
      ImageCodec.grayFromBytes(8, 8, MultimodalOps.asciiBytes(text),
        id % 2 == 1))
    val decoded = MultimodalOps.decodeWith(
      docs.withColumn("payload", toImg(col("doc_id"), col("text"))),
      col("payload"), col("doc_id"), ImageCodec.kernel(8, 8)).toDF()
      .persist()
    require(decoded.count() == nDocs)

    // per-(band, key) populations for a given (bits, bands) blocking —
    // the exact key derivation aHashBandedPairs shuffles on
    def bucketStats(bits: Int, bands: Int): (Long, Long, Long) = {
      val bw = bits / bands
      val mask = (1L << bw) - 1L
      val hashed = decoded.select(
        MultimodalOps.aHash(col("features")).as("ahash"))
      val buckets = hashed.select(explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("ahash"), bw * b).bitwiseAND(mask)
              .as("key"))): _*)).as("bk"))
        .groupBy(col("bk.band"), col("bk.key"))
        .agg(count(lit(1)).as("c"))
      val r = buckets.agg(max(col("c")),
        sum((col("c") * (col("c") - 1) / 2).cast("long")),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    val t16 = System.nanoTime()
    val (max16, cand16, nb16) = bucketStats(bits = 16, bands = 4)
    val s16 = (System.nanoTime() - t16) / 1e9
    val t64 = System.nanoTime()
    val (max64, cand64, nb64) = bucketStats(bits = 64, bands = 4)
    val s64 = (System.nanoTime() - t64) / 1e9

    // 16-bit: saturation is a pigeonhole certainty — 4-bit keys, 16
    // values per band, so SOME bucket holds ≥ n/16; assert the weaker
    // n/64 so the bound is loose against any skew direction
    require(max16 >= nDocs / 64,
      s"16-bit blocking unexpectedly sparse: max bucket $max16")
    // 64-bit: buckets are the planted clique plus accidental collisions
    // (~n/65536 expected extras per key); max bucket must stay ≤
    // clique + n/1000 — linear in dup density, NOT in corpus size
    require(max64 <= cliqueN + nDocs / 1000,
      s"64-bit blocking saturating: max bucket $max64")
    // candidate-pair blow-up: 16-bit candidates are Θ(n²/64)-ish — at
    // 50k docs that is ≥ 10M; 64-bit candidates stay within a small
    // multiple of the planted-clique truth (bands× the clique pairs,
    // plus rare accidentals)
    val truePairs = cliqueN * (cliqueN - 1) / 2
    require(cand16 > cand64 * 100,
      s"expected ≥100× candidate gap, got 16-bit=$cand16 64-bit=$cand64")
    // bounded candidates PER DOC (measured ~4/doc at 50k: the md5-
    // derived rasters are not uniform over 16-bit keys, so allow 16),
    // plus the clique's own band hits — linear in n, not quadratic
    require(cand64 <= truePairs * 4 + nDocs * 16,
      s"64-bit candidates out of band: $cand64 vs truth $truePairs")

    println(f"PROBE nDocs=$nDocs | 16-bit: maxBucket=$max16" +
      f" candidates=$cand16 buckets=$nb16 ($s16%.1fs)" +
      f" | 64-bit: maxBucket=$max64 candidates=$cand64 buckets=$nb64" +
      f" ($s64%.1fs) | truePairs=$truePairs")

    // Y4M frame-level dedup at 10×: 3 frames/doc through the real
    // container, md5-bucketed luma join — the planted clique's docs
    // share ALL frames, so its pair count is exactly 3·C(cliqueN,2)
    // plus cross-frame/cross-doc accidentals; the md5 bucket key keeps
    // the join linear in true-duplicate density
    val t0 = System.nanoTime()
    val frameHashes = udf((id: Long, text: String) => {
      val src = graft.ops.MultimodalOps.asciiBytes(text)
      graft.ops.VideoCodec.decodeY4mFrames(graft.ops.VideoCodec.encodeY4m(
        8, 8, (0 until 3).map { f =>
          (x: Int, y: Int) => src((y * 8 + x + 29 * f) % src.length) & 0xff
        }, chroma = "420"))
        .map(r => r.lumaSum3.mkString(","))
    })
    val fr = docs.select(col("doc_id"),
        posexplode(frameHashes(col("doc_id"), col("text"))))
      .select(col("doc_id"), col("pos").as("frame"),
        md5(col("col")).as("k"))
      .persist()
    val nFrames = fr.count()
    require(nFrames == nDocs * 3)
    val dupPairs = fr.as("a").join(fr.as("b"),
        col("a.k") === col("b.k") &&
          (col("a.doc_id") < col("b.doc_id") ||
            (col("a.doc_id") === col("b.doc_id") &&
              col("a.frame") < col("b.frame"))))
      .count()
    val tY4m = (System.nanoTime() - t0) / 1e9
    require(dupPairs >= 3L * cliqueN * (cliqueN - 1) / 2,
      s"planted clique frame pairs missing: $dupPairs")
    // linear-in-dup-density, not quadratic-in-corpus: the accidental
    // tail stays a small multiple of the corpus size
    require(dupPairs <= 3L * cliqueN * (cliqueN - 1) / 2 + nDocs * 8,
      s"frame-dup pairs out of band: $dupPairs")
    println(f"PROBE y4mFrames=$nFrames dupPairs=$dupPairs tY4m=$tY4m%.1fs")
    spark.stop()
  }
}
