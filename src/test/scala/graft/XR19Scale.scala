package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): the round-19 probe behind
  * `mm_y4m_frame_neardup` — perceptual frame-level video near-dup at
  * 10× scale with planted NEAR-IDENTICAL (not identical) frames.
  *
  * Corpus: `nDocs` docs × 3 Y4M frames each (default 50 000 docs =
  * 150 000 frames, 10× the sf0.1 documents table), decoded through the
  * REAL codec path (encodeY4m → decodeY4mFrames → rasterFeatures 8×8).
  * Planted structure, all near-identical by one-pixel +1 nudges:
  *
  *  - intra-doc: every doc's frame 2 is its frame 0 with pixel 0
  *    nudged — the re-encode shape the oracle query plants;
  *  - cross-doc: the first 60 docs share one base text, each with its
  *    OWN nudge pixel (doc mod 64) — a near-identical clique whose
  *    members never agree byte-for-byte.
  *
  * Asserted (the 64/4/Hamming-3 blocking is pigeonhole-EXACT, so
  * banded must equal brute force wherever brute force is computable
  * cheaply):
  *
  *  1. banded ∩ intra-doc pairs == the TRUE hamming-≤3 intra-doc set
  *     (computed per doc, O(n));
  *  2. banded ∩ clique×clique == the true hamming-≤3 clique pairs
  *     (180 keys, brute-forced on the driver);
  *  3. bucket populations stay bounded: max bucket ≤ clique size +
  *     corpus/1000 (linear in dup density, not corpus size), and
  *     total band candidates stay within a small multiple of truth —
  *     the XR18Scale scale law at (doc, frame) granularity.
  *
  * Run:  sbt 'Test/runMain graft.XR19Scale [nDocs]' */
object XR19Scale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{ImageCodec, MultimodalOps, VideoCodec}

    val cliqueN = 60L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      md5(concat(lit("v"),
        when(col("id") < cliqueN, lit(-1L)).otherwise(col("id"))
          .cast("string"))).as("text"))

    // the real per-frame decode path of mm_y4m_frame_neardup, plus the
    // clique's per-doc nudge pixel (doc mod 64) on every frame
    val frameFeats = udf((id: Long, text: String) => {
      val src = MultimodalOps.asciiBytes(text)
      val nudgeJ = (id % 64).toInt
      def px(f: Int)(x: Int, y: Int): Int = {
        val j = y * 8 + x
        val base = src((j + 29 * (if (f == 2) 0 else f)) % src.length) & 0xff
        val bump = (f == 2 && j == 0) || (id < 60L && j == nudgeJ)
        if (bump) (base + 1) % 256 else base
      }
      val frames: Seq[(Int, Int) => Int] = (0 until 3).map(f => px(f) _)
      VideoCodec.decodeY4mFrames(
        VideoCodec.encodeY4m(8, 8, frames, chroma = "420"))
        .map(r => ImageCodec.rasterFeatures(r, 8, 8).toSeq)
    })
    val perFrame = docs
      .select(col("doc_id"), posexplode(frameFeats(col("doc_id"),
        col("text"))))
      .select((col("doc_id") * 4 + col("pos")).as("key"),
        col("col").as("features"))
      .persist()
    val nKeys = perFrame.count()
    require(nKeys == nDocs * 3, s"decode lost frames: $nKeys")

    val hashes = perFrame.select(col("key"),
      MultimodalOps.aHash(col("features")).as("ahash")).persist()

    val t0 = System.nanoTime()
    val banded = MultimodalOps.aHashBandedPairs(perFrame, col("key"),
      bits = 64, bands = 4, maxHamming = 3).persist()
    val nBanded = banded.count()
    val sBanded = (System.nanoTime() - t0) / 1e9

    // 1. intra-doc truth (O(n): 3 pairs per doc), must match exactly
    val h2 = hashes.select(shiftrightunsigned(col("key"), 2).as("doc"),
      col("key"), col("ahash"))
    val intraTrue = h2.as("a").join(h2.as("b"),
        col("a.doc") === col("b.doc") && col("a.key") < col("b.key"))
      .select(col("a.key").as("doc_a"), col("b.key").as("doc_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= 3)
    val bandedIntra = banded.where(
      shiftrightunsigned(col("doc_a"), 2) ===
        shiftrightunsigned(col("doc_b"), 2))
    val nIntraTrue = intraTrue.count()
    val nIntraMiss = intraTrue.join(bandedIntra, Seq("doc_a", "doc_b"),
      "left_anti").count()
    val nIntraExtra = bandedIntra.join(intraTrue, Seq("doc_a", "doc_b"),
      "left_anti").count()
    require(nIntraMiss == 0 && nIntraExtra == 0,
      s"intra-doc recall broken: $nIntraMiss missed, $nIntraExtra extra" +
        s" of $nIntraTrue true pairs")
    // the planted frame-0→frame-2 nudge must dominate: nearly every doc
    // contributes its pair (a one-pixel +1 flips at most a few
    // borderline mean bits)
    require(nIntraTrue >= nDocs / 2,
      s"planted intra-doc near-dups unexpectedly rare: $nIntraTrue")

    // 2. clique truth: 180 keys, brute-forced on the driver
    val cl = hashes.where(shiftrightunsigned(col("key"), 2) < cliqueN)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(cl.length == cliqueN * 3)
    val clTrue = (for {
      (ka, ha) <- cl; (kb, hb) <- cl
      if ka < kb && (ka >> 2) != (kb >> 2)
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ka, kb)).toSet
    val bandedClique = banded.where(
        shiftrightunsigned(col("doc_a"), 2) < cliqueN &&
          shiftrightunsigned(col("doc_b"), 2) < cliqueN &&
          shiftrightunsigned(col("doc_a"), 2) =!=
            shiftrightunsigned(col("doc_b"), 2))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    require(bandedClique == clTrue,
      s"clique recovery broken: banded ${bandedClique.size} vs true " +
        s"${clTrue.size} (missed ${(clTrue -- bandedClique).size}, " +
        s"extra ${(bandedClique -- clTrue).size})")

    // 3. the XR18Scale bucket law at (doc, frame) granularity
    val bw = 16; val mask = (1L << bw) - 1L
    val buckets = hashes.select(explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), bw * b).bitwiseAND(mask)
            .as("bkey"))): _*)).as("bk"))
      .groupBy(col("bk.band"), col("bk.bkey"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")), sum((col("c") * (col("c") - 1) / 2)
        .cast("long"))).head()
    val maxBucket = buckets.getLong(0)
    val candidates = buckets.getLong(1)
    require(maxBucket <= cliqueN * 3 + nKeys / 1000,
      s"banded blocking saturating: max bucket $maxBucket")
    val truePairs = nIntraTrue + clTrue.size
    require(candidates <= truePairs * 4 + nKeys * 16,
      s"candidates out of band: $candidates vs truth $truePairs")

    println(f"PROBE nDocs=$nDocs keys=$nKeys | banded pairs=$nBanded" +
      f" ($sBanded%.1fs) | intra-doc true=$nIntraTrue (0 missed/extra)" +
      f" | clique true=${clTrue.size} recovered exactly" +
      f" | maxBucket=$maxBucket candidates=$candidates")
    spark.stop()
  }
}
