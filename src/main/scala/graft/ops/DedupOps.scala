package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: hash-groupBy — one shuffle on a 32-byte digest, no raw text
  *    movement.
  *  - n-gram Jaccard: shingle→inverted-index self-join.  The document-
  *    frequency cap is the skew guard: a shingle appearing in > maxDocFreq
  *    docs ("stop shingle") would create a quadratic join blow-up at scale
  *    and carries no dedup signal, so it is dropped BEFORE the join.
  *  - MinHash + LSH banding: per-row signatures (no shuffle), then one
  *    shuffle on (band, bandKey) buckets — candidate pairs only, never the
  *    full cross product.
  *  - SimHash: per-row 16-bit signature; near-dups share a signature (or a
  *    signature within Hamming distance via multi-probe, caller-side).
  *  - embedding cosine: exact pairwise within caller-chosen blocks; the
  *    scale path is [[SimilarityOps.lshBuckets]] first, cosine within
  *    buckets only.
  *
  * All hashing is md5-derived (deterministic, retry-safe, oracle-
  * reproducible); no rand().
  */
object DedupOps {

  /** Exact duplicate groups by content digest: (text_hash, keeper = min id,
    * dup_cnt).  Keep only `dup_cnt > 1` for the actual duplicates. */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("text_hash"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("dup_cnt"))

  /** Exact-dedup projection: keeps the lowest-id row per distinct text. */
  def exactDedup(df: DataFrame, text: Column, id: Column): DataFrame = {
    val keep = exactGroups(df, text, id).select(col("keeper_id"))
    df.join(keep, id === col("keeper_id"), "left_semi")
  }

  /** Distinct word-3-shingle digests per document (the inverted-index
    * postings), document-frequency-capped. */
  def shinglePostings(df: DataFrame, text: Column, id: Column,
      k: Int = 3, maxDocFreq: Long = 100): DataFrame = {
    val post = df
      .select(id.as("doc_id"),
        explode(array_distinct(
          transform(TextOps.wordShingles(TextOps.tokens(text), k),
            s => md5(s)))).as("sh"))
    val rare = post.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq)
      .select("sh")
    post.join(rare, Seq("sh"), "left_semi")
  }

  /** Candidate near-dup pairs by n-gram Jaccard similarity >= `minJaccard`.
    * Output: (doc_a, doc_b, common, size_a, size_b, jaccard) with
    * doc_a < doc_b. */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column,
      k: Int = 3, maxDocFreq: Long = 100,
      minJaccard: Double = 0.2): DataFrame = {
    val post = shinglePostings(df, text, id, k, maxDocFreq)
    val sizes = post.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = post.as("a").join(post.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "size_b"), Seq("doc_b"))
      .withColumn("jaccard", round(
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double"), 6))
      .where(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
  }

  /** Per-document MinHash signature: `numHashes` md5-family min-hashes over
    * word-k-shingles.  Pure per-row expression — signatures cost no
    * shuffle. */
  def minhashSignature(text: Column, k: Int = 3,
      numHashes: Int = 16): Column = {
    val shingles = array_distinct(TextOps.wordShingles(TextOps.tokens(text), k))
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      array_min(transform(shingles, s =>
        conv(substring(md5(concat(j.cast("string"), lit(":"), s)), 1, 15),
          16, 10).cast("long"))))
  }

  /** LSH banding: (doc_id, band, band_key) — docs sharing a band_key in any
    * band are near-dup candidates.  bandsize rows per doc; one shuffle on
    * the bucket key finds candidates without a cross product. */
  def minhashBands(df: DataFrame, text: Column, id: Column,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df.select(id.as("doc_id"),
      minhashSignature(text, k, numHashes).as("sig"))
    sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            md5(concat_ws(",",
              transform(slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand)),
                x => x.cast("string")))).as("band_key")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.band_key").as("band_key"))
  }

  /** Candidate near-dup pairs from LSH buckets: (doc_a, doc_b) distinct. */
  def minhashCandidates(df: DataFrame, text: Column, id: Column,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val b = minhashBands(df, text, id, k, numHashes, bands)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash over whitespace tokens (with multiplicity): bit i is the
    * sign of the token-population vote, where each token votes +1/-1 by bit
    * i of its 16-bit md5-derived hash.  Integer votes, so the per-row value
    * is associativity-independent and oracle-exact. */
  def simhash16(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val hashes = transform(toks, t =>
      conv(substring(md5(t), 1, 4), 16, 10).cast("int"))
    (0 until 16).map { i =>
      val vote = aggregate(hashes, lit(0),
        (v, h) => v + when(shiftright(h, i).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(vote > 0, lit(1 << i)).otherwise(0)
    }.reduce(_ + _)
  }

  /** Exact embedding near-duplicate pairs: cosine >= `minCosine`, brute
    * force over id-ordered pairs.  Quadratic — for the 100 TB path, bucket
    * with [[SimilarityOps.lshBuckets]] first and run this within buckets. */
  def embeddingPairs(df: DataFrame, vec: Column, id: Column,
      minCosine: Double): DataFrame = {
    val v = df.select(id.as("vid"), vec.as("v"))
    v.as("a").join(v.as("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        round(SimilarityOps.cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .where(col("cos") >= minCosine)
  }
}
