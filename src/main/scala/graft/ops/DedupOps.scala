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

  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def md5Hex(s: String): String = {
    val d = Md5Local.get().digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** JVM mirror of the tokenize→k-shingle pipeline in [[TextOps]]
    * (split(lower, \s+) with empties removed; short docs yield one shingle =
    * the whole token string) — byte-identical inputs to the md5 hashes. */
  private def shinglesOf(text: String, k: Int): Array[String] = {
    val toks = Ws.split(text.toLowerCase(java.util.Locale.ROOT), -1)
      .filter(_.nonEmpty)
    if (toks.length >= k)
      Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))
    else Array(toks.mkString(" "))
  }

  /** MinHash signature kernel: for each of `numHashes` hash families j, the
    * minimum over distinct shingles of the first 60 bits of
    * md5("j:shingle") — exactly `conv(substring(md5(...),1,15),16,10)`, so
    * the DuckDB oracle reproduces it verbatim.  A tight JVM loop instead of
    * nested higher-order expressions: HOFs are interpreted per element and
    * were the dominant cost of the whole dedup suite. */
  private def signatureOf(text: String, k: Int, numHashes: Int): Array[Long] = {
    val uniq = shinglesOf(text, k).distinct
    Array.tabulate(numHashes) { j =>
      var min = Long.MaxValue
      var i = 0
      while (i < uniq.length) {
        val h = java.lang.Long.parseLong(
          md5Hex(j.toString + ":" + uniq(i)).substring(0, 15), 16)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

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

  /** Ensure at least default parallelism under the per-row kernels.  A small
    * corpus arrives as one file = one partition, serializing the UDF; at
    * scale the scan already has >= parallelism splits and this is a no-op
    * (checking the physical partition count plans the scan but runs no job). */
  private def parallelized(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Distinct word-3-shingle digests per document (the inverted-index
    * postings), document-frequency-capped. */
  def shinglePostings(df: DataFrame, text: Column, id: Column,
      k: Int = 3, maxDocFreq: Long = 100): DataFrame = {
    // distinct shingle md5s per doc via the JVM kernel (same bytes as
    // md5(concat_ws(' ', shingle)) expressions, ~10× less per-row overhead)
    val hashes = udf((t: String) =>
      if (t == null) null else shinglesOf(t, k).distinct.map(md5Hex))
    val post = parallelized(df)
      .select(id.as("doc_id"), explode(hashes(text)).as("sh"))
    // document-frequency cap via ONE shuffle (window count over sh), not a
    // groupBy + semi-join that shingles the corpus twice
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
    post.withColumn("__df", count(lit(1)).over(w))
      .where(col("__df") <= maxDocFreq)
      .drop("__df")
  }

  /** All ordered id pairs (a < b) within one posting/bucket list.  Bounded:
    * callers cap list length (document-frequency cap / LSH band width), so
    * the per-bucket pair fan-out is ≤ cap²/2, never the corpus cross
    * product. */
  private val orderedPairs = udf((ids: Seq[Long]) => {
    val s = ids.distinct.sorted
    val out = Array.newBuilder[(Long, Long)]
    var i = 0
    while (i < s.length - 1) {
      var j = i + 1
      while (j < s.length) { out += ((s(i), s(j))); j += 1 }
      i += 1
    }
    out.result()
  })

  /** Candidate near-dup pairs by n-gram Jaccard similarity >= `minJaccard`.
    * Output: (doc_a, doc_b, common, size_a, size_b, jaccard) with
    * doc_a < doc_b.
    *
    * Shape: postings are computed ONCE (persisted — they are ~100× smaller
    * than raw text), pair counts come from grouping postings by shingle and
    * expanding in-bucket pairs (bounded by `maxDocFreq`), and the two size
    * lookups are broadcast joins — no self-join recomputation of the
    * shingling, no shuffle of raw text. */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column,
      k: Int = 3, maxDocFreq: Long = 100,
      minJaccard: Double = 0.2): DataFrame = {
    // eager: both the sizes and the pairs branch consume the postings, and
    // AQE submits those independent stages CONCURRENTLY — against a lazy
    // cache they race on the block locks (observed: whole stages stalled at
    // zero CPU waiting for the other branch's cache fill)
    val post = graft.core.CacheScope.persist(
      shinglePostings(df, text, id, k, maxDocFreq), eager = true)
    val sizes = post.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = post.groupBy("sh").agg(collect_list("doc_id").as("ids"))
      .select(explode(orderedPairs(col("ids"))).as("p"))
      .groupBy(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    // the size lookups are one-row-per-document — broadcastable only while
    // the corpus is; no explicit hint, AQE broadcasts when the side fits
    // and falls back to a shuffle join at scale
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
    * word-k-shingles.  Per-row scalar function (no shuffle); see
    * [[signatureOf]] for the kernel and its oracle-parity contract. */
  def minhashSignature(text: Column, k: Int = 3,
      numHashes: Int = 16): Column = {
    val f = udf((t: String) =>
      if (t == null) null else signatureOf(t, k, numHashes))
    f(text)
  }

  /** LSH banding: (doc_id, band, band_key) — docs sharing a band_key in any
    * band are near-dup candidates.  bandsize rows per doc; one shuffle on
    * the bucket key finds candidates without a cross product. */
  def minhashBands(df: DataFrame, text: Column, id: Column,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = parallelized(df).select(id.as("doc_id"),
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

  /** Candidate near-dup pairs from LSH buckets: (doc_a, doc_b) distinct.
    * One pass over the bands (signatures computed once), one shuffle to
    * group each (band, band_key) bucket, in-bucket pair expansion —
    * candidates only, never the corpus cross product. */
  def minhashCandidates(df: DataFrame, text: Column, id: Column,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame =
    minhashBands(df, text, id, k, numHashes, bands)
      .groupBy("band", "band_key").agg(collect_list("doc_id").as("ids"))
      .select(explode(orderedPairs(col("ids"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .distinct()

  /** 16-bit SimHash over whitespace tokens (with multiplicity): bit i is the
    * sign of the token-population vote, where each token votes +1/-1 by bit
    * i of its 16-bit md5-derived hash (the first 4 md5 hex chars — exactly
    * `conv(substring(md5(t),1,4),16,10)`, so the oracle reproduces it).
    * Integer votes, so the per-row value is associativity-independent.
    * JVM kernel for the same reason as [[signatureOf]]. */
  def simhash16(text: Column): Column = {
    val f = udf((t: String) => {
      if (t == null) null
      else {
        val toks = Ws.split(t.toLowerCase(java.util.Locale.ROOT), -1)
          .filter(_.nonEmpty)
        val votes = new Array[Int](16)
        toks.foreach { tk =>
          val h = Integer.parseInt(md5Hex(tk).substring(0, 4), 16)
          var i = 0
          while (i < 16) {
            votes(i) += (if (((h >> i) & 1) == 1) 1 else -1); i += 1
          }
        }
        var sig = 0
        var i = 0
        while (i < 16) { if (votes(i) > 0) sig |= 1 << i; i += 1 }
        java.lang.Integer.valueOf(sig)
      }
    })
    f(text)
  }

  /** SimHash near-dup candidates: docs whose 16-bit signatures share the
    * low or high byte (standard simhash blocking — every pair within
    * Hamming distance bounded by one byte-flip region collides in at least
    * one band).  Same bucket-expansion shape as MinHash banding. */
  def simhashCandidates(df: DataFrame, text: Column, id: Column): DataFrame = {
    val sig = parallelized(df)
      .select(id.as("doc_id"), simhash16(text).cast("long").as("sh"))
    sig.select(col("doc_id"), explode(array(
        struct(lit(0).as("band"), col("sh").bitwiseAND(255).as("key")),
        struct(lit(1).as("band"), shiftright(col("sh"), 8).as("key")))).as("b"))
      .groupBy(col("b.band"), col("b.key"))
      .agg(collect_list("doc_id").as("ids"))
      .select(explode(orderedPairs(col("ids"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .distinct()
  }

  /** Duplicate-cluster extraction: connected components over a candidate
    * pair list ((doc_a, doc_b), doc_a < doc_b — the output shape of
    * [[minhashCandidates]] / [[simhashCandidates]] / [[ngramJaccardPairs]]),
    * labeling every document in any pair with the MINIMUM doc id reachable
    * through the pair graph.  Output: (doc_id, keeper_id); `doc_id ==
    * keeper_id` marks the row to keep, everything else is a duplicate — the
    * step that turns pair lists into an actual dedup decision.
    *
    * Physical shape: iterative min-label propagation with pointer jumping —
    * each round takes the min over neighbours' labels (one shuffle on the
    * edge list) and then path-halves (label := label's label, one
    * self-join), giving O(log diameter) rounds instead of O(diameter);
    * LSH candidate clusters are near-cliques, so 2-3 rounds converge.
    * Each round's label table is persisted and the previous one released —
    * the working set is one (doc_id, keeper_id) pair per UNIQUE doc in the
    * pair list, far smaller than the corpus.  Pure integer min: the result
    * is deterministic regardless of partitioning or iteration count.
    *
    * The reference has no graph step (its dedup surface stops at exact
    * hashes); this mirrors the standard MinHash-dedup postprocessing
    * (union-find over candidate pairs). */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = graft.core.CacheScope.persist(
      pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst"))
        .unionByName(pairs.select(col("doc_b").cast("long").as("src"),
          col("doc_a").cast("long").as("dst"))),
      eager = true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("keeper_id", col("doc_id"))
      .persist()
    var prev: DataFrame = null
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // min over neighbours' current labels
      val nbr = edges
        .join(labels.select(col("doc_id").as("dst"),
          col("keeper_id").as("dst_keeper")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min("dst_keeper").as("nbr_min"))
      val stepped = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("keeper_id"),
            coalesce(col("nbr_min"), col("keeper_id"))).as("keeper_id"),
          col("keeper_id").as("old_keeper"))
      // pointer jumping: keeper := keeper's keeper (halves chain length)
      val jumped = stepped
        .join(stepped.select(col("doc_id").as("keeper_id"),
          col("keeper_id").as("jump")), Seq("keeper_id"), "left")
        .select(col("doc_id"),
          coalesce(col("jump"), col("keeper_id")).as("keeper_id"),
          (coalesce(col("jump"), col("keeper_id")) =!= col("old_keeper"))
            .as("chg"))
      if (prev != null) prev.unpersist(blocking = false)
      prev = labels
      labels = jumped.persist()
      changed = labels.where(col("chg")).count()
      i += 1
    }
    if (prev != null) prev.unpersist(blocking = false)
    // hand the final table to the scope so the caller's release() drops it
    graft.core.CacheScope.register(labels)
    labels.select("doc_id", "keeper_id")
  }

  /** Exact embedding near-duplicate pairs: cosine >= `minCosine` over all
    * id-ordered pairs (vec_a < vec_b).
    *
    * Two physical plans behind one signature, switched on the corpus size:
    *
    *  - `n <= maxDriverRows`: the corpus slice is broadcast once (ids
    *    ascending, norms precomputed per row — NOT per pair), the pair space
    *    is partitioned over executors by left-row index, and the O(n²·d)
    *    kernel runs as tight primitive-double loops — no per-pair array
    *    re-materialization.  This is the inner loop of the 100 TB path,
    *    which buckets with [[SimilarityOps.lshBuckets]] first and runs the
    *    kernel within each (always driver-sized) bucket.
    *  - larger corpora: a distributed self-join on `vec_a < vec_b` with the
    *    codegen'd [[graft.functions.VecKernels]] dot/norm — still O(n²·d)
    *    work (inherent to EXACT all-pairs) but executor-memory-bound, never
    *    a driver collect.
    *
    * Determinism/oracle parity (both paths): dot and norm are sequential
    * left folds from 0.0 in index order, cosine = dot / (sqrt(n2a)·sqrt(n2b)),
    * rounded half-up at 6 decimals (BigDecimal HALF_UP — bit-identical to
    * Spark's `round(col, 6)` and the DuckDB oracle's fold order). */
  def embeddingPairs(df: DataFrame, vec: Column, id: Column,
      minCosine: Double, maxDriverRows: Long = 1L << 20): DataFrame = {
    val base = df.select(id.cast("long").as("vid"),
      vec.cast("array<double>").as("v"))
    if (base.count() > maxDriverRows) {
      import graft.functions.VecKernels
      val withN = base.withColumn("__nrm", sqrt(VecKernels.norm2(col("v"))))
      val a = withN.select(col("vid").as("vec_a"), col("v").as("__va"),
        col("__nrm").as("__na"))
      val b = withN.select(col("vid").as("vec_b"), col("v").as("__vb"),
        col("__nrm").as("__nb"))
      return a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cos", round(
          VecKernels.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
        .where(col("cos") >= minCosine)
        .select("vec_a", "vec_b", "cos")
    }
    val spark = df.sparkSession
    val collected = base
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val ids = collected.map(_._1)
    val vecs = collected.map(_._2)
    val norms = vecs.map { a =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      math.sqrt(s)
    }
    val n = ids.length
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    val slices = math.max(1, math.min(n, 8 * spark.sparkContext.defaultParallelism))
    val pairs = spark.sparkContext
      .parallelize(0 until n, slices)
      .flatMap { i =>
        val (bIds, bVecs, bNorms) = bc.value
        val a = bVecs(i)
        val d = a.length
        (i + 1 until bIds.length).iterator.flatMap { j =>
          val b = bVecs(j)
          var dot = 0.0; var k = 0
          while (k < d) { dot += a(k) * b(k); k += 1 }
          val cos = java.math.BigDecimal.valueOf(dot / (bNorms(i) * bNorms(j)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (cos >= minCosine) Iterator.single((bIds(i), bIds(j), cos))
          else Iterator.empty
        }
      }
    spark.createDataFrame(pairs).toDF("vec_a", "vec_b", "cos")
  }
}
