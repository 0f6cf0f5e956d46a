package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row is
  * assigned to a named split (train/val/test) as a pure function of
  * (seed, key) — no rand(), no sampling state, no coordination.
  *
  * This is the 100 TB-safe form of the reference's index-list splits
  * (reference: training_experiments/data/loader.py:387-448 builds per-split
  * row-index arrays on the driver): a hash split needs no materialized index,
  * is stable under retries/speculation, keeps every row's assignment
  * reproducible forever (adding data never reshuffles old rows), and pushes
  * down as an ordinary filter predicate — so a `train` scan prunes at the
  * parquet level when the split column is written out / partitioned on.
  *
  * The hash is the md5-uniform of [[graft.core.Rng.Md5]], so assignments are
  * reproducible in ANSI SQL (the oracle) and in any engine with md5.
  */
object SplitOps {

  /** Curriculum schedule over a difficulty score (Bengio et al. 2009
    * curriculum learning, in the bucketed-interleave form production
    * pipelines use): rows are ranked easy→hard, cut into `nBuckets`
    * equal-depth difficulty buckets, and scheduled round-robin across
    * buckets — consuming in `sched_key` order yields a gentle difficulty
    * ramp WITH per-step mixing (pure sorted order starves late training
    * of easy examples; pure shuffle has no ramp).
    *
    * Everything is closed-form integer arithmetic over ONE global
    * range-partitioned rank ([[graft.core.Ranker]], no single-partition
    * window): bucket = rank·B DIV n, position = rank − ⌈bucket·n/B⌉,
    * sched_key = position·B + bucket.  Exactly replayable in SQL; the
    * sched_key order is a total order (deterministic ties by id).
    *
    * Output: (doc_id, bucket, pos_in_bucket, sched_key). */
  def curriculumOrder(df: DataFrame, score: Column, id: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    // persisted (CacheScope-registered, consumer releases): the narrow
    // (id, score) frame drives two actions — count() and the rank sort —
    // and without the persist an expensive upstream (e.g. the contrastive
    // pipeline's margin stages) would recompute once per action
    val base = graft.core.CacheScope.persist(
      df.select(id.as("doc_id"), score.cast("double").as("__score")))
    val ranked = graft.core.Ranker.withRank(base, "__r",
      col("__score"), col("doc_id"))
    val n = base.count()
    require(n > 0, "curriculumOrder: empty input")
    val b = nBuckets.toLong
    ranked
      .withColumn("bucket", expr(s"__r * ${b}L DIV ${n}L"))
      .withColumn("pos_in_bucket",
        col("__r") - expr(s"(bucket * ${n}L + ${b}L - 1) DIV ${b}L"))
      .select(col("doc_id"), col("bucket"),
        col("pos_in_bucket"),
        (col("pos_in_bucket") * b + col("bucket")).as("sched_key"))
  }

  /** Uniform in [0,1) for (seed, key): first 8 md5 hex chars / 2^32 —
    * `('0x' || substr(md5(concat_ws(':', 'split', seed, key)), 1, 8))::BIGINT
    *  / 4294967296.0` in SQL. */
  def splitUniform(key: Column, seed: Long): Column =
    graft.core.Rng.Md5.uniform(seed, "split", key)

  /** Split name for (seed, key) under cumulative `fractions` (name, frac);
    * fractions must sum to ~1 (the last split absorbs the remainder, so
    * float dust never leaves a row unassigned). */
  def assignSplit(key: Column, seed: Long,
      fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 >= 0.0), "negative fraction")
    val u = splitUniform(key, seed)
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // last split is the otherwise-branch: no row falls through
    fractions.init.zip(cuts.init)
      .foldLeft(null: Column) { case (acc, ((name, _), cut)) =>
        if (acc == null) when(u < cut, name) else acc.when(u < cut, name)
      } match {
      case null => lit(fractions.head._1)
      case w    => w.otherwise(fractions.last._1)
    }
  }

  /** df + a `split` column.  `key` must identify the row stably (a primary
    * key — NOT a position, so re-partitioning or appends never move rows
    * between splits). */
  def withSplit(df: DataFrame, key: Column, seed: Long,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", assignSplit(key, seed, fractions))

  /** One split as a filtered frame — an ordinary predicate, so Catalyst
    * pushes it into the scan. */
  def split(df: DataFrame, key: Column, seed: Long,
      fractions: Seq[(String, Double)], name: String): DataFrame =
    withSplit(df, key, seed, fractions).where(col("split") === name).drop("split")

  /** Leakage-safe split: assign train/val/test by duplicate CLUSTER, not
    * by document — near-duplicates (the `pairs` candidate edges, e.g.
    * [[DedupOps.minhashCandidates]]) never straddle a split boundary, so
    * a test document's near-copy cannot sit in train.  Every cluster
    * member hashes on its cluster's min-id label; untouched documents
    * hash on their own id (which IS their singleton cluster's min id —
    * one uniform keying, no special case in the semantics).
    *
    * Shape: cluster labels from [[DedupOps.dedupClusters]] (duplicate-
    * rate-sized, dual driver/distributed plan), one left join onto the
    * corpus, then the same pure hash predicate as [[withSplit]]. */
  def clusterSplit(df: DataFrame, pairs: DataFrame, id: Column, seed: Long,
      fractions: Seq[(String, Double)]): DataFrame = {
    val clusters = graft.ops.DedupOps.dedupClusters(pairs)
      .select(col("doc_id").as("__cdoc"), col("keeper_id"))
    df.join(clusters, id === col("__cdoc"), "left")
      .withColumn("split",
        assignSplit(coalesce(col("keeper_id"), id), seed, fractions))
      .drop("__cdoc", "keeper_id")
  }

  /** Stratified Bernoulli sample: keep each row with its class's fraction
    * (classes absent from `fractions` keep with `default`).  The fraction
    * lookup is a literal CASE chain and the keep test a pure
    * (seed, key)-hash predicate — zero shuffle, zero state, pushes into
    * the scan like any filter, and the kept set is stable under appends
    * and retries (the `sampleBy` semantics, made deterministic). */
  def stratifiedSample(df: DataFrame, classCol: Column, key: Column,
      seed: Long, fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    require(default >= 0.0 && default <= 1.0, "default must be in [0,1]")
    val u = graft.core.Rng.Md5.uniform(seed, "strat", key)
    val f = fractions.toSeq.sortBy(_._1)
      .foldLeft(null: Column) { case (acc, (cls, fr)) =>
        if (acc == null) when(classCol === cls, fr)
        else acc.when(classCol === cls, fr)
      } match {
      case null => lit(default)
      case w    => w.otherwise(default)
    }
    df.where(u < f)
  }

  /** Temperature-rebalanced sampling: downsample every class to realize
    * target shares ∝ n_c^alpha (alpha < 1 flattens a skewed domain mix —
    * the multilingual-pretraining recipe).  Keep fraction
    * f_c = min(1, (n_c/n_min)^(alpha−1)), anchored at the smallest class
    * (which keeps everything), so kept counts are n_min^(1−alpha)·n_c^alpha.
    *
    * One small-key agg for the per-class counts, a broadcast join of the
    * |classes|-row fraction table, then the same pure hash predicate as
    * [[stratifiedSample]] — the corpus itself never shuffles.  Fractions
    * are rounded to 6 dp so the keep decision is engine-exact (oracle
    * replays the same arithmetic). */
  def temperatureSample(df: DataFrame, classCol: Column, key: Column,
      seed: Long, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(classCol.as("__cls"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val fr = counts.crossJoin(broadcast(nmin))
      .select(col("__cls"),
        round(least(lit(1.0), pow(col("__n") / col("__nmin"), alpha - 1.0)), 6)
          .as("__f"))
    df.join(broadcast(fr), classCol === col("__cls"))
      .where(graft.core.Rng.Md5.uniform(seed, "temp", key) < col("__f"))
      .drop("__cls", "__f")
  }

  /** Token-budget domain mixture: keep a deterministic Bernoulli subset
    * of each class sized so the EXPECTED kept TOKEN mass realizes
    * `weights` shares of `totalTokens` — LM mixtures are specified in
    * tokens, not documents (the Pile/Dolma-style recipe table).  Keep
    * fraction f_c = min(1, totalTokens·w_c/Σw / tokens_c), rounded to
    * 6 dp for engine-exact keep decisions; classes absent from `weights`
    * are dropped.  A class whose corpus holds fewer tokens than its
    * budget caps at 1.0 (kept whole) — re-weight or upsample elsewhere.
    *
    * One token-sum agg per class (map-side-combined longs), a broadcast
    * |classes|-row fraction table, then the [[stratifiedSample]] hash
    * predicate — the corpus itself never shuffles. */
  def tokenMixtureSample(df: DataFrame, classCol: Column, key: Column,
      tokenCount: Column, seed: Long, weights: Map[String, Double],
      totalTokens: Long): DataFrame = {
    require(totalTokens > 0, "totalTokens must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "weights must be non-empty and positive")
    val wsum = weights.values.sum
    val wCase = weights.toSeq.sortBy(_._1)
      .foldLeft(null: Column) { case (acc, (cls, w)) =>
        if (acc == null) when(col("__cls") === cls, lit(w))
        else acc.when(col("__cls") === cls, lit(w))
      }
    val counts = df.groupBy(classCol.as("__cls"))
      .agg(sum(tokenCount).cast("double").as("__toks"))
      .where(col("__cls").isin(weights.keys.toSeq: _*))
    val fr = counts.select(col("__cls"),
      round(least(lit(1.0),
        lit(totalTokens.toDouble) * wCase / lit(wsum) / col("__toks")), 6)
        .as("__f"))
    df.join(broadcast(fr), classCol === col("__cls"))
      .where(graft.core.Rng.Md5.uniform(seed, "tokmix", key) < col("__f"))
      .drop("__cls", "__f")
  }

  /** Domain UPSAMPLING — the other half of mixture realization: when a
    * class's token budget EXCEEDS its corpus (wiki/books in every LLM
    * recipe), emit each document `floor(r_c)` times plus one more with
    * probability `frac(r_c)`, where r_c = budget_c / tokens_c — the
    * epochs-plus-remainder recipe, deterministic per (seed, doc).  Output
    * adds `copy` (0-based copy index; training order should interleave
    * copies, e.g. by hashing (key, copy)).  Classes absent from `weights`
    * are dropped; r_c < 1 degenerates to [[tokenMixtureSample]]'s
    * Bernoulli keep.
    *
    * Shape: the same broadcast fraction table + hash predicate, then a
    * per-row `sequence` explode — fan-out is exactly the repeat factor,
    * no shuffle, no join beyond the |classes|-row broadcast. */
  def upsampleMixture(df: DataFrame, classCol: Column, key: Column,
      tokenCount: Column, seed: Long, weights: Map[String, Double],
      totalTokens: Long): DataFrame = {
    require(totalTokens > 0, "totalTokens must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "weights must be non-empty and positive")
    val wsum = weights.values.sum
    val wCase = weights.toSeq.sortBy(_._1)
      .foldLeft(null: Column) { case (acc, (cls, w)) =>
        if (acc == null) when(col("__cls") === cls, lit(w))
        else acc.when(col("__cls") === cls, lit(w))
      }
    val counts = df.groupBy(classCol.as("__cls"))
      .agg(sum(tokenCount).cast("double").as("__toks"))
      .where(col("__cls").isin(weights.keys.toSeq: _*))
    val fr = counts.select(col("__cls"),
      round(lit(totalTokens.toDouble) * wCase / lit(wsum) / col("__toks"), 6)
        .as("__f"))
    val reps = (floor(col("__f")).cast("int") +
      when(graft.core.Rng.Md5.uniform(seed, "upsamp", key) <
        col("__f") - floor(col("__f")), lit(1)).otherwise(lit(0)))
    df.join(broadcast(fr), classCol === col("__cls"))
      .withColumn("__r", reps)
      .where(col("__r") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__r") - 1)))
      .withColumn("copy", col("copy").cast("long"))
      .drop("__cls", "__f", "__r")
  }

  /** Exact per-class quota: keep a deterministic uniform sample of AT MOST
    * `k` rows per class — the "cap every domain at k documents" op, where
    * Bernoulli sampling can't promise the cap and tiny classes shouldn't
    * be thinned at all.
    *
    * Rank-by-hash inside each class, keep rank ≤ k.  Spark plans the
    * rank ≤ k predicate as WindowGroupLimit: each shuffle task keeps a
    * running top-k heap per class instead of materializing and sorting
    * whole classes, so a billion-row class costs O(k) memory, not a
    * single-task full sort. */
  /** Deterministic weighted source interleave — one totally-ordered
    * training stream where a source with weight w contributes every
    * ~1/w-th position (the batch replay of `interleave_datasets`-style
    * probability mixing, made exact and rank-based so every engine
    * reproduces the same stream).  Each source's rows are ranked by `key`
    * within the source; its r-th row (1-based) gets the integer interleave
    * key  ik = (r · SCALE) div w  (SCALE = 720720 = lcm(1..16), so any
    * weight ≤ 16 divides exactly; `div` = integer division, identical in
    * every engine), and the stream position is the global rank over
    * (ik, class, r) — sources with larger weights recur proportionally
    * more often, round-robin at equal weights.
    *
    * Shape: per-source ranks and the final position both come from
    * [[graft.core.Ranker.withRank]] (range-partitioned sort — never a
    * single-partition window); the per-source pass loops over the weight
    * map, which is a handful of sources by construction.
    * Output: (doc_id, cls, ik, pos). */
  def interleaveBySource(df: DataFrame, classCol: Column, key: Column,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val Scale = 720720L
    val parts = weights.toSeq.sortBy(_._1).map { case (cls, wt) =>
      val sub = df.where(classCol === cls)
        .select(key.cast("long").as("doc_id"), classCol.as("cls"))
      graft.core.Ranker.withRank(sub, "__r0", col("doc_id"))
        .select(col("doc_id"), col("cls"),
          (col("__r0") + 1).as("__r"),
          expr(s"((__r0 + 1) * $Scale) div $wt").as("ik"))
    }
    val all = parts.reduce(_ unionByName _)
    graft.core.Ranker.withRank(all, "pos", col("ik"), col("cls"), col("__r"))
      .select(col("doc_id"), col("cls"), col("ik"), col("pos"))
  }

  /** EXACT-count split: the named `counts` splits receive exactly that
    * many rows each, the remainder lands in `rest` — vs [[withSplit]]'s
    * binomial sizes.  The eval-set contract ("a 50 000-doc held-out set",
    * not "≈1%") needs exact cardinality; assignment order is the
    * deterministic (seed, key) md5 hash with a key tie-break, so the
    * member set is reproducible and independent of partitioning.
    *
    * Unlike [[withSplit]], appending data DOES reassign rows (a new row
    * hashing into the test prefix displaces the old boundary row) — exact
    * counts and append-stability are mutually exclusive; pick per use.
    *
    * Shape: one range-partitioned rank ([[graft.core.Ranker]] — no
    * single-partition window), then a literal CASE on the rank.  Output:
    * input columns + `split`. */
  def exactSplit(df: DataFrame, key: Column, seed: Long,
      counts: Seq[(String, Long)], rest: String = "train"): DataFrame = {
    require(counts.nonEmpty && counts.forall(_._2 > 0), "counts must be > 0")
    val names = counts.map(_._1)
    require(names.distinct == names && !names.contains(rest),
      "split names must be distinct and exclude the rest split")
    val ranked = graft.core.Ranker.withRank(
      df.withColumn("__sk",
        graft.core.Rng.Md5.sortKey(seed, "exact_split", key)),
      "__xr", col("__sk"), key)
    val cuts = counts.scanLeft(0L)(_ + _._2).tail
    val split = counts.zip(cuts)
      .foldLeft(null: Column) { case (acc, ((name, _), cut)) =>
        if (acc == null) when(col("__xr") < cut, name)
        else acc.when(col("__xr") < cut, name)
      }.otherwise(rest)
    ranked.withColumn("split", split).drop("__sk", "__xr")
  }

  /** Deterministic shuffled N-shard export layout (the WebDataset/tfrecord
    * shard convention): every row gets `(shard, pos)` — shard from the
    * (seed, key) md5 uniform, position = the row's rank within its shard
    * under the same hash order (key tie-break) — so writing
    * `partitionBy(shard)` + sort on `pos` yields globally-shuffled,
    * reproducible training shards with no `rand()` and no global sort.
    *
    * Shape: one shuffle on `shard` with an in-shard sort (the window is
    * per-shard).  Pick `nShards` at or above the cluster's parallelism
    * (shards are typically 100s–1000s at 100 TB) — each shard is one sort
    * task, which is exactly the parallelism of the export write itself. */
  def exportShards(df: DataFrame, key: Column, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val sk = graft.core.Rng.Md5.sortKey(seed, "shard", key)
    val w = Window.partitionBy("shard").orderBy(col("__sk"), key)
    df.withColumn("__sk", sk)
      .withColumn("shard",
        pmod(conv(substring(col("__sk"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__sk")
  }

  def quotaSample(df: DataFrame, classCol: Column, key: Column,
      seed: Long, k: Int): DataFrame = {
    require(k > 0, s"quota k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(classCol)
      .orderBy(graft.core.Rng.Md5.sortKey(seed, "quota", key), key)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  /** Per-class WEIGHTED sampling without replacement, exactly k per class:
    * the A-Res reservoir rule (Efraimidis & Spirakis 2006, "Weighted
    * random sampling with a reservoir") — each row draws the key
    * `u^(1/w)` from its md5 uniform `u` and weight `w`, and the k largest
    * keys per class win, so inclusion probability tracks weight share.
    * The distributed form needs no reservoir at all: the key is a pure
    * per-row expression and the per-class top-k plans as a
    * WindowGroupLimit (O(k) state per partition, no full sort).
    *
    * The key is 6-dp rounded with id tie-break so the selected set is
    * oracle-reproducible (`pow` is the one non-correctly-rounded IEEE op
    * in the chain).  Weights must be strictly positive.  Output: the
    * input columns plus `sample_key`. */
  /** Poisson bootstrap resample: each row is emitted `c` times where `c`
    * is Poisson(`lambda`)-distributed — the standard distributed
    * approximation of sampling n-with-replacement-from-n (bagging /
    * bootstrap confidence intervals), exact in the n→∞ limit and
    * embarrassingly parallel because each row draws independently.
    *
    * The draw is inverse-CDF over the row's md5 uniform against PLAN-TIME
    * cumulative Poisson thresholds (computed once on the driver, truncated
    * where the tail probability < 1e-12) — deterministic under retry,
    * oracle-reproducible, no rand().  A pure narrow map + explode: no
    * shuffle, no state.  Output: the input columns plus `copy`
    * (0-based replica index); rows drawing c = 0 disappear. */
  /** Cumulative Poisson thresholds P[X <= k], k = 0.., truncated where the
    * tail probability drops below 1e-12 (k ≈ 12 at λ = 1).  Shared by
    * [[bootstrapSample]] and its SQL oracle so both CASE chains compare
    * the uniform against bit-identical double constants. */
  def poissonCum(lambda: Double): Seq[Double] = {
    // beyond λ ≈ 30, exp(-λ) underflow would make the tail test never
    // terminate — and a bootstrap with λ that large is a modeling error
    require(lambda <= 30.0,
      s"lambda=$lambda too large for the double-precision CDF table")
    Iterator.iterate((0, math.exp(-lambda), math.exp(-lambda))) {
      case (k, pk, c) =>
        val p = pk * lambda / (k + 1); (k + 1, p, c + p)
    }.takeWhile(_._3 < 1.0 - 1e-12).map(_._3).toSeq
  }

  def bootstrapSample(df: DataFrame, key: Column, seed: Long,
      lambda: Double = 1.0): DataFrame = {
    require(lambda > 0, "lambda must be positive")
    val u = graft.core.Rng.Md5.uniform(seed, "boot", key)
    val cum = poissonCum(lambda)
    // copies = smallest k with u < cum(k); u beyond the last threshold
    // takes the truncation bucket cum.size
    val copies = cum.zipWithIndex.foldRight(lit(cum.size)) {
      case ((c, k), rest) => when(u < c, k).otherwise(rest)
    }
    df.withColumn("__c", copies)
      .where(col("__c") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__c") - 1)))
      .drop("__c")
  }

  def weightedQuotaSample(df: DataFrame, classCol: Column, key: Column,
      weight: Column, seed: Long, k: Int): DataFrame = {
    require(k > 0, s"quota k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = graft.core.Rng.Md5.uniform(seed, "wquota", key)
    val akey = round(pow(u, lit(1.0) / weight.cast("double")), 6)
    val w = Window.partitionBy(classCol).orderBy(col("sample_key").desc, key)
    df.withColumn("sample_key", akey)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }
}
