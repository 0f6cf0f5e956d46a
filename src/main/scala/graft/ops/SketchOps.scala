package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable, integer-exact sketch primitives for corpus-scale statistics.
  *
  * Both sketches here are ONE map-side-combined aggregation over the corpus
  * — the canonical 100 TB shape: executors emit tiny partials (a bounded
  * bucket table / a fixed depth×width grid), the shuffle moves only those
  * partials, and merging IS the aggregation, so the result is bit-identical
  * under any partitioning.  Every arithmetic step is integer (bit-length,
  * shifts, modular md5 hashes), so a SQL oracle replays the sketch
  * hash-exactly — no float tolerance anywhere.
  *
  * Reference scope note: the reference engine (scDataset) has no sketch
  * tier at all (SURVEY.md §2.7 gap analysis); these are the extension ops a
  * training-data pipeline needs for percentile dashboards (doc length,
  * price, latency) and approximate frequency (token/domain counts) when the
  * exact distinct key set itself is too large to materialize.
  */
object SketchOps {

  /** HDR-histogram-style log-linear bucket table of a non-negative integer
    * column (Tene's HdrHistogram recipe, expressed relationally).
    *
    * A value v with most-significant-bit position m lands in the bucket
    * keyed by its top `subBits`+1 bits: shift = max(0, m − subBits),
    * key = v >> shift.  Bucket width / lower-bound ≤ 2^−subBits, so any
    * value reconstructed from its bucket carries a guaranteed relative
    * error ≤ 2^−subBits (exact below 2^subBits), while the whole table is
    * bounded by 64·2^(subBits+1) rows regardless of corpus size.
    *
    * All arithmetic is integer: the msb position comes from the length of
    * the base-2 string (`conv(v,10,2)` here, `bin(v)` in the oracle), never
    * from floating log2 — the bucket of every value is engine-exact.
    *
    * Output: (bucket_id, lb, ub, n) — lb/ub the inclusive value bounds.
    * Negative AND NULL inputs fail loudly (a quantile sketch silently
    * dropping rows — or parking them in a null bucket the cumulative scan
    * skips — would shift every rank it reports).
    */
  def hdrHistogram(df: DataFrame, value: Column, subBits: Int): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1,16], got $subBits")
    bucketed(df.select(guardedValue(value, "hdrHistogram").as("__v")),
        subBits)
      .groupBy(col("bucket_id"), col("lb"), col("ub"))
      .agg(count(lit(1)).as("n"))
  }

  /** The shared NULL/negative guard — both histogram forms fail loudly
    * on inputs a quantile sketch must not silently drop or park in a
    * null bucket the cumulative scan would skip. */
  private def guardedValue(value: Column, who: String): Column =
    when(value.isNull,
      raise_error(lit(s"$who: NULL value")).cast("long"))
      .when(value.cast("long") < 0,
        raise_error(concat(lit(s"$who: negative value "),
          value.cast("string"))).cast("long"))
      .otherwise(value.cast("long"))

  /** The shared HDR bucket algebra over a frame carrying `__v`: appends
    * bucket_id, lb, ub.  ONE copy of the msb/shift/key arithmetic and of
    * the ub = lb + (2^sh − 1) form — NOT shiftleft(key+1, sh) − 1, which
    * wraps past Long.MaxValue for the top bucket (ANSI overflow); this
    * form never exceeds the bucket's own max value. */
  private def bucketed(base: DataFrame, subBits: Int): DataFrame =
    base
      .withColumn("__m", (length(conv(col("__v"), 10, 2)) - lit(1)).cast("int"))
      .withColumn("__sh", greatest(lit(0), col("__m") - lit(subBits)))
      .withColumn("__key", expr("shiftright(__v, __sh)"))
      .withColumn("bucket_id",
        col("__sh").cast("long") * lit(1L << (subBits + 1)) + col("__key"))
      .withColumn("lb", expr("shiftleft(__key, __sh)"))
      .withColumn("ub", expr("shiftleft(__key, __sh)") +
        (expr("shiftleft(1L, __sh)") - lit(1L)))

  /** Quantile estimates from the [[hdrHistogram]] bucket table.
    *
    * Quantiles arrive as exact rationals (num, den) — e.g. (999, 1000) for
    * p99.9 — so the target rank ceil(q·n) = (num·n + den − 1) div den is
    * computed in integers; a literal double q·n would round differently
    * across engines at rank boundaries.  The estimate for each q is the
    * [lb, ub] of the first bucket whose cumulative count reaches the rank:
    * the true rank-th smallest value provably lies inside that interval.
    *
    * The cumulative scan runs on the BUCKET table (≤ 64·2^(subBits+1)
    * rows — corpus-size-independent) via [[graft.core.Ranker]]'s
    * range-partitioned rank + two-phase exact cumsum: O(B) work, no
    * single-partition window, and no O(B²) self-join even at subBits=16
    * (~8.4M buckets), so no stage of the plan serializes.
    */
  def hdrQuantiles(df: DataFrame, value: Column, subBits: Int,
      quantiles: Seq[(Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (nu, de) =>
      require(nu > 0 && nu <= de, s"quantile $nu/$de out of (0,1]") }
    val h = hdrHistogram(df, value, subBits)
    val ranked = graft.core.Ranker.withRank(h, "__r", col("bucket_id").asc)
    val (cum0, nTotal) = graft.core.Ranker.withCumsumLongAndTotal(
      ranked, "__r", col("n"), "cum")
    val cum = cum0.select(col("bucket_id"), col("lb"), col("ub"), col("cum"))
    val tot = h.sparkSession.range(1).select(lit(nTotal).as("n_total"))
    val spark = df.sparkSession
    val qdf = spark.range(1)
      .select(explode(array(quantiles.map { case (nu, de) =>
        struct(lit(nu).as("q_num"), lit(de).as("q_den"))
      }: _*)).as("q"))
      .select(col("q.q_num"), col("q.q_den"))
    val ranks = qdf.crossJoin(broadcast(tot))
      .withColumn("rank",
        expr("(cast(q_num as bigint) * n_total + q_den - 1) div q_den"))
    cum.crossJoin(broadcast(ranks))
      .where(col("cum") >= col("rank"))
      .groupBy(col("q_num"), col("q_den"), col("rank"), col("n_total"))
      .agg(min(struct(col("bucket_id"), col("lb"), col("ub"))).as("m"))
      .select(
        round(col("q_num").cast("double") / col("q_den").cast("double"), 6)
          .as("q"),
        col("rank"), col("n_total"),
        col("m.lb").as("est_lb"), col("m.ub").as("est_ub"))
  }

  /** Per-group [[hdrHistogram]]: the bucket table keyed by `group` —
    * ≤ 64·2^(subBits+1) rows PER GROUP, one aggregation.  The grouped
    * form is what per-language/per-source length dashboards need. */
  def hdrHistogramBy(df: DataFrame, group: Column, value: Column,
      subBits: Int): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1,16], got $subBits")
    bucketed(df.select(group.as("grp"),
        guardedValue(value, "hdrHistogramBy").as("__v")), subBits)
      .groupBy(col("grp"), col("bucket_id"), col("lb"), col("ub"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group quantiles from [[hdrHistogramBy]].  The cumulative scan is
    * a window PARTITIONED BY GROUP over ≤ 64·2^(subBits+1) bucket rows —
    * a keyed window, never a single partition, so the plan scales with
    * group count.  Ranks are the same exact-rational integers as
    * [[hdrQuantiles]]; the rank-th value per group provably lies in
    * [est_lb, est_ub]. */
  def hdrQuantilesBy(df: DataFrame, group: Column, value: Column,
      subBits: Int, quantiles: Seq[(Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (nu, de) =>
      require(nu > 0 && nu <= de, s"quantile $nu/$de out of (0,1]") }
    val h = hdrHistogramBy(df, group, value, subBits)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bucket_id")
    val cum = h.withColumn("cum", sum("n").over(w))
    val qdf = df.sparkSession.range(1)
      .select(explode(array(quantiles.map { case (nu, de) =>
        struct(lit(nu).as("q_num"), lit(de).as("q_den"))
      }: _*)).as("q"))
      .select(col("q.q_num"), col("q.q_den"))
    val ranks = h.groupBy("grp").agg(sum("n").as("n_total"))
      .crossJoin(broadcast(qdf))
      .withColumn("rank",
        expr("(cast(q_num as bigint) * n_total + q_den - 1) div q_den"))
    // plain shuffle join on grp (NOT broadcast): ranks has one row per
    // group × quantile, and the grouped form exists precisely for
    // high-cardinality group columns — broadcasting the per-group table
    // would cap the op at driver/broadcast memory
    cum.join(ranks, Seq("grp"))
      .where(col("cum") >= col("rank"))
      .groupBy(col("grp"), col("q_num"), col("q_den"), col("rank"),
        col("n_total"))
      .agg(min(col("lb")).as("est_lb"), min(col("ub")).as("est_ub"))
      .select(col("grp").as("group"),
        round(col("q_num").cast("double") / col("q_den").cast("double"), 6)
          .as("q"),
        col("rank"), col("n_total"), col("est_lb"), col("est_ub"))
  }

  private def cmsSlot(item: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(row), item)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Count-min sketch of an item stream (Cormode–Muthukrishnan 2005): a
    * fixed depth×width grid of counters, each row counting the stream under
    * an independent md5-derived hash.  Built as one aggregation — the grid
    * (depth·width rows, corpus-size-independent) IS the shuffle payload,
    * and two sketches of disjoint streams merge by adding counters (a
    * groupBy-sum union), which is how executor partials combine here.
    *
    * Output: (row, slot, n).  Estimates are upward-biased by construction
    * (collisions only ADD), giving the deterministic guarantee
    * est ≥ exact that [[cmsEstimate]] consumers rely on.
    */
  def cmsSketch(df: DataFrame, item: Column, depth: Int, width: Int)
      : DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.select(item.cast("string").as("__it"))
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), cmsSlot(col("__it"), i, width).as("slot"))
      ): _*)).as("h"))
      .groupBy(col("h.row").as("row"), col("h.slot").as("slot"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-frequency estimates for `items` against a [[cmsSketch]] grid:
    * est(x) = min over rows of the counter at that row's hash of x.  The
    * sketch grid (depth·width rows, corpus-size-independent by
    * construction) is broadcast; probes LEFT-join it so a probe slot with
    * no counter row reads as the true CMS counter value 0 — an item never
    * seen in the stream therefore returns n_est = 0 instead of vanishing
    * (or, worse, taking its min over only its non-empty slots).  For any
    * item present in the stream the estimate is ≥ its exact count
    * (counters only aggregate upward).
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, item: Column,
      depth: Int, width: Int): DataFrame = {
    val probes = items.select(item.cast("string").as("item"))
      .select(col("item"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), cmsSlot(col("item"), i, width).as("slot"))
      ): _*)).as("h"))
      .select(col("item"), col("h.row").as("row"), col("h.slot").as("slot"))
    probes.join(broadcast(sketch), Seq("row", "slot"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
  }
}
