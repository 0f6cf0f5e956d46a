package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join pre-flight and pre-shuffle reduction tools.
  *
  * At 100 TB the two join failure modes are (1) an output blow-up nobody
  * predicted — a many-to-many key fans out and the "join" is suddenly 50×
  * its inputs — and (2) shuffling a huge probe side in full when only a
  * sliver of it has partners.  [[joinSizeCensus]] answers (1) *before* the
  * join runs, from two cheap map-side-combinable aggregations; [[bloomSemiPrune]]
  * answers (2) by dropping partnerless probe rows below the exchange with a
  * Bloom filter when the build side's distinct key set is too large to
  * broadcast exactly.
  */
object JoinOps {

  /** Exact pre-flight census of an equi-join's output, WITHOUT running the
    * join: for key sets A and B this computes, from the two per-key count
    * tables alone,
    *
    *   - `n_keys`           — matched distinct keys,
    *   - `join_rows`        — the exact output cardinality Σ cntA(k)·cntB(k),
    *   - `max_rows_per_key` — the worst single-key fan-out (the skew bomb),
    *
    * The cost is two `groupBy(key).count()` passes (map-side combinable, so
    * the shuffle carries one row per distinct key, not per input row) and a
    * join of the two count tables — typically orders of magnitude smaller
    * than the joined relations.  This is the guard to run before a 100 TB
    * many-to-many join: if `join_rows` or `max_rows_per_key` comes back
    * explosive, re-plan (salt, pre-aggregate, or bucket) instead of
    * discovering the blow-up as a dead executor three hours in.
    */
  def joinSizeCensus(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column): DataFrame = {
    val ca = a.groupBy(aKey.as("key")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(bKey.as("key")).agg(count(lit(1)).as("cb"))
    ca.join(cb, "key")
      .select((col("ca") * col("cb")).as("rows_k"))
      .agg(count(lit(1)).as("n_keys"),
        sum("rows_k").as("join_rows"),
        max("rows_k").as("max_rows_per_key"))
  }

  /** Pre-shuffle probe-side reduction with a Bloom filter over the build
    * side's long keys.  Returns `probe` filtered to rows whose key *might*
    * be in `build`'s key set — a strict superset of the true semi-join, so
    * following it with the exact join yields exactly the plain join's
    * result (false positives are eliminated by the join itself; the filter
    * only removes rows that provably have no partner).
    *
    * The regime this targets sits between two built-ins: when the build
    * side's distinct keys fit the broadcast budget, a broadcast semi-join
    * is exact and strictly better; when nothing is known, AQE's runtime
    * bloom filter may fire on its own.  This operator makes the reduction
    * *explicit and sizeable*: `expectedItems` distinct 64-bit keys cost
    * ~1.2 bytes each at 1% fpp (12 MB per 10 M keys — broadcastable long
    * after the exact key set is not), and the filter is applied below the
    * exchange, so shuffle volume drops by the probe side's true
    * selectivity.  The filter itself is built with a tree-reduce of
    * per-partition partial blooms (one pass over `build`, no shuffle).
    *
    * The predicate is a deterministic Scala UDF (the sketch lives off-heap
    * of codegen), so place it after cheap native filters in the plan; the
    * scan-pruning columns still push down normally.
    */
  def bloomSemiPrune(probe: DataFrame, probeKey: Column, build: DataFrame,
      buildKey: Column, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.select(buildKey.cast("long").as("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    probe.where(mightContain(probeKey.cast("long")))
  }
}
