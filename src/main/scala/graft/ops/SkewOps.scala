package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for wide aggregations over heavy-hitter keys.
  *
  * At 100 TB a `groupBy(key)` with a few dominant keys (one language, one
  * source domain, one label) funnels those keys' entire row sets through
  * single reducers.  Salting splits each key into `salts` sub-keys for the
  * first (heavy, map-side combinable) aggregation, then merges the tiny
  * per-salt partials in a second, skew-free pass.  The salt is derived from
  * row content via xxhash64 — deterministic under retry, no `rand()`.
  *
  * AQE's skew-join handling covers joins; this covers aggregations, which
  * AQE does not rebalance.
  */
object SkewOps {

  /** Two-phase salted count per key.  Equivalent to
    * `df.groupBy(key).count()` with bounded per-reducer fan-in. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16,
      saltSource: Column): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(saltSource), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").as("cnt"))

  /** Two-phase salted sum of a LONG column per key (exact, associative). */
  def saltedSumLong(df: DataFrame, key: Column, value: Column,
      salts: Int = 16, saltSource: Column): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(saltSource), lit(salts)).as("__salt"))
      .agg(sum(value.cast("long")).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").as("sum"))

  /** Salted equi-join for hot-key fact × dim joins: the fact side's salt is
    * derived from row content (deterministic under retry), the dim side is
    * replicated once per salt, and the join runs on `(key, salt)` — a single
    * hot key spreads across `salts` reducers instead of funnelling through
    * one.
    *
    * When the dim fits an executor, `broadcast(dim)` is strictly better (no
    * shuffle at all).  Salting is the shape for the middle regime — a dim
    * too large to broadcast joined to a fact with heavy-hitter keys — and
    * the static, plan-time alternative to AQE's reactive skew split (which
    * only rebalances after a skewed map stage has already materialized).
    * Dim-side cost is `salts ×` replication, so keep `salts` near the
    * executor-count scale, not the partition count.
    *
    * `key` must name a column present in BOTH frames (the join is a USING
    * join, so the key appears once in the output); all other column names
    * must be disjoint. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16, saltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val f = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
