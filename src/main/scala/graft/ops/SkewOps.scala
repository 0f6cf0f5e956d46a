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
}
