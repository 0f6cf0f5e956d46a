package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted-dedup-index pattern, extracted from the MinHash triad so
  * every banding tier (MinHash bands, winnow fingerprints, SimHash bands)
  * shares one write/validate/append surface:
  *
  *  - an index is a parquet directory holding the tier's per-document key
  *    table (whatever the tier joins on to find candidates);
  *  - the hashing PARAMETERS that produced the keys are persisted beside
  *    the data in `_graft_params` (underscore prefix: invisible to parquet
  *    directory reads).  Keys hashed under different parameters never
  *    collide, which silently reads as "no duplicates" — so every reader
  *    validates parameters FIRST and fails loudly on mismatch;
  *  - appends re-validate, then add the new shard's keys with
  *    mode(append) — no rewrite of the existing index.
  *
  * At 100 TB the index is the small side: per-document keys only (a few
  * dozen bytes/doc), scanned map-side against a broadcast shard table in
  * the steady state of continuous ingestion (see
  * [[DedupOps.minhashCandidatesAgainst]]).
  */
object PersistedIndex {

  /** Write `table` as a fresh index at `dir` with its named integer
    * parameters. */
  def write(table: DataFrame, dir: String, params: Seq[(String, Int)]): Unit = {
    table.write.mode("overwrite").parquet(dir)
    val spark = table.sparkSession
    import spark.implicits._
    params.toDF("param", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_graft_params")
  }

  /** Fail loudly unless the index at `dir` was written with exactly
    * `params` (same names, same values). */
  def requireParams(spark: SparkSession, dir: String,
      params: Seq[(String, Int)]): Unit = {
    val stored = spark.read.parquet(s"$dir/_graft_params").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val passed = params.toMap
    require(stored == passed,
      s"index at $dir was built with $stored; caller passed $passed — " +
        "keys hashed under different parameters never collide (reads as " +
        "'no duplicates'), so the parameters must match exactly")
  }

  /** Append a shard's key table to an existing index after validating the
    * parameters it was hashed with. */
  def append(table: DataFrame, dir: String, params: Seq[(String, Int)]): Unit = {
    requireParams(table.sparkSession, dir, params)
    table.write.mode("append").parquet(dir)
  }
}
