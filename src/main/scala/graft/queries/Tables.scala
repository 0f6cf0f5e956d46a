package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared loaders for the driver-generated test tables — one definition of
  * each table's read path instead of per-query-file copies. */
private[queries] object Tables {

  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and convert (floor) to a
    * microsecond timestamp — downstream ms math is unaffected.
    *
    * `nanosAsLong` is a runtime-settable SQL conf; Verify/Bench also set it
    * at session build, but it is (idempotently) re-asserted here so the
    * loader stays correct under any caller-provided session (specs build
    * their own). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
