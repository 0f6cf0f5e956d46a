package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** Scratch (test scope): min-of-3 timing of the native as-of join plan
  * node vs the composed union+window form at sf0.1.
  * Run: sbt 'Test/runMain graft.XAsof [sfDir]' */
object XAsof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val e = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    e.count() // warm the scan
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def native() = EventOps.asofJoinNative(
      e.where(col("event_type") === "click"), col("event_id"),
      col("user_id"), col("ts"),
      e.where(col("event_type") === "purchase"), col("event_id"),
      col("user_id"), col("ts"), col("value")).count()
    def composed() = EventOps.asofJoin(
      e.where(col("event_type") === "click"), col("event_id"),
      col("user_id"), col("ts"),
      e.where(col("event_type") === "purchase"), col("event_id"),
      col("user_id"), col("ts"), col("value")).count()
    (1 to 3).foreach { i =>
      val (rn, tn) = time(native())
      val (rc, tc) = time(composed())
      println(f"ASOF run $i: native $tn%.2f s ($rn rows)  composed $tc%.2f s ($rc rows)")
    }
    spark.stop()
  }
}
