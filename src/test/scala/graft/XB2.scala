package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): min-of-N re-measure of b2_buffer_shuffle at sf0.1
  * to settle the r11 221k→140k samp/s question (r10 notes documented a
  * 2.4–13.4 s spread on an identical plan — host noise suspected).
  * Run: sbt 'Test/runMain graft.XB2 [n]' */
object XB2 {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val fn = SparkEntry.queries("b2_buffer_shuffle")
    // warm-up (JIT/codegen) outside the measured runs
    fn(spark, sfDir).count(); graft.core.CacheScope.release()
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      graft.core.CacheScope.release()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"B2 run $i: $t%.2f s ($rows rows)")
      (t, rows)
    }
    val best = times.map(_._1).min
    println(f"B2 min-of-$n: $best%.2f s → ${times.head._2 / best}%.0f samples/sec")
    spark.stop()
  }
}
