package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): the resident-codebook scale probe — k×d well
  * past what a per-iteration driver collect should ever hold, refined
  * through [[graft.ops.MlOps.kmeansFitResident]] (no k×d collect, no
  * routes broadcast).  Run:
  *   sbt 'Test/runMain graft.XR16Scale [n] [k] [d]' */
object XR16Scale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val k = if (args.length > 1) args(1).toInt else 5000
    val d = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(d - 1)), j =>
        (pmod(col("id"), lit(64)) * 100).cast("double") +
          pmod(col("id") * 31 + j * 17, lit(97)).cast("double")).as("v"))
    val t0 = System.nanoTime()
    val (cent, asg) = graft.ops.MlOps.kmeansFitResident(data, col("v"),
      col("vec_id"), k, seed = 11L, refineIters = 2, probe = 3)
    val nc = cent.count()
    val na = asg.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE resident n=$n k=$k d=$d centroids=$nc assigned=$na " +
      f"sec=$sec%.1f")
    require(nc == k && na == n)
    spark.stop()
  }
}
