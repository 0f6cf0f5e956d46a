package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** Scale smoke (test scope): 10× bench size (6M rows), exercises the
  * index-first sampling machinery end-to-end and checks the invariants
  * that must survive scale-up (exact cardinality, coverage, no partition
  * pathologies).  Run: sbt 'Test/runMain graft.XScale [rows]'. */
object XScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 6000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = spark.range(n).toDF("k")
      .withColumn("label", pmod(col("k") * 2654435761L, lit(1000)))
      .withColumn("payload", md5(col("k").cast("string")))
    val sc = timed("rank (one-time)") {
      val c = ScCollection.fromDataFrame(base, col("k")).cached()
      c.df.count()
      c
    }
    timed(s"block pipeline ($n rows)") {
      val ds = ScDataset(sc, BlockShuffling(blockSize = 1024), batchSize = 64,
        fetchFactor = 16, seed = 42L)
      val planned = ds.planFrame(0)
      val got = planned.count()
      require(got == n, s"pipeline cardinality: $got != $n")
      CacheScope.release()
    }
    timed(s"weighted replace (${2 * n} samples)") {
      val plan = BlockWeightedSampling(col("label") + 1, totalSize = 2 * n,
        blockSize = 1024).plan(sc, 11)
      val got = plan.count()
      require(got == 2 * n, s"weighted cardinality: $got != ${2 * n}")
      CacheScope.release()
    }
    timed(s"class balanced (${n / 2} samples)") {
      val plan = ClassBalancedSampling(col("label"), totalSize = n / 2,
        blockSize = 1024).plan(sc, 13)
      val got = plan.count()
      require(got == n / 2, s"balanced cardinality: $got != ${n / 2}")
      // balance check: no class should exceed 2x the uniform share
      val mx = plan.groupBy("label").count()
        .agg(max("count")).head.getLong(0)
      require(mx < 2 * (n / 2) / 1000 + 1000, s"class skew: max=$mx")
      CacheScope.release()
    }
    timed(s"no-replace reservoir (${n / 100} of $n)") {
      val plan = BlockWeightedSampling(col("label") + 1, totalSize = n / 100,
        blockSize = 1024, replace = false).plan(sc, 17)
      val got = plan.count()
      require(got == n / 100, s"noreplace cardinality: $got != ${n / 100}")
      CacheScope.release()
    }
    timed(s"no-replace 3-round draw (${3 * (n / 100)} of $n)") {
      val plan = BlockWeightedSampling(col("label") + 1,
        totalSize = 3 * (n / 100), blockSize = 1024, replace = false,
        samplingSize = Some(n / 100)).plan(sc, 17)
      val got = plan.count()
      require(got == 3 * (n / 100),
        s"rounds cardinality: $got != ${3 * (n / 100)}")
      CacheScope.release()
    }
    spark.stop()
    println("SCALE all invariants held")
  }
}
