package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): round-14 scale evidence.
  *  1. Semantic-dedup pair-stage growth with corpus-proportional cells
  *     (k = ceil(n/64)) vs the old fixed-8 quantizer — pair rows must
  *     grow ~linearly, not quadratically.
  *  2. toBatchesPrefetched overlap: drain wall with a per-batch compute
  *     delay, prefetched vs plain.
  * Run: sbt 'Test/runMain graft.XR14Scale'. */
object XR14Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- 1. semantic pair-stage scaling ---------------------------------
    // synthetic unit-ish embeddings: deterministic pseudo-random dims from
    // the id hash (same shape as the embeddings table, dim 16)
    def emb(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 16).map(d =>
        (pmod(hash(col("id"), lit(d)), lit(1000)) / 500.0 - 1.0)
          .cast("float")): _*).as("embedding"))
    Seq(20000L, 200000L).foreach { n =>
      val e = emb(n).cache(); e.count()
      val k = math.max(8L, math.ceil(n / 64.0).toLong)
      val t0 = System.nanoTime()
      val asg = graft.ops.SimilarityOps.ivfAssign(e, col("embedding"),
        col("vec_id"), e.where(col("vec_id") < k), col("embedding"),
        col("vec_id"))
      val sizes = asg.groupBy("centroid_id").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"),
          max("count")).head()
      val asgSec = (System.nanoTime() - t0) / 1e9
      val pairsProp = sizes.getLong(0)
      // the OLD parameterization for contrast: 8 cells regardless of n
      val asg8 = graft.ops.SimilarityOps.ivfAssign(e, col("embedding"),
        col("vec_id"), e.where(col("vec_id") < 8), col("embedding"),
        col("vec_id"))
      val pairs8 = asg8.groupBy("centroid_id").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
        .head().getLong(0)
      println(f"SEMSCALE n=$n k=$k assign=$asgSec%.1fs " +
        f"pairs_proportional=$pairsProp pairs_fixed8=$pairs8 " +
        f"pairs_per_row=${pairsProp.toDouble / n}%.1f " +
        f"maxCell=${sizes.getLong(1)}")
      e.unpersist()
      graft.core.CacheScope.release()
    }

    // --- 2. prefetch overlap --------------------------------------------
    import graft.core._
    val base = spark.range(500000L).toDF("k")
      .withColumn("payload", md5(col("k").cast("string")))
    val sc = ScCollection.fromDataFrame(base, col("k")).cached()
    sc.df.count()
    val ds = ScDataset(sc, BlockShuffling(blockSize = 1024),
      batchSize = 4096, fetchFactor = 4, seed = 42L)
    def drain(it: Iterator[org.apache.spark.sql.Row]): (Double, Long) = {
      val t0 = System.nanoTime()
      var n = 0L
      while (it.hasNext) { it.next(); Thread.sleep(10); n += 1 }
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (plainS, nb) = drain(ds.toBatches(0, Seq("payload")))
    val (preS, nb2) = drain(ds.toBatchesPrefetched(0, Seq("payload")))
    require(nb == nb2)
    println(f"PREFETCH batches=$nb plain=$plainS%.1fs prefetched=$preS%.1fs " +
      f"compute_floor=${nb * 0.010}%.1fs")
    spark.stop()
  }
}
