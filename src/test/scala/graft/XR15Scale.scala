package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): round-15 scale evidence.
  *  1. Flat O(n·k) vs learned-coarse two-level O(n·√k·probe) assignment
  *     cost with corpus-proportional codebooks (k = ⌈n/64⌉): flat wall
  *     must grow ~n², two-level ~n^1.5, at equal (bounded-distortion)
  *     output.
  * Run: sbt 'Test/runMain graft.XR15Scale'. */
object XR15Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emb(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 16).map(d =>
        (pmod(hash(col("id"), lit(d)), lit(1000)) / 500.0 - 1.0)
          .cast("double")): _*).as("embedding"))

    Seq(20000L, 80000L, 320000L, 640000L).foreach { n =>
      val e = emb(n).cache(); e.count()
      val k = math.max(8L, math.ceil(n / 64.0).toLong)
      // the codebook: first-k synthetic vectors (the sweep measures
      // ASSIGNMENT cost, so the fine fit is out of scope)
      val cents = emb(k).select(col("vec_id").as("centroid_id"),
        col("embedding").as("cv")).cache()
      cents.count()

      val t0 = System.nanoTime()
      val sFlat = graft.ops.SimilarityOps.l2Assign(e, col("embedding"),
          col("vec_id"), cents, col("cv"), col("centroid_id"))
        .agg(count(lit(1)), sum(round(col("d2") * 1e6).cast("long"))).head()
      val flatSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val sTwo = graft.ops.SimilarityOps.l2AssignTwoLevelLearned(e,
          col("embedding"), col("vec_id"), cents, col("cv"),
          col("centroid_id"), probe = 3, seed = 49L)
        .agg(count(lit(1)), sum(round(col("d2") * 1e6).cast("long"))).head()
      val twoSec = (System.nanoTime() - t1) / 1e9

      val distRatio = sTwo.getLong(1).toDouble / sFlat.getLong(1)
      println(f"ASSIGNSCALE n=$n k=$k flat=$flatSec%.1fs two=$twoSec%.1fs " +
        f"speedup=${flatSec / twoSec}%.1fx rows_flat=${sFlat.getLong(0)} " +
        f"rows_two=${sTwo.getLong(0)} dist_ratio=$distRatio%.4f")
      e.unpersist(); cents.unpersist()
      graft.core.CacheScope.release()
    }

    // --- 2. fit cost: MLlib kmeans|| (O(n·k) per Lloyd step) vs the
    //        sample-init + routed-Lloyd fit (O(n·√k·probe) per step) ----
    {
      val n = 320000L
      val k = 5000
      val e = emb(n).cache(); e.count()
      val t0 = System.nanoTime()
      val (_, asg) = graft.ops.MlOps.kmeansFitRouted(e, col("embedding"),
        col("vec_id"), k, seed = 42L, maxIter = 5, refineIters = 2)
      val nAsg = asg.count()
      val routedSec = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.release()
      // MLlib reference point: ONE Lloyd iteration (full fits at this
      // k are impractical — which is the point being measured)
      val t1 = System.nanoTime()
      val vdata = e.select(col("vec_id"),
        graft.ops.MlOps.toVector(col("embedding")).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(42L).setMaxIter(1).fit(vdata)
      val mllibSec = (System.nanoTime() - t1) / 1e9
      println(f"FITSCALE n=$n k=$k routed_full_fit=$routedSec%.1fs " +
        f"(sample init + 2 routed Lloyd steps, $nAsg rows assigned) " +
        f"mllib_ONE_iter=$mllibSec%.1fs")
      e.unpersist()
    }
    spark.stop()
  }
}
