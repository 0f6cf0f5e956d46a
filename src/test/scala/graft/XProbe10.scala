package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimilarityOps}
/** Scratch (test scope): semantic-dedup k-scaling at 10x (k fixed vs k∝n). */
object XProbe10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/repo/scaledata/sf0.1x10/embeddings.parquet")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("PROBE n " + e.count())
    def pairsWithK(k: Int): Long = {
      val asg = SimilarityOps.ivfAssign(e, col("embedding"), col("vec_id"),
        e.where(col("vec_id") < k), col("embedding"), col("vec_id"))
        .select(col("vec_id"), col("centroid_id").as("cluster"))
      val c = DedupOps.semanticPairs(e, col("embedding"), col("vec_id"),
        asg, 0.4).count()
      graft.core.CacheScope.release()
      c
    }
    timed("warm")(pairsWithK(8)) // JIT + caches warm
    println("PROBE k8_pairs " + timed("k8")(pairsWithK(8)))
    println("PROBE k80_pairs " + timed("k80")(pairsWithK(80)))
    spark.stop()
  }
}
