package graft
import org.apache.spark.sql.functions._
/** Scratch probe (test scope): time FULL materialization of a query's
  * output columns (a bare count() lets Catalyst prune every projection, so
  * bench numbers understate per-row expression cost).
  * Run: sbt 'Test/runMain graft.XMat <query>...' */
object XMat {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    args.foreach { q =>
      val t0 = System.nanoTime()
      // force FULL materialization of every output column
      val df = SparkEntry.queries(q)(spark, sf)
      val n = df.select(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()
      println(f"MAT $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
