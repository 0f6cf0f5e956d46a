package graft

/** Kernel microbench (test scope): isolates the dedup kernels' per-doc cost
  * from Spark task overhead. */
object XKernelBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(_.getString(0))
    println(s"KB docs=${texts.length}")
    // use the public column API through a local DataFrame? No — time the
    // whole per-doc pipeline via the public bands UDF on a local session.
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, 1))
      .toDF("doc_id", "text")
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ops.DedupOps.minhashBands(df, col("text"), col("doc_id")).count()
      println(f"KB bands pass $r: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n (single thread)")
    }
    spark.stop()
  }
}
