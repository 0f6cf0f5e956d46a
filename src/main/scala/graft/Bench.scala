package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up outside the timed region (JIT + codegen + parquet reader init),
    // mirroring the reference's warm-up window (benchmarks/utils.py:90-92).
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // each query is timed self-contained: drop its persisted frames so
      // storage doesn't accumulate across 40+ queries and skew later ones
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      name -> (sec, rows)
    }
    val qs = results.map { case (k, (sec, _)) => s"\"" + k + "\":" + sec }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // samples/sec for the headline sampling pipelines — the unit BASELINE.md
    // reports for the reference loader (rows emitted / wall time).
    val tp = Seq("o1_streaming", "o2_block_shuffle", "o3_weighted_replace",
        "o4_class_balanced", "pipeline_block", "b2_buffer_shuffle")
      .flatMap(k => results.get(k).collect {
        case (sec, rows) if rows > 0 && sec > 0 =>
          s"\"" + k + "\":" + math.round(rows / sec)
      }).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples_per_sec":$tp,"sf":"$sfDir"}""")
    spark.stop()
  }
}
