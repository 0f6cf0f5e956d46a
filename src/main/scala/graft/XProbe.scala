package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch: per-job timing for the slow bench queries (delete after use). */
object XProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val sec = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (sec > 0.3)
          println(f"PROBE stage=${si.stageId}%4d ${sec}%7.2fs tasks=${si.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB  ${si.name.take(60)}")
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (q <- Seq("pipeline_block", "o2_block_droplast", "dd_jaccard_pairs",
        "o3_weighted_replace", "pipeline_block", "dd_minhash_pairs")) {
      println(s"PROBE ===== $q =====")
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"PROBE $q total=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
      graft.core.CacheScope.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
