package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.SparkListener
import org.apache.spark.sql.SparkSession

/** Profiling harness (test scope — not shipped in the library jar):
  * per-stage timing + per-query CPU accounting for the bench queries.
  * Run: sbt 'Test/runMain graft.XProbe q1 q2 …' (all queries if no args). */
object XProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val verbose = sys.env.contains("XPROBE_STAGES")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new LongAdder
    val taskCount = new LongAdder
    val stageCount = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        cpuNs.add(m.executorCpuTime)
        taskCount.add(si.numTasks.toLong)
        stageCount.incrementAndGet()
        val sec = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (verbose && sec > 0.3)
          println(f"PROBE stage=${si.stageId}%4d ${sec}%7.2fs tasks=${si.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB  ${si.name.take(60)}")
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val qs = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    val results = for (q <- qs) yield {
      if (verbose) println(s"PROBE ===== $q =====")
      cpuNs.reset(); taskCount.reset(); stageCount.set(0)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.release()
      // let the listener queue drain so cpu attribution lands on this query
      Thread.sleep(300)
      (q, wall, cpuNs.sum() / 1e9, stageCount.get(), taskCount.sum(), rows)
    }
    println(f"PROBE ${"query"}%-26s ${"wall"}%8s ${"cpu"}%8s ${"stages"}%7s ${"tasks"}%6s rows")
    for ((q, w, c, st, tk, r) <- results.sortBy(-_._3))
      println(f"PROBE $q%-26s $w%8.2f $c%8.2f $st%7d $tk%6d $r")
    println(f"PROBE TOTAL wall=${results.map(_._2).sum}%.1f cpu=${results.map(_._3).sum}%.1f " +
      f"stages=${results.map(_._4).sum} tasks=${results.map(_._5).sum}")
    spark.stop()
  }
}
