package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): dump `.explain("formatted")` for named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization round's
  * before/after plan evidence.
  *
  * Run: sbt 'Test/runMain graft.XPlanDump <suffix> <q1,q2,...> [sfDir] [outDir]'
  * e.g. sbt 'Test/runMain graft.XPlanDump before dd_spans,graph_reach' */
object XPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: XPlanDump <suffix> <q1,q2,..> [sfDir] [outDir]")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 3) args(3) else "/root/repo/plans/r20"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off so the dump shows the full static plan shape (codegen
      // spans, exchanges) rather than an unexecuted AdaptiveSparkPlan stub
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val formatted = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              formatted)
            println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: $e")
          } finally graft.core.CacheScope.release()
      }
    }
    spark.stop()
  }
}
