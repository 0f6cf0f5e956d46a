package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): round-14 plan audit of the graph tier against
  * the shared bucketed co-engagement layout — every graph query must scan
  * the bucketed table (`FileScan parquet ... Bucketed: true` /
  * `spark_catalog.default.graft_co_edges_*`) and contain ZERO events
  * scans (the re-derivation the layout removes).
  * Run:  sbt 'Test/runMain graft.XPlanR14 [sfDir]' */
object XPlanR14 {
  val names = Seq("graph_reach", "graph_reach_sketch", "graph_degree_hist",
    "graph_components", "graph_triangles")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("PLAN14 | query | co_edges scans | events scans | exchanges | bucketed |")
    println("PLAN14 |---|---|---|---|---|")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        val co = c("graft_co_edges")
        val ev = c("events\\.parquet")
        val ex = c("Exchange hashpartitioning") +
          c("Exchange rangepartitioning") + c("Exchange SinglePartition")
        val bucketed = plan.contains("Bucketed: true")
        println(s"PLAN14 | $name | $co | $ev | $ex | $bucketed |")
      } catch { case e: Throwable =>
        println(s"PLAN14 | $name | ERROR ${e.toString.take(100)} |")
      } finally graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
