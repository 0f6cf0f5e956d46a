package graft
import org.apache.spark.sql.SparkSession

/** Scratch (test scope): exchange/codegen counts for MANY queries in one
  * JVM — the plan-shape audit table.
  * Run: sbt 'Test/runMain graft.XPlanMany <query>...' (sf0.001). */
object XPlanMany {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("XPLANS | query | exchanges | broadcasts | sorts | wscg |")
    println("XPLANS |---|---|---|---|---|")
    args.foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        // count shuffle exchanges separately from broadcast exchanges
        val ex = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") +
          c("Exchange SinglePartition")
        println(s"XPLANS | $q | $ex | ${c("BroadcastExchange")} | " +
          s"${c("\\bSort\\b")} | ${c("WholeStageCodegen")} |")
      } catch { case e: Throwable =>
        println(s"XPLANS | $q | ERR ${e.toString.take(60)} |")
      } finally graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
