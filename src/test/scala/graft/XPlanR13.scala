package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): physical-plan audit of the round-13 TPC-H tier —
  * counts exchanges / broadcasts / windows and flags single-partition
  * exchanges (top-k and one-row aggregates are the legitimate cases).
  * Run:  sbt 'Test/runMain graft.XPlanR13 [sfDir]' */
object XPlanR13 {
  val names = Seq(
    "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10",
    "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "ev_asof_native", "graph_triangles", "ml_ridge", "tpch_q6_sql",
    "graph_reach", "a1_unpivot", "ev_funnel_windowed", "ev_sessions_native", "ml_logreg", "ev_asof_forward", "ev_asof_tolerance", "ev_asof_nearest", "graph_degree_hist", "ev_item_session_cooc", "graph_components", "ev_rfm", "ml_cv_accuracy", "ml_kmeans_lloyd", "ml_kmeans_inertia")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("PLAN | query | exchanges | broadcasts | windows | 1-part exchanges |")
    println("PLAN |---|---|---|---|---|")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        val ex = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") +
          c("Exchange SinglePartition")
        val bc = c("BroadcastExchange")
        val win = c("\\bWindow\\b")
        val sp = c("Exchange SinglePartition")
        println(s"PLAN | $name | $ex | $bc | $win | $sp |")
      } catch { case e: Throwable =>
        println(s"PLAN | $name | ERROR ${e.toString.take(100)} |")
      } finally graft.core.CacheScope.release()
    }
    spark.stop()
    println("PLAN done")
  }
}
