package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): min-of-N re-measure of the bench slow tail at
  * sf0.1 — separates real per-query cost from in-run interference (the
  * b2_buffer_shuffle lesson, applied to the tail).
  * Run: sbt 'Test/runMain graft.XSlowTail [n]' */
object XSlowTail {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val names = Seq("graph_pagerank", "dd_spans", "dd_funnel_report",
      "dd_substr_pairs", "tpch_bucketed_join", "dd_incremental_winnow",
      "ml_nb_confusion", "b2_buffer_shuffle",
      "tpch_q2", "tpch_q17", "tpch_q21", "graph_reach", "graph_triangles",
      "ev_asof_nearest", "ev_item_session_cooc")
    println("SLOWTAIL | query | min s | max s | rows |")
    println("SLOWTAIL |---|---|---|---|")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count(); graft.core.CacheScope.release() // warm-up
        val runs = (1 to n).map { _ =>
          val t0 = System.nanoTime()
          val rows = fn(spark, sfDir).count()
          graft.core.CacheScope.release()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        println(f"SLOWTAIL | $name | ${runs.map(_._1).min}%.2f | ${runs.map(_._1).max}%.2f | ${runs.head._2} |")
      } catch { case e: Throwable =>
        println(s"SLOWTAIL | $name | ERR ${e.toString.take(80)} |")
      }
    }
    spark.stop()
  }
}
