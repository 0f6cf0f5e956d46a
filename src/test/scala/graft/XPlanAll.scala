package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): GLOBAL physical-plan audit — every
  * SparkEntry.queries entry, flagging the one shape that cannot survive
  * scale-out: a Window over a SinglePartition exchange (all rows through
  * one task).  One-row global aggregates legitimately use SinglePartition;
  * a window must not.  Run:
  *   sbt 'Test/runMain graft.XPlanAll [sfDir]' */
object XPlanAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    var errs = 0
    var n = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        n += 1
        // a Window whose child exchange is SinglePartition — the string
        // form lists the window above its exchange; detect the pair by
        // proximity (window line followed within 3 lines by the exchange)
        val lines = plan.split("\n")
        val bad = lines.zipWithIndex.exists { case (l, i) =>
          l.contains("Window") &&
            lines.slice(i + 1, i + 4).exists(_.contains("Exchange SinglePartition"))
        }
        if (bad) { flagged += 1; println(s"PLANALL FLAG $name") }
        graft.core.CacheScope.release()
      } catch { case e: Throwable =>
        errs += 1
        println(s"PLANALL ERR $name ${e.toString.take(80)}")
      }
    }
    println(s"PLANALL summary: $n audited, $flagged single-partition-window, $errs errors")
    spark.stop()
  }
}
