package graft
import org.apache.spark.sql.SparkSession
object XPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = if (args.nonEmpty) args(0) else "pipeline_block"
    val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("XPLAN exchanges=" + "Exchange".r.findAllIn(plan).length +
      " wscg=" + "WholeStageCodegen".r.findAllIn(plan).length)
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ")
      || l.contains("Join") || l.contains("Sort")).take(25)
      .foreach(l => println("XPLAN " + l.trim.take(110)))
    spark.stop()
  }
}
