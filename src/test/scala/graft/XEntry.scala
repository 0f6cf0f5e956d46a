package graft
object XEntry {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENTRY rows=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
