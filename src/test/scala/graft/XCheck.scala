package graft

import org.apache.spark.sql.SparkSession

/** Scratch check (test scope): compare a query's current output against a
  * prior driver-verified parquet dump (e.g. /tmp/verify_r7/<name>.parquet)
  * at the same SF.  Run:
  *   sbt 'Test/runMain graft.XCheck <name> <priorDir> [sfDir]' */
object XCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val priorDir = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cur = SparkEntry.queries(name)(spark, sfDir)
    val prior = spark.read.parquet(s"$priorDir/$name.parquet")
      .select(cur.columns.map(org.apache.spark.sql.functions.col): _*)
    val onlyCur = cur.exceptAll(prior).count()
    val onlyPrior = prior.exceptAll(cur).count()
    println(s"XCHECK $name cur=${cur.count()} prior=${prior.count()} " +
      s"onlyCur=$onlyCur onlyPrior=$onlyPrior " +
      (if (onlyCur == 0 && onlyPrior == 0) "MATCH" else "MISMATCH"))
    spark.stop()
  }
}
