package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.LayoutOps

/** Scratch (test scope): the lake's many-commit scale probe — a
  * 200-commit streaming-shaped lake, then a narrow range query through
  * (a) the plain snapshot read + filter, (b) the hint-driven
  * readVersionRange, (c) the planner-integrated readVersionIndexed.
  * Records wall time and the directory-listing census (the 100 TB
  * design question: does planning cost scale with the MANIFEST or with
  * the FILES).  Run: sbt 'Test/runMain graft.XR15Lake' */
object XR15Lake {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("xr15lake")
      .toString + "/tbl"
    val commits = 200
    val rowsPer = 1000
    val t0 = System.nanoTime()
    (0 until commits).foreach { c =>
      val lo = c.toLong * rowsPer
      spark.range(lo, lo + rowsPer).toDF("id")
        .withColumn("payload", md5(col("id").cast("string")))
        .createOrReplaceTempView("delta")
      LayoutOps.commitAppend(spark.table("delta"), path,
        statsCols = Seq("id"))
    }
    val tIngest = (System.nanoTime() - t0) / 1e9
    val v = LayoutOps.latestVersion(spark, path)
    println(f"PROBE ingest: $commits%d commits in $tIngest%.1f s (v=$v%d)")

    def time[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f
      (r, (System.nanoTime() - s) / 1e9)
    }
    // narrow range: hits exactly 1 of 200 commits
    val (lo, hi) = (42000L, 42999L)
    val (nPlain, tPlain) = time(
      LayoutOps.readVersion(spark, path, v)
        .where(col("id").between(lo, hi)).count())
    val (nRange, tRange) = time(
      LayoutOps.readVersionRange(spark, path, v, "id", lo, hi).count())
    val ((nIdx, listed), tIdx) = time {
      val (df, idx) = LayoutOps.indexedRead(spark, path, v)
      (df.where(col("id").between(lo, hi)).count(), idx.listedDirCount)
    }
    println(f"PROBE plain read+filter: $nPlain%d rows in $tPlain%.2f s " +
      f"(lists all $commits%d dirs)")
    println(f"PROBE readVersionRange:  $nRange%d rows in $tRange%.2f s")
    println(f"PROBE readVersionIndexed: $nIdx%d rows in $tIdx%.2f s " +
      f"(listed $listed%d of $commits%d dirs)")
    require(nPlain == nRange && nRange == nIdx && nIdx == 1000L)
    spark.stop()
  }
}
