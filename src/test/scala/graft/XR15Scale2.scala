package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{GraphOps, LayoutOps, TextOps}

/** Scratch (test scope): 10x scale probes for the round-15 additions —
  * LPA rounds, unigram training (driver EM constant vs corpus), and a
  * directory-granular delete on a many-commit lake.
  * Run: sbt 'Test/runMain graft.XR15Scale2' */
object XR15Scale2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f
      (r, (System.nanoTime() - s) / 1e9)
    }

    // --- LPA: ring-of-cliques graph, 10x nodes ---------------------
    def lpaEdges(n: Long) = spark.range(n).toDF("i").select(
      (col("i") / 10).cast("long").as("c"), col("i"))
      .select(col("i").as("src"),
        ((col("c") * 10) + pmod(col("i") + 1, lit(10))).as("dst"))
    Seq(100000L, 1000000L).foreach { n =>
      val (cnt, t) = time(GraphOps.labelPropagation(
        lpaEdges(n), col("src"), col("dst"), iters = 2).count())
      println(f"PROBE lpa n=$n%d communitiesRows=$cnt%d ${t}%.1f s " +
        f"(${t / n * 1e6}%.2f us/node)")
      graft.core.CacheScope.release()
    }

    // --- unigram train: corpus 10x, word table ~constant -----------
    def corpus(n: Long) = spark.range(n).select(
      concat_ws(" ",
        concat(lit("tok"), pmod(col("id") * 7L, lit(997))),
        concat(lit("word"), pmod(col("id") * 13L, lit(997))),
        concat(lit("piece"), pmod(col("id") * 31L, lit(997)))).as("text"))
    Seq(100000L, 1000000L).foreach { n =>
      val (v, t) = time(TextOps.unigramTrain(corpus(n), col("text"),
        vocabSize = 500, maxPieceLen = 6, emIters = 2))
      println(f"PROBE unigram corpus=$n%d vocab=${v.size}%d ${t}%.1f s")
      graft.core.CacheScope.release()
    }

    // --- deleteWhere on a 100-commit lake: 1 dir rewritten ---------
    val path = java.nio.file.Files.createTempDirectory("xr15del")
      .toString + "/tbl"
    (0 until 100).foreach { c =>
      LayoutOps.commitAppend(
        spark.range(c * 1000L, c * 1000L + 1000L).toDF("id"), path,
        statsCols = Seq("id"))
    }
    val v0 = LayoutOps.latestVersion(spark, path)
    val (before, _, _) = LayoutOps.manifestEntries(spark, path, v0)
    val (nv, tDel) = time(LayoutOps.deleteWhere(spark, path,
      col("id").between(42200L, 42399L)))
    val (after, _, _) = LayoutOps.manifestEntries(spark, path, nv.get)
    val carried = after.count(before.contains)
    val rows = LayoutOps.readVersion(spark, path, nv.get).count()
    println(f"PROBE deleteWhere commits=100 carried=$carried%d " +
      f"rewritten=${before.size - carried}%d rows=$rows%d ${tDel}%.1f s")
    require(carried == 99 && rows == 99800L)
    spark.stop()
  }
}
