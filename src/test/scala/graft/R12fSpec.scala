package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariants for the round-12f surface: partition-pruned layout reads,
  * Poisson bootstrap, and the set/ranking surfaces. */
class R12fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writePartitioned + readPartition prunes to the matching directory") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val df = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L),
      (4L, "fr", 40L)).toDF("id", "lang", "v")
    LayoutOps.writePartitioned(df, "lang", dir)
    val rd = LayoutOps.readPartition(spark, dir, "lang", "en")
    assert(rd.select("id").as[Long].collect().toSet == Set(1L, 3L))
    // the filter must reach the scan as a PartitionFilter (pruning), not
    // a post-scan Filter over all directories
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined)
  }

  test("bootstrapSample: copies follow the planted inverse-CDF draw") {
    val df = (1L to 2000L).toDF("doc_id")
    val out = SplitOps.bootstrapSample(df, col("doc_id"), seed = 5L)
    val copies = out.groupBy("doc_id").count().as[(Long, Long)].collect()
    // replay the draw for every row from the shared thresholds
    val cum = SplitOps.poissonCum(1.0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Int = {
      val hex = md.digest(s"boot:5:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val u = java.lang.Long.parseLong(hex.substring(0, 8), 16) / 4294967296.0
      cum.indexWhere(u < _) match { case -1 => cum.size; case k => k }
    }
    val expected = (1L to 2000L).map(i => i -> draw(i))
      .filter(_._2 > 0).toMap
    assert(copies.toMap == expected.map { case (k, v) => k -> v.toLong })
    // total mass ~ n at lambda = 1 (Poisson mean), and copy is 0-based
    val total = out.count()
    assert(math.abs(total - 2000L) < 150)
    assert(out.agg(min("copy")).head().getInt(0) == 0)
  }

  test("set ops: intersect and except on planted vocabularies") {
    val a = Seq("x", "y", "z").toDF("tok")
    val b = Seq("y", "z", "w").toDF("tok")
    assert(a.intersect(b).as[String].collect().toSet == Set("y", "z"))
    assert(a.except(b).as[String].collect().toSet == Set("x"))
  }

  test("rank/dense_rank are tie-stable without a tiebreaker") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc)
    val df = Seq(("a", 10L), ("a", 10L), ("a", 5L)).toDF("g", "v")
      .select(col("g"), col("v"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .as[(String, Long, Int, Int)].collect().sortBy(r => (-r._2, r._3))
    assert(df.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((10L, 1, 1), (10L, 1, 1), (5L, 3, 2)))
  }
}
