package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariants for the round-12j surface: per-group drift and the sorted
  * layout. */
class R12jSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jsDriftByGroup with two groups == pairwise jsDivergence") {
    val df = Seq(
      ("a", "the cat sat on the mat"),
      ("a", "a cat ran"),
      ("b", "dogs bark loudly"),
      ("b", "the dog sat")
    ).toDF("src", "text")
    val drift = TextOps.jsDriftByGroup(df, col("text"), col("src"))
      .select("group", "js_nats").as[(String, Double)].collect().toMap
    val pair = TextOps.jsDivergence(
        df.where(col("src") === "a"), col("text"),
        df.where(col("src") === "b"), col("text"))
      .select("js_nats").as[Double].head()
    // one-vs-rest with exactly two groups IS the pairwise divergence
    assert(drift("a") == pair)
    assert(drift("b") == pair)
    assert(pair > 0.0 && pair < math.log(2.0))
  }

  test("jsDriftByGroup: a group identical to the rest has zero drift") {
    val df = Seq(("a", "x y z"), ("b", "x y z")).toDF("src", "text")
    val drift = TextOps.jsDriftByGroup(df, col("text"), col("src"))
      .select("group", "js_nats").as[(String, Double)].collect().toMap
    assert(drift("a") == 0.0 && drift("b") == 0.0)
  }

  test("writeSorted: range predicate reaches the scan as PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("sorted").toString
    val df = (1L to 1000L).map(i => (i, i % 997)).toDF("id", "v")
    LayoutOps.writeSorted(df, "v", nParts = 4, dir)
    val rd = spark.read.parquet(dir).where(col("v") >= 100 && col("v") <= 200)
    val scan = rd.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(v,100)") &&
      scan.contains("LessThanOrEqual(v,200)"))
    assert(rd.count() ==
      df.where(col("v") >= 100 && col("v") <= 200).count())
  }
}
