package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-12ad surface: observed metrics and the CSV
  * full-fidelity round-trip (the query keeps to clean columns; this spec
  * proves the tricky-text path with explicit quoting options). */
class R12adSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observe collects gate metrics during the gated scan itself") {
    val obs = new org.apache.spark.sql.Observation()
    val df = (1L to 100L).toDF("v")
      .observe(obs, count(lit(1)).as("seen"), sum("v").as("mass"))
      .where(col("v") > 90L)
    assert(df.count() == 10L)
    val m = obs.get
    assert(m("seen") == 100L)   // pre-filter: metrics saw every row
    assert(m("mass") == 5050L)
  }

  test("CSV round-trips quotes, commas, and embedded newlines") {
    val rows = Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line one\nline two"),
      (5L, ""))
    val df = rows.toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir)
    val back = spark.read
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .schema("id LONG, text STRING")
      .csv(dir)
      .as[(Long, String)].collect()
      .map { case (i, t) => (i, Option(t).getOrElse("")) }.toSet
    assert(back == rows.toSet)
  }
}
