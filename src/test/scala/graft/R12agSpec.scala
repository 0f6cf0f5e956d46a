package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlOps

/** Invariants for the round-12ag surface: PAV isotonic calibration. */
class R12agSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pavCalibrate pools adjacent violators with weighted merges") {
    // buckets: rates 0.2, 0.6, 0.4, 0.9 — the middle pair violates
    // monotonicity; pooled (60·0.6 + 40·0.4)-style weighted merge:
    // (36 + 16) / (60 + 40) = 0.52
    val rel = Seq((0L, 100L, 20L), (1L, 60L, 36L), (2L, 40L, 16L),
      (3L, 50L, 45L)).toDF("b", "n", "p")
    val out = MlOps.pavCalibrate(rel, col("b"), col("n"), col("p"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0)._5 == 0.2)
    assert(out(1)._5 == 0.52 && out(2)._5 == 0.52)
    assert(out(3)._5 == 0.9)
    // raw rates preserved alongside
    assert(out(1)._4 == 0.6 && out(2)._4 == 0.4)
    // calibrated curve is monotone non-decreasing in bucket order
    val cal = out.toSeq.sortBy(_._1).map(_._2._5)
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b })
  }

  test("pavCalibrate leaves an already-monotone curve unchanged") {
    val rel = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
      .toDF("b", "n", "p")
    val out = MlOps.pavCalibrate(rel, col("b"), col("n"), col("p"))
      .as[(Long, Long, Long, Double, Double)].collect()
    out.foreach(r => assert(r._4 == r._5))
  }

  test("pavCalibrate cascades merges through multiple violators") {
    // strictly decreasing rates → everything pools to the global rate
    val rel = Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L))
      .toDF("b", "n", "p")
    val out = MlOps.pavCalibrate(rel, col("b"), col("n"), col("p"))
      .as[(Long, Long, Long, Double, Double)].collect()
    out.foreach(r => assert(r._5 == 0.5))
  }
}
