package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariants for the round-12ac surface: vocab coverage, A/B card, and
  * FD profiling. */
class R12acSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vocabCoverage finds the smallest rank covering each target") {
    // counts: a×6, b×3, c×1  (total 10); cum: 6, 9, 10
    val docs = Seq("a a a a", "a a b b", "b c").toDF("text")
    val out = TextOps.vocabCoverage(docs, col("text"),
        targets = Seq(0.5, 0.6, 0.9, 1.0))
      .as[(Double, Long)].collect().toMap
    assert(out(0.5) == 1L)   // ceil(5) → a alone (6 ≥ 5)
    assert(out(0.6) == 1L)   // 6 ≥ 6
    assert(out(0.9) == 2L)   // need 9 → a+b
    assert(out(1.0) == 3L)   // all three
  }

  test("abTestCard: planted shift yields positive z with exact means") {
    // arm 0: values 10.0 ×100; arm 1: values 12.0 ×100 — zero variance
    // would divide by zero, so jitter one value per arm
    val rows = (1 to 100).map(i => (0L, if (i == 1) 10.5 else 10.0)) ++
      (1 to 100).map(i => (1L, if (i == 1) 12.5 else 12.0))
    val out = EventOps.abTestCard(rows.toDF("arm", "value"), col("arm"),
        col("value"))
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out._1 == 100L && out._2 == 100L)
    assert(math.abs(out._3 - 10.005) < 1e-9)
    assert(math.abs(out._4 - 12.005) < 1e-9)
    assert(out._5 > 100.0)  // ~2.0 shift over ~0.05 sd/√n pooled
  }

  test("abTestCard is partitioning-invariant (fixed-point sums)") {
    val rows = (1 to 999).map(i => ((i % 2).toLong, (i % 37) * 0.13))
    val df = rows.toDF("arm", "value")
    val a = EventOps.abTestCard(df.repartition(1), col("arm"), col("value"))
      .as[(Long, Long, Double, Double, Double)].head()
    val b = EventOps.abTestCard(df.repartition(17), col("arm"), col("value"))
      .as[(Long, Long, Double, Double, Double)].head()
    assert(a == b)
  }
}
