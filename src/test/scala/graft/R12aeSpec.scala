package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariants for the round-12ae surface: co-occurrence lift, Gini, and
  * the script profile. */
class R12aeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("itemCooc counts co-engaged users once and computes exact lift") {
    // users: 1 → {10, 20}; 2 → {10, 20}; 3 → {10}; 4 → {30}
    // repeated touches must not double-count
    val ev = Seq((1L, 10), (1L, 10), (1L, 20), (2L, 10), (2L, 20),
      (3L, 10), (4L, 30)).toDF("user_id", "item")
    val out = EventOps.itemCooc(ev, col("user_id"), col("item"))
      .as[(Int, Int, Long, Double)].collect()
    assert(out.length == 1)
    val (i, j, nCo, lift) = out.head
    assert((i, j) == ((10, 20)) && nCo == 2L)
    // N=4 users, n_10=3, n_20=2 → lift = 2·4/(3·2) = 4/3
    assert(math.abs(lift - 4.0 / 3.0) < 1e-12)
  }

  test("giniConcentration: uniform → 0, extreme → near 1") {
    val uniform = (1 to 10).map(i => (i, 5L)).toDF("k", "w")
    val g0 = EventOps.giniConcentration(uniform, col("k"), col("w"))
      .as[(Long, Long, Double)].head()
    assert(math.abs(g0._3) < 1e-12)
    val skewed = ((1 to 9).map(i => (i, 1L)) :+ (10, 991L)).toDF("k", "w")
    val g1 = EventOps.giniConcentration(skewed, col("k"), col("w"))
      .as[(Long, Long, Double)].head()
    assert(g1._2 == 1000L && g1._3 > 0.85)
  }

  test("scriptProfile fractions are exact and sum to 1") {
    val docs = Seq(("s1", "abc 12"), ("s1", "xy"), ("s2", "!!??"))
      .toDF("source", "text")
    val out = TextOps.scriptProfile(docs, col("text"), col("source"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val s1 = out("s1")                  // 8 chars: 5 letters, 2 digits, 1 space
    assert(s1._2 == 8L)
    assert(s1._3 == 0.625 && s1._4 == 0.25 && s1._5 == 0.125 && s1._6 == 0.0)
    val s2 = out("s2")                  // all punctuation
    assert(s2._3 == 0.0 && s2._6 == 1.0)
    out.values.foreach { r =>
      assert(math.abs(r._3 + r._4 + r._5 + r._6 - 1.0) < 1e-9)
    }
  }
}
