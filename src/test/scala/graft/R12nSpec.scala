package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariants for the round-12n surface: the MAD gate. */
class R12nSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("madGate: planted spike flagged; constant corpus flags nothing") {
    // values 10..19 (median 14, MAD 3 — lower medians) plus a 1000 spike
    val df = ((1L to 10L).map(i => (i, 9L + i)) :+ ((99L, 1000L)))
      .toDF("doc_id", "n")
    val out = TextOps.madGate(df, col("n"), col("doc_id"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(out(99L))                          // |1000-14| >> 3*MAD
    assert((1L to 10L).forall(i => !out(i)))  // bulk within the band
    val const = (1L to 5L).map(i => (i, 7L)).toDF("doc_id", "n")
    val c = TextOps.madGate(const, col("n"), col("doc_id"))
      .as[(Long, Long, Boolean)].collect()
    assert(c.forall(!_._3)) // MAD 0, deviations 0 -> nothing flagged
  }
}
