package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** Round-15: a null left_id with a VALID (key, ts) must merge normally and
  * emit a null id — not be conflated with a real id 0 (the main emit paths
  * previously called getLong on the null slot).  Covers all three modes
  * (backward / forward / nearest), each of which has its own emit site. */
class R15AsofSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)

  // left: one null-id row with a valid key/ts that MATCHES, one real id-0
  // row — the two must stay distinguishable in the output
  private val left = Seq(
    (null.asInstanceOf[java.lang.Long], jl(10L), jl(100L)), // null id, valid
    (jl(0L), jl(10L), jl(200L)),                            // REAL id 0
    (jl(5L), jl(10L), jl(300L)))
    .toDF("event_id", "user_id", "tsl")
  private val right = Seq(
    (jl(7L), jl(10L), jl(90L), 1.5),
    (jl(8L), jl(10L), jl(250L), 2.5))
    .toDF("event_id", "user_id", "tsl", "value")

  private def run(forward: Boolean, nearest: Boolean) =
    EventOps.asofJoinNative(left, col("event_id"), col("user_id"),
      timestamp_micros(col("tsl")), right, col("event_id"), col("user_id"),
      timestamp_micros(col("tsl")), col("value"),
      forward = forward, nearest = nearest)
      .collect()
      .map(r => ((if (r.isNullAt(0)) null else jl(r.getLong(0))),
        (if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap

  test("backward: null left_id merges on its valid key and emits null id") {
    val out = run(forward = false, nearest = false)
    assert(out.size == 3, "null id and real id 0 must not collapse")
    assert(out(null) == 7L, "null-id row still as-of matches (ts 100 → 90)")
    assert(out(jl(0L)) == 7L, "real id 0 keeps its own match")
    assert(out(jl(5L)) == 8L)
  }

  test("forward: null left_id merges and emits null id") {
    val out = run(forward = true, nearest = false)
    assert(out.size == 3)
    assert(out(null) == 8L, "null-id row forward-matches (ts 100 → 250)")
    assert(out(jl(0L)) == 8L)
    assert(out(jl(5L)) == -1L, "no right row at/after ts 300")
  }

  test("nearest: null left_id merges and emits null id") {
    val out = run(forward = false, nearest = true)
    assert(out.size == 3)
    assert(out(null) == 7L, "|100-90| < |250-100| → backward wins")
    assert(out(jl(0L)) == 8L, "|200-250| < |200-90| → forward wins")
    assert(out(jl(5L)) == 8L)
  }
}
