package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Round-15: deterministic label propagation — two separated cliques
  * converge to their min labels, results are run-stable, directions and
  * self-loops are normalized away. */
class R15GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.labelPropagation(edges.toDF("src", "dst"),
      col("src"), col("dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint triangles each converge to their smallest member's " +
      "label within two rounds; the result is deterministic across runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val got = lpa(edges, 2)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(lpa(edges, 2) == got, "bit-stable across runs")
  }

  test("edge direction and self-loops do not matter; a dominant " +
      "neighborhood label wins over the min-label tie rule") {
    // star: hub 5 with leaves 1..4, plus a self-loop and a reversed edge
    val edges = Seq((5L, 1L), (2L, 5L), (5L, 3L), (4L, 5L), (5L, 5L))
    val r1 = lpa(edges, 1)
    // round 1: every leaf's only neighbor is 5 -> label 5;
    // hub sees {1,2,3,4} all once -> min label 1
    assert(r1 == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 1L))
    val r2 = lpa(edges, 2)
    // round 2: hub sees label 5 four times -> 5 (frequency beats min)
    assert(r2(5L) == 5L)
    assert(Seq(1L, 2L, 3L, 4L).forall(v => r2(v) == 1L),
      "leaves adopt the hub's round-1 label")
  }
}
