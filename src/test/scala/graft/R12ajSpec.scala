package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Invariants for the round-12aj surface: integer PageRank. */
class R12ajSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: symmetric K3 is a fixed point at init mass") {
    val edges = Seq((1, 2), (1, 3), (2, 3)).toDF("s", "d")
    val out = GraphOps.pageRank(edges, col("s"), col("d"), iters = 10)
      .as[(Long, Long)].collect().toMap
    val init = 1000000000000L / 3
    // complete symmetric graph: all ranks identical, within the integer
    // floor's mass leak (r div 2 drops ≤1 unit per superstep)
    assert(out.values.toSet.size == 1)
    assert(math.abs(out(1L) - init) <= 10)
  }

  test("pageRank: star center outranks leaves; partitioning-invariant") {
    val edges = Seq((0, 1), (0, 2), (0, 3), (0, 4)).toDF("s", "d")
    val out = GraphOps.pageRank(edges, col("s"), col("d"), iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) > out(1L))
    assert((1L to 4L).map(out(_)).toSet.size == 1)  // leaves identical
    val out2 = GraphOps.pageRank(edges.repartition(7), col("s"), col("d"),
      iters = 10).as[(Long, Long)].collect().toMap
    assert(out == out2)                            // integer determinism
  }

  test("pageRank driver and distributed paths agree bit-for-bit") {
    val edges = (1 to 60).map(i =>
      ((i * 7) % 23, (i * 11) % 23)).filter(p => p._1 != p._2)
      .toDF("s", "d")
    val driver = GraphOps.pageRank(edges, col("s"), col("d"), iters = 10)
      .as[(Long, Long)].collect().toMap
    val dist = GraphOps.pageRank(edges, col("s"), col("d"), iters = 10,
        maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist)
  }
}
