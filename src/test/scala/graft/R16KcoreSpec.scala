package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Planted-fixture checks for k-core peeling (the corpus-level check is
  * the graph_kcore oracle over the real-pixel near-dup graph): the
  * peel cascade, the all-peeled empty core, direction/duplicate-edge
  * normalization, and the fail-loud non-convergence guard. */
class R16KcoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // K4 clique on {0,1,2,3} + a path 3-4-5 hanging off it
  private def fixture = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
    (3L, 4L), (4L, 5L)).toDF("a", "b")

  test("3-core peels the tail in a cascade and keeps the clique") {
    // round 1 peels 5 (deg 1) and 4 (deg 2); 3 keeps degree 3 after the
    // cascade — the clique survives with uniform degree 3
    val out = GraphOps.kCore(fixture, col("a"), col("b"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("k above the densest core yields an empty result, not a crash") {
    assert(GraphOps.kCore(fixture, col("a"), col("b"), k = 4)
      .collect().isEmpty)
  }

  test("duplicate and reversed edges normalize before peeling") {
    val noisy = fixture
      .unionByName(fixture.select(col("b").as("a"), col("a").as("b")))
      .unionByName(fixture) // duplicates
      .unionByName(Seq((7L, 7L)).toDF("a", "b")) // self loop dropped
    val out = GraphOps.kCore(noisy, col("a"), col("b"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("non-convergence within maxRounds fails loudly — BOTH paths") {
    // a 12-vertex path peels one layer per round from each end: 1-core
    // converges round 1, but k=2 peels the whole path over ~6 rounds —
    // maxRounds=2 must refuse rather than return a half-peeled graph.
    // The driver gate must NOT relax this: the oracle replays exactly
    // maxRounds rounds, so both plans enforce the same bound.
    val path = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      GraphOps.kCore(path, col("a"), col("b"), k = 2, maxRounds = 2)
        .collect()
    }
    intercept[IllegalArgumentException] {
      GraphOps.kCore(path, col("a"), col("b"), k = 2, maxRounds = 2,
        maxDriverEdges = 0L).collect()
    }
    // and with enough rounds the 2-core of a path is empty
    assert(GraphOps.kCore(path, col("a"), col("b"), k = 2, maxRounds = 8)
      .collect().isEmpty)
  }

  test("driver and distributed peels agree bit-for-bit at the boundary") {
    // pseudo-random 23-vertex graph: driver path (default gate) vs the
    // distributed loop (gate forced off) must produce the identical
    // (v, degree) map — the pageRank dual-plan agreement discipline
    val edges = (1 to 80).map(i => ((i * 7L) % 23, (i * 11L) % 23))
      .filter(p => p._1 != p._2).toDF("a", "b")
    for (k <- Seq(2, 3, 5)) {
      val driver = GraphOps.kCore(edges, col("a"), col("b"), k,
        maxRounds = 16).as[(Long, Long)].collect().toMap
      val dist = GraphOps.kCore(edges, col("a"), col("b"), k,
        maxRounds = 16, maxDriverEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(driver == dist, s"k=$k paths diverge")
    }
  }

  test("distributed path still passes the planted fixtures") {
    val out = GraphOps.kCore(fixture, col("a"), col("b"), k = 3,
      maxDriverEdges = 0L).as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(GraphOps.kCore(fixture, col("a"), col("b"), k = 4,
      maxDriverEdges = 0L).collect().isEmpty)
  }
}
