package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Round-14 graph-tier scale paths: compact-forward triangle counting
  * under a skewed hub, and the bounded-state HyperANF k-hop census vs the
  * exact BFS. */
class R14GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangleCensus (compact-forward) matches a planted fixture with " +
      "known counts") {
    // K4 on {1,2,3,4} (4 triangles) + a pendant edge (0 triangles)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r = GraphOps.triangleCensus(edges, col("src"), col("dst")).collect()(0)
    assert(r.getLong(0) == 4L, "K4 has 4 triangles")
    // degrees: 3,3,3,4,1 → wedges 3+3+3+6+0 = 15
    assert(r.getLong(1) == 15L)
    assert(math.abs(r.getDouble(2) - 3.0 * 4 / 15) < 1e-9)
    graft.core.CacheScope.release()
  }

  test("triangleCensus survives a 10^4-degree hub: fan-out stays bounded " +
      "and the count is exact") {
    // one hub (vertex 0) joined to 10 000 leaves, plus a triangle ring
    // among the first 30 leaves and the hub: leaves (3i+1, 3i+2) are
    // connected, so hub + that pair closes a triangle — 10 planted
    // triangles.  The naive id-ordered join would expand the hub's
    // 10^4-neighbor adjacency into ~5·10^7 wedge rows; compact-forward
    // orients every hub edge AWAY from the low-degree leaves INTO the hub,
    // whose out-degree is then 0 — the wedge join never explodes.
    val n = 10000
    val hub = (1 to n).map(i => (0L, i.toLong))
    val ring = (0 until 10).map(i => ((3 * i + 1).toLong, (3 * i + 2).toLong))
    val edges = (hub ++ ring).toDF("src", "dst")
    val t0 = System.nanoTime()
    val r = GraphOps.triangleCensus(edges, col("src"), col("dst")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(0) == 10L, s"planted 10 hub triangles, got ${r.getLong(0)}")
    assert(secs < 60.0, s"hub census took $secs s — fan-out not bounded?")
    graft.core.CacheScope.release()
  }

  test("kHopReachSketch tracks the exact census within HLL tolerance on a " +
      "random graph, and kHopReachAuto picks each path by size") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 600).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val exact = GraphOps.kHopReach(edges, col("src"), col("dst"), hops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sk = GraphOps.kHopReachSketch(edges, col("src"), col("dst"), hops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (seed, (n1, n2)) =>
      val (s1, s2) = sk(seed)
      assert(math.abs(s1 - n1) <= math.max(2L, (0.15 * n1).toLong),
        s"seed $seed hop1: sketch $s1 vs exact $n1")
      assert(math.abs(s2 - n2) <= math.max(2L, (0.15 * n2).toLong),
        s"seed $seed hop2: sketch $s2 vs exact $n2")
    }
    // the gate: under the threshold the auto path IS the exact path
    val auto = GraphOps.kHopReachAuto(edges, col("src"), col("dst"), hops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(auto == exact, "below maxExactEdges the auto path is exact")
    // above the (forced-tiny) threshold it swaps to the sketch path
    val autoSk = GraphOps.kHopReachAuto(edges, col("src"), col("dst"),
      hops = 2, maxExactEdges = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(autoSk == sk, "beyond maxExactEdges the auto path is the sketch")
    graft.core.CacheScope.release()
  }
}
