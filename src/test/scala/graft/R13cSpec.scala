package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GraphOps, MlOps}

/** Planted fixtures for the round-13c ops: triangle census and
  * normal-equation ridge regression. */
class R13cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangleCensus: one triangle plus a pendant edge") {
    // triangle {1,2,3} + edge 3-4: degrees 2,2,3,1 → wedges 1+1+3+0 = 5
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 1L))
      .toDF("src", "dst") // (2,1) is a duplicate of (1,2) reversed — the
                          // op must orient and dedup
    val out = GraphOps.triangleCensus(e, col("src"), col("dst"))
      .as[(Long, Long, Double)].head()
    assert(out == ((1L, 5L, 0.6)))
  }

  test("triangleCensus: bipartite graph has zero triangles") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("src", "dst")
    val out = GraphOps.triangleCensus(e, col("src"), col("dst"))
      .as[(Long, Long, Double)].head()
    assert(out._1 == 0L && out._2 == 4L && out._3 == 0.0)
  }

  test("kHopReach on a path graph: neighborhood sizes grow by one hop") {
    // path 1-2-3-4
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = GraphOps.kHopReach(e, col("src"), col("dst"), hops = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1L, 2L, 3L)))
    assert(out(2L) == ((2L, 3L, 3L)))
    assert(out(3L) == ((2L, 3L, 3L)))
    assert(out(4L) == ((1L, 2L, 3L)))
  }

  test("ridgeNormal recovers exact planted coefficients at lambda 0") {
    // y = 3 + 2*x1 - x2 exactly, over a deterministic integer grid
    val rows = for { x1 <- 0L to 20L; x2 <- 0L to 10L }
      yield (x1, x2, 3L + 2 * x1 - x2)
    val df = rows.toDF("x1", "x2", "y")
    val theta = MlOps.ridgeNormal(df, Seq(col("x1"), col("x2")), col("y"),
      lambda = 0.0).toMap
    assert(math.abs(theta(0) - 3.0) < 1e-6)
    assert(math.abs(theta(1) - 2.0) < 1e-6)
    assert(math.abs(theta(2) + 1.0) < 1e-6)
  }

  test("ridgeNormal shrinks feature coefficients, not the intercept") {
    val rows = for { x1 <- 0L to 20L; x2 <- 0L to 10L }
      yield (x1, x2, 3L + 2 * x1 - x2)
    val df = rows.toDF("x1", "x2", "y")
    val loose = MlOps.ridgeNormal(df, Seq(col("x1"), col("x2")), col("y"), 0.0).toMap
    val tight = MlOps.ridgeNormal(df, Seq(col("x1"), col("x2")), col("y"), 1e6).toMap
    assert(math.abs(tight(1)) < math.abs(loose(1)))
    assert(math.abs(tight(2)) < math.abs(loose(2)))
  }
}
