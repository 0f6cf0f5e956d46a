package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{EventOps, GraphOps, MlOps}

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

  test("triangleCensus: a single edge (no wedges) yields zero clustering, " +
      "not a division error") {
    val out = GraphOps.triangleCensus(Seq((1L, 2L)).toDF("src", "dst"),
        col("src"), col("dst"))
      .as[(Long, Long, Double)].head()
    assert(out == ((0L, 0L, 0.0)))
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

  test("funnelStagesWindowed: stages advance only within the time budget") {
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val events = Seq(
      // user 1 converts fully: each stage 1 s after the previous
      (1L, t(0L), 1L, "signup"), (1L, t(1000000L), 2L, "view"),
      (1L, t(2000000L), 3L, "purchase"),
      // user 2: view arrives 2 h after signup — stuck at stage 1 even
      // though the UNwindowed funnel would reach 3
      (2L, t(0L), 4L, "signup"), (2L, t(7200L * 1000000L), 5L, "view"),
      (2L, t(7201L * 1000000L), 6L, "purchase"),
      // user 3: the window resets per stage — view at 50 min (ok),
      // purchase at 50 min after the view (ok) = full conversion even
      // though purchase is 100 min after signup
      (3L, t(0L), 7L, "signup"), (3L, t(3000L * 1000000L), 8L, "view"),
      (3L, t(6000L * 1000000L), 9L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val win = EventOps.funnelStagesWindowed(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("signup", "view", "purchase"), windowMs = 3600000L)
      .as[(Long, Int)].collect().toMap
    assert(win == Map(1L -> 3, 2L -> 1, 3L -> 3))
    val plain = EventOps.funnelStages(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type"),
        Seq("signup", "view", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(plain(2L) == 3, "the unwindowed funnel does reach stage 3")
  }

  test("rfmSegments: five planted users land in five distinct quintiles " +
      "per axis") {
    def t(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // user u: last activity day u (u=5 most recent → R quintile 1 is u5),
    // u purchases of value 10*u each (F and M quintile 1 are u5 too)
    val rows = for { u <- 1 to 5; i <- 1 to u }
      yield (u.toLong * 100 + i, t(if (i == 1) u else 1), u.toLong,
        "purchase", 10.0 * u, "")
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val cells = graft.ops.EventOps.rfmSegments(ev, col("user_id"),
        col("ts"), col("value"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // most-recent = most-frequent = highest-value user → (1,1,1); the
    // least on all axes → (5,5,5); each axis spans exactly 1..5 once
    assert(cells.map(_._4).forall(_ == 1L) && cells.size == 5)
    assert(cells.map(c => (c._1, c._2, c._3)) ==
      Set((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L), (4L, 4L, 4L),
        (5L, 5L, 5L)))
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

  test("logregGd: separable fixture learns the right signs, and the fit " +
      "is bit-identical under different partitionings") {
    // y follows x1 (positive) and anti-follows x2 (negative)
    val rows = for { x1 <- 0 to 10; x2 <- 0 to 10 }
      yield (x1 / 10.0, x2 / 10.0, if (x1 - x2 > 0) 1.0 else 0.0)
    val df = rows.toDF("x1", "x2", "y")
    def fit(parts: Int) = MlOps.logregGd(df.repartition(parts),
        col("x1"), col("x2"), col("y"), iters = 5, eta = 1.0)
      .as[(Double, Double, Double)].head()
    val f1 = fit(1)
    val f8 = fit(8)
    assert(f1 == f8, "micro-unit gradients must be partitioning-immune")
    assert(f1._2 > 0 && f1._3 < 0, "signs follow the planted relation")
  }

  test("kmeansLloyd: separable planted clusters recovered, bit-identical " +
      "under different partitionings") {
    // two tight clusters around (0.1, 0.1) and (0.9, 0.9); the two
    // lowest-id seeds land one in each cluster
    val rows = Seq(
      (0L, Seq(0.1f, 0.1f)), (2L, Seq(0.12f, 0.1f)), (4L, Seq(0.1f, 0.14f)),
      (1L, Seq(0.9f, 0.9f)), (3L, Seq(0.88f, 0.9f)), (5L, Seq(0.9f, 0.86f)))
    val df = rows.toDF("vec_id", "embedding")
    def run(parts: Int) = graft.ops.MlOps.kmeansLloyd(
        df.repartition(parts), col("embedding"), col("vec_id"),
        k = 2, iters = 2)
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val a = run(1)
    val b = run(6)
    assert(a == b, "integer trajectory must be partitioning-immune")
    val counts = a.filter(_._2 == -1).map(r => r._1 -> r._3).toMap
    assert(counts == Map(0 -> 3L, 1 -> 3L))
    // centroid 0 ≈ (0.106.., 0.113..) in micro-units; exact integer mean
    val c0 = a.filter(r => r._1 == 0 && r._2 > 0).map(_._3)
    assert(c0.forall(v => v > 90000L && v < 130000L))
    val c1 = a.filter(r => r._1 == 1 && r._2 > 0).map(_._3)
    assert(c1.forall(v => v > 850000L && v < 910000L))
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
