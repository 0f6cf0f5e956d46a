package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.{EventOps, GraphOps}

/** Property-style invariants for the round-13 operators: the native as-of
  * join (all directions/tolerances) vs a Scala brute force, the triangle
  * census vs an O(V³) reference, and k-hop reach vs a reference BFS —
  * real local Spark plans per trial, so trial counts stay small (the
  * SamplingProps convention). */
object R13Props extends Properties("round13") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private val genSeries = for {
    nL <- Gen.choose(1, 40)
    nR <- Gen.choose(0, 40)
    seed <- Gen.choose(0L, 1000000L)
  } yield (nL, nR, seed)

  private def mkRows(n: Int, seed: Long, idBase: Long) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (idBase + i, rng.nextInt(4).toLong,
        new java.sql.Timestamp(rng.nextInt(50) * 1000L),
        math.rint(rng.nextDouble() * 100) / 10.0)
    }
  }

  property("asofJoinNative (backward/forward/nearest, ± tolerance) == brute force") =
    Prop.forAll(genSeries, Gen.oneOf("backward", "forward", "nearest"),
        Gen.oneOf(-1L, 5000L, 20000L)) {
      case ((nL, nR, seed), mode, tolMs) =>
        val lRows = mkRows(nL, seed, 100L)
        val rRows = mkRows(nR, seed + 7, 1000L)
        val l = lRows.toDF("event_id", "user_id", "ts", "value")
        val r = rRows.toDF("event_id", "user_id", "ts", "value")
        val got = EventOps.asofJoinNative(l, col("event_id"), col("user_id"),
            col("ts"), r, col("event_id"), col("user_id"), col("ts"),
            col("value"), forward = mode == "forward", toleranceMs = tolMs,
            nearest = mode == "nearest")
          .select("left_id", "matched_id")
          .as[(Long, Option[Long])].collect().toMap
        def bwd(k: Long, ltsMs: Long) = rRows
          .filter(e => e._2 == k && e._3.getTime <= ltsMs &&
            (tolMs < 0 || ltsMs - e._3.getTime <= tolMs))
          .sortBy(e => (e._3.getTime, e._1)).lastOption
        def fwd(k: Long, ltsMs: Long) = rRows
          .filter(e => e._2 == k && e._3.getTime >= ltsMs &&
            (tolMs < 0 || e._3.getTime - ltsMs <= tolMs))
          .sortBy(e => (e._3.getTime, e._1)).headOption
        val want = lRows.map { case (lid, k, lts, _) =>
          val ltsMs = lts.getTime
          val best = mode match {
            case "backward" => bwd(k, ltsMs)
            case "forward"  => fwd(k, ltsMs)
            case "nearest"  =>
              // smaller |delta| wins; a tie goes to the backward row;
              // rows AT the instant count as backward
              (bwd(k, ltsMs), fwd(k, ltsMs)) match {
                case (Some(b), Some(f))
                  if f._3.getTime - ltsMs < ltsMs - b._3.getTime => Some(f)
                case (Some(b), _) => Some(b)
                case (_, f) => f
              }
          }
          lid -> best.map(_._1)
        }.toMap
        Prop(got == want) :| s"mode=$mode tol=$tolMs got=$got want=$want"
    }

  private val genGraph = for {
    nV <- Gen.choose(2, 12)
    nE <- Gen.choose(1, 30)
    seed <- Gen.choose(0L, 1000000L)
  } yield (nV, nE, seed)

  property("triangleCensus == O(V^3) reference on random graphs") =
    Prop.forAll(genGraph) { case (nV, nE, seed) =>
      val rng = new scala.util.Random(seed)
      val edges = (0 until nE).map { _ =>
        (rng.nextInt(nV).toLong, rng.nextInt(nV).toLong)
      }.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      if (edges.isEmpty) Prop.passed
      else {
        val df = edges.toDF("src", "dst")
        val got = GraphOps.triangleCensus(df, col("src"), col("dst"))
          .as[(Long, Long, Double)].head()
        val es = edges.toSet
        def adj(a: Long, b: Long) =
          es((math.min(a, b), math.max(a, b)))
        val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val tri = (for {
          a <- vs; b <- vs if b > a; c <- vs if c > b
          if adj(a, b) && adj(b, c) && adj(a, c)
        } yield 1).size.toLong
        val deg = vs.map(v => edges.count(e => e._1 == v || e._2 == v))
        val wedges = deg.map(d => d.toLong * (d - 1) / 2).sum
        Prop(got._1 == tri && got._2 == wedges) :| s"got $got want ($tri, $wedges)"
      }
    }

  property("kHopReach == reference BFS on random graphs") =
    Prop.forAll(genGraph) { case (nV, nE, seed) =>
      val rng = new scala.util.Random(seed + 13)
      val edges = (0 until nE).map { _ =>
        (rng.nextInt(nV).toLong, rng.nextInt(nV).toLong)
      }.filter(e => e._1 != e._2).distinct
      if (edges.isEmpty) Prop.passed
      else {
        val df = edges.toDF("src", "dst")
        val got = GraphOps.kHopReach(df, col("src"), col("dst"), hops = 3)
          .as[(Long, Long, Long, Long)].collect()
          .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
        val nbr = edges.flatMap(e => Seq(e, e.swap)).distinct
          .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
        val vs = nbr.keys.toSeq.sorted
        val want = vs.map { v =>
          var reach = nbr(v) - v
          val sizes = Seq.newBuilder[Long]
          sizes += reach.size.toLong
          for (_ <- 2 to 3) {
            reach = (reach ++ reach.flatMap(u => nbr(u))) - v
            sizes += reach.size.toLong
          }
          v -> sizes.result()
        }.toMap
        Prop(got == want) :| s"got $got want $want"
      }
    }
}
