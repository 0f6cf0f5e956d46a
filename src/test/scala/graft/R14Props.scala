package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.{GraphOps, SimilarityOps}

/** Round-14 properties: the new scale paths against exhaustive/flat
  * references on random inputs. */
object R14Props extends Properties("round14") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val smallGraph = for {
    n <- Gen.choose(8, 40)
    m <- Gen.choose(n, 4 * n)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
    } yield (a.toLong, b.toLong))
  } yield edges.filter(e => e._1 != e._2)

  private val vecs = for {
    n <- Gen.choose(30, 80)
    seed <- Gen.choose(0L, 10000L)
  } yield (n, seed)

  // complete routing (probe = |coarse|) makes two-level EXACTLY the flat
  // assignment: every fine centroid is reachable from every coarse cell
  property("ivfAssignTwoLevel(probe = all coarse cells) == flat ivfAssign") =
    forAll(vecs) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val e = (0 until n).map(i => (i.toLong,
        Array.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
        .cache()
      val k = math.max(4, n / 8)
      val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
      val cents = e.where(col("vec_id") < k)
      val coarse = e.where(col("vec_id") < k1)
      val flat = SimilarityOps.ivfAssign(e, col("embedding"), col("vec_id"),
        cents, col("embedding"), col("vec_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val two = SimilarityOps.ivfAssignTwoLevel(e, col("embedding"),
        col("vec_id"), cents, col("embedding"), col("vec_id"), coarse,
        probe = k1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      e.unpersist()
      graft.core.CacheScope.release()
      two == flat
    }

  // the sketch census is a pure function of the edge SET — invariant
  // under partitioning and input row order
  property("kHopReachSketch deterministic under repartitioning") =
    forAll(smallGraph) { edges =>
      (edges.isEmpty: Boolean) || {
        val df3 = edges.toDF("src", "dst").repartition(3)
        val df7 = edges.reverse.toDF("src", "dst").repartition(7)
        def run(df: org.apache.spark.sql.DataFrame) = {
          val r = GraphOps.kHopReachSketch(df, col("src"), col("dst"),
            hops = 2).collect()
            .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
          graft.core.CacheScope.release()
          r
        }
        run(df3) == run(df7)
      }
    }

  // two-pass gate equivalence: auto(exact) == kHopReach on the same input
  property("kHopReachAuto below the gate == exact kHopReach") =
    forAll(smallGraph) { edges =>
      (edges.isEmpty: Boolean) || {
        val df = edges.toDF("src", "dst")
        def canon(r: org.apache.spark.sql.DataFrame) =
          r.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val exact = canon(GraphOps.kHopReach(df, col("src"), col("dst"), 1))
        graft.core.CacheScope.release()
        val auto = canon(GraphOps.kHopReachAuto(df, col("src"), col("dst"), 1))
        graft.core.CacheScope.release()
        auto == exact
      }
    }
}
