package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.{SimilarityOps, TextOps}

/** Round-15 properties: the learned-coarse L2 route and the driver-gated
  * BPE merge loop against their exact references on random inputs. */
object R15Props extends Properties("round15") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = for {
    n <- Gen.choose(30, 70)
    seed <- Gen.choose(0L, 10000L)
  } yield (n, seed)

  // invariants that hold for ANY routing (no clusterability assumption):
  // one output row per vector, and the routed choice is never BETTER
  // than the exact flat argmin (it scores a candidate subset) — equal
  // exactly when the subset contains the argmin
  property("l2AssignTwoLevelLearned: one row per vector; routed d2 >= " +
      "flat min d2; bit-deterministic") =
    forAll(vecs) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val e = (0 until n).map(i => (i.toLong,
        Array.fill(8)(rnd.nextDouble() * 2 - 1).toSeq))
        .toDF("vec_id", "embedding").cache()
      val k = math.max(4, n / 6)
      val cents = e.where(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("cv"))
      val flat = SimilarityOps.l2Assign(e, col("embedding"), col("vec_id"),
          cents, col("cv"), col("centroid_id"))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      def run() = SimilarityOps.l2AssignTwoLevelLearned(e, col("embedding"),
          col("vec_id"), cents, col("cv"), col("centroid_id"), probe = 2,
          seed = seed + 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val two = run()
      val again = run()
      e.unpersist()
      graft.core.CacheScope.release()
      two.size == n &&
        two.forall { case (vid, _, d2) => d2 >= flat(vid) - 1e-12 } &&
        again == two
    }

  // complete routing (probe >= k1) makes the routed assignment EXACTLY
  // the flat argmin — every fine centroid reachable from every cell
  property("l2AssignTwoLevelLearned(probe >= k1) == l2Assign") =
    forAll(vecs) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val e = (0 until n).map(i => (i.toLong,
        Array.fill(8)(rnd.nextDouble() * 2 - 1).toSeq))
        .toDF("vec_id", "embedding").cache()
      val k = math.max(4, n / 6)
      val k1 = 3
      val cents = e.where(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("cv"))
      val flat = SimilarityOps.l2Assign(e, col("embedding"), col("vec_id"),
          cents, col("cv"), col("centroid_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val two = SimilarityOps.l2AssignTwoLevelLearned(e, col("embedding"),
          col("vec_id"), cents, col("cv"), col("centroid_id"),
          probe = k1, k1 = k1, seed = seed + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      e.unpersist()
      graft.core.CacheScope.release()
      two == flat
    }

  // adversarial tie-heavy corpora over a 3-letter alphabet: the local
  // incremental merge loop must reproduce the distributed per-round
  // argmax merge-for-merge (count ties break lexicographically in both)
  private val corpora = for {
    nDocs <- Gen.choose(2, 5)
    docs <- Gen.listOfN(nDocs, Gen.listOf(
      Gen.listOfN(4, Gen.oneOf("a", "b", "c")).map(_.mkString))
      .map(_.take(12).mkString(" ")))
  } yield docs.filter(_.nonEmpty)

  property("bpeTrain local == distributed merge-for-merge on tie-heavy " +
      "random corpora") =
    forAll(corpora) { docs =>
      docs.isEmpty || {
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val local = TextOps.bpeTrain(df, col("text"), numMerges = 8)
        graft.core.CacheScope.release()
        val dist = TextOps.bpeTrain(df, col("text"), numMerges = 8,
          maxDriverWords = 0L)
        graft.core.CacheScope.release()
        local == dist
      }
    }
}
