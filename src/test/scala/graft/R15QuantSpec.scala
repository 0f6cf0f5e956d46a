package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.CacheScope
import graft.ops.{DedupOps, MlOps, SimilarityOps}

/** Round-15: the learned-coarse two-level quantizer and its wiring into
  * semanticDedup's production assignment path — the engine's last
  * quadratic term (flat O(n·k) centroid scan with k ∝ corpus) replaced by
  * an O(n·√k·probe) route behind a size gate. */
class R15QuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8 well-separated Euclidean cells (100-unit axis offsets, coords 0..7)
  // with per-member low-amplitude jitter on the high coords — the k-means
  // fit recovers the cells and every vector's argmin centroid is
  // unambiguous (no near-ties for routing to flip)
  private lazy val corpus = {
    val r = new scala.util.Random(5)
    (0 until 8).flatMap { c =>
      (0 until 24).map { j =>
        val id = c * 24L + j
        val v = Array.tabulate(16) { d =>
          val base = if (d == c) 100.0 else 0.0
          val jit = if (d >= 8) r.nextGaussian() * 2.0 else 0.0
          base + jit
        }
        (id, v.toSeq)
      }
    }.toDF("vec_id", "embedding")
  }

  test("l2Assign is bit-equal to the kmeansFit flat UDF assignment " +
      "(same sequential fold, same strict-argmin/lowest-id tie-break)") {
    val (centers, flatAsg) = MlOps.kmeansFit(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L)
    val centDf = spark.createDataset(centers.toSeq.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) })
      .toDF("centroid_id", "cv")
    val a = flatAsg.as[(Long, Long)].collect().toMap
    val b = SimilarityOps.l2Assign(corpus, col("embedding"), col("vec_id"),
        centDf, col("cv"), col("centroid_id"))
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    assert(a.size == 192 && b == a)
  }

  test("l2AssignTwoLevelLearned: full agreement with flat on the fixture, " +
      "every vector assigned, deterministic") {
    val (centers, _) = MlOps.kmeansFit(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L)
    val centDf = spark.createDataset(centers.toSeq.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) })
      .toDF("centroid_id", "cv")
    val flat = SimilarityOps.l2Assign(corpus, col("embedding"),
        col("vec_id"), centDf, col("cv"), col("centroid_id"))
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    val two = SimilarityOps.l2AssignTwoLevelLearned(corpus, col("embedding"),
        col("vec_id"), centDf, col("cv"), col("centroid_id"), probe = 2,
        k1 = 4, seed = 49L)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    assert(two.size == flat.size, "no vector may drop out of the output")
    assert(two == flat, "routed candidates contain every true argmin here")
    val again = SimilarityOps.l2AssignTwoLevelLearned(corpus,
        col("embedding"), col("vec_id"), centDf, col("cv"),
        col("centroid_id"), probe = 2, k1 = 4, seed = 49L)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    assert(again == two, "deterministic for fixed (input, seed, probe)")
  }

  test("l2AssignTwoLevelLearned at probe=1: the reverse route keeps every " +
      "vector assigned even when forward routing is at its stingiest") {
    val (centers, _) = MlOps.kmeansFit(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L)
    val centDf = spark.createDataset(centers.toSeq.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) })
      .toDF("centroid_id", "cv")
    val n = SimilarityOps.l2AssignTwoLevelLearned(corpus, col("embedding"),
      col("vec_id"), centDf, col("cv"), col("centroid_id"), probe = 1,
      seed = 49L).count()
    assert(n == 192L)
  }

  test("knnJoinIvf routed probes: full routing (routeProbe ≥ k1) equals " +
      "the flat probe scan; index and in-memory forms agree on the " +
      "routed path") {
    val e = corpus.select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
    val cents = e.where(col("vec_id") < 16)
    val coarse = e.where(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)]
        .collect().toSet
    val flat = rows(SimilarityOps.knnJoinIvf(e, col("embedding"),
      col("vec_id"), e, col("embedding"), col("vec_id"),
      cents, col("embedding"), col("vec_id"), k = 3, nprobe = 2))
    // routeProbe = 4 = k1 routes every fine centroid to every coarse
    // cell → the routed candidate set is the full codebook → identical
    // probe choice → identical output
    val routedFull = rows(SimilarityOps.knnJoinIvf(e, col("embedding"),
      col("vec_id"), e, col("embedding"), col("vec_id"),
      cents, col("embedding"), col("vec_id"), k = 3, nprobe = 2,
      coarse = Some(coarse), routeProbe = 4))
    assert(routedFull == flat)
    // genuine routing (routeProbe=2): in-memory and persisted-index
    // forms must agree row-for-row (the index is a layout, not a
    // different algorithm — including the routed probe path)
    val routed = rows(SimilarityOps.knnJoinIvf(e, col("embedding"),
      col("vec_id"), e, col("embedding"), col("vec_id"),
      cents, col("embedding"), col("vec_id"), k = 3, nprobe = 2,
      coarse = Some(coarse), routeProbe = 2))
    val idx = java.nio.file.Files.createTempDirectory("r15knn").toString +
      "/idx"
    SimilarityOps.ivfIndexWrite(e, col("embedding"), col("vec_id"),
      cents, col("embedding"), col("vec_id"), idx)
    val viaIndex = rows(SimilarityOps.knnJoinIvfIndex(spark, idx, e,
      col("embedding"), col("vec_id"), k = 3, nprobe = 2, coarseK1 = 4,
      routeProbe = 2))
    assert(viaIndex == routed)
    assert(routed.map(_._1) == flat.map(_._1),
      "every query keeps neighbours under routing")
    CacheScope.release()
  }

  test("kmeansFitRouted (sample init + routed Lloyd) recovers the same " +
      "cluster structure as the exact local fit, deterministically, " +
      "even from a genuine subsample") {
    // canonical form: the partition of ids into clusters (labels are
    // arbitrary between fits)
    def groupsOf(asg: Map[Long, Long]): Set[Set[Long]] =
      asg.groupBy(_._2).values.map(_.keySet.toSet).toSet
    val exact = groupsOf(MlOps.kmeansFit(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L)._2
      .as[(Long, Long)].collect().toMap)
    assert(exact.size == 8 && exact.forall(_.size == 24),
      "the separated fixture's true cells")
    val routed = MlOps.kmeansFitRouted(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L, maxDriverRows = 64L)._2
      .as[(Long, Long)].collect().toMap
    graft.core.CacheScope.release()
    assert(groupsOf(routed) == exact,
      "a 64-row sample init + 3 routed Lloyd steps recover the cells")
    val again = MlOps.kmeansFitRouted(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L, maxDriverRows = 64L)._2
      .as[(Long, Long)].collect().toMap
    graft.core.CacheScope.release()
    assert(again == routed, "deterministic for fixed input + seed")
    // k past the sample's capacity (k > maxDriverRows/2): the hash-rank
    // init path — the k-proportional-to-corpus regime — must not crash
    // and must still recover the cells after routed refinement
    val rankInit = MlOps.kmeansFitRouted(corpus, col("embedding"),
      col("vec_id"), k = 8, seed = 42L, maxDriverRows = 10L)._2
      .as[(Long, Long)].collect().toMap
    graft.core.CacheScope.release()
    assert(groupsOf(rankInit) == exact,
      "hash-rank init + routed Lloyd recovers the cells without a sample fit")
  }

  test("Dist2 fails loudly on mismatched dimensions instead of silently " +
      "truncating; tiny codebooks delegate to the flat scan") {
    val bad = Seq((1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
      .toDF("id", "a", "b")
    val e = intercept[Exception](
      bad.select(graft.functions.VecKernels.dist2(col("a"), col("b")))
        .collect())
    assert(e.getMessage != null)
    // k=1: routing has nothing to route — must behave as l2Assign
    val one = corpus.limit(20)
    val cents1 = corpus.where(col("vec_id") === 0L)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val out = SimilarityOps.l2AssignTwoLevelLearned(one, col("embedding"),
      col("vec_id"), cents1, col("cv"), col("centroid_id")).collect()
    assert(out.length == 20 && out.forall(_.getLong(1) == 0L))
    graft.core.CacheScope.release()
  }

  test("semanticDedup through the gated two-level assignment keeps the " +
      "same keepers as the flat path") {
    // the OpsSpec fixture: 3 cells, planted near-identical pairs (10c,
    // 10c+1), spiked members below the 0.999 dup bar
    val r = new scala.util.Random(11)
    val vs = (0 until 3).flatMap { c =>
      (0 until 10).map { j =>
        val id = c * 10L + j
        val v = Array.tabulate(16) { d =>
          val base = if (d == c) 100.0 else 0.0
          val spike = if (j >= 2 && d == 3 + (j - 2)) 15.0 else 0.0
          val noise = if (j == 1) r.nextGaussian() * 1e-3 else 0.0
          (base + spike + noise).toFloat
        }
        (id, v)
      }
    }
    val df = vs.toDF("vec_id", "embedding")
    val flatKept = DedupOps.semanticDedup(df, col("embedding"),
      col("vec_id"), k = 3, minCosine = 0.999, seed = 42L)
      .select("vec_id").as[Long].collect().toSet
    CacheScope.release()
    // force the two-level route (n·k = 90 > 1): the PRODUCTION gate wired
    // into semanticDedup, exercised end-to-end through pairs → components
    // → keeper projection
    val gatedKept = DedupOps.semanticDedup(df, col("embedding"),
      col("vec_id"), k = 3, minCosine = 0.999, seed = 42L,
      maxFlatAssignCost = 1L)
      .select("vec_id").as[Long].collect().toSet
    CacheScope.release()
    assert(flatKept == vs.map(_._1).toSet -- Set(1L, 11L, 21L))
    assert(gatedKept == flatKept,
      "two-level cells reproduce the flat keeper set on separated cells")
  }
}
