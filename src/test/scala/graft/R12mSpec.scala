package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariants for the round-12m surface: downsampling and centroid
  * drift. */
class R12mSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("downsampleFrequentTokens: rare tokens always survive, totals exact") {
    // "the" dominates (40 of 50 tokens); rare tokens have p = 1
    val docs = (1L to 10L)
      .map(i => (i, ("the " * 4) + s"rare$i"))
      .toDF("doc_id", "text")
    val out = TextOps.downsampleFrequentTokens(docs, col("text"),
        col("doc_id"), threshold = 0.02)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 10)
    assert(out.values.forall(_._1 == 5L)) // 5 tokens per doc
    // p(rare) = min(1, sqrt(.02*50/1)) = 1 -> every rare token kept
    assert(out.values.forall(_._2 >= 1L))
    // p(the) = sqrt(.02*50/40) ~ 0.158 -> most "the"s dropped corpus-wide
    val keptTotal = out.values.map(_._2).sum
    assert(keptTotal < 30L)
  }

  test("downsampleFrequentTokens: threshold >= max freq keeps everything") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val out = TextOps.downsampleFrequentTokens(docs, col("text"),
        col("doc_id"), threshold = 1.0)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(r => r._2 == r._3)) // p = 1 for every token
  }

  test("centroidDrift: identical snapshots -> cos 1; opposite -> cos -1") {
    def vecs(sign: Float, ids: Range) = ids.map(i =>
      (i.toLong, Array(1f * sign, 2f * sign, 3f * sign, 4f * sign), 0))
    val same = (vecs(1f, 0 until 4) ++ vecs(1f, 100 until 104))
      .toDF("vec_id", "embedding", "label")
    val sameCos = EmbedOps.centroidDrift(
        same.where(col("vec_id") < 100), same.where(col("vec_id") >= 100),
        col("embedding"), col("label"))
      .select("cos").as[Double].head()
    assert(math.abs(sameCos - 1.0) < 1e-5)
    val opp = (vecs(1f, 0 until 4) ++ vecs(-1f, 100 until 104))
      .toDF("vec_id", "embedding", "label")
    val oppCos = EmbedOps.centroidDrift(
        opp.where(col("vec_id") < 100), opp.where(col("vec_id") >= 100),
        col("embedding"), col("label"))
      .select("cos").as[Double].head()
    assert(math.abs(oppCos + 1.0) < 1e-5)
  }

  test("centroidDrift: counts land per side, one row per shared label") {
    val df = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 1),
      (2L, Array(1f, 1f), 0), (3L, Array(1f, 2f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = EmbedOps.centroidDrift(df.where(col("vec_id") < 2),
        df.where(col("vec_id") >= 2), col("embedding"), col("label"))
      .select("label", "n_a", "n_b").as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // label 1 exists only in snapshot A -> no drift row; label 0: 1 vs 2
    assert(out.keySet == Set(0))
    assert(out(0) == ((1L, 2L)))
  }
}
