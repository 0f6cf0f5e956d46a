package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps

/** Round-21 shared-layout equivalence: every operator that accepts a
  * precomputed candidates / position-aggregate frame must return EXACTLY
  * the rows of its compute-inline default when fed the table the layout
  * derivation produces (Tables.minhashCands / Tables.winnowPosAgg land
  * precisely these frames; parquet round-trips longs and long arrays
  * bit-exactly, so in-memory equality proves the landed path too). */
class R21LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "a"),
    (1L, "the quick brown fox jumps over the lazy dog again and again", "a"),
    (2L, "completely different text body with no overlap whatsoever!!", "b"),
    (3L, "the quick brown fox jumps over the lazy dog AGAIN and AGAIN", "b"),
    (4L, "another unrelated document body to pad the tiny fixture set", "c"))
    .toDF("doc_id", "text", "source")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.sorted.map(col): _*).collect()
      .map(_.toString).sorted.toSeq

  test("fuzzyDedup(candidates = precomputed) == fuzzyDedup()") {
    val d = corpus
    val cand = DedupOps.minhashCandidates(d, col("text"), col("doc_id"),
      k = 3, numHashes = 16, bands = 4)
    val a = DedupOps.fuzzyDedup(d, col("text"), col("doc_id"))
    val b = DedupOps.fuzzyDedup(d, col("text"), col("doc_id"),
      candidates = Some(cand))
    assert(sortedRows(a) == sortedRows(b))
  }

  test("minhashEvalReport(candidates = precomputed) == inline") {
    val d = corpus
    val cand = DedupOps.minhashCandidates(d, col("text"), col("doc_id"),
      k = 3, numHashes = 16, bands = 4)
    val a = DedupOps.minhashEvalReport(d, col("text"), col("doc_id"))
    val b = DedupOps.minhashEvalReport(d, col("text"), col("doc_id"),
      candidates = Some(cand))
    assert(sortedRows(a) == sortedRows(b))
  }

  test("span tier with posAggTable == compute-inline (all three operators)") {
    val d = corpus
    val agg = DedupOps.winnowPosAgg(d, col("text"), col("doc_id"),
      k = 25, w = 4)
    val spansA = DedupOps.sharedSpans(d, col("text"), col("doc_id"),
      k = 25, w = 4, maxDocFreq = 100)
    val spansB = DedupOps.sharedSpans(d, col("text"), col("doc_id"),
      k = 25, w = 4, maxDocFreq = 100, posAggTable = Some(agg))
    assert(sortedRows(spansA) == sortedRows(spansB))
    val pairsA = DedupOps.winnowPairs(d, col("text"), col("doc_id"),
      k = 25, w = 4, maxDocFreq = 100, minSharedFps = 1)
    val pairsB = DedupOps.winnowPairs(d, col("text"), col("doc_id"),
      k = 25, w = 4, maxDocFreq = 100, minSharedFps = 1,
      posAggTable = Some(agg))
    assert(sortedRows(pairsA) == sortedRows(pairsB))
    val cutA = DedupOps.spanDedupedText(d, col("text"), col("doc_id"),
      k = 25, w = 4, maxDocFreq = 100)
    val cutB = DedupOps.spanDedupedText(d, col("text"), col("doc_id"),
      k = 25, w = 4, maxDocFreq = 100, posAggTable = Some(agg))
    assert(sortedRows(cutA) == sortedRows(cutB))
    assert(spansA.count() > 0) // the fixture must actually exercise spans
  }

  test("confirmJaccard/fuzzyDedup with pairStats == compute-inline") {
    val d = corpus
    val cand = DedupOps.minhashCandidates(d, col("text"), col("doc_id"),
      k = 3, numHashes = 16, bands = 4)
    val stats = DedupOps.ngramPairStatsOf(d, col("text"), col("doc_id"),
      k = 3, maxDocFreq = 100)
    val ca = DedupOps.confirmJaccard(d, col("text"), col("doc_id"), cand,
      k = 3, maxDocFreq = 100, minJaccard = 0.2)
    val cb = DedupOps.confirmJaccard(d, col("text"), col("doc_id"), cand,
      k = 3, maxDocFreq = 100, minJaccard = 0.2, pairStats = Some(stats))
    assert(sortedRows(ca) == sortedRows(cb))
    assert(ca.count() > 0)
    val fa = DedupOps.fuzzyDedup(d, col("text"), col("doc_id"))
    val fb = DedupOps.fuzzyDedup(d, col("text"), col("doc_id"),
      candidates = Some(cand), pairStats = Some(stats))
    assert(sortedRows(fa) == sortedRows(fb))
  }

  test("jaccard/containment with pairStats == compute-inline") {
    val d = corpus
    val stats = DedupOps.ngramPairStatsOf(d, col("text"), col("doc_id"),
      k = 3, maxDocFreq = 100)
    val ja = DedupOps.ngramJaccardPairs(d, col("text"), col("doc_id"),
      k = 3, maxDocFreq = 100, minJaccard = 0.2)
    val jb = DedupOps.ngramJaccardPairs(d, col("text"), col("doc_id"),
      k = 3, maxDocFreq = 100, minJaccard = 0.2, pairStats = Some(stats))
    assert(sortedRows(ja) == sortedRows(jb))
    assert(ja.count() > 0)
    val ca = DedupOps.containmentPairs(d, col("text"), col("doc_id"),
      k = 3, maxDocFreq = 100, minContainment = 0.5)
    val cb = DedupOps.containmentPairs(d, col("text"), col("doc_id"),
      k = 3, maxDocFreq = 100, minContainment = 0.5,
      pairStats = Some(stats))
    assert(sortedRows(ca) == sortedRows(cb))
  }

  test("banded embedding pairs at 0.2 post-filtered to 0.4 == pairs at 0.4") {
    val vecs = (0L until 40L).map { i =>
      (i, (0 until 8).map(j =>
        math.sin((i % 7 + 1) * 0.7 + j * 0.31) +
          (if (i % 2 == 0) 0.001 * i else 0.0)).toArray)
    }.toDF("vec_id", "embedding")
    val lo = DedupOps.embeddingPairsBanded(vecs, col("embedding"),
      col("vec_id"), minCosine = 0.2, dims = 8)
    val hi = DedupOps.embeddingPairsBanded(vecs, col("embedding"),
      col("vec_id"), minCosine = 0.4, dims = 8)
    assert(sortedRows(lo.where(col("cos") >= 0.4)) == sortedRows(hi))
    assert(hi.count() > 0)
  }

  test("contaminationSpans(corpusPosAgg = precomputed) == inline") {
    val d = corpus
    val probe = d.where(col("doc_id") < 1)
    val agg = DedupOps.winnowPosAgg(d, col("text"), col("doc_id"),
      k = 25, w = 4)
    val a = DedupOps.contaminationSpans(d, col("text"), col("doc_id"),
      probe, col("text"), col("doc_id"), k = 25, w = 4)
    val b = DedupOps.contaminationSpans(d, col("text"), col("doc_id"),
      probe, col("text"), col("doc_id"), k = 25, w = 4,
      corpusPosAgg = Some(agg))
    assert(sortedRows(a) == sortedRows(b))
  }
}
