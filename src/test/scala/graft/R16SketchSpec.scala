package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{SimilarityOps, SketchOps, TextOps}

/** Edge-case checks for the sketch + hybrid-retrieval tier (the bulk
  * correctness check is the DuckDB oracle replay of sketch_* /
  * text_overlap_topk / sim_rrf_fuse): empty inputs, v = 0 and
  * Long.MaxValue buckets, NULL/negative fail-loud, CMS unseen items,
  * RRF candidates absent from one list. */
class R16SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def longs(vs: Long*) = vs.toDF("v")

  test("hdrHistogram: v=0 and small values are exact singleton buckets") {
    // below 2^subBits the shift is 0, so every value is its own bucket
    val rows = SketchOps.hdrHistogram(longs(0L, 0L, 1L, 15L), col("v"), 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set((0L, 0L, 2L), (1L, 1L, 1L), (15L, 15L, 1L)))
  }

  test("hdrHistogram: Long.MaxValue lands in the top bucket, no overflow") {
    val r = SketchOps.hdrHistogram(longs(Long.MaxValue), col("v"), 4)
      .collect()
    assert(r.length === 1)
    val (lb, ub) = (r(0).getLong(1), r(0).getLong(2))
    assert(lb === (31L << 58) && ub === Long.MaxValue)
    assert(lb <= Long.MaxValue && Long.MaxValue <= ub)
  }

  test("hdrHistogram: negative and NULL inputs fail loudly") {
    intercept[Exception] {
      SketchOps.hdrHistogram(longs(5L, -1L), col("v"), 4).collect() }
    intercept[Exception] {
      SketchOps.hdrHistogram(
        Seq(Some(5L), None).toDF("v"), col("v"), 4).collect() }
  }

  test("hdrQuantiles: rank value provably inside [est_lb, est_ub]") {
    val vs = (1L to 1000L).map(i => i * i)  // skewed, spans many shifts
    val qs = Seq((1, 2), (9, 10), (99, 100), (1, 1))
    val out = SketchOps.hdrQuantiles(vs.toDF("v"), col("v"), 4, qs)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.length === qs.size)
    val sorted = vs.sorted
    out.foreach { case (rank, lb, ub) =>
      val exact = sorted((rank - 1).toInt)  // rank is 1-based ceil(q·n)
      assert(lb <= exact && exact <= ub,
        s"rank $rank exact $exact outside [$lb, $ub]")
      // subBits=4 ⇒ relative error of the bucket bound ≤ 2^-4
      assert(ub - lb <= math.max(0L, lb >> 4), s"bucket [$lb,$ub] too wide")
    }
  }

  test("hdrQuantiles: exact (lb == ub) below 2^subBits; empty input empty") {
    val out = SketchOps.hdrQuantiles(longs(3L, 7L, 11L), col("v"), 4,
      Seq((1, 1))).collect()
    assert(out.length === 1 &&
      out(0).getLong(3) === 11L && out(0).getLong(4) === 11L)
    assert(SketchOps.hdrQuantiles(longs().limit(0), col("v"), 4,
      Seq((1, 2))).collect().isEmpty)
  }

  test("cmsSketch: grid mass = depth·n; empty stream -> empty grid") {
    val items = Seq("a", "b", "a", "c").toDF("it")
    val g = SketchOps.cmsSketch(items, col("it"), depth = 4, width = 16)
    assert(g.agg(sum("n")).collect()(0).getLong(0) === 16L)
    assert(g.where(col("slot") < 0 || col("slot") >= 16).count() === 0)
    assert(SketchOps.cmsSketch(items.limit(0), col("it"), 4, 16)
      .collect().isEmpty)
  }

  test("cmsEstimate: est >= exact for every seen item; unseen item -> 0") {
    val stream = (1 to 200).map(i => s"w${i % 7}").toDF("it")
    val sketch = SketchOps.cmsSketch(stream, col("it"), depth = 4,
      width = 8)  // narrow grid forces collisions: est > exact somewhere
    val probes = ((0 until 7).map(i => s"w$i") :+ "never_seen").toDF("it")
    val est = SketchOps.cmsEstimate(sketch, probes, col("it"), 4, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = stream.groupBy("it").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size === 8)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"est($k) < exact") }
    assert(est("never_seen") === 0L)
    // against an EMPTY sketch every probe must read 0, not vanish
    val empty = SketchOps.cmsSketch(stream.limit(0), col("it"), 4, 8)
    val z = SketchOps.cmsEstimate(empty, probes, col("it"), 4, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(z.size === 8 && z.values.forall(_ === 0L))
  }

  test("rrfFuse: both-list sum, single-list contribution, id tie-break") {
    val a = Seq((1L, 10L, 0L), (1L, 11L, 1L)).toDF(
      "query_id", "neighbor_id", "rank")
    val b = Seq((1L, 10L, 1L), (1L, 12L, 0L)).toDF(
      "query_id", "neighbor_id", "rank")
    val out = SimilarityOps.rrfFuse(a, b, k = 10, c = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    def rr(r: Long) = 1.0 / (60 + r + 1)
    // 10 in both: 1/61 + 1/62; 11 only in a: 1/62; 12 only in b: 1/61
    assert(out.map(_._1).toSeq === Seq(10L, 12L, 11L))
    assert(math.abs(out(0)._2 - (rr(0) + rr(1))) < 1e-6)
    assert(math.abs(out(1)._2 - rr(0)) < 1e-6)
    assert(math.abs(out(2)._2 - rr(1)) < 1e-6)
    // equal single-list scores tie-break by neighbor_id ascending
    val t = SimilarityOps.rrfFuse(
      Seq((1L, 21L, 0L), (1L, 20L, 0L)).toDF(
        "query_id", "neighbor_id", "rank").where(col("neighbor_id") === 21),
      Seq((1L, 20L, 0L)).toDF("query_id", "neighbor_id", "rank"),
      k = 10).collect().sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(t === Seq(20L, 21L))
    // k cuts the fused list, not the inputs
    assert(SimilarityOps.rrfFuse(a, b, k = 1).count() === 1)
  }

  test("hdrQuantilesBy: per-group ranks independent, exact small values") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 1000L))
      .toDF("g", "v")
    val out = SketchOps.hdrQuantilesBy(df, col("g"), col("v"), 4,
      Seq((1, 2), (1, 1)))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(4),
        r.getLong(5))).toSet
    // group a: small values exact (lb == ub); p50 of {1,2,3} = 2, p100 = 3
    // group b: p50 of {10,1000} = 10 exact; p100 = 1000 lands in its
    // [992, 1023] bucket at subBits=4
    assert(out == Set(("a", 0.5, 2L, 2L), ("a", 1.0, 3L, 3L),
      ("b", 0.5, 10L, 10L), ("b", 1.0, 992L, 1023L)))
  }

  test("rrfFuseMany: 3-list sum, absent-from-two contribution, k cut") {
    val a = Seq((1L, 10L, 0L), (1L, 11L, 1L)).toDF(
      "query_id", "neighbor_id", "rank")
    val b = Seq((1L, 10L, 0L), (1L, 12L, 1L)).toDF(
      "query_id", "neighbor_id", "rank")
    val c3 = Seq((1L, 10L, 2L), (1L, 13L, 0L)).toDF(
      "query_id", "neighbor_id", "rank")
    val out = SimilarityOps.rrfFuseMany(Seq(a, b, c3), k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    def rr(r: Long) = 1.0 / (60 + r + 1)
    assert(out.size == 4)
    assert(math.abs(out(10L) - (rr(0) + rr(0) + rr(2))) < 1e-6)
    assert(math.abs(out(11L) - rr(1)) < 1e-6) // only in list a
    assert(math.abs(out(13L) - rr(0)) < 1e-6) // only in list c
    // two-list degenerate form must equal rrfFuse
    val two = SimilarityOps.rrfFuseMany(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val ref = SimilarityOps.rrfFuse(a, b, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(two == ref)
    assert(SimilarityOps.rrfFuseMany(Seq(a, b, c3), k = 2).count() == 2)
  }

  test("tokenOverlapTopK: overlap counts, self excluded, k bound") {
    val corpus = Seq((0L, "x y z"), (1L, "x y q"), (2L, "x p q"),
      (3L, "m n o")).toDF("id", "t")
    val out = TextOps.tokenOverlapTopK(corpus, col("id"), col("t"),
      corpus.where(col("id") === 0), col("id"), col("t"), k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // doc1 shares {x,y}=2, doc2 shares {x}=1, doc3 shares 0 (absent),
    // doc0 (self) excluded; k=2 keeps both
    assert(out.toSet === Set((1L, 2L, 0), (2L, 1L, 1)))
  }
}
