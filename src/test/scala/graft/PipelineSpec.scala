package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._
import graft.streaming.StreamingOps

/** Invariants for the round-7 curation operators: hash splits, vocabulary,
  * the quality gate, embedding centroids, first-occurrence dedup. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hash split: total coverage, determinism, and subset stability") {
    val ids = (0L until 5000L).toDF("id")
    val s1 = SplitOps.withSplit(ids, col("id"), 42L, fracs)
      .as[(Long, String)].collect().toMap
    // every row assigned to a declared split
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(s1.size == 5000)
    // same seed => identical assignment
    val s2 = SplitOps.withSplit(ids, col("id"), 42L, fracs)
      .as[(Long, String)].collect().toMap
    assert(s1 == s2)
    // different seed => different assignment (overwhelmingly)
    val s3 = SplitOps.withSplit(ids, col("id"), 43L, fracs)
      .as[(Long, String)].collect().toMap
    assert(s1 != s3)
    // subset stability: filtering rows never moves survivors between splits
    val sub = SplitOps.withSplit(ids.where(col("id") % 7 === 0), col("id"),
      42L, fracs).as[(Long, String)].collect().toMap
    sub.foreach { case (k, v) => assert(s1(k) == v) }
    // fractions hold to within sampling noise (binomial sd ~ 0.006)
    val train = s1.values.count(_ == "train").toDouble / 5000
    assert(math.abs(train - 0.8) < 0.03, s"train frac $train")
  }

  test("hash split: split() filters to exactly the assigned rows") {
    val ids = (0L until 1000L).toDF("id")
    val all = SplitOps.withSplit(ids, col("id"), 7L, fracs)
      .as[(Long, String)].collect()
    val test = SplitOps.split(ids, col("id"), 7L, fracs, "test")
      .as[Long].collect().toSet
    assert(test == all.filter(_._2 == "test").map(_._1).toSet)
  }

  test("vocabTopK: counts and rank order match a local reference") {
    val df = Seq("a b b c", "b c d", "C c a").toDF("text")
    val got = TextOps.vocabTopK(df, col("text"), 3)
      .select("token", "cnt", "rank").as[(String, Long, Long)].collect()
      .sortBy(_._3)
    // counts: b=3, c=4 (lowercased), a=2, d=1 → top3 = c(4), b(3), a(2)
    assert(got.toSeq == Seq(("c", 4L, 0L), ("b", 3L, 1L), ("a", 2L, 2L)))
  }

  test("filterPipeline survivors satisfy every predicate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.filterPipeline(docs, col("text"), col("doc_id"),
      minTokens = 20, maxTokens = 1000, minQuality = 0.5, langs = Seq("en", "de"))
      .as[(Long, String, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, lang, n, q) =>
      assert(n >= 20 && n <= 1000 && q >= 0.5 && Set("en", "de")(lang))
    }
    // and it is a subset of the unfiltered diagnostics
    val total = docs.count()
    assert(out.length < total)
  }

  test("centroids: exact micro-unit mean per label, any partitioning") {
    val rows = Seq(
      (1L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 5.0f)),
      (2L, Array(-1.5f, 0.25f)))
    val df = rows.toDF("label", "embedding")
    val got = EmbedOps.centroids(df.repartition(7), col("embedding"), col("label"))
      .select("label", "dim", "centroid", "n")
      .as[(Long, Long, Double, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got((1L, 0L)) == ((2.0, 2L)))   // (1+3)/2
    assert(got((1L, 1L)) == ((3.5, 2L)))   // (2+5)/2
    assert(got((2L, 0L)) == ((-1.5, 1L)))
    assert(got((2L, 1L)) == ((0.25, 1L)))
    // partitioning-immune: same result single-partition
    val got1 = EmbedOps.centroids(df.coalesce(1), col("embedding"), col("label"))
      .select("label", "dim", "centroid", "n")
      .as[(Long, Long, Double, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got == got1)
  }

  test("l2Normalize produces unit vectors") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.5f, 0.5f)))
      .toDF("id", "v")
    val norms = df.select(
        sqrt(graft.functions.VecKernels.norm2(EmbedOps.l2Normalize(col("v")))))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }

  test("firstEvents keeps the earliest event per (user, type)") {
    val df = Seq(
      (10L, "2024-01-01 00:00:05", 1L, "click", 1.0),
      (11L, "2024-01-01 00:00:01", 1L, "click", 2.0),
      (12L, "2024-01-01 00:00:01", 1L, "view", 3.0),
      (13L, "2024-01-01 00:00:09", 2L, "click", 4.0),
    ).toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val got = StreamingOps.firstEvents(df)
      .select("user_id", "event_type", "first_event_id", "first_value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == Set((1L, "click", 11L, 2.0), (1L, "view", 12L, 3.0),
      (2L, "click", 13L, 4.0)))
  }
}
