package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{SimilarityOps, TextOps}

/** Boundary-respecting sequence packing (shelf + FFD) and hard-negative
  * mining edge cases; the bulk correctness check is the DuckDB oracle
  * replay of text_pack_shelf / text_pack_ffd / sim_hard_negatives. */
class R16PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sizes(vs: Long*) =
    vs.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_tokens")

  test("packBinsShelf: every bin fill <= capacity, every doc placed once") {
    val df = sizes(10L, 99L, 33L, 64L, 1L, 128L, 42L, 42L, 42L, 7L, 9L)
    val out = TextOps.packBinsShelf(df, col("n_tokens"), col("doc_id"), 128L)
    assert(out.count() === 11)
    assert(out.select(countDistinct("doc_id")).as[Long].head === 11L)
    val fills = out.groupBy("size_class", "bin_in_class")
      .agg(sum("n_tokens").as("fill")).select("fill").as[Long].collect()
    assert(fills.forall(_ <= 128L))
    // class q holds exactly q slots per bin
    val slots = out.select("size_class", "slot").as[(Long, Long)].collect()
    assert(slots.forall { case (q, s) => s >= 0 && s < q })
  }

  test("packBinsShelf: class = cap//n and id-ordered ranks within class") {
    // cap=12: sizes 6,6,6 -> class 2, two per bin: ids (0,1) bin0, (2) bin1
    val out = TextOps.packBinsShelf(sizes(6L, 6L, 6L), col("n_tokens"),
      col("doc_id"), 12L)
      .orderBy("doc_id")
      .select("size_class", "bin_in_class", "slot")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 0L, 0L), (2L, 0L, 1L), (2L, 1L, 0L)))
  }

  test("packBinsShelf: oversize and NULL fail loudly") {
    intercept[Exception] {
      TextOps.packBinsShelf(sizes(5L, 129L), col("n_tokens"),
        col("doc_id"), 128L).collect()
    }
    intercept[Exception] {
      TextOps.packBinsShelf(
        Seq((0L, Some(5L)), (1L, None)).toDF("doc_id", "n_tokens"),
        col("n_tokens"), col("doc_id"), 128L).collect()
    }
  }

  test("packBinsFfd: known-answer classic FFD trace in one group") {
    // cap=10, sizes desc 6,5,4,3,2: 6->b0, 5->b1, 4->b0(=10), 3->b1(=8),
    // 2->b1(=10)
    val out = TextOps.packBinsFfd(sizes(6L, 5L, 4L, 3L, 2L),
        col("n_tokens"), col("doc_id"), 10L, numGroups = 1)
      .select("n_tokens", "bin_in_group").as[(Long, Long)]
      .collect().toMap
    assert(out === Map(6L -> 0L, 4L -> 0L, 5L -> 1L, 3L -> 1L, 2L -> 1L))
  }

  test("packBinsFfd: invariants — fill <= cap, <=1 half-empty bin/group") {
    val df = (0L until 200L).map(i => (i, 1L + (i * 37) % 90))
      .toDF("doc_id", "n_tokens")
    val out = TextOps.packBinsFfd(df, col("n_tokens"), col("doc_id"),
      128L, numGroups = 4)
    assert(out.select(countDistinct("doc_id")).as[Long].head === 200L)
    val fills = out.groupBy("grp", "bin_in_group")
      .agg(sum("n_tokens").as("fill"))
    assert(fills.where(col("fill") > 128L).count() === 0)
    val half = fills.groupBy("grp")
      .agg(sum(when(col("fill") <= 64L, 1L).otherwise(0L)).as("nh"))
      .select("nh").as[Long].collect()
    assert(half.forall(_ <= 1L))
    // determinism across runs
    val again = TextOps.packBinsFfd(df, col("n_tokens"), col("doc_id"),
      128L, numGroups = 4)
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
  }

  test("packBinsFfd: oversize fails loudly") {
    intercept[Exception] {
      TextOps.packBinsFfd(sizes(5L, 11L), col("n_tokens"), col("doc_id"),
        10L, numGroups = 1).collect()
    }
  }

  test("hardNegatives: same-label filtered BEFORE the rank window") {
    // query 0 (label 0); vec 1 same label with cos 1.0 must NOT crowd out
    // the lower-cos different-label vecs
    val e = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(1f, 0f), 0),   // positive, cos 1.0
      (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.5f, 0.5f), 1),
      (4L, Seq(0f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.hardNegatives(e, col("embedding"),
        col("vec_id"), col("label"), e.where(col("vec_id") === 0),
        col("embedding"), col("vec_id"), col("label"), k = 2)
      .orderBy("rank")
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSeq
    assert(out === Seq((2L, 0L), (3L, 1L))) // vec 1 excluded, ranks dense
  }

  test("packBinsShelfBy: bins never mix groups, fills <= capacity") {
    val df = Seq(("en", 0L, 60L), ("en", 1L, 60L), ("en", 2L, 60L),
      ("de", 3L, 60L), ("de", 4L, 60L), ("en", 5L, 10L))
      .toDF("g", "doc_id", "n")
    val out = TextOps.packBinsShelfBy(df, col("g"), col("n"),
      col("doc_id"), 128L)
    assert(out.count() === 6)
    val fills = out.groupBy("grp", "size_class", "bin_in_class")
      .agg(sum("n_tokens").as("fill"), countDistinct("grp").as("ng"))
    assert(fills.where(col("fill") > 128L).count() === 0)
    // en docs of class 2 (60 tokens): ids 0,1 share bin 0; id 2 in bin 1.
    // de restarts its own rank: ids 3,4 share de's bin 0.
    val en = out.where(col("grp") === "en" && col("size_class") === 2)
      .orderBy("doc_id").select("bin_in_class").as[Long].collect().toSeq
    val de = out.where(col("grp") === "de")
      .orderBy("doc_id").select("bin_in_class").as[Long].collect().toSeq
    assert(en === Seq(0L, 0L, 1L) && de === Seq(0L, 0L))
  }

  test("gramTable partials over disjoint slices sum to the direct table") {
    import graft.ops.EmbedOps
    val rows = (0L until 40L).map(i =>
      (i, Seq((i % 5).toFloat * 0.25f, (i % 3).toFloat * 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    val direct = EmbedOps.gramTable(df, col("embedding"), 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = (0 until 2).map(p =>
        EmbedOps.gramTable(df.where(pmod(col("vec_id"), lit(2)) === p),
          col("embedding"), 2))
      .reduce(_ unionByName _)
      .groupBy("i", "j").agg(sum("q").as("q"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged === direct)
  }

  test("packBinsFfdBy: group isolation + per-group FFD trace") {
    // two langs, one sub-group: each lang runs its own classic FFD
    val df = Seq(("en", 0L, 6L), ("en", 1L, 5L), ("en", 2L, 4L),
      ("de", 3L, 6L), ("de", 4L, 5L))
      .toDF("g", "doc_id", "n")
    val out = TextOps.packBinsFfdBy(df, col("g"), col("n"), col("doc_id"),
        10L, subGroups = 1)
      .select("grp", "doc_id", "bin_in_group")
      .as[(String, Long, Long)].collect().toSet
    // en: 6->b0, 5->b1, 4->b0(=10); de: 6->b0, 5->b1
    assert(out === Set(("en", 0L, 0L), ("en", 1L, 1L), ("en", 2L, 0L),
      ("de", 3L, 0L), ("de", 4L, 1L)))
  }

  test("hardNegativesIvf: equals brute hardNegatives when probes cover") {
    val e = (0L until 30L).map { i =>
      (i, Seq((math.cos(i * 0.7) * 2).toFloat, (math.sin(i * 0.7) * 2).toFloat,
        (i % 5).toFloat), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val cents = e.where(col("vec_id") < 4)
    // nprobe = all cells -> the IVF path degenerates to exact
    val ivf = SimilarityOps.hardNegativesIvf(e, col("embedding"),
        col("vec_id"), col("label"), e, col("embedding"), col("vec_id"),
        col("label"), cents, col("embedding"), col("vec_id"),
        k = 3, nprobe = 4)
      .select("query_id", "neighbor_id", "rank")
    val brute = SimilarityOps.hardNegatives(e, col("embedding"),
        col("vec_id"), col("label"), e, col("embedding"), col("vec_id"),
        col("label"), k = 3)
      .select("query_id", "neighbor_id", "rank")
    assert(ivf.except(brute).count() === 0 &&
      brute.except(ivf).count() === 0)
  }

  test("negativeMargin: easiest positive minus hardest negative") {
    val negs = Seq((0L, 2L, 0.9, 0)).toDF(
      "query_id", "neighbor_id", "cos", "rank")
    val pos = Seq((0L, 0.95), (0L, 0.99)).toDF("query_id", "cos")
    val m = SimilarityOps.negativeMargin(negs, pos, col("query_id"),
      col("cos")).collect()
    assert(m.length === 1)
    assert(math.abs(m(0).getDouble(3) - 0.05) < 1e-9)
  }
}
