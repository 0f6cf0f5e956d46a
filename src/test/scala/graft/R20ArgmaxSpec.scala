package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlOps

/** The r20 optimization round replaced the row_number-over-window argmax
  * in nbScore and knnClassify with map-side-combined min_by aggregates.
  * These tests pin the selection semantics the window provided —
  * especially the tie-breaks (score/votes desc, then label asc). */
class R20ArgmaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nbScore argmax ties break to the smallest label") {
    // two classes with IDENTICAL token distributions and priors: every
    // document's two class scores are exactly equal after rounding, so
    // the winner must be the lexicographically smaller label for every doc
    val train = Seq(
      (1L, "aaa", "x x y"), (2L, "aaa", "y z"),
      (3L, "bbb", "x x y"), (4L, "bbb", "y z")
    ).toDF("doc_id", "label", "text")
    val test0 = Seq((10L, "x y"), (11L, "z"), (12L, "x z y")).toDF("doc_id", "text")
    val out = MlOps.nbClassify(train, col("text"), col("label"),
        test0, col("text"), col("doc_id"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    graft.core.CacheScope.release()
    assert(out.length == 3)
    assert(out.forall(_._2 == "aaa"),
      s"equal-score ties must pick the smallest label: ${out.toSeq}")
  }

  test("knnClassify vote ties break to the smallest label") {
    // 4 labeled points, query equidistant-ish with k=4 → two labels get
    // 2 votes each; the smaller label must win
    val labeled = Seq(
      (1L, Seq(1.0, 0.0), "m"), (2L, Seq(0.9, 0.1), "m"),
      (3L, Seq(0.0, 1.0), "k"), (4L, Seq(0.1, 0.9), "k")
    ).toDF("vec_id", "v", "lbl")
    val q = Seq((9L, Seq(0.5, 0.5))).toDF("vec_id", "v")
    val out = MlOps.knnClassify(labeled, col("v"), col("vec_id"),
        col("lbl"), q, col("v"), col("vec_id"), k = 4)
      .as[(Long, String, Long)].collect()
    graft.core.CacheScope.release()
    assert(out.toSeq == Seq((9L, "k", 2L)),
      s"2-2 vote tie must pick the smaller label: ${out.toSeq}")
  }
}
