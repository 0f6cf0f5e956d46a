package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlOps

/** The r20 optimization round's one-tokenize-pass NB paths must be
  * VALUE-IDENTICAL to the generic train/score composition they replace:
  *
  *  - [[MlOps.nbSelfClassify]] == nbClassify(d, …, d, …) — the corpus-
  *    labeling audit, 3 tokenize passes collapsed to 1;
  *  - [[MlOps.nbCrossValScore]] == per-fold nbClassify(train = fold ≠ f,
  *    test = fold = f) — each fold's model derived from the global
  *    token-class counts by exclusion.
  *
  * Scores are asserted EXACTLY (both sides round to 6 dp on the same
  * IEEE expressions), predictions row-for-row. */
class R20NbOnePassSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic corpus: 3 sources with overlapping vocab,
  // uneven fold sizes, one repeated-token doc, one single-token doc
  private def corpus(n: Int) = {
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (0 until n).map { i =>
      val src = s"src${i % 3}"
      val toks = (0 to (i % 5)).map(j => words((i * 7 + j * 3) % words.length))
      (i.toLong, src, toks.mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "pred_label", "score")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

  test("nbSelfClassify == nbClassify(d, .., d, ..) row-for-row") {
    val d = corpus(90)
    val generic = canon(MlOps.nbClassify(d, col("text"), col("source"),
      d, col("text"), col("doc_id")))
    val onePass = canon(MlOps.nbSelfClassify(d, col("text"), col("source"),
      col("doc_id")))
    graft.core.CacheScope.release()
    assert(generic.nonEmpty && onePass == generic)
  }

  test("nbCrossValScore == per-fold nbClassify composition, all folds") {
    val folds = 3
    val d = corpus(90).withColumn("fold",
      pmod(col("doc_id") * 13 + 5, lit(folds)).cast("int"))
    val perFold = (0 until folds).flatMap { f =>
      val train = d.where(col("fold") =!= f)
      val test = d.where(col("fold") === f)
      MlOps.nbClassify(train, col("text"), col("source"),
          test, col("text"), col("doc_id"))
        .select("doc_id", "pred_label", "score")
        .as[(Long, String, Double)].collect()
        .map { case (id, p, sc) => (f, id, p, sc) }
    }.sortBy(_._2)
    val onePass = MlOps.nbCrossValScore(d, col("text"), col("source"),
        col("doc_id"), col("fold"), folds)
      .as[(Int, Long, String, Double)].collect().sortBy(_._2).toSeq
    graft.core.CacheScope.release()
    assert(perFold.nonEmpty && onePass == perFold)
  }

  test("nbCrossValScore drops a class absent from a fold's train split " +
      "exactly like the composition") {
    val folds = 2
    // src9 exists ONLY in fold 0: when fold 0 is the test split, its
    // train model has no src9 — predictions must still agree
    val d = corpus(40).withColumn("fold",
      pmod(col("doc_id"), lit(folds)).cast("int"))
      .withColumn("source",
        when(col("doc_id") === 0 || col("doc_id") === 2, lit("src9"))
          .otherwise(col("source")))
    val perFold = (0 until folds).flatMap { f =>
      MlOps.nbClassify(d.where(col("fold") =!= f), col("text"),
          col("source"), d.where(col("fold") === f), col("text"),
          col("doc_id"))
        .select("doc_id", "pred_label", "score")
        .as[(Long, String, Double)].collect()
        .map { case (id, p, sc) => (f, id, p, sc) }
    }.sortBy(_._2)
    val onePass = MlOps.nbCrossValScore(d, col("text"), col("source"),
        col("doc_id"), col("fold"), folds)
      .as[(Int, Long, String, Double)].collect().sortBy(_._2).toSeq
    graft.core.CacheScope.release()
    assert(perFold.nonEmpty && onePass == perFold)
  }
}
