package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlOps

/** Invariants for the round-12ao surface: exact AUC. */
class R12aoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactAuc matches hand-computed average-rank AUC with ties") {
    // scores 1,1,2,3 / labels 0,1,0,1: avg ranks (1.5,1.5,3,4),
    // ΣR+ = 1.5 + 4 = 5.5 → AUC = (5.5 − 3)/(2·2) = 0.625
    val df = Seq((1L, false), (1L, true), (2L, false), (3L, true))
      .toDF("s", "y")
    val r = MlOps.exactAuc(df, col("s"), col("y"))
      .as[(Long, Long, Double)].head()
    assert(r == ((2L, 2L, 0.625)))
  }

  test("exactAuc: perfect separation → 1.0; reversed → 0.0; random-ish → ~0.5") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    assert(MlOps.exactAuc(perfect, col("s"), col("y"))
      .as[(Long, Long, Double)].head()._3 == 1.0)
    val reversed = Seq((4L, false), (3L, false), (2L, true), (1L, true))
      .toDF("s", "y")
    assert(MlOps.exactAuc(reversed, col("s"), col("y"))
      .as[(Long, Long, Double)].head()._3 == 0.0)
    // constant score: everything ties → AUC exactly 0.5
    val const = Seq((7L, true), (7L, false), (7L, true), (7L, false))
      .toDF("s", "y")
    assert(MlOps.exactAuc(const, col("s"), col("y"))
      .as[(Long, Long, Double)].head()._3 == 0.5)
  }

  test("prCurve thresholds carry exact cumulative TP/FP from the top") {
    // scores: 3→(T), 2→(T,F), 1→(F,F)
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false),
      (1L, false)).toDF("s", "y")
    val rows = MlOps.prCurve(df, col("s"), col("y"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .sortBy(-_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((3L, 1L, 0L), (2L, 2L, 1L), (1L, 2L, 3L)))
    assert(rows(0)._4 == 1.0 && rows(0)._5 == 0.5)       // p=1/1, r=1/2
    assert(rows(1)._4 == 0.666667)                       // round(2/3, 6)
    assert(rows(2)._5 == 1.0)                            // full recall
  }
}
