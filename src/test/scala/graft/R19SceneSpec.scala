package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps

/** Round-19: scene-cut detection + keyframe sampling over per-frame
  * feature grids (the temporal video-pipeline stage). */
class R19SceneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cuts, scene ids, and keyframes over a planted scene structure") {
    // doc 1: frames 0-2 near-identical (dist 2), frame 3 a hard cut,
    // frames 3-4 near-identical; doc 2: every frame its own scene
    def feats(base: Double, nudge: Int): Seq[Double] =
      Seq.tabulate(8)(j => if (j == nudge) base + 1 else base)
    val rows = Seq(
      (1L, 0L, feats(10, 0)), (1L, 1L, feats(10, 1)), (1L, 2L, feats(10, 2)),
      (1L, 3L, feats(200, 0)), (1L, 4L, feats(200, 1)),
      (2L, 0L, feats(10, 0)), (2L, 1L, feats(100, 0)), (2L, 2L, feats(200, 0)))
      .toDF("doc_id", "frame", "features")
    val out = MultimodalOps.sceneCuts(rows, col("doc_id"), col("frame"),
        col("features"), threshold = 16.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getBoolean(3), r.getLong(4)))).toMap
    // doc 1: within-scene distances are exactly 2 (two nudged cells)
    assert(out((1L, 0L)) == ((-1.0, true, 0L)))
    assert(out((1L, 1L)) == ((2.0, false, 0L)))
    assert(out((1L, 2L)) == ((2.0, false, 0L)))
    assert(out((1L, 3L))._2 && out((1L, 3L))._3 == 1L) // the hard cut
    assert(out((1L, 4L)) == ((2.0, false, 1L)))
    // doc 2: every consecutive distance is 8*90 or 8*100 > 16
    assert(out((2L, 0L))._3 == 0L && out((2L, 1L))._3 == 1L &&
      out((2L, 2L))._3 == 2L)
    // keyframes = scene starts: one per scene
    val kf = MultimodalOps.sceneCuts(rows, col("doc_id"), col("frame"),
        col("features"), threshold = 16.0)
      .where(col("is_cut")).select("doc_id", "frame")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kf == Set((1L, 0L), (1L, 3L), (2L, 0L), (2L, 1L), (2L, 2L)))
  }

  test("the scene window partitions on the doc key (scale gate)") {
    val rows = Seq((1L, 0L, Seq(1.0)), (2L, 0L, Seq(2.0)))
      .toDF("doc_id", "frame", "features")
    val plan = MultimodalOps.sceneCuts(rows, col("doc_id"), col("frame"),
      col("features"), 1.0).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"scene window must partition on doc_id:\n$plan")
  }
}
