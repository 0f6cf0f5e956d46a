package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Round-15: incremental lake consumption — `lakeTail` (at-least-once
  * catch-up with a durable cursor) and `lakeMirror` (exactly-once
  * lake→lake replication whose cursor IS the destination's manifest txn
  * history). */
class R15LakeTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("lakeTail hands each catch-up exactly the appended delta and " +
      "persists its cursor; a crash before the cursor advance replays " +
      "(at-least-once)") {
    val src = tmp("r15tailsrc") + "/tbl"
    val ckp = tmp("r15tailckp")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, Set[Long])]
    def consume(): Int = LayoutOps.lakeTail(spark, src, ckp) { (d, v) =>
      seen += ((v, d.select("id").as[Long].collect().toSet))
    }
    LayoutOps.commitAppend(Seq(1L, 2L).toDF("id"), src)
    assert(consume() == 1)
    LayoutOps.commitAppend(Seq(3L).toDF("id"), src)
    LayoutOps.commitAppend(Seq(4L).toDF("id"), src)
    assert(consume() == 2, "two pending versions consumed in one call")
    assert(consume() == 0, "caught up: nothing replayed")
    assert(seen.toList == List((0, Set(1L, 2L)), (2, Set(3L, 4L))))
    // crash simulation: f throws AFTER observing the delta — the cursor
    // must not advance, so the next call replays the same delta
    LayoutOps.commitAppend(Seq(5L).toDF("id"), src)
    intercept[RuntimeException] {
      LayoutOps.lakeTail(spark, src, ckp)((_, _) =>
        throw new RuntimeException("consumer crash"))
    }
    assert(consume() == 1)
    assert(seen.last == ((3, Set(5L))), "the crashed delta is replayed")
  }

  test("lakeMirror replicates incrementally and is idempotent under " +
      "replay: destination rows equal the source snapshot, duplicate " +
      "calls are no-ops") {
    val src = tmp("r15mirsrc") + "/tbl"
    val dst = tmp("r15mirdst") + "/tbl"
    LayoutOps.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src,
      statsCols = Seq("id"))
    assert(LayoutOps.lakeMirror(spark, src, dst,
      statsCols = Seq("id")).contains(0))
    assert(LayoutOps.lakeMirror(spark, src, dst).isEmpty, "caught up")
    LayoutOps.commitAppend(Seq((3L, "c")).toDF("id", "s"), src,
      statsCols = Seq("id"))
    LayoutOps.commitAppend(Seq((4L, "d")).toDF("id", "s"), src,
      statsCols = Seq("id"))
    assert(LayoutOps.lakeMirror(spark, src, dst,
      statsCols = Seq("id")).contains(2))
    assert(LayoutOps.lakeMirror(spark, src, dst).isEmpty)
    val d = LayoutOps.latestVersion(spark, dst)
    assert(d == 1, "two catch-ups = two destination commits")
    val got = LayoutOps.readVersion(spark, dst, d)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L))
    // the mirror's stats flow through: a ranged read of the MIRROR
    // prunes from its own manifest
    val (kept, skipped) = LayoutOps.rangeDirs(spark, dst, d, "id", 3L, 4L)
    assert(kept.size == 1 && skipped.size == 1,
      "mirrored commits carry their own manifest stats")
  }

  test("a compaction in the source makes the mirror refuse rather than " +
      "double-apply history") {
    val src = tmp("r15mircsrc") + "/tbl"
    val dst = tmp("r15mircdst") + "/tbl"
    LayoutOps.commitAppend(Seq(1L, 2L).toDF("id"), src)
    assert(LayoutOps.lakeMirror(spark, src, dst).contains(0))
    LayoutOps.commitAppend(Seq(3L).toDF("id"), src)
    assert(LayoutOps.compactSnapshot(spark, src).contains(2))
    val e = intercept[IllegalArgumentException] {
      LayoutOps.lakeMirror(spark, src, dst)
    }
    assert(e.getMessage.contains("compaction/overwrite"))
  }
}
