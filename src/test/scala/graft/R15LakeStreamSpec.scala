package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Round-15: `readStream` FROM the versioned lake (LakeStreamSource) —
  * offsets are lake versions, each micro-batch is the manifest-planned
  * append-delta, checkpoints resume across queries, pacing bounds
  * versions per batch, and only committed data is ever visible. */
class R15LakeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def runAvailableNow(src: String, ckp: String,
      sink: scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]): Unit = {
    val q = spark.readStream
      .format("graft.sources.LakeStreamSource")
      .option("path", src)
      .load()
      .writeStream
      .option("checkpointLocation", ckp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        val ids = b.select("id").collect().map(_.getLong(0)).toSet
        sink.synchronized { sink += ((id, ids)) }
        ()
      }
      .start()
    q.awaitTermination(120000L)
    ()
  }

  test("the lake tails as a stream: AvailableNow drains all committed " +
      "versions, a later run with the same checkpoint delivers only the " +
      "new commits, and a caught-up run delivers nothing") {
    val src = tmp("r15lssrc") + "/tbl"
    val ckp = tmp("r15lsckp")
    LayoutOps.commitAppend(Seq(1L, 2L).toDF("id"), src)
    LayoutOps.commitAppend(Seq(3L).toDF("id"), src)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    runAvailableNow(src, ckp, seen)
    assert(seen.flatMap(_._2).toSet == Set(1L, 2L, 3L),
      s"first drain must deliver both committed versions, got $seen")
    val afterFirst = seen.size
    // two more commits, resume from the SAME checkpoint
    LayoutOps.commitAppend(Seq(4L).toDF("id"), src)
    LayoutOps.commitAppend(Seq(5L, 6L).toDF("id"), src)
    runAvailableNow(src, ckp, seen)
    assert(seen.drop(afterFirst).flatMap(_._2).toSet == Set(4L, 5L, 6L),
      "resume delivers exactly the appended versions — no replay")
    val afterSecond = seen.size
    runAvailableNow(src, ckp, seen)
    assert(seen.drop(afterSecond).flatMap(_._2).isEmpty,
      "caught up: nothing is re-delivered")
  }

  test("maxVersionsPerMicroBatch paces the tail one lake version per " +
      "micro-batch") {
    val src = tmp("r15lspace") + "/tbl"
    val ckp = tmp("r15lspaceckp")
    (1 to 3).foreach(i =>
      LayoutOps.commitAppend(Seq(i.toLong * 10).toDF("id"), src))
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream
      .format("graft.sources.LakeStreamSource")
      .option("path", src)
      .option("maxVersionsPerMicroBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val ids = b.select("id").collect().map(_.getLong(0)).toSet
        batches.synchronized { batches += ids }
        ()
      }
      .start()
    q.awaitTermination(120000L)
    assert(batches.toList == List(Set(10L), Set(20L), Set(30L)),
      s"one version per micro-batch, in commit order; got $batches")
  }

  test("a non-positive maxVersionsPerMicroBatch is refused loudly " +
      "instead of silently pinning the offset") {
    val src = tmp("r15lsbad") + "/tbl"
    LayoutOps.commitAppend(Seq(1L).toDF("id"), src)
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.LakeStreamSource")
        .option("path", src)
        .option("maxVersionsPerMicroBatch", "0")
        .load()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxVersionsPerMicroBatch")),
      s"got $e")
  }

  test("an uncommitted orphan directory is invisible to the stream; a " +
      "compaction inside the tailed interval is refused") {
    val src = tmp("r15lsorph") + "/tbl"
    val ckp = tmp("r15lsorphckp")
    LayoutOps.commitAppend(Seq(1L).toDF("id"), src)
    // a crashed writer's data dir: present on disk, in no manifest
    Seq(999L).toDF("id").write.parquet(s"$src/files/v9-orphan")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    runAvailableNow(src, ckp, seen)
    assert(seen.flatMap(_._2).toSet == Set(1L),
      "manifests are the name authority: the orphan never streams")
    // compaction rewrites history: the next planned interval must refuse
    LayoutOps.commitAppend(Seq(2L).toDF("id"), src)
    assert(LayoutOps.compactSnapshot(spark, src).contains(2))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream
        .format("graft.sources.LakeStreamSource")
        .option("path", src).load()
        .writeStream.option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) => () }
        .start()
      q.awaitTermination(120000L)
      ()
    }
    assert(e.getMessage.contains("compaction") ||
      Option(e.getCause).exists(_.getMessage.contains("compaction")),
      s"tail over a compacted interval must fail loudly, got $e")
  }
}
