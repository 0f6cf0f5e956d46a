package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Round-15: the documented two-lake production topology, end to end —
  * a streaming sink feeds an APPEND-ONLY ingest lake (tail-consumable
  * forever), an exactly-once mirror ships deltas to a SERVING lake, and
  * OPTIMIZE/vacuum run on the serving side only, where rewriting
  * history is safe because nothing tails it. */
class R15LoopSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream -> ingest lake -> mirror -> compacted+vacuumed serving " +
      "lake: rows flow exactly once, serving reads prune, ingest stays " +
      "tail-consumable") {
    val root = java.nio.file.Files.createTempDirectory("r15loop").toString
    val src = s"$root/src"
    val ingest = s"$root/ingest"
    val serving = s"$root/serving"
    val cp = s"$root/cp"
    val schema = StructType(Seq(StructField("day", LongType),
      StructField("v", LongType)))
    def feed(d: Long): Unit = Seq((d, d * 10L), (d, d * 10L + 1L))
      .toDF("day", "v").coalesce(1).write.mode("append").parquet(src)
    def sinkOnce(): Unit = {
      val q = graft.streaming.StreamingOps.lakeSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        ingest, cp, statsCols = Seq("day"))
      q.processAllAvailable(); q.stop()
    }
    // phase 1: three days land as three micro-batch commits, mirrored,
    // then the serving lake is compacted (ingest is NOT)
    (1L to 3L).foreach(feed)
    sinkOnce()
    assert(LayoutOps.lakeMirror(spark, ingest, serving,
      statsCols = Seq("day")).isDefined)
    val c1 = LayoutOps.compactSnapshot(spark, serving, targetFiles = 1,
      statsCols = Seq("day"))
    assert(c1.isDefined)
    // phase 2: two more days; the mirror ships ONLY the delta even
    // though serving was compacted (its cursor lives in txn markers)
    (4L to 5L).foreach(feed)
    sinkOnce()
    assert(LayoutOps.lakeMirror(spark, ingest, serving,
      statsCols = Seq("day")).isDefined)
    assert(LayoutOps.lakeMirror(spark, ingest, serving).isEmpty,
      "replay is a no-op")
    // serving == ingest, exactly once
    val sv = LayoutOps.latestVersion(spark, serving)
    val got = LayoutOps.readVersion(spark, serving, sv)
      .select("v").as[Long].collect().sorted.toSeq
    val want = LayoutOps.readVersion(spark, ingest,
      LayoutOps.latestVersion(spark, ingest))
      .select("v").as[Long].collect().sorted.toSeq
    assert(got == want && got.size == 10)
    // serving reads prune from its manifest stats (planner-driven)
    val (df, idx) = LayoutOps.indexedRead(spark, serving, sv)
    assert(df.where(col("day") === 5L).count() == 2)
    assert(idx.lastPruning._2 >= 1,
      s"the day-5 read must skip the compacted pre-day-4 directory, " +
        s"census ${idx.lastPruning}")
    // vacuum the serving lake: mirror markers are folded forward, so a
    // replayed mirror STILL no-ops and snapshots read identically
    LayoutOps.vacuum(spark, serving, keepFrom = sv)
    assert(LayoutOps.lakeMirror(spark, ingest, serving).isEmpty,
      "idempotency history survives vacuum (txn fold)")
    val sv2 = LayoutOps.latestVersion(spark, serving)
    assert(LayoutOps.readVersion(spark, serving, sv2).count() == 10)
    // the ingest lake never compacted: still fully tail-consumable
    val tail = scala.collection.mutable.ArrayBuffer.empty[Long]
    LayoutOps.lakeTail(spark, ingest, s"$root/tailck") { (d, _) =>
      tail ++= d.select("v").as[Long].collect()
    }
    assert(tail.sorted.toSeq == want, "a fresh consumer replays the " +
      "ingest lake from the beginning — append-only forever")
  }
}
