package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Round-15: versioned-lake commits retry on conflict — two racing
  * committers BOTH land (distinct versions, union snapshot) instead of
  * the loser throwing. */
class R15LakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two racing append committers both land; the final snapshot is " +
      "the union and every intermediate version stays readable") {
    val path = java.nio.file.Files.createTempDirectory("r15lake").toString +
      "/tbl"
    // seed version 0 so both racers carry a predecessor forward
    LayoutOps.commitAppend(Seq((0L, "seed")).toDF("id", "payload"), path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 3).foreach { round =>
        val base = round * 10L
        val fa = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = LayoutOps.commitAppend(
            Seq((base + 1L, s"a$round")).toDF("id", "payload"), path)
        })
        val fb = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = LayoutOps.commitAppend(
            Seq((base + 2L, s"b$round")).toDF("id", "payload"), path)
        })
        val (va, vb) = (fa.get(), fb.get())
        assert(va != vb, s"round $round: racers must land distinct versions")
        assert(Set(va, vb) == Set(2 * round - 1, 2 * round),
          s"round $round: got versions $va/$vb")
      }
      val latest = LayoutOps.latestVersion(spark, path)
      assert(latest == 6)
      // vacuum's disk-based sweep collects a crash leftover: a data dir
      // written but never manifested (the writer died before its CAS)
      val orphan = s"$path/files/v99-deadbeef"
      Seq((999L, "junk")).toDF("id", "payload")
        .write.parquet(orphan)
      val swept = LayoutOps.vacuum(spark, path, keepFrom = 0)
      assert(swept == 1, "only the orphan is unreferenced — all kept")
      assert(!new java.io.File(orphan).exists,
        "the never-manifested leftover is gone")
      val snap = LayoutOps.readVersion(spark, path, latest)
        .select("id").as[Long].collect().toSet
      assert(snap == Set(0L, 11L, 12L, 21L, 22L, 31L, 32L),
        "the final snapshot is the union of every committed append")
      // every intermediate version is a consistent prefix: v rows = v+1
      (0 to latest).foreach { v =>
        assert(LayoutOps.readVersion(spark, path, v).count() == v + 1L,
          s"version $v must carry exactly its committed appends")
      }
    } finally pool.shutdown()
  }

  test("eight-way commit hammer: the manifest CAS is atomic on the " +
      "local filesystem (link(2) publish), every committer lands a " +
      "distinct version") {
    val path = java.nio.file.Files.createTempDirectory("r15cas").toString +
      "/tbl"
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futs = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = LayoutOps.commitAppend(
            Seq((i.toLong, s"w$i")).toDF("id", "payload"), path,
            maxRetries = 32)
        })
      }
      val versions = futs.map(_.get()).toSet
      assert(versions == (0 until n).toSet,
        s"all $n racers must land distinct consecutive versions, " +
          s"got $versions")
      val snap = LayoutOps.readVersion(spark, path, n - 1)
        .select("id").as[Long].collect().toSet
      assert(snap == (1 to n).map(_.toLong).toSet,
        "no commit may be lost or duplicated under contention")
      // no stray staging files left behind by the link-publish
      val leftovers = new java.io.File(path).listFiles()
        .map(_.getName).filter(_.endsWith(".tmp"))
      assert(leftovers.isEmpty, s"staging files must be cleaned: " +
        leftovers.mkString(","))
    } finally pool.shutdown()
  }
}
