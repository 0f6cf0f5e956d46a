package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Round-15: Catalyst-integrated lake reads — `readVersionIndexed`'s
  * LakeFileIndex lets the PLANNER's own pushed filters prune commit
  * directories from the manifest stats, with pruned directories never
  * listed and `sizeInBytes` answered from `#size:` manifest lines.
  * Invariant under every predicate: indexed result == full-scan
  * `readVersion(...).where(...)`. */
class R15LakeIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Lake with four commits:
    *  v0 ids 0..99,    s "a*",  tag all-null
    *  v1 ids 100..199, s "h*",  tag set
    *  v2 ids 200..299, s "p*",  tag set
    *  v3 ids 300..399  — committed WITHOUT stats (pruning must keep it)
    */
  private lazy val lake: String = {
    val path = java.nio.file.Files.createTempDirectory("r15idx").toString +
      "/tbl"
    def slice(lo: Int, pre: String, tagged: Boolean) =
      (lo until lo + 100).map { i =>
        (i.toLong, f"$pre${i}%04d", if (tagged) s"t$i" else null)
      }.toDF("id", "s", "tag")
    LayoutOps.commitAppend(slice(0, "a", tagged = false), path,
      statsCols = Seq("id", "s", "tag"))
    LayoutOps.commitAppend(slice(100, "h", tagged = true), path,
      statsCols = Seq("id", "s", "tag"))
    LayoutOps.commitAppend(slice(200, "p", tagged = true), path,
      statsCols = Seq("id", "s", "tag"))
    LayoutOps.commitAppend(slice(300, "z", tagged = true), path)
    path
  }

  private def checkAgainstFullScan(
      flt: org.apache.spark.sql.Column): Long = {
    val v = LayoutOps.latestVersion(spark, lake)
    val (df, idx) = LayoutOps.indexedRead(spark, lake, v)
    val got = df.where(flt).orderBy("id").collect().toSeq
    val want = LayoutOps.readVersion(spark, lake, v).where(flt)
      .orderBy("id").collect().toSeq
    assert(got == want, s"indexed read diverged under $flt")
    idx.lastPruning._2.toLong // skipped dirs
  }

  test("numeric range filter prunes out-of-range commits at planning " +
      "time; rows match the full scan") {
    // only v1 intersects 120..180; v3 (no stats) must be kept
    assert(checkAgainstFullScan(col("id").between(120, 180)) == 2)
    // upper range: v0/v1/v2 provably out, v3 kept conservatively
    assert(checkAgainstFullScan(col("id") >= 350) == 3)
    // literal-first shape
    assert(checkAgainstFullScan(lit(50L) > col("id")) == 2)
  }

  test("string equality, IN and prefix filters prune by the str stats") {
    assert(checkAgainstFullScan(col("s") === "h0150") == 2)
    assert(checkAgainstFullScan(col("s").isin("a0003", "p0299")) == 1)
    assert(checkAgainstFullScan(col("s").startsWith("p")) == 2)
  }

  test("an all-null delta (kind none) is pruned by IsNotNull and by any " +
      "comparison; OR keeps a dir either side may match") {
    assert(checkAgainstFullScan(col("tag").isNotNull) == 1)    // v0 skipped
    // v0 by kind none, v2 by range (t200..t299)
    assert(checkAgainstFullScan(col("tag") === "t123") == 2)
    assert(checkAgainstFullScan(
      col("id") < 50 || col("s").startsWith("p")) == 1)        // keeps v0+v2
    // unsupported shape: no pruning, still correct
    assert(checkAgainstFullScan(length(col("s")) === 5) == 0)
  }

  test("pruned directories are never listed and sizeInBytes comes from " +
      "the manifest, not a listing") {
    val v = LayoutOps.latestVersion(spark, lake)
    val (df, idx) = LayoutOps.indexedRead(spark, lake, v)
    assert(idx.listedDirCount == 0, "index construction must not list")
    val n = df.where(col("id").between(120, 180)).count()
    assert(n == 61)
    assert(idx.lastPruning == (2, 2), "v1 kept + stat-less v3 kept")
    assert(idx.listedDirCount == 2,
      s"only surviving dirs may be listed, saw ${idx.listedDirCount}")
    // the three stats'd commits carry #size lines; v3 (no statsCols)
    // does too — writeWithStats emits them on both branches
    val (_, _, sizes) = LayoutOps.manifestEntries(spark, lake, v)
    assert(sizes.size == 4, s"every commit records #size, got $sizes")
    assert(idx.sizeInBytes == sizes.values.sum)
    assert(idx.listedDirCount == 2, "sizeInBytes must not trigger listing")
  }

  test("readVersionDelta reads exactly the appended directories, with " +
      "pushdown, and an empty interval yields an empty frame") {
    // everything after v0: ids 100..399 (three appended dirs)
    val d03 = LayoutOps.readVersionDelta(spark, lake, 0, 3)
    assert(d03.count() == 300)
    assert(d03.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(100L, 399L))
    // filters prune within the delta: only v2 (200..299) survives
    assert(d03.where(col("id") >= 200 && col("id") < 300).count() == 100)
    // from the beginning = the full snapshot
    assert(LayoutOps.readVersionDelta(spark, lake, -1, 3).count() == 400)
    // empty interval: schema preserved, zero rows
    val empty = LayoutOps.readVersionDelta(spark, lake, 2, 2)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "s", "tag"))
  }

  test("an unsupported stats type (boolean) records NO claim — never " +
      "kind none — so its directories are always read") {
    val path = java.nio.file.Files.createTempDirectory("r15bool").toString +
      "/tbl"
    LayoutOps.commitAppend(
      Seq((1L, true), (2L, false)).toDF("id", "flag"), path,
      statsCols = Seq("id", "flag"))
    val (_, stats, _) = LayoutOps.manifestEntries(spark, path, 0)
    assert(!stats.keys.exists(_._2 == "flag"),
      s"boolean min/max is unsupported: no stats line, got $stats")
    assert(stats.keys.exists(_._2 == "id"), "numeric stats still recorded")
    val got = LayoutOps.readVersionIndexed(spark, path, 0)
      .where(col("flag") === true).count()
    assert(got == 1, "the non-null boolean rows must NOT be pruned away")
  }

  test("string range pruning compares in UTF8 byte order: a " +
      "supplementary-plane value inside the range keeps its directory") {
    val path = java.nio.file.Files.createTempDirectory("r15utf8").toString +
      "/tbl"
    // U+E000 (UTF-8 EE 80 80) < U+1F600 (F0 9F 98 80) in byte order,
    // but "\uD83D..." < "" in Java's UTF-16 ordering
    LayoutOps.commitAppend(
      Seq((1L, ""), (2L, "😀")).toDF("id", "s"), path,
      statsCols = Seq("s"))
    val v = LayoutOps.latestVersion(spark, path)
    val (kept, _) =
      LayoutOps.rangeDirs(spark, path, v, "s", "", "😁")
    assert(kept.size == 1, "the emoji row is inside the range — " +
      "UTF-16 comparison would wrongly skip the directory")
    val rows = LayoutOps
      .readVersionRange(spark, path, v, "s", "", "😁")
      .select("id").as[Long].collect().toSeq
    assert(rows == Seq(2L))
  }

  test("all-pruned range read returns an empty frame from one footer; " +
      "compacting a not-yet-written table returns None") {
    // every commit carries stats, so an out-of-range read prunes ALL
    // dirs and must hit the cheap empty-frame branch
    val path = java.nio.file.Files.createTempDirectory("r15allpruned")
      .toString + "/tbl"
    LayoutOps.commitAppend(Seq((1L, "a")).toDF("id", "s"), path,
      statsCols = Seq("id"))
    LayoutOps.commitAppend(Seq((2L, "b")).toDF("id", "s"), path,
      statsCols = Seq("id"))
    val v = LayoutOps.latestVersion(spark, path)
    val (kept, skipped) = LayoutOps.rangeDirs(spark, path, v, "id",
      100000L, 200000L)
    assert(kept.isEmpty && skipped.size == 2)
    val empty = LayoutOps.readVersionRange(spark, path, v, "id",
      100000L, 200000L)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "s"))
    val blank = java.nio.file.Files.createTempDirectory("r15blank")
      .toString + "/tbl"
    assert(LayoutOps.compactSnapshot(spark, blank).isEmpty)
  }

  test("schema evolution: readVersionEvolved unions commit schemas so " +
      "pre-evolution rows surface added columns as nulls; pruning still " +
      "applies") {
    val path = java.nio.file.Files.createTempDirectory("r15evo").toString +
      "/tbl"
    LayoutOps.commitAppend(Seq((1L, "a")).toDF("id", "s"), path,
      statsCols = Seq("id"))
    LayoutOps.commitAppend(
      Seq((2L, "b", 7.5)).toDF("id", "s", "score"), path,
      statsCols = Seq("id"))
    val v = LayoutOps.latestVersion(spark, path)
    val evolved = LayoutOps.readVersionEvolved(spark, path, v)
    assert(evolved.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    val rows = evolved.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(7.5))))
    // the default (newest-footer) read would also see all three columns
    // here only because the evolved commit is last; evolved is order-proof:
    // a third OLD-schema commit must not shrink the merged schema
    LayoutOps.commitAppend(Seq((3L, "c")).toDF("id", "s"), path,
      statsCols = Seq("id"))
    val evolved2 = LayoutOps.readVersionEvolved(spark, path,
      LayoutOps.latestVersion(spark, path))
    assert(evolved2.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    assert(evolved2.where(col("score").isNotNull).count() == 1)
    // pruning still rides the merged schema
    assert(evolved2.where(col("id") >= 3L).count() == 1)
  }

  test("z-ordered compaction bounds BOTH dimensions per file — the " +
      "clustering a single-column sort cannot give — with identical rows") {
    val path = java.nio.file.Files.createTempDirectory("r15zorder")
      .toString + "/tbl"
    val grid = spark.range(1024).select(
      (col("id") / 32).cast("long").as("x"),
      pmod(col("id"), lit(32)).cast("long").as("y"))
    // four arrival-order slices: rows 0..255 etc. (x-bands)
    (0 until 4).foreach { s =>
      LayoutOps.commitAppend(
        grid.where(col("x") >= s * 8 && col("x") < (s + 1) * 8), path)
    }
    val v = LayoutOps.compactZOrdered(spark, path,
      col("x"), col("y"), bits = 6, targetFiles = 4,
      statsCols = Seq("x", "y"))
    assert(v.contains(4))
    val snap = LayoutOps.readVersion(spark, path, 4)
    assert(snap.count() == 1024)
    assert(snap.agg(sum("x"), sum("y")).head() ==
      org.apache.spark.sql.Row(15872L, 15872L), "rows identical")
    // per-FILE spans: a z-ordered layout keeps both dimensions bounded
    // (a linear x-sort would leave y spanning the full 0..31 everywhere)
    val (dirs, _, _) = LayoutOps.manifestEntries(spark, path, 4)
    val files = new java.io.File(dirs.head.stripPrefix("file:"))
      .listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(files.length == 4)
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // sampled range-split points need not align with quadrant edges, so
    // ONE file may straddle a major z-curve jump and span wide; the
    // property a linear sort cannot give is that MOST files bound both
    // dimensions (an x-sort leaves y spanning 0..31 in every file)
    assert(spans.count { case (sx, sy) => sx <= 24 && sy <= 24 } >= 3,
      s"z-order bounds both dims in most files, got ${spans.toSeq}")
    assert(spans.count { case (_, sy) => sy <= 24 } == 4,
      s"the interleaved dimension is bounded everywhere, " +
        s"got ${spans.toSeq}")
  }

  test("size lines survive carry, compaction and vacuum fold") {
    val v = LayoutOps.latestVersion(spark, lake)
    assert(v == 3)
    val (dirs3, stats3, _) = LayoutOps.manifestEntries(spark, lake, 3)
    assert(dirs3.size == 4)
    // v3's manifest carried v0..v2's stats lines forward
    assert(stats3.keys.map(_._2).toSet == Set("id", "s", "tag"))
    val compacted = LayoutOps.compactSnapshot(spark, lake, targetFiles = 1,
      statsCols = Seq("id"))
    assert(compacted.contains(4))
    val (dirs4, _, sizes4) = LayoutOps.manifestEntries(spark, lake, 4)
    assert(dirs4.size == 1 && sizes4.size == 1)
    val (df4, idx4) = LayoutOps.indexedRead(spark, lake, 4)
    assert(df4.count() == 400)
    assert(idx4.sizeInBytes == sizes4.values.sum)
    // a compaction inside the interval rewrites history: the structural
    // append-delta must refuse, not silently replay the snapshot as new
    val e = intercept[IllegalArgumentException] {
      LayoutOps.readVersionDelta(spark, lake, 3, 4)
    }
    assert(e.getMessage.contains("compaction/overwrite"))
  }
}
