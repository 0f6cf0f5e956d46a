package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Round-15: `deleteWhere` — row-level DELETE with directory-granular
  * rewrites.  Only directories the predicate could touch (by manifest
  * stats) are rewritten; everything else is carried by name, files
  * untouched; old versions stay readable; delta consumers refuse the
  * rewritten interval. */
class R15LakeDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val path = java.nio.file.Files.createTempDirectory("r15del")
      .toString + "/tbl"
    def slice(lo: Int, tagged: Boolean) =
      (lo until lo + 100).map(i =>
        (i.toLong, if (tagged) s"t$i" else null)).toDF("id", "tag")
    LayoutOps.commitAppend(slice(0, tagged = false), path,
      statsCols = Seq("id", "tag"))
    LayoutOps.commitAppend(slice(100, tagged = true), path,
      statsCols = Seq("id", "tag"))
    LayoutOps.commitAppend(slice(200, tagged = true), path,
      statsCols = Seq("id", "tag"))
    path
  }

  test("a range delete rewrites only the directory it can touch; " +
      "untouched directories are carried by name with their stats") {
    val path = freshLake()
    val (dirsBefore, _, _) = LayoutOps.manifestEntries(spark, path, 2)
    assert(LayoutOps.deleteWhere(spark, path,
      col("id").between(120L, 180L)).contains(3))
    val (dirsAfter, statsAfter, sizesAfter) =
      LayoutOps.manifestEntries(spark, path, 3)
    // v0 and v2's directories are the SAME paths (no rewrite), v1's is
    // replaced by one delete directory
    assert(dirsAfter.size == 3)
    assert(dirsAfter.count(dirsBefore.contains) == 2,
      s"exactly the untouched dirs carry over: $dirsBefore -> $dirsAfter")
    val rows = LayoutOps.readVersion(spark, path, 3)
      .select("id").as[Long].collect().toSet
    assert(rows.size == 239 && !rows.contains(150L) && rows.contains(119L)
      && rows.contains(181L))
    // the rewritten directory records fresh stats (inherited columns)
    assert(statsAfter.keys.map(_._2).toSet == Set("id", "tag"))
    assert(sizesAfter.size == 3)
    // carried stats still prune on the new version
    val (kept, skipped) = LayoutOps.rangeDirs(spark, path, 3, "id", 0L, 50L)
    assert(kept.size == 1 && skipped.size == 2)
    // time travel: the pre-delete snapshot is intact
    assert(LayoutOps.readVersion(spark, path, 2).count() == 300)
    // the delete rewrote history: structural delta consumers refuse
    val e = intercept[IllegalArgumentException] {
      LayoutOps.readVersionDelta(spark, path, 2, 3)
    }
    assert(e.getMessage.contains("compaction/overwrite"))
  }

  test("MERGE replaces matched keys by rewriting only the overlapping " +
      "directory; a disjoint-key merge is a pure insert that stays " +
      "delta-consumable; duplicate update keys are rejected") {
    val path = freshLake()
    import spark.implicits._
    // replace two keys inside v1's range: v0 and v2 carried by name
    val upd = Seq((150L, "X"), (160L, "Y")).toDF("id", "tag")
    val (before, _, _) = LayoutOps.manifestEntries(spark, path, 2)
    assert(LayoutOps.mergeInto(spark, path, upd, "id").contains(3))
    val (after, _, _) = LayoutOps.manifestEntries(spark, path, 3)
    assert(after.size == 3 && after.count(before.contains) == 2,
      s"only the key-overlapping dir is rewritten: $before -> $after")
    val snap = LayoutOps.readVersion(spark, path, 3)
    assert(snap.count() == 300, "replacement, not growth")
    assert(snap.where(col("id") === 150L).select("tag")
      .as[String].head() == "X")
    assert(snap.where(col("id") === 151L).select("tag")
      .as[String].head() == "t151", "unmatched rows unchanged")
    // disjoint keys: nothing rewritten, all dirs carried + one insert
    // dir — the structural delta is still defined and equals the insert
    val ins = Seq((500L, "Z")).toDF("id", "tag")
    assert(LayoutOps.mergeInto(spark, path, ins, "id").contains(4))
    val (after4, _, _) = LayoutOps.manifestEntries(spark, path, 4)
    assert(after4.size == 4 && after4.count(after.contains) == 3)
    assert(LayoutOps.readVersion(spark, path, 4).count() == 301)
    val delta = LayoutOps.readVersionDelta(spark, path, 3, 4)
    assert(delta.select("id").as[Long].collect().toSeq == Seq(500L))
    // duplicate update keys would make the merge order-dependent
    val e = intercept[IllegalArgumentException] {
      LayoutOps.mergeInto(spark, path,
        Seq((1L, "a"), (1L, "b")).toDF("id", "tag"), "id")
    }
    assert(e.getMessage.contains("unique"))
  }

  test("rewrites read affected directories under their UNION schema: a " +
      "delete spanning an evolved commit cannot drop the added column; " +
      "empty merges no-op; fresh-lake merges enforce key uniqueness") {
    val path = java.nio.file.Files.createTempDirectory("r15evo2")
      .toString + "/tbl"
    import spark.implicits._
    // v0 (id, s) then v1 (id, s, score): heterogeneous commit schemas
    LayoutOps.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    LayoutOps.commitAppend(
      Seq((3L, "c", 7.5), (4L, "d", 8.5)).toDF("id", "s", "score"), path)
    // no stats anywhere: BOTH dirs are affected -> both rewritten
    assert(LayoutOps.deleteWhere(spark, path, col("id") === 2L)
      .contains(2))
    val snap = LayoutOps.readVersionEvolved(spark, path, 2)
    assert(snap.schema.fieldNames.contains("score"),
      "the evolved column survives a rewrite that spans both schemas")
    assert(snap.where(col("score") === 8.5).count() == 1)
    assert(snap.count() == 3)
    // empty update batch: no version churn
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    assert(LayoutOps.mergeInto(spark, path, empty, "id").isEmpty)
    assert(LayoutOps.latestVersion(spark, path) == 2)
    // duplicate keys are rejected even on a NOT-YET-CREATED lake
    val fresh = java.nio.file.Files.createTempDirectory("r15fresh")
      .toString + "/tbl"
    val e = intercept[IllegalArgumentException] {
      LayoutOps.mergeInto(spark, fresh,
        Seq((1L, "a"), (1L, "b")).toDF("id", "s"), "id")
    }
    assert(e.getMessage.contains("unique"))
  }

  test("DELETE keeps false AND null predicate rows; a provably " +
      "unmatchable delete publishes nothing") {
    val path = freshLake()
    // v0 is affected through the id clause, and its rows with id >= 10
    // evaluate the predicate to NULL (tag is null) — SQL DELETE keeps
    // them; v2 is provably untouched on both clauses and is carried
    assert(LayoutOps.deleteWhere(spark, path,
      col("tag") === "t150" || col("id") < 10L).contains(3))
    val snap = LayoutOps.readVersion(spark, path, 3)
    assert(snap.count() == 289, "10 id-rows + 1 tag-row deleted")
    assert(snap.where(col("tag").isNull).count() == 90,
      "null-predicate rows inside the REWRITTEN directory survive")
    assert(snap.where(col("id") === 150L).count() == 0)
    // no directory can contain id 99999: trivially complete, no version
    assert(LayoutOps.deleteWhere(spark, path,
      col("id") === 99999L).isEmpty)
    assert(LayoutOps.latestVersion(spark, path) == 3)
  }
}
