package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PersistedIndex

/** Round-20: persisted-index RETENTION — continuous `append` ingest
  * fragments the index directory (one part file per shuffle partition
  * per catch-up); `compact`/`maybeCompact` rewrite the key table into a
  * bounded file count while candidates stay IDENTICAL, `_graft_params`
  * survives, and the validate/append surface keeps working on the
  * compacted layout. */
class R20IndexCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Seq("k" -> 4, "perm" -> 16)

  /** A fresh index with `appends` fragmented appends of 100 keys each
    * (doc i carries key i % 37 — planted collisions so candidate joins
    * are non-trivial). */
  private def freshIndex(appends: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("r20idx").toString +
      "/idx"
    def shard(lo: Int) = (lo until lo + 100)
      .map(i => (i.toLong, (i % 37).toLong)).toDF("doc_id", "key")
      .repartition(8)
    PersistedIndex.write(shard(0), dir, params)
    (1 until appends).foreach(k => PersistedIndex.append(shard(k * 100),
      dir, params))
    dir
  }

  private def candidates(dir: String): Set[(Long, Long)] = {
    val idx = spark.read.parquet(dir)
    val probe = (0 until 50).map(i => (10000L + i, (i % 37).toLong))
      .toDF("doc_id", "key")
    idx.as("a").join(probe.as("b"), col("a.key") === col("b.key"))
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)]
      .collect().toSet
  }

  test("compact bounds the file count and never changes candidates") {
    val dir = freshIndex(appends = 5)
    val fragBefore = PersistedIndex.dataFileCount(spark, dir)
    assert(fragBefore >= 5 * 8, s"expected fragmentation, got $fragBefore")
    val before = candidates(dir)
    // closed form: index keys 0..18 carry 14 docs, 19..36 carry 13;
    // probe keys 0..12 carry 2 docs, 13..36 carry 1 →
    // 13·14·2 + 6·14 + 18·13 = 682
    assert(before.size == 682)
    PersistedIndex.compact(spark, dir, params, targetFiles = 2)
    assert(PersistedIndex.dataFileCount(spark, dir) == 2)
    assert(candidates(dir) == before, "compaction changed candidates")
    // params survived and keep validating
    PersistedIndex.requireParams(spark, dir, params)
    // rows survived exactly
    assert(spark.read.parquet(dir).count() == 500)
  }

  test("append after compact keeps working; wrong params still fail") {
    val dir = freshIndex(appends = 2)
    PersistedIndex.compact(spark, dir, params, targetFiles = 1)
    PersistedIndex.append(Seq((9999L, 3L)).toDF("doc_id", "key"), dir,
      params)
    assert(spark.read.parquet(dir).count() == 201)
    val e = intercept[IllegalArgumentException] {
      PersistedIndex.compact(spark, dir, Seq("k" -> 5), targetFiles = 1)
    }
    assert(e.getMessage.contains("parameters must match"))
  }

  test("maybeCompact is the amortized policy: no-op until fragmented") {
    val dir = freshIndex(appends = 2) // 16 part files
    assert(!PersistedIndex.maybeCompact(spark, dir, params,
      maxFiles = 64, targetFiles = 1))
    assert(PersistedIndex.dataFileCount(spark, dir) == 16)
    assert(PersistedIndex.maybeCompact(spark, dir, params,
      maxFiles = 8, targetFiles = 1))
    assert(PersistedIndex.dataFileCount(spark, dir) == 1)
    assert(spark.read.parquet(dir).count() == 200)
  }

  test("a crashed compaction swap is caught loudly at the next read") {
    val dir = freshIndex(appends = 2)
    // simulate a crash mid-swap: the marker is up, data files suspect
    val marker = new java.io.File(dir, "_graft_compacting")
    assert(marker.createNewFile())
    val e = intercept[IllegalArgumentException] {
      PersistedIndex.requireParams(spark, dir, params)
    }
    assert(e.getMessage.contains("_graft_compacting"), e.getMessage)
    // compacting a suspect index would PERSIST the damage — refused too
    val e2 = intercept[IllegalArgumentException] {
      PersistedIndex.compact(spark, dir)
    }
    assert(e2.getMessage.contains("_graft_compacting"), e2.getMessage)
    // a fresh write (the documented remedy: rebuild from source)
    // clears the marker and the index reads again
    val t = (0 until 100).map(i => (i.toLong, (i % 37).toLong))
      .toDF("doc_id", "key")
    PersistedIndex.write(t, dir, params)
    PersistedIndex.requireParams(spark, dir, params)
    assert(!marker.exists())
  }

  test("compacting a missing index fails loudly") {
    val e = intercept[IllegalArgumentException] {
      PersistedIndex.compact(spark, "/tmp/definitely_not_an_index_r20",
        Nil, 1)
    }
    assert(e.getMessage.contains("no index at"))
  }
}
