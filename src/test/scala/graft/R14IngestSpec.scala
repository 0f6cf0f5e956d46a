package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** The h5ad ingestion workflow: tools/h5ad_to_parquet.py --selftest
  * produces the converter's exact output layout (two synthetic plates
  * through the real CSR→row-arrays core), and this spec proves the
  * converted table drops straight into the engine — positional ids,
  * sampling pipeline, U6 densification, gene-vocabulary sidecar. */
class R14IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("converted h5ad fixture reads through ScCollection.fromParquet " +
      "into the sampling pipeline and densifies exactly") {
    import scala.sys.process._
    val out = java.nio.file.Files.createTempDirectory("graft-h5ad").toFile
    val rc = Seq("python3", "/root/repo/tools/h5ad_to_parquet.py",
      "--selftest", out.toString).!
    assert(rc == 0, "converter selftest must succeed")

    val sc = ScCollection.fromParquet(spark, s"$out/cells.parquet",
      Seq("cell_id"))
    val n = sc.df.count()
    assert(n == 200L, "two plates of 120+80 cells")
    // plate offsets make cell_id globally positional → rowId == cell_id
    assert(sc.df.where(col(ScCollection.RowId) =!= col("cell_id"))
      .count() == 0L)

    // a block-shuffled epoch covers every cell exactly once
    val ds = ScDataset(sc, BlockShuffling(blockSize = 32), batchSize = 16,
      seed = 1L)
    val planned = ds.planFrame(0)
    assert(planned.count() == n)
    assert(planned.select("cell_id").distinct().count() == n)

    // U6 densification: genes/expressions reconstruct the dense row —
    // per-cell sum of the dense vector equals the sum of the sparse
    // values (sparse_to_dense indices are 1-based)
    val dense = sc.df.select(col("cell_id"),
      graft.functions.SparseToDense.sparseToDense(
        transform(col("genes"), g => g + 1),
        col("expressions"), 50).as("dense"),
      aggregate(col("expressions"), lit(0.0d),
        (acc, x) => acc + x).as("sparse_sum"))
    val mismatches = dense.select(
        abs(aggregate(col("dense"), lit(0.0d), (acc, x) => acc + x) -
          col("sparse_sum")).as("delta"))
      .where(col("delta") > 1e-3).count()
    assert(mismatches == 0L, "densified rows must preserve mass")

    // the gene-vocabulary sidecar joins back on the column id
    val vars = spark.read.parquet(s"$out/var.parquet")
    assert(vars.count() == 50L)
    assert(vars.where(col("var_name").startsWith("GENE")).count() == 50L)
    CacheScope.release()
  }

  test("converted HF-Arrow dataset reads through ScCollection.fromParquet " +
      "with positional row ids preserved across files") {
    import scala.sys.process._
    val out = java.nio.file.Files.createTempDirectory("graft-hfarrow").toFile
    val rc = Seq("python3", "/root/repo/tools/hf_arrow_to_parquet.py",
      "--selftest", out.toString).!
    assert(rc == 0, "arrow converter selftest must succeed")
    val sc = ScCollection.fromParquet(spark, s"$out/docs.parquet",
      Seq("row_idx"))
    assert(sc.df.count() == 100L)
    // global positional ids in file order → rowId == row_id, and the
    // per-file label sequence survives the concatenation in order
    assert(sc.df.where(col(ScCollection.RowId) =!= col("row_idx"))
      .count() == 0L)
    assert(sc.df.where(col("label") =!= col("row_idx")).count() == 0L)
    CacheScope.release()
  }
}
