package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NpySource

/** The npy/memmap source adapter: real .npy files written by numpy, read
  * back distributed (range-sliced tasks), including the CSR-directory
  * (BioNeMo SCDL) layout landing in the h5ad-converter schema. */
class R14NpySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixtures(dir: java.io.File): Unit = {
    import scala.sys.process._
    val py =
      s"""import numpy as np
         |import os
         |d = ${"\"" + dir.toString + "\""}
         |np.save(os.path.join(d, "vec_f4.npy"),
         |        (np.arange(1000, dtype=np.float32) * 0.5))
         |np.save(os.path.join(d, "mat_f8.npy"),
         |        np.arange(60, dtype=np.float64).reshape(20, 3))
         |np.save(os.path.join(d, "ids_i8.npy"),
         |        np.arange(100, dtype=np.int64) * 7)
         |# CSR dir: 50 rows, 10 cols, row r holds cols {r%10, (r+3)%10}
         |rows = 50
         |indptr = np.arange(0, 2 * rows + 1, 2, dtype=np.int64)
         |indices = np.zeros(2 * rows, dtype=np.int32)
         |data = np.zeros(2 * rows, dtype=np.float32)
         |for r in range(rows):
         |    a, b = sorted((r % 10, (r + 3) % 10))
         |    indices[2*r], indices[2*r+1] = a, b
         |    data[2*r], data[2*r+1] = r + 0.25, r + 0.75
         |csr = os.path.join(d, "csr")
         |os.makedirs(csr, exist_ok=True)
         |np.save(os.path.join(csr, "indptr.npy"), indptr)
         |np.save(os.path.join(csr, "indices.npy"), indices)
         |np.save(os.path.join(csr, "data.npy"), data)
         |print("fixtures ok")
         |""".stripMargin
    val f = java.io.File.createTempFile("mknpy", ".py")
    java.nio.file.Files.writeString(f.toPath, py)
    assert(Seq("python3", f.toString).! == 0)
    f.delete(); ()
  }

  test("readNpy reads 1-D and 2-D arrays distributed and exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-npy").toFile
    writeFixtures(dir)
    val v = NpySource.readNpy(spark, s"$dir/vec_f4.npy", slices = 7)
    assert(v.count() == 1000L)
    assert(v.agg(sum("value")).head().getDouble(0) == (0 until 1000)
      .map(_ * 0.5).sum)
    assert(v.where(col("row_id") === 999).head().getDouble(1) == 499.5)
    val m = NpySource.readNpy(spark, s"$dir/mat_f8.npy", slices = 3)
    assert(m.count() == 20L)
    val row7 = m.where(col("row_id") === 7).select("values")
      .head().getSeq[Double](0)
    assert(row7 == Seq(21.0, 22.0, 23.0))
    val ids = NpySource.readLongs(spark, s"$dir/ids_i8.npy")
    assert(ids.length == 100 && ids(99) == 693L)
  }

  test("readCsrDir lands the BioNeMo CSR memmap layout in the h5ad " +
      "converter schema, exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-npy2").toFile
    writeFixtures(dir)
    val cells = NpySource.readCsrDir(spark, s"$dir/csr", slices = 4)
    assert(cells.columns.toSeq == Seq("cell_id", "genes", "expressions"))
    assert(cells.count() == 50L)
    val r13 = cells.where(col("cell_id") === 13).head()
    assert(r13.getSeq[Int](1) == Seq(3, 6)) // sorted cols {13%10, 16%10}
    assert(r13.getSeq[Float](2) == Seq(13.25f, 13.75f))
    // drops into the engine like any other cells table — and the
    // one-call collection adapter agrees with the manual wrap
    val sc = graft.core.ScCollection.fromDataFrame(cells, col("cell_id"))
    assert(sc.df.count() == 50L)
    val sc2 = graft.core.ScCollection.fromCsrNpy(spark, s"$dir/csr",
      slices = 4)
    assert(sc2.df.count() == 50L)
    // positional memmap ids → rowId is the identity re-label
    assert(sc2.df.where(
      col(graft.core.ScCollection.RowId) =!= col("cell_id")).count() == 0L)
    graft.core.CacheScope.release()
  }
}
