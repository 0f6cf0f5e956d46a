package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16: the LZF filter (h5py's no-dependency ``compression='lzf'``
  * layout, filter id 32000) through the pure-Python minih5 reader —
  * the first unreadable-file shape a real-world .h5ad user hits after
  * gzip.  The committed fixture lives in tools/fixtures/lzf/ (its own
  * plate set, so the four-plate concatenation fixtures keep their
  * counts), with data values repetitive enough that the LZF
  * back-reference path actually fires, not just literal runs. */
class R16LzfSpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val repo = "/root/repo"

  test("lzf-compressed .h5ad converts through the real HDF5 branch") {
    import scala.sys.process._
    val out = java.nio.file.Files.createTempDirectory("graft-h5ad-lzf")
      .toFile
    val rc = Seq("python3", s"$repo/tools/h5ad_to_parquet.py",
      s"$repo/tools/fixtures/lzf", out.toString).!
    assert(rc == 0, "lzf conversion must succeed without h5py")
    val byId = spark.read.parquet(s"$out/cells.parquet")
      .select(col("cell_id"), col("genes"), col("expressions"),
        col("cell_type"), col("n_counts"))
      .as[(Long, Seq[Int], Seq[Float], String, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(byId.size == 3)
    assert(byId(0L)._2 == Seq(0, 2, 4, 6) &&
      byId(0L)._3 == Seq(1.5f, 1.5f, 1.5f, 1.5f))
    assert(byId(1L)._2 == Seq(1, 3, 5, 7) &&
      byId(1L)._3 == Seq(2.5f, 2.5f, 2.5f, 0.25f))
    assert(byId(2L)._2 == Seq(9, 11) && byId(2L)._3 == Seq(1.5f, 2.5f))
    assert(byId.view.mapValues(_._4).toMap ==
      Map(0L -> "B", 1L -> "T", 2L -> "NK"))
    assert(byId(1L)._5 == 7.75)
  }

  test("lzf round-trip property + fixture determinism (python-side)") {
    import scala.sys.process._
    // round-trips random, repetitive, empty, and all-zero payloads
    // through lzf_compress -> minih5.lzf_decompress; asserts the
    // committed fixture bytes regenerate exactly and that the fixture's
    // chunks actually COMPRESSED (back-references fired)
    val py =
      """import sys, random, hashlib
        |sys.path.insert(0, '/root/repo/tools')
        |import minih5
        |from gen_h5ad_fixture import lzf_compress, main as gen
        |random.seed(7)
        |cases = [b'', b'a', b'abcabc' * 150,
        |         bytes(random.randrange(256) for _ in range(5000)),
        |         b'\x00' * 4096, bytes(range(256)) * 40]
        |for c in cases:
        |    assert minih5.lzf_decompress(lzf_compress(c)) == c
        |assert len(lzf_compress(b'\x00' * 4096)) < 4096 // 8
        |import tempfile, os, filecmp
        |tmp = tempfile.mkdtemp()
        |gen(tmp)
        |for f in ['plate0.h5ad', 'plate1.h5ad', 'plate2.h5ad',
        |          'plate3.h5ad', 'lzf/plate_lzf.h5ad']:
        |    assert filecmp.cmp(os.path.join(tmp, f),
        |        os.path.join('/root/repo/tools/fixtures', f),
        |        shallow=False), f
        |print('LZF_OK')
        |""".stripMargin
    val outBuf = new StringBuilder
    val rc = (Seq("python3", "-c", py) ! ProcessLogger(
      s => outBuf.append(s), _ => ()))
    assert(rc == 0 && outBuf.toString.contains("LZF_OK"))
  }
}
