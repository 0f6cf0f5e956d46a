package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-20: the szip filter (HDF5 id 4 — CCSDS 121.0-B extended-Rice
  * coding) through the pure-Python minih5 reader, closing the last
  * named ingest seam from the r19 verdict (szip-compressed h5ad
  * archives previously failed loudly).  Three layers of evidence:
  *
  *  1. GOLDEN BITSTREAMS: hand-coded byte sequences derived from the
  *     standard's rules (option-ID widths and values, FS/unary form,
  *     split-sample two-pass layout, zero-block ROS, second-extension
  *     pair packing, NN reference + mapping) decode to hand-computed
  *     samples — pinning the decoder against the SPEC, independent of
  *     the encoder.
  *  2. round-trip properties over every option path at 8/16/32 bits.
  *  3. the committed fixture (tools/fixtures/szip/plate_szip.h5ad)
  *     converts end-to-end through h5ad_to_parquet without h5py, and
  *     regenerates byte-identically.
  *
  * No foreign szip encoder exists in this environment, so REAL-archive
  * interop is untested — documented at minih5.szip_decompress, not
  * silent. */
class R20SzipSpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val repo = "/root/repo"

  private def runPy(py: String, marker: String): Unit = {
    import scala.sys.process._
    val outBuf = new StringBuilder
    val errBuf = new StringBuilder
    val rc = Seq("python3", "-c", py) ! ProcessLogger(
      s => outBuf.append(s).append('\n'),
      s => errBuf.append(s).append('\n'))
    assert(rc == 0 && outBuf.toString.contains(marker),
      s"stdout: $outBuf\nstderr: $errBuf")
  }

  test("golden bitstreams from the standard's rules decode exactly") {
    // each vector lists the hand-derived code sequence as (value, bits)
    // pairs; the bytes are assembled MSB-first and fed to the decoder
    val py =
      """import sys
        |sys.path.insert(0, '/root/repo/tools')
        |import minih5
        |
        |def bits(pairs):
        |    big, total = 0, 0
        |    for v, n in pairs:
        |        big = (big << n) | v; total += n
        |    pad = (-total) % 8
        |    return ((big << pad)).to_bytes((total + pad) // 8, 'big')
        |
        |EC = 1 | 16 | 4 | 128   # allow-k13, MSB, EC, RAW
        |NN = 1 | 16 | 32 | 128
        |
        |# 1. split k=0 (pure FS), 8-bit, J=8: ID '001' then unary codes
        |v = bits([(1, 3),               # option id = k+1 = 1
        |          (1, 2), (1, 1), (1, 3), (1, 1),   # FS 1,0,2,0
        |          (1, 2), (1, 1), (1, 1), (1, 4)])  # FS 1,0,0,3
        |assert v == bytes([0b00101100, 0b11011100, 0b01000000]), v.hex()
        |assert minih5.szip_decompress(v, 8, 8, 8, 8, EC) == \
        |    [1, 0, 2, 0, 1, 0, 0, 3]
        |
        |# 2. split k=2: ID '011', FS of t>>2 for all 8, then 2 LSBs each
        |data = [4, 5, 6, 7, 8, 9, 10, 11]
        |v = bits([(3, 3)] + [(1, (t >> 2) + 1) for t in data] +
        |         [(t & 3, 2) for t in data])
        |assert minih5.szip_decompress(v, 8, 8, 8, 8, EC) == data
        |
        |# 3. uncompressed: ID '111' then 8 raw bytes
        |data = [250, 0, 17, 255, 3, 128, 64, 1]
        |v = bits([(7, 3)] + [(t, 8) for t in data])
        |assert minih5.szip_decompress(v, 8, 8, 8, 8, EC) == data
        |
        |# 4. zero-block ROS: 64 zeros = 8 blocks to the line end; code
        |# is '000' + '0' + FS(4) = 9 bits 000000001 + 7 pad bits
        |v = bits([(0, 3), (0, 1), (1, 5)])
        |assert v == bytes([0x00, 0x80]), v.hex()
        |assert minih5.szip_decompress(v, 64, 8, 8, 64, EC) == [0] * 64
        |
        |# 5. zero-block literal run of 3 blocks then a '001' FS block:
        |# runs 1..4 encode as FS(run-1)
        |v = bits([(0, 3), (0, 1), (1, 3),            # 3 zero blocks
        |          (1, 3)] + [(1, t + 1) for t in [5, 0, 0, 0]])
        |assert minih5.szip_decompress(v, 16, 8, 4, 64, EC) == \
        |    [0] * 12 + [5, 0, 0, 0]
        |
        |# 6. second extension, 8-bit, J=8: pairs (0,1),(1,0),(2,2),(0,0)
        |# -> ms=a+b, m=ms(ms+1)/2+b = 2, 1, 12, 0; ID '000'+'1'
        |v = bits([(0, 3), (1, 1), (1, 3), (1, 2), (1, 13), (1, 1)])
        |assert v == bytes([0b00010010, 0b10000000, 0b00000110]), v.hex()
        |assert minih5.szip_decompress(v, 8, 8, 8, 8, EC) == \
        |    [0, 1, 1, 0, 2, 2, 0, 0]
        |
        |# 7. NN: raw reference then mapped residuals, split k=1.
        |# data 100,101,99,100,100,102,98,100 -> residuals delta
        |# +1,-2,+1,0,+2,-4,+2 -> mapped 2,3,2,0,4,7,4 (2d / 2|d|-1)
        |body = [2, 3, 2, 0, 4, 7, 4]
        |v = bits([(2, 3), (100, 8)] +
        |         [(1, (t >> 1) + 1) for t in body] +
        |         [(t & 1, 1) for t in body])
        |assert minih5.szip_decompress(v, 8, 8, 8, 8, NN) == \
        |    [100, 101, 99, 100, 100, 102, 98, 100]
        |
        |# 8. NN out-of-band residual: p=2 (theta=2), m=5 > 2*theta
        |# -> |d| = m - theta = 3, sign positive (theta == p): x = 5.
        |# line = [2, 5, ...] with J=4: ref 2 then mapped 5, 0, 0
        |v = bits([(1, 3), (2, 8), (1, 6), (1, 1), (1, 1)])
        |assert minih5.szip_decompress(v, 4, 8, 4, 4, NN) == [2, 5, 5, 5]
        |
        |# 9. 16-bit option ids are 4 bits wide: k=0 block [5,1,1,1]
        |v = bits([(1, 4)] + [(1, t + 1) for t in [5, 1, 1, 1]])
        |assert minih5.szip_decompress(v, 4, 16, 4, 4, EC) == [5, 1, 1, 1]
        |
        |# 10. truncation fails loudly, never garbles
        |try:
        |    minih5.szip_decompress(b'\x20', 8, 8, 8, 8, EC)
        |    assert False, 'should have thrown'
        |except minih5.Mini5Error as e:
        |    assert 'overrun' in str(e)
        |print('GOLDEN_OK')
        |""".stripMargin
    runPy(py, "GOLDEN_OK")
  }

  test("round-trip across all option paths + fixture determinism") {
    val py =
      """import sys, random
        |sys.path.insert(0, '/root/repo/tools')
        |import minih5
        |from gen_h5ad_fixture import szip_compress, main as gen
        |NN = 1 | 16 | 32 | 128
        |EC = 1 | 16 | 4 | 128
        |random.seed(11)
        |def rt(data, bpp, ppb, pps, opts, what):
        |    enc = szip_compress(data, bpp, ppb, pps, opts)
        |    dec = minih5.szip_decompress(enc, len(data), bpp, ppb,
        |                                 pps, opts)
        |    assert dec == list(data), what
        |    return len(enc)
        |for bpp in (8, 16, 32):
        |    nmax = (1 << bpp) - 1
        |    for ppb, pps in ((8, 64), (16, 128), (8, 30), (16, 16)):
        |        for opts in (NN, EC):
        |            rt([(i * 3) % nmax for i in range(300)],
        |               bpp, ppb, pps, opts, 'ramp')
        |            rt([random.randrange(nmax + 1) for _ in range(300)],
        |               bpp, ppb, pps, opts, 'noise')
        |            rt([min(42, nmax)] * 300, bpp, ppb, pps, opts, 'const')
        |            rt([0] * 300, bpp, ppb, pps, opts, 'zeros')
        |            rt([0] * 100 + [nmax] * 100 + [nmax // 2] * 100,
        |               bpp, ppb, pps, opts, 'steps')
        |            rt([random.randrange(nmax + 1)
        |                for _ in range(pps + 3)],
        |               bpp, ppb, pps, opts, 'tail')
        |            rt([random.randrange(nmax + 1)], bpp, ppb, pps,
        |               opts, 'tiny')
        |# ROS across >64-block segments + a run broken at the boundary
        |rt([0] * 5000, 8, 8, 4096, NN, 'long-zero')
        |rt([0] * 512 + [255] + [0] * 511, 8, 8, 2048, EC, 'seg-boundary')
        |# smooth data actually compresses
        |n = rt([2000 + (i % 7) for i in range(4096)], 16, 16, 256, NN,
        |       'smooth')
        |assert n < 4096 * 2 // 3, n
        |# k13 restriction honored
        |rt([random.randrange(65536) for _ in range(500)], 16, 16, 128,
        |   16 | 32 | 128, 'no-k13')
        |# fixture determinism: regeneration reproduces every committed
        |# plate byte-for-byte, szip plate included
        |import tempfile, os, filecmp
        |tmp = tempfile.mkdtemp()
        |gen(tmp)
        |for f in ['plate0.h5ad', 'plate1.h5ad', 'plate2.h5ad',
        |          'plate3.h5ad', 'lzf/plate_lzf.h5ad',
        |          'szip/plate_szip.h5ad']:
        |    assert filecmp.cmp(os.path.join(tmp, f),
        |        os.path.join('/root/repo/tools/fixtures', f),
        |        shallow=False), f
        |print('SZIP_OK')
        |""".stripMargin
    runPy(py, "SZIP_OK")
  }

  test("szip-compressed .h5ad converts through the real HDF5 branch") {
    import scala.sys.process._
    val out = java.nio.file.Files.createTempDirectory("graft-h5ad-szip")
      .toFile
    val rc = Seq("python3", s"$repo/tools/h5ad_to_parquet.py",
      s"$repo/tools/fixtures/szip", out.toString).!
    assert(rc == 0, "szip conversion must succeed without h5py")
    val byId = spark.read.parquet(s"$out/cells.parquet")
      .select(col("cell_id"), col("genes"), col("expressions"),
        col("cell_type"), col("n_counts"))
      .as[(Long, Seq[Int], Seq[Float], String, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(byId.size == 4)
    assert(byId(0L)._2 == Seq(0, 1, 2, 3, 4, 5) &&
      byId(0L)._3 == Seq(1.0f, 1.0f, 1.0f, 1.0f, 2.0f, 2.0f))
    assert(byId(1L)._2 == Seq(6, 7, 8, 9, 10, 11) &&
      byId(1L)._3 == Seq(2.0f, 2.0f, 3.0f, 3.0f, 3.0f, 3.0f))
    assert(byId(2L)._2 == Seq(0, 2, 4, 6, 8, 10) &&
      byId(2L)._3 == Seq(0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f))
    assert(byId(3L)._2 == Seq(1, 3, 5, 7, 9, 11) &&
      byId(3L)._3 == Seq(4.25f, 4.25f, 4.25f, 4.25f, 4.25f, 8.5f))
    assert(byId.view.mapValues(_._4).toMap ==
      Map(0L -> "NK", 1L -> "T", 2L -> "B", 3L -> "T"))
    assert(byId(3L)._5 == 25.75)
  }
}
