package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NumPy `.npy` / memmap-directory ingestion — the third reference format
  * adapter (reference src/scdataset/transforms.py:267-302 BioNeMo SCDL
  * path: a directory of memory-mapped arrays holding a CSR matrix).
  *
  * A `.npy` file is a 10-byte magic/version prefix, an ASCII header dict
  * (`descr`, `fortran_order`, `shape`), then the raw C-order array bytes —
  * which is exactly a memmap with a header.  The reader is DISTRIBUTED:
  * the driver parses the tiny header, splits the row range into slices,
  * and each task seeks into its own byte range through the Hadoop
  * filesystem — no single-node materialization, the same access pattern
  * the reference's memmap fetch does per index window, expressed as a
  * parallel scan.  Works on any FS Spark can reach (file:, hdfs:, s3a:).
  *
  * Supported dtypes: little-endian int32/int64/float32/float64, 1-D or
  * 2-D C-order (the shapes scientific memmaps actually use).
  */
object NpySource {

  final case class NpyHeader(descr: String, rows: Long, cols: Int,
      dataOffset: Long) {
    def elemBytes: Int = descr match {
      case "<i4" | "<f4" => 4
      case "<i8" | "<f8" => 8
      case d => throw new IllegalArgumentException(s"unsupported dtype $d")
    }
  }

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parse the npy header (driver-side, O(100) bytes). */
  def header(spark: SparkSession, path: String): NpyHeader = {
    val in = fs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    try {
      val magic = new Array[Byte](8)
      in.readFully(0L, magic)
      require(magic.take(6).sameElements(
        Array(0x93.toByte) ++ "NUMPY".getBytes("ASCII")),
        s"$path is not a .npy file")
      val major = magic(6)
      val (hdrLen, hdrStart) =
        if (major == 1) {
          val b = new Array[Byte](2); in.readFully(8L, b)
          (((b(1) & 0xff) << 8 | (b(0) & 0xff)).toLong, 10L)
        } else {
          val b = new Array[Byte](4); in.readFully(8L, b)
          (((b(3) & 0xffL) << 24) | ((b(2) & 0xffL) << 16) |
            ((b(1) & 0xffL) << 8) | (b(0) & 0xffL), 12L)
        }
      val hb = new Array[Byte](hdrLen.toInt)
      in.readFully(hdrStart, hb)
      val h = new String(hb, "ASCII")
      val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(h)
        .map(_.group(1)).getOrElse(sys.error(s"no descr in $h"))
      require(!"'fortran_order':\\s*True".r.findFirstIn(h).isDefined,
        s"$path is Fortran-order; C-order required")
      val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(h)
        .map(_.group(1)).getOrElse(sys.error(s"no shape in $h"))
      val dims = shape.split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toLong)
      val (rows, cols) = dims match {
        case Array(n) => (n, 1)
        case Array(n, d) => (n, d.toInt)
        case _ => sys.error(s"unsupported ndim ${dims.length} in $path")
      }
      NpyHeader(descr, rows, cols, hdrStart + hdrLen)
    } finally in.close()
  }

  /** Distributed element read: one task per row slice, each seeking its
    * own byte range.  1-D → (row_id, value); 2-D → (row_id, values
    * array).  Values surface as double (lossless for i4/f4/f8; i8 via
    * [[readLongs]] when exactness past 2^53 matters). */
  def readNpy(spark: SparkSession, path: String,
      slices: Int = 0): DataFrame = {
    val h = header(spark, path)
    val n = if (slices > 0) slices
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val (descr, rows, cols, off) = (h.descr, h.rows, h.cols, h.dataOffset)
    val eb = h.elemBytes
    val rdd = spark.sparkContext.parallelize(0 until n, n).flatMap { i =>
      val lo = rows * i / n
      val hi = rows * (i + 1) / n
      if (hi <= lo) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(path)
        val in = p.getFileSystem(conf.value).open(p)
        val bytes = new Array[Byte]((hi - lo) * cols * eb match {
          // VM array limit is Int.MaxValue - 2; stay safely under it
          case sz if sz <= Int.MaxValue - 8 => sz.toInt
          case _ => sys.error("slice too large; raise slices")
        })
        in.readFully(off + lo * cols * eb, bytes)
        in.close()
        val buf = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (lo until hi).iterator.map { r =>
          val base = ((r - lo) * cols * eb).toInt
          val vals = Array.tabulate(cols) { c =>
            descr match {
              case "<i4" => buf.getInt(base + c * eb).toDouble
              case "<i8" => buf.getLong(base + c * eb).toDouble
              case "<f4" => buf.getFloat(base + c * eb).toDouble
              case "<f8" => buf.getDouble(base + c * eb)
            }
          }
          (r, vals)
        }
      }
    }
    import spark.implicits._
    if (cols == 1)
      rdd.map { case (r, v) => (r, v(0)) }.toDF("row_id", "value")
    else rdd.toDF("row_id", "values")
  }

  /** Exact long read of a 1-D `<i8` array (indptr / offsets). */
  def readLongs(spark: SparkSession, path: String): Array[Long] = {
    val h = header(spark, path)
    require(h.descr == "<i8" && h.cols == 1, s"expected 1-D <i8: $h")
    require(h.rows <= 100000000L, "indptr too large for a driver read")
    val in = fs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    val bytes = new Array[Byte]((h.rows * 8).toInt)
    in.readFully(h.dataOffset, bytes)
    in.close()
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(h.rows.toInt)(i => buf.getLong(i * 8))
  }

  /** A CSR memmap DIRECTORY (`data.npy` + `indices.npy` + `indptr.npy` —
    * the BioNeMo SCDL layout) → the SAME per-cell schema as the h5ad
    * converter: (cell_id, genes int32 asc, expressions float).  The
    * driver reads only indptr (one long per row); each task slices its
    * own byte ranges of data/indices — the distributed form of the
    * reference's per-window memmap fetch. */
  def readCsrDir(spark: SparkSession, dir: String,
      slices: Int = 0): DataFrame = {
    val indptr = readLongs(spark, s"$dir/indptr.npy")
    val rows = indptr.length - 1
    val hIdx = header(spark, s"$dir/indices.npy")
    val hDat = header(spark, s"$dir/data.npy")
    require(hIdx.cols == 1 && hDat.cols == 1, "indices/data must be 1-D")
    // fail at the DRIVER with a clear message, not a MatchError in a task
    require(hIdx.descr == "<i4" || hIdx.descr == "<i8",
      s"indices dtype ${hIdx.descr}: integer (<i4/<i8) required")
    require(Set("<f4", "<f8", "<i4", "<i8").contains(hDat.descr),
      s"data dtype ${hDat.descr}: <f4/<f8/<i4/<i8 required")
    val n = if (slices > 0) slices
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bIndptr = spark.sparkContext.broadcast(indptr)
    val (idxPath, datPath) = (s"$dir/indices.npy", s"$dir/data.npy")
    val (idxDescr, idxOff, idxEb) = (hIdx.descr, hIdx.dataOffset, hIdx.elemBytes)
    val (datDescr, datOff, datEb) = (hDat.descr, hDat.dataOffset, hDat.elemBytes)
    val rdd = spark.sparkContext.parallelize(0 until n, n).flatMap { i =>
      val ptr = bIndptr.value
      val lo = rows.toLong * i / n
      val hi = rows.toLong * (i + 1) / n
      if (hi <= lo) Iterator.empty
      else {
        val e0 = ptr(lo.toInt); val e1 = ptr(hi.toInt)
        def slurp(path: String, off: Long, eb: Int): java.nio.ByteBuffer = {
          val sz = (e1 - e0) * eb
          // a wrapped .toInt would allocate a too-small array and read
          // garbage offsets — refuse loudly instead (same guard as
          // readNpy); dense CSR slices at BioNeMo scale need more slices
          // VM array limit is Int.MaxValue - 2; stay safely under it
          require(sz <= Int.MaxValue - 8,
            s"CSR slice of $sz bytes exceeds the 2 GiB array limit; raise slices " +
              s"(nonzeros are skewed across rows or slices=$n is too low)")
          val p = new org.apache.hadoop.fs.Path(path)
          val in = p.getFileSystem(conf.value).open(p)
          val bytes = new Array[Byte](sz.toInt)
          in.readFully(off + e0 * eb, bytes)
          in.close()
          java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        }
        val ib = slurp(idxPath, idxOff, idxEb)
        val db = slurp(datPath, datOff, datEb)
        def idxAt(e: Long): Int = idxDescr match {
          case "<i4" => ib.getInt(((e - e0) * idxEb).toInt)
          // a gene index above 2^31 has no valid Int form — fail loudly
          // (matches the driver-side dtype/size guards) instead of
          // wrapping to a garbage/negative gene id
          case "<i8" => Math.toIntExact(ib.getLong(((e - e0) * idxEb).toInt))
        }
        def datAt(e: Long): Float = datDescr match {
          case "<f4" => db.getFloat(((e - e0) * datEb).toInt)
          case "<f8" => db.getDouble(((e - e0) * datEb).toInt).toFloat
          case "<i4" => db.getInt(((e - e0) * datEb).toInt).toFloat
          case "<i8" => db.getLong(((e - e0) * datEb).toInt).toFloat
        }
        (lo until hi).iterator.map { r =>
          val s = ptr(r.toInt); val e = ptr(r.toInt + 1)
          (r, (s until e).map(idxAt).toArray, (s until e).map(datAt).toArray)
        }
      }
    }
    import spark.implicits._
    rdd.toDF("cell_id", "genes", "expressions")
  }
}
