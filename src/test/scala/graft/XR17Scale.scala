package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): 10× scale probes for the round-17 graph/codec
  * work — the real-codec decode sweep, the banded near-dup pair graph,
  * k-core over it on BOTH plan paths (driver gate + forced distributed,
  * equality asserted), and the lossy JPEG sweep with its tolerance gauge.
  * Run:  sbt 'Test/runMain graft.XR17Scale [nDocs]'
  * (defaults to 50 000 docs = 10× the sf0.1 documents table). */
object XR17Scale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{GraphOps, ImageCodec, JpegCodec, MultimodalOps}

    // synthetic printable texts; ids < cliqueN share ONE text, so their
    // rasters are identical → a planted hamming-0 clique the k-core must
    // recover exactly
    val cliqueN = 60
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      md5(concat(lit("p"),
        when(col("id") < cliqueN, lit(-1L)).otherwise(col("id"))
          .cast("string"))).as("text"))

    // 1) real-codec decode sweep (BMP even / PPM odd — the nearDupPairs
    //    derivation shape) at per-doc granularity
    val toImg = udf((id: Long, text: String) =>
      ImageCodec.grayFromBytes(8, 8, MultimodalOps.asciiBytes(text),
        id % 2 == 1))
    var t0 = System.nanoTime()
    val decoded = MultimodalOps.decodeWith(
      docs.withColumn("payload", toImg(col("doc_id"), col("text"))),
      col("payload"), col("doc_id"), ImageCodec.kernel(8, 8)).toDF()
      .persist()
    val nDec = decoded.count()
    val tDecode = (System.nanoTime() - t0) / 1e9
    require(nDec == nDocs)

    // 2) banded aHash pairs — 64-bit hashes (kernel 8×8) so accidental
    //    hamming ≤ 3 collisions stay rare at 10× and the pair count is
    //    clique-dominated, the realistic near-dup density at scale
    t0 = System.nanoTime()
    val pairs = MultimodalOps.aHashBandedPairs(decoded, col("doc_id"),
      bits = 64, bands = 8, maxHamming = 3).persist()
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    require(nPairs >= cliqueN.toLong * (cliqueN - 1) / 2,
      s"planted clique pairs missing: $nPairs")

    // 3) k-core on both plan paths; k = half the planted clique degree
    val k = cliqueN / 2
    t0 = System.nanoTime()
    val coreDriver = GraphOps.kCore(pairs, col("doc_a"), col("doc_b"), k,
      maxRounds = 16).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val tDriver = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val coreDist = GraphOps.kCore(pairs, col("doc_a"), col("doc_b"), k,
      maxRounds = 16, maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val tDist = (System.nanoTime() - t0) / 1e9
    require(coreDriver == coreDist, "kCore plan paths diverge at 10×")
    require((0L until cliqueN.toLong).forall(coreDriver.contains),
      "planted clique not in the k-core")

    // 4) lossy JPEG sweep + tolerance gauge over every doc
    val errUdf = udf((text: String) => {
      val src = MultimodalOps.asciiBytes(text)
      val r = JpegCodec.decode(JpegCodec.grayJpeg(8, 8, src, 90))
      (0 until 64).map(j => math.abs(r.lumaSum3(j) / 3 -
        (src(j % src.length) & 0xff))).max
    })
    t0 = System.nanoTime()
    val maxErr = docs.select(max(errUdf(col("text")))).head().getInt(0)
    val tJpeg = (System.nanoTime() - t0) / 1e9
    require(maxErr <= 32, s"JPEG gauge bound violated at 10×: $maxErr")

    // 5) 4:2:0 color sweep — the heaviest codec path (6 blocks/MCU +
    //    YCbCr both ways + chroma resampling) with its own gauge
    val err420 = udf((text: String) => {
      val src = MultimodalOps.asciiBytes(text)
      val rgb = (x: Int, y: Int) => {
        val j = y * 8 + x
        (src(j % src.length) & 0xff, (src((j + 13) % src.length) & 0xff),
          src((j + 29) % src.length) & 0xff)
      }
      val r = JpegCodec.decode(JpegCodec.encodeColor420(8, 8, rgb, 90))
      (0 until 64).map { j =>
        val (a, b2, c) = rgb(j % 8, j / 8)
        math.abs(r.lumaSum3(j) - (a + b2 + c))
      }.max
    })
    t0 = System.nanoTime()
    val max420 = docs.select(max(err420(col("text")))).head().getInt(0)
    val t420 = (System.nanoTime() - t0) / 1e9
    require(max420 <= 160, s"4:2:0 gauge bound violated at 10×: $max420")

    println(f"PROBE nDocs=$nDocs decode=$tDecode%.1fs pairs=$nPairs" +
      f" tPairs=$tPairs%.1fs kcoreDriver=$tDriver%.1fs" +
      f" kcoreDist=$tDist%.1fs coreSize=${coreDriver.size}" +
      f" jpegSweep=$tJpeg%.1fs jpegMaxErr=$maxErr" +
      f" jpeg420Sweep=$t420%.1fs jpeg420MaxErr=$max420")
    spark.stop()
  }
}
