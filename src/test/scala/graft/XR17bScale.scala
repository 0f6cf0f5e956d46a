package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): 10× scale probes for the round-17b container
  * tiers — TIFF (LZW + predictor), FLAC (Rice-coded frames, MD5
  * verified per doc), the interlaced PNG/GIF paths, and the ADPCM
  * gauge.  Lossless tiers assert BIT-EXACT round trips on every doc;
  * the lossy tier asserts its gauge bound.
  * Run:  sbt 'Test/runMain graft.XR17bScale [nDocs]' (default 50 000 =
  * 10× the sf0.1 documents table). */
object XR17bScale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{AudioCodec, FlacCodec, ImageCodec, MultimodalOps,
      TiffCodec}

    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      md5(concat(lit("q"), col("id").cast("string"))).as("text"))

    def sweep(name: String, f: (Long, String) => Boolean): Double = {
      val ok = udf(f)
      val t0 = System.nanoTime()
      val bad = docs.filter(!ok(col("doc_id"), col("text"))).count()
      val t = (System.nanoTime() - t0) / 1e9
      require(bad == 0, s"$name: $bad docs failed at 10×")
      t
    }

    // 1) TIFF: LZW + predictor round trip, byte order by parity
    val tTiff = sweep("tiff", (id, text) => {
      val src = MultimodalOps.asciiBytes(text)
      val bytes = TiffCodec.grayTiff(8, 8, src, compression = 5,
        predictor = if (id % 2 == 0) 2 else 1, bigEndian = id % 2 == 1)
      val r = ImageCodec.decode(bytes)
      (0 until 64).forall(j =>
        r.lumaSum3(j) == 3 * (src(j % src.length) & 0xff))
    })

    // 2) FLAC: Rice-coded frames, per-doc MD5 verify inside decode
    val tFlac = sweep("flac", (_, text) => {
      val src = MultimodalOps.asciiBytes(text)
      val (_, dec) = FlacCodec.decode(
        FlacCodec.flacFromBytes(16000, 256, src))
      (0 until 256).forall(i =>
        dec(i) == ((src((i * 7 + 3) % src.length) & 0xff) - 76) * 256)
    })

    // 3) interlaced containers: Adam7 PNG + 4-pass GIF w/ local tables
    val tInterlace = sweep("interlace", (id, text) => {
      val src = MultimodalOps.asciiBytes(text)
      val png = ImageCodec.decode(ImageCodec.grayPng(8, 8, src,
        colorType = (id % 2).toInt * 2, filter = (id % 5).toInt,
        interlace = true))
      val gif = ImageCodec.decode(ImageCodec.encodeGif(8, 8,
        (x, y) => src((y * 8 + x) % src.length) & 0xff,
        interlace = true, localTable = id % 2 == 0))
      (0 until 64).forall { j =>
        val v = 3 * (src(j % src.length) & 0xff)
        png.lumaSum3(j) == v && gif.lumaSum3(j) == v
      }
    })

    // 4) ADPCM gauge at 10×: slew bound + exact block anchor
    val tAdpcm = sweep("adpcm", (_, text) => {
      val src = MultimodalOps.asciiBytes(text)
      val sig = Array.tabulate(256)(i =>
        (((src((i * 7 + 3) % src.length) & 0xff) - 76) * 256).toShort)
      val (_, dec) = AudioCodec.decodeWav(
        AudioCodec.encodeWavAdpcm(16000, sig))
      dec(0) == sig(0) &&
        sig.indices.forall(i => math.abs(dec(i) - sig(i)) <= 24576)
    })

    println(f"PROBE nDocs=$nDocs tiffLzw=$tTiff%.1fs flac=$tFlac%.1fs" +
      f" interlace=$tInterlace%.1fs adpcm=$tAdpcm%.1fs  (all checks" +
      " exact/bounded on every doc)")
    spark.stop()
  }
}
