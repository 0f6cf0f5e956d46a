package graft

import org.apache.spark.sql.SparkSession
import graft.ops.{ImageCodec, JpegCodec, MultimodalOps}

/** Gauge-bound probe for the r17b lossy containers: measures the CORPUS
  * MAX per-pixel channel-sum error of the 4:2:2 / 4:1:1 JPEG containers
  * over every document at each SF — the number the tolerance-gauge
  * oracle bounds must exceed with honest headroom.
  * Run: sbt 'Test/runMain graft.XJpegGauge' */
object XJpegGauge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val texts = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select("text").as[String].collect()
      def maxErr(mk: Array[Byte] => Array[Byte]): Int =
        texts.map { t =>
          val src = MultimodalOps.asciiBytes(t)
          val bytes = mk(src)
          val r = JpegCodec.decode(bytes)
          (0 until 64).map { j =>
            val expect = (src(j % src.length) & 0xff) +
              (src((j + 13) % src.length) & 0xff) +
              (src((j + 29) % src.length) & 0xff)
            math.abs(r.lumaSum3(j) - expect)
          }.max
        }.max
      val e422 = maxErr(s => JpegCodec.color422Jpeg(8, 8, s, quality = 90))
      val e411 = maxErr(s => JpegCodec.color411Jpeg(8, 8, s, quality = 90))
      println(s"GAUGE $sf n=${texts.length} 422maxErr=$e422 411maxErr=$e411")
      // audio: fixture signal sample i = (src[(i·7+3) mod len] − 76)·256
      def audioMaxErr(enc: Array[Short] => Array[Byte]): (Int, Int, Int) = {
        var mx = 0
        var warmMx = 0
        var anchorErr = 0
        texts.foreach { t =>
          val src = graft.ops.MultimodalOps.asciiBytes(t)
          val sig = Array.tabulate(256) { i =>
            ((src((i * 7 + 3) % src.length) & 0xff) - 76) * 256
          }.map(_.toShort)
          val (_, dec) = graft.ops.AudioCodec.decodeWav(enc(sig))
          require(dec.length == 256, s"decoded ${dec.length} samples")
          var i = 0
          while (i < 256) {
            val e = math.abs(dec(i) - sig(i))
            mx = math.max(mx, e)
            if (i >= 32) warmMx = math.max(warmMx, e)
            i += 1
          }
          anchorErr = math.max(anchorErr, math.abs(dec(0) - sig(0)))
        }
        (mx, warmMx, anchorErr)
      }
      val (eU, _, _) = audioMaxErr(s => graft.ops.AudioCodec.encodeWavUlaw(16000, s))
      val (eA, _, _) = audioMaxErr(s => graft.ops.AudioCodec.encodeWavAlaw(16000, s))
      val (eI, wI, aI) = audioMaxErr(s => graft.ops.AudioCodec.encodeWavAdpcm(16000, s))
      println(s"GAUGE $sf ulawMaxErr=$eU alawMaxErr=$eA adpcmMaxErr=$eI " +
        s"adpcmWarmMaxErr=$wI adpcmAnchorErr=$aI")
    }
    spark.stop()
  }
}
