package graft
object XProbe {
  def main(args: Array[String]): Unit = {
    val f = (x: Int, y: Int) => (x * 37 + y * 91 + 13) % 256
    val b = graft.ops.ImageCodec.encodeGif(9, 7, f)
    println("PROBE len=" + b.length)
    // locate LZW payload: 6 sig + 7 LSD + 768 table + 10 img desc + 1 mincode
    var p = 6 + 7 + 768 + 10
    println("PROBE mincode=" + (b(p) & 0xff)); p += 1
    val z = new java.io.ByteArrayOutputStream
    while ((b(p) & 0xff) != 0) { val n = b(p) & 0xff; z.write(b, p + 1, n); p += 1 + n }
    val d = z.toByteArray
    println("PROBE zlen=" + d.length)
    var acc = 0L; var nAcc = 0; var dp = 0; var width = 9
    val codes = scala.collection.mutable.ArrayBuffer[Int]()
    var guard = 0
    while (dp < d.length + 2 && guard < 80) {
      while (nAcc < width && dp < d.length) { acc |= (d(dp) & 0xff).toLong << nAcc; nAcc += 8; dp += 1 }
      if (nAcc < width) { guard = 100 }
      else {
        val c = (acc & ((1L << width) - 1)).toInt; acc >>= width; nAcc -= width
        codes += c
        guard += 1
        if (c == 257) guard = 100
      }
    }
    println("PROBE codes=" + codes.take(70).mkString(","))
    println("PROBE pixels=" + (0 until 10).map(i => f(i % 9, i / 9)).mkString(","))
  }
}
