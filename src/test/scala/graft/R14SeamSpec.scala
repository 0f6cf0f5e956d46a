package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaFeatures

/** The media codec seam: a swapped decode kernel flows through
  * decode → aHash → banded near-dup with zero changes downstream. */
class R14SeamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a plausible "real" kernel: reads the payload bytes themselves as the
  // grid (what an actual decoder does), not a digest of them
  private val byteKernel: MultimodalOps.DecodeKernel = (id, bytes) => {
    val dim = 16 // fill all 16 aHash bits the banded tier blocks on
    MediaFeatures(id, bytes.length.toLong, width = 32, height = 32,
      features = Array.tabulate(dim) { j =>
        (bytes(j % math.max(1, bytes.length)) & 0xff) / 255.0 })
  }

  private def fixture() = {
    // docs 1 and 2 carry IDENTICAL payloads (a re-uploaded image); 3 is
    // one byte off (near-dup); 4 is unrelated
    Seq((1L, "the-same-image-bytes-0123456789"),
        (2L, "the-same-image-bytes-0123456789"),
        (3L, "the-same-image-bytes-012345678X"),
        (4L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"))
      .toDF("doc_id", "txt")
      .withColumn("payload", col("txt").cast("binary"))
  }

  test("a swapped kernel flows through decode -> aHash -> near-dup " +
      "unchanged: same schema, same duplicate detection on equal payloads") {
    val df = fixture()
    val viaStub = MultimodalOps.stubDecode(df, col("payload"), col("doc_id"))
    val viaByte = MultimodalOps.decodeWith(df, col("payload"), col("doc_id"),
      byteKernel)
    // identical record schema out of either kernel — downstream consumers
    // cannot tell which codec ran
    assert(viaStub.schema == viaByte.schema)
    // the duplicate payload pair (1,2) is found under BOTH kernels: any
    // deterministic kernel maps equal bytes to equal features, so the
    // aHash bucket join finds the re-upload regardless of codec
    def dupPairs(d: org.apache.spark.sql.Dataset[MediaFeatures]) =
      MultimodalOps.aHashPairs(d.toDF(), col("doc_id"))
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(dupPairs(viaStub).contains((1L, 2L)))
    assert(dupPairs(viaByte).contains((1L, 2L)))
    // the banded Hamming tier runs on the swapped kernel too, and under
    // the byte kernel the one-byte-off payload is a near-dup (features
    // differ in at most one grid cell => Hamming <= 3 over 16 bits)
    val banded = MultimodalOps.aHashBandedPairs(viaByte.toDF(),
      col("doc_id")).select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    assert(banded.contains((1L, 2L)))
    assert(!banded.contains((1L, 4L)) && !banded.contains((2L, 4L)),
      "unrelated payloads must not pair")
    // resize consumes either kernel's record shape
    val resized = MultimodalOps.stubResize(viaByte.toDF(), 16, 16, 4)
    assert(resized.select(size(col("features"))).distinct().head().getInt(0) == 4)
    graft.core.CacheScope.release()
  }
}
