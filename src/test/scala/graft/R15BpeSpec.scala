package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.CacheScope
import graft.ops.TextOps

/** Round-15: the driver-gated BPE merge loop — incremental local merges
  * must reproduce the distributed per-round argmax merge-for-merge. */
class R15BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("local incremental merge loop == distributed loop, merge-for-merge, " +
      "on a corpus with overlapping/repeating pairs and count ties") {
    // stresses the incremental update paths: repeated chars (overlapping
    // occurrences of (l,l)), words sharing prefixes/suffixes (one merge
    // shifts many pair counts), ties broken lexicographically, and
    // exhaustion behaviour
    val corpus = Seq(
      (1L, "banana bandana aaa aaaa cabana"),
      (2L, "low lower lowest newest widest west"),
      (3L, "mississippi missive permission aaa banana"),
      (4L, "abcabcabc zzz zzzz abab")).toDF("doc_id", "text")
    val local = TextOps.bpeTrain(corpus, col("text"), numMerges = 60)
    CacheScope.release()
    val dist = TextOps.bpeTrain(corpus, col("text"), numMerges = 60,
      maxDriverWords = 0L)
    CacheScope.release()
    assert(local == dist,
      s"first divergence at ${local.zip(dist).indexWhere(p => p._1 != p._2)}")
    // both exhaust at the same point (every word fully merged)
    assert(local.length == dist.length)
  }

  test("supplementary characters: code-point symbols keep local == " +
      "distributed (a charAt split would corrupt surrogates to '?' on " +
      "the distributed side only)") {
    // U+1F600 GRINNING FACE and U+10348 GOTHIC HWAIR — both outside the
    // BMP, interleaved with ASCII and repeated for real pair pressure
    val smile = new String(Character.toChars(0x1F600))
    val hwair = new String(Character.toChars(0x10348))
    val corpus = Seq(
      (1L, s"$smile$smile a$smile b$hwair$hwair $smile$hwair"),
      (2L, s"ab$smile ab$smile ba$hwair $smile$smile$smile"))
      .toDF("doc_id", "text")
    val local = TextOps.bpeTrain(corpus, col("text"), numMerges = 10)
    CacheScope.release()
    val dist = TextOps.bpeTrain(corpus, col("text"), numMerges = 10,
      maxDriverWords = 0L)
    CacheScope.release()
    assert(local == dist, s"local $local vs distributed $dist")
    assert(local.exists(m => m._1.contains(smile) || m._2.contains(smile)),
      "the emoji participates in learned merges as a WHOLE code point")
    // and the tokenizer applies them losslessly
    val toks = TextOps.bpeTokens(
      Seq((9L, s"$smile$smile")).toDF("doc_id", "text"),
      col("text"), col("doc_id"), local)
      .as[(Long, Seq[String])].collect().head._2
    assert(toks.mkString == s"$smile$smile", "no surrogate corruption")
  }

  test("the classic fixture's hand-computed merges come out of the LOCAL " +
      "path (the small-vocabulary default regime)") {
    val corpus = Seq(
      (1L, "low low low newest newest"),
      (2L, "lower lower newest newest widest")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(corpus, col("text"), numMerges = 3)
    CacheScope.release()
    assert(merges == Seq(("w", "e"), ("l", "o"), ("s", "t")))
  }

  test("1000+ merges train in seconds on a synthetic vocabulary") {
    // ~6000 distinct pseudo-words — enough pair supply for >1000 merges
    val corpus = spark.range(6000L)
      .select(col("id").as("doc_id"),
        concat_ws("", shuffleFree(col("id"))).as("text"))
    val t0 = System.nanoTime()
    val merges = TextOps.bpeTrain(corpus, col("text"), numMerges = 1200)
    val sec = (System.nanoTime() - t0) / 1e9
    CacheScope.release()
    assert(merges.length == 1200, s"pair supply exhausted at ${merges.length}")
    assert(sec < 60.0, f"local merge loop took $sec%.1f s for 1200 merges")
    info(f"1200 merges in $sec%.1f s")
  }

  // deterministic pseudo-word: 12 hash-derived lowercase letters
  private def shuffleFree(id: org.apache.spark.sql.Column) =
    array((0 until 12).map(j =>
      chr(pmod(hash(id, lit(j)), lit(26)) + 97)): _*)
}
