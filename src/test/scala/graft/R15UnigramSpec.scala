package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Round-15: unigram-LM tokenizer (SentencePiece-style hard EM) —
  * learns multi-char pieces, tokenizes losslessly and deterministically,
  * local and distributed training agree, pruning respects coverage. */
class R15UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "abab abab ab ba", "ab abab ba ba", "abc abab ab").toDF("text")

  test("EM learns the dominant multi-char piece; tokenization is the " +
      "Viterbi segmentation and concatenates back to the word") {
    val vocab = TextOps.unigramTrain(corpus, col("text"), vocabSize = 8,
      maxPieceLen = 4, emIters = 3)
    val m = vocab.toMap
    assert(m.contains("ab"), s"'ab' dominates this corpus: $vocab")
    assert(m("ab") > m("a") && m("ab") > m("b"),
      "the learned piece must outweigh its characters")
    val toks = TextOps.unigramTokens(corpus, col("text"),
      monotonically_increasing_id(), vocab, maxPieceLen = 4)
      .select(concat_ws(" ", col("tokens")).as("t"))
      .as[String].collect().toSet
    // every word rebuilds exactly from its pieces
    val rebuilt = toks.flatMap(_.split(" "))
    assert(rebuilt.forall(p => p.nonEmpty))
    val joined = TextOps.unigramTokens(corpus, col("text"),
      monotonically_increasing_id(), vocab, maxPieceLen = 4)
      .select(concat_ws("", col("tokens")).as("r")).as[String]
      .collect().sorted.toSeq
    val want = corpus.select(
      concat_ws("", filter(split(lower(col("text")), "\\s+"),
        t => t =!= lit(""))).as("r")).as[String].collect().sorted.toSeq
    assert(joined == want, "lossless round trip")
    // "abab" segments into 2 pieces (ab+ab) or 1 (abab), never 4 chars
    val seg = TextOps.unigramTokens(Seq("abab").toDF("text"), col("text"),
      lit(0L), vocab, maxPieceLen = 4)
      .select(size(col("tokens"))).as[Int].head()
    assert(seg <= 2, s"multi-char pieces must be used, got $seg tokens")
  }

  test("training is deterministic and the distributed path agrees with " +
      "the local path") {
    val a = TextOps.unigramTrain(corpus, col("text"), 8, 4, 3)
    val b = TextOps.unigramTrain(corpus, col("text"), 8, 4, 3)
    assert(a == b, "bit-stable across runs")
    val dist = TextOps.unigramTrain(corpus, col("text"), 8, 4, 3,
      maxDriverWords = 0L) // force the distributed EM path
    assert(a.map(_._1) == dist.map(_._1),
      s"local and distributed pieces agree: $a vs $dist")
    val eps = a.zip(dist).forall { case ((_, x), (_, y)) =>
      math.abs(x - y) < 1e-9 }
    assert(eps, "log-probs agree to fp tolerance")
  }

  test("supplementary-plane text is code-point safe: no piece ever " +
      "splits a surrogate pair, the round trip holds, and local == " +
      "distributed on an emoji corpus") {
    val emoji = Seq("😀😀ab 😀😀ab", "ab😀 😀😀", "𝔘𝔘x 𝔘𝔘x").toDF("text")
    val vocab = TextOps.unigramTrain(emoji, col("text"), vocabSize = 12,
      maxPieceLen = 3, emIters = 2)
    assert(vocab.forall { case (p, _) =>
      !p.exists(c => Character.isSurrogate(c)) ||
        p.codePoints().toArray.forall(Character.isValidCodePoint)
    })
    // every piece is whole code points: re-encoding round-trips
    assert(vocab.forall { case (p, _) =>
      new String(p.codePoints().toArray, 0,
        p.codePointCount(0, p.length)) == p })
    val rebuilt = TextOps.unigramTokens(emoji, col("text"),
      monotonically_increasing_id(), vocab, maxPieceLen = 3)
      .select(concat_ws("", col("tokens")).as("r")).as[String]
      .collect().sorted.toSeq
    val want = emoji.select(
      concat_ws("", filter(split(lower(col("text")), "\\s+"),
        t => t =!= lit(""))).as("r")).as[String].collect().sorted.toSeq
    assert(rebuilt == want, "lossless on non-BMP input")
    val dist = TextOps.unigramTrain(emoji, col("text"), 12, 3, 2,
      maxDriverWords = 0L)
    assert(vocab.map(_._1) == dist.map(_._1),
      "local and distributed agree on code-point segmentation")
  }

  test("unseen characters tokenize as single-char pieces (lossless on " +
      "any input); pruning keeps all single chars") {
    val vocab = TextOps.unigramTrain(corpus, col("text"), 8, 4, 2)
    val out = TextOps.unigramTokens(Seq("zq abab").toDF("text"),
      col("text"), lit(0L), vocab, maxPieceLen = 4)
      .select(col("tokens")).as[Seq[String]].head()
    assert(out.take(2) == Seq("z", "q"), s"unseen chars pass through: $out")
    assert(out.mkString("") == "zqabab")
    val chars = corpus.as[String].collect()
      .flatMap(_.toLowerCase.replaceAll("\\s", "")).toSet
    assert(chars.forall(c => vocab.exists(_._1 == c.toString)),
      "every training character survives pruning (coverage)")
  }
}
