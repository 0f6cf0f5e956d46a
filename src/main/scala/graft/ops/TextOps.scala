package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID heuristic, quality scoring, document
  * fingerprinting.  All are PER-ROW column expressions (no UDFs, no
  * shuffles): they run inside whole-stage codegen and scale linearly with
  * the scan — the only shuffle in any text pipeline built from these is the
  * one the caller adds (e.g. a groupBy for corpus stats).
  *
  * Every function is deterministic (no rand()) and mirrors to ANSI SQL for
  * the oracle-checked queries.
  */
object TextOps {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** Token count on a BPE-ish lexer regex: words / digit runs / single
    * punctuation, the cheap stand-in for subword token estimation. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word k-shingles joined by single spaces; a document shorter than k
    * tokens yields one shingle = the whole token string. */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Document fingerprint: minimum md5 over word-5-shingles (a MinHash with
    * a single hash function — the rolling-hash fingerprint analogue). */
  def fingerprint(text: Column): Column =
    array_min(transform(wordShingles(tokens(text), 5), s => md5(s)))

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "las", "una", "que", "por"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour"),
    "en" -> Seq("the", "and", "of", "is", "to", "in"))

  /** Number of tokens that are members of `set`. */
  def markerHits(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set: _*)))

  /** Heuristic language ID: marker-token hit counts per language, strict
    * argmax in fixed precedence order (de, es, fr), default "en".  The SQL
    * mirror uses the same CASE precedence, so prediction is deterministic
    * even on marker-free text. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val s = Markers.map { case (l, set) => l -> markerHits(t, set) }.toMap
    when(s("de") > s("en") && s("de") > s("es") && s("de") > s("fr"), "de")
      .when(s("es") > s("en") && s("es") > s("fr"), "es")
      .when(s("fr") > s("en"), "fr")
      .otherwise("en")
  }

  /** Count of sentence-punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  private val Stopwords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "for", "on")

  /** Corpus vocabulary: top-`k` tokens by frequency, rank-ordered with a
    * token tiebreak.  One explode + one hash aggregate with map-side
    * combine — the shuffle carries at most |vocab| rows per task, never the
    * token stream — then a driver-sized top-k (TakeOrdered, no global
    * sort).  The vocabulary-building pass of any tokenizer training /
    * coverage audit. */
  def vocabTopK(df: DataFrame, text: Column, k: Int): DataFrame = {
    val counts = df.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // top-k by (cnt desc, token): orderBy+limit compiles to TakeOrdered.
    // The rank is re-derived pointwise on the k collected rows.
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    top.withColumn("rank", (row_number().over(w) - 1).cast("long"))
  }

  /** One-pass C4/Gopher-style quality gate: per-document features + language
    * prediction computed in a single projection, then plain predicates —
    * every filter pushes toward the scan, nothing shuffles.  Returns the
    * surviving documents with their diagnostics (the columns a curation
    * pipeline logs before the expensive model-based stages). */
  def filterPipeline(df: DataFrame, text: Column, idCol: Column,
      minTokens: Long, maxTokens: Long, minQuality: Double,
      langs: Seq[String]): DataFrame = {
    val t = tokens(text)
    val nTok = size(t)
    val quality = round(
      lit(0.4) * least(lit(1.0), nTok.cast("double") / lit(200.0)) +
      lit(0.3) * (lit(1.0) - least(lit(1.0),
        punctCount(text).cast("double") / greatest(nTok, lit(1)).cast("double"))) +
      lit(0.3) * least(lit(1.0),
        (markerHits(t, Stopwords).cast("double") /
          greatest(nTok, lit(1)).cast("double")) * lit(5.0)),
      6)
    df.select(idCol.as("doc_id"), langId(text).as("lang_pred"),
        nTok.cast("long").as("n_tokens"), quality.as("quality"))
      .where(col("n_tokens") >= minTokens &&
        col("n_tokens") <= maxTokens &&
        col("quality") >= minQuality &&
        col("lang_pred").isin(langs: _*))
  }

  /** Sequence-packing plan under a fixed token budget: documents are
    * concatenated in id order and chunked every `budget` tokens (the
    * concat-and-chunk packing every LLM pretraining pipeline runs).  Output
    * per document: (doc_id, n_tokens, pack_id, pack_offset,
    * spans_boundary) — which fixed-size pack the document starts in, where,
    * and whether it crosses into the next one.
    *
    * Physical shape: one range-partitioned rank + the two-phase integer
    * cumsum ([[graft.core.Ranker]]) — no single-partition window, no driver
    * token array, so the plan is the same at 100 TB.  pack_id uses a double
    * division (exact while the corpus token count < 2^53 ≈ 9·10^15 — three
    * orders of magnitude past a 100 TB corpus). */
  def packPlan(df: DataFrame, text: Column, idCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = df.select(idCol.as("doc_id"),
      size(tokens(text)).cast("long").as("n_tokens"))
    val ranked = graft.core.Ranker.withRank(base, "__r", col("doc_id"))
    val (cum, _) = graft.core.Ranker.withCumsumLongAndTotal(
      ranked, "__r", col("n_tokens"), "__cum")
    cum
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .withColumn("pack_id", floor(col("__start") / lit(budget)).cast("long"))
      .withColumn("pack_offset", col("__start") - col("pack_id") * budget)
      .withColumn("spans_boundary",
        col("pack_offset") + col("n_tokens") > budget)
      .select("doc_id", "n_tokens", "pack_id", "pack_offset", "spans_boundary")
  }

  /** Quality features + a composite score in [0,1] (length, punctuation
    * density, stopword density — the usual cheap pre-filters before
    * expensive model-based scoring). */
  def qualityFeatures(df: DataFrame, text: Column, idCol: Column): DataFrame = {
    val t = tokens(text)
    val nTok = size(t)
    val stopHits = markerHits(t, Stopwords)
    val charSum = aggregate(t, lit(0), (acc, tk) => acc + length(tk))
    df.select(
      idCol.as("doc_id"),
      nTok.cast("long").as("n_tokens"),
      punctCount(text).cast("long").as("punct_cnt"),
      round(charSum.cast("double") / greatest(nTok, lit(1)).cast("double"), 6)
        .as("avg_token_len"),
      round(stopHits.cast("double") / greatest(nTok, lit(1)).cast("double"), 6)
        .as("stop_ratio"),
      round(
        lit(0.4) * least(lit(1.0), nTok.cast("double") / lit(200.0)) +
        lit(0.3) * (lit(1.0) - least(lit(1.0),
          punctCount(text).cast("double") / greatest(nTok, lit(1)).cast("double"))) +
        lit(0.3) * least(lit(1.0),
          (markerHits(t, Stopwords).cast("double") /
            greatest(nTok, lit(1)).cast("double")) * lit(5.0)),
        6).as("quality"))
  }
}
