package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{GraphOps, TextOps}

/** Round-15c: deterministic label-propagation communities over the
  * tier-shared co-engagement graph — two synchronous rounds, most-
  * frequent neighbor label, min-label ties; the oracle replays the
  * identical rounds in SQL. */
object R15cQueries {

  private val unigramModels =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, Double)]]

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_lpa" -> ((s, dir) =>
      GraphOps.labelPropagation(Tables.coEdges(s, dir),
        col("src"), col("dst"), iters = 2)),

    // Unigram-LM (SentencePiece-style) tokenization: the Viterbi model
    // itself is spec-proven (R15UnigramSpec: EM learning, local ==
    // distributed, determinism); the oracle gates the tokenizer's
    // LOSSLESS round trip hash-exactly — concat(pieces) must rebuild
    // the normalized text of every document.
    "text_unigram_tokens" -> ((s, dir) => {
      val vocab = unigramModels.getOrElseUpdate(dir,
        TextOps.unigramTrain(Tables.docs(s, dir), col("text"),
          vocabSize = 2000, maxPieceLen = 6, emIters = 2))
      TextOps.unigramTokens(Tables.docs(s, dir), col("text"),
        col("doc_id"), vocab, maxPieceLen = 6)
        .select(col("doc_id"),
          md5(concat_ws("", col("tokens"))).as("tok_hash"))
    })
  )

  def oracles: Map[String, String] = Map(
    "graph_lpa" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract_string(props, '$.k')::INT AS item
        |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |e0 AS (SELECT DISTINCT a.item AS a, b.item AS b
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item),
        |und AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
        |l0 AS (SELECT DISTINCT a AS v, a::BIGINT AS label FROM und),
        |c1 AS (SELECT u.a, l.label, count(*) AS cnt
        |  FROM und u JOIN l0 l ON l.v = u.b GROUP BY 1, 2),
        |l1 AS (SELECT a AS v, label FROM (
        |  SELECT a, label, row_number() OVER (PARTITION BY a
        |    ORDER BY cnt DESC, label ASC) AS rn FROM c1) WHERE rn = 1),
        |c2 AS (SELECT u.a, l.label, count(*) AS cnt
        |  FROM und u JOIN l1 l ON l.v = u.b GROUP BY 1, 2),
        |l2 AS (SELECT a AS v, label FROM (
        |  SELECT a, label, row_number() OVER (PARTITION BY a
        |    ORDER BY cnt DESC, label ASC) AS rn FROM c2) WHERE rn = 1)
        |SELECT v::BIGINT AS v, label FROM l2""".stripMargin,

    "text_unigram_tokens" ->
      """SELECT doc_id,
        |  md5(array_to_string(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> ''), '')) AS tok_hash
        |FROM documents""".stripMargin
  )
}
