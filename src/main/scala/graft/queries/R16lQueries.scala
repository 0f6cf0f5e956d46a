package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{EmbedOps, TextOps}

/** Round-16l: mergeability proof for the ML sufficient-statistics tier
  * (Gram partials over corpus slices sum to the whole-corpus statistics —
  * what makes incremental PCA possible without ever re-scanning history)
  * and per-group shelf packing (multilingual SFT: bins never mix
  * languages). */
object R16lQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gram mergeability: three disjoint corpus slices contribute partial
    // fixed-point Gram tables; merging = integer addition by (i, j).  The
    // oracle replays the DIRECT whole-corpus statistics, so the hash
    // match IS the merge == direct proof (the sketch_merge pattern for
    // the linear-algebra tier — at 100 TB new data updates PCA by adding
    // d² longs, never by re-scanning).
    "emb_gram_merge" -> ((s, dir) => {
      val e = Tables.emb(s, dir)
      val parts = (0 until 3).map(r =>
        EmbedOps.gramTable(e.where(pmod(col("vec_id"), lit(3)) === r),
          col("embedding"), d = 64))
      parts.reduce(_ unionByName _)
        .groupBy("i", "j").agg(sum("q").as("q"))
    }),

    // per-language shelf packing: same closed form as text_pack_shelf
    // with the size class keyed by (lang, q) — bins never mix languages
    "text_pack_shelf_lang" -> ((s, dir) =>
      TextOps.packBinsShelfBy(
        Tables.docs(s, dir).select(col("lang"), col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
        col("lang"), col("n_tokens"), col("doc_id"), 128L))
  )

  def oracles: Map[String, String] = Map(

    // the DIRECT whole-corpus replay (emb_gram's grammar) — merged
    // partials must hash-equal it
    "emb_gram_merge" ->
      """WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS v FROM embeddings),
        |q AS (SELECT a.i::INT AS i, b.i::INT AS j,
        |    sum(floor(a.v * b.v * 1000000000000.0)::BIGINT)::BIGINT AS q
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2),
        |s AS (SELECT 0::INT AS i, i::INT AS j,
        |    sum(floor(v * 1000000000.0)::BIGINT)::BIGINT AS q
        |  FROM x GROUP BY 2),
        |n AS (SELECT 0::INT AS i, 0::INT AS j, count(*)::BIGINT AS q
        |  FROM embeddings)
        |SELECT i, j, q FROM q
        |UNION ALL SELECT i, j, q FROM s
        |UNION ALL SELECT i, j, q FROM n""".stripMargin,

    "text_pack_shelf_lang" ->
      """WITH t AS (
        |  SELECT lang AS grp, doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> ''))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT grp, doc_id, n_tokens,
        |    (128 // n_tokens)::BIGINT AS size_class
        |  FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY grp, size_class ORDER BY doc_id) - 1 AS cr
        |  FROM c)
        |SELECT grp, doc_id, n_tokens, size_class,
        |  (cr // size_class)::BIGINT AS bin_in_class,
        |  (cr % size_class)::BIGINT AS slot
        |FROM r""".stripMargin
  )
}
