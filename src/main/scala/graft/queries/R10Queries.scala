package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SimilarityOps}

/** Round-10 queries: the semantic (embedding-cluster) dedup tier and the
  * exact shared-span substring tier — the last two rungs of the dedup
  * ladder (document → paragraph → substring → semantic).
  *
  * Oracle strategy: the quantizer feeding [[DedupOps.semanticDedupAssigned]]
  * here is the FIXED-centroid [[SimilarityOps.ivfAssign]] (centroids =
  * `vec_id < 8`, the `sim_ivf_assign` convention) so DuckDB can replay the
  * assignment exactly; the learned-kmeans front end
  * ([[DedupOps.semanticDedup]]) is spec-covered (OpsSpec), since an
  * iterative seeded kmeans++ is not SQL-expressible.
  */
object R10Queries {

  import Tables.emb

  /** The fixed-centroid cluster assignment shared by the semantic-dedup
    * queries: (vec_id, cluster). */
  private def ivfClusters(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    SimilarityOps.ivfAssign(e, col("embedding"), col("vec_id"),
      e.where(col("vec_id") < 8), col("embedding"), col("vec_id"))
      .select(col("vec_id"), col("centroid_id").as("cluster"))
  }

  /** The ivfAssign CTE prefix shared by the semantic oracle SQL. */
  private val AsgSql =
    """c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |s AS (
      |  SELECT e.vec_id, c.centroid_id,
      |    round(
      |      list_reduce(list_transform(list_zip(e.embedding, c.cv),
      |        x -> x[1]::DOUBLE * x[2]::DOUBLE), (x, y) -> x + y) /
      |      (sqrt(list_reduce(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)) *
      |       sqrt(list_reduce(list_transform(c.cv, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))),
      |      6) AS ccos
      |  FROM embeddings e CROSS JOIN c
      |),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rn
      |  FROM s
      |),
      |asg AS (SELECT vec_id, centroid_id AS cluster FROM r WHERE rn = 1),
      |p AS (
      |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
      |    round(
      |      list_reduce(list_transform(list_zip(a.embedding, b.embedding),
      |        x -> x[1]::DOUBLE * x[2]::DOUBLE), (x, y) -> x + y) /
      |      (sqrt(list_reduce(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)) *
      |       sqrt(list_reduce(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))),
      |      6) AS cos
      |  FROM embeddings a
      |  JOIN asg aa ON aa.vec_id = a.vec_id
      |  JOIN asg bb ON bb.cluster = aa.cluster AND bb.vec_id > a.vec_id
      |  JOIN embeddings b ON b.vec_id = bb.vec_id
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Semantic-dedup pair stage: in-cluster cosine near-dups, cluster =
    // fixed-centroid IVF cell (one shuffle on the cluster id — the
    // embedding-tier analogue of an LSH bucket)
    "dd_semantic_pairs" -> ((s, dir) =>
      DedupOps.semanticPairs(emb(s, dir), col("embedding"), col("vec_id"),
        ivfClusters(s, dir), minCosine = 0.4)),

    // Full SemDeDup keeper projection: cluster -> in-cluster cosine pairs
    // -> connected components -> keep the min-id member of each dup group
    "dd_semantic_keep" -> ((s, dir) =>
      DedupOps.semanticDedupAssigned(emb(s, dir), col("embedding"),
        col("vec_id"), ivfClusters(s, dir), minCosine = 0.4)
        .select(col("vec_id"), col("label").cast("long").as("label")))
  )

  def oracles: Map[String, String] = Map(

    "dd_semantic_pairs" ->
      s"""WITH $AsgSql
         |SELECT doc_a, doc_b, cos FROM p WHERE cos >= 0.4""".stripMargin,

    "dd_semantic_keep" ->
      s"""WITH RECURSIVE $AsgSql,
         |cj AS (SELECT doc_a, doc_b FROM p WHERE cos >= 0.4),
         |e2 AS (SELECT doc_a AS a, doc_b AS b2 FROM cj UNION ALL SELECT doc_b, doc_a FROM cj),
         |n AS (SELECT DISTINCT a AS node FROM e2),
         |reach(node, rt) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e2.a, reach.rt FROM e2 JOIN reach ON reach.node = e2.b2
         |),
         |cl AS (SELECT node AS vid, min(rt) AS keeper_id FROM reach GROUP BY node)
         |SELECT vec_id, label::BIGINT AS label FROM embeddings
         |WHERE vec_id NOT IN (SELECT vid FROM cl WHERE vid <> keeper_id)""".stripMargin
  )
}
