package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Round-16g: k-core decomposition over the REAL-pixel near-dup graph —
  * the dense-cluster extractor (template farms / spam rings are exactly
  * the high-k cores of a near-duplicate graph).  Edges are the SHARED
  * near-dup pair layout ([[Tables.nearDupPairs]] — landed once per (JVM,
  * dir), same discipline as the graph tier's coEdges; r16 derived the
  * codec+pair graph inline here, which made this the bench's most
  * expensive query); k scales with the corpus (`max(9, n/125)`), the
  * peel loop early-exits at its fixpoint, and the oracle replays a FIXED
  * 16 rounds — peeling is monotone, so post-fixpoint rounds are no-ops
  * and the two agree hash-exactly (the generated-CTE discipline of
  * ml_kmeans_lloyd). */
object R16gQueries {

  private val MaxRounds = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_kcore" -> ((s, dir) => {
      val k = math.max(9L, Tables.docs(s, dir).count() / 125).toInt
      GraphOps.kCore(Tables.nearDupPairs(s, dir), col("doc_a"),
        col("doc_b"), k, maxRounds = MaxRounds)
    })
  )

  def oracles: Map[String, String] = Map(
    "graph_kcore" -> {
      // every e_i is referenced 3× by round i+1: AS MATERIALIZED stops
      // DuckDB from inlining the chain (3^16 expansions otherwise)
      val rounds = (1 to MaxRounds).map { i =>
        s"""k$i AS MATERIALIZED (SELECT a FROM e${i - 1} GROUP BY a
           |  HAVING count(*) >= (SELECT kk FROM kv)),
           |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
           |  JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${R16bQueries.RealAHashSql},
         |p AS MATERIALIZED (
         |  SELECT x.doc_id AS da, y.doc_id AS db
         |  FROM a x JOIN a y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.ahash, y.ahash)) <= 3),
         |kv AS MATERIALIZED (
         |  SELECT greatest(9, count(*) // 125) AS kk FROM documents),
         |e0 AS MATERIALIZED (SELECT da AS a, db AS b FROM p
         |       UNION SELECT db, da FROM p),
         |$rounds
         |SELECT a AS v, count(*)::BIGINT AS degree
         |FROM e$MaxRounds GROUP BY 1""".stripMargin
    }
  )
}
