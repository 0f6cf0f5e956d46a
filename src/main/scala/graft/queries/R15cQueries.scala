package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Round-15c: deterministic label-propagation communities over the
  * tier-shared co-engagement graph — two synchronous rounds, most-
  * frequent neighbor label, min-label ties; the oracle replays the
  * identical rounds in SQL. */
object R15cQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_lpa" -> ((s, dir) =>
      GraphOps.labelPropagation(Tables.coEdges(s, dir),
        col("src"), col("dst"), iters = 2))
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
        |SELECT v::BIGINT AS v, label FROM l2""".stripMargin
  )
}
