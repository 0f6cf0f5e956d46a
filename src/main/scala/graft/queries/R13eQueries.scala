package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EventOps

/** Round-13e queries: the windowed funnel (each stage must convert within
  * a time budget of the previous stage). */
object R13eQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // signup → view → purchase, each later stage within 1 h of the prior
    "ev_funnel_windowed" -> ((s, dir) =>
      EventOps.funnelStagesWindowed(Tables.events(s, dir), col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("signup", "view", "purchase"), windowMs = 3600000L))
  )

  def oracles: Map[String, String] = Map(
    // the same (stage, last-ts) automaton as a string-state list_reduce
    // over the (ts, event_id)-ordered per-user sequence; timestamps fold
    // as exact integer micros
    "ev_funnel_windowed" ->
      """WITH s AS (
        |  SELECT user_id,
        |    list(event_type || '|' || epoch_us(ts)::VARCHAR
        |         ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, CAST(split_part(list_reduce(list_prepend('0|0', seq),
        |  (acc, x) ->
        |  CASE WHEN split_part(acc,'|',1) = '0' AND split_part(x,'|',1) = 'signup'
        |         THEN '1|' || split_part(x,'|',2)
        |       WHEN split_part(acc,'|',1) = '1' AND split_part(x,'|',1) = 'view'
        |         AND split_part(x,'|',2)::BIGINT - split_part(acc,'|',2)::BIGINT <= 3600000000
        |         THEN '2|' || split_part(x,'|',2)
        |       WHEN split_part(acc,'|',1) = '2' AND split_part(x,'|',1) = 'purchase'
        |         AND split_part(x,'|',2)::BIGINT - split_part(acc,'|',2)::BIGINT <= 3600000000
        |         THEN '3|' || split_part(x,'|',2)
        |       ELSE acc END), '|', 1) AS INTEGER) AS stage
        |FROM s""".stripMargin
  )
}
