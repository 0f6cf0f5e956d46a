package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** The native as-of join plan node vs the composed union+window form:
  * equal output on real data, the documented tie-breaks on a planted
  * fixture, and proof the custom exec actually planned (not a fallback). */
class R13bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long): java.sql.Timestamp = new java.sql.Timestamp(us)

  test("asofJoinNative plans AsOfJoinExec and equals the composed asofJoin " +
      "on the sf0.001 events table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val e = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("left_id").collect().map(_.toSeq).toSeq
    val native = EventOps.asofJoinNative(
      e.where(col("event_type") === "click"), col("event_id"),
      col("user_id"), col("ts"),
      e.where(col("event_type") === "purchase"), col("event_id"),
      col("user_id"), col("ts"), col("value"))
    // physical nodeName strips the Exec suffix ("SortMergeJoin" style)
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "the planner strategy must plan the custom exec")
    val composed = EventOps.asofJoin(
      e.where(col("event_type") === "click"), col("event_id"),
      col("user_id"), col("ts"),
      e.where(col("event_type") === "purchase"), col("event_id"),
      col("user_id"), col("ts"), col("value"))
    assert(run(native) == run(composed))
  }

  test("AsOfJoinKeyFilterPushdown pushes a key predicate into BOTH " +
      "children and preserves results") {
    val left = Seq((1L, 10L, ts(100)), (2L, 20L, ts(100)), (3L, 15L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((7L, 10L, ts(50), 1.5), (8L, 20L, ts(60), 2.5),
        (9L, 15L, ts(70), 3.5))
      .toDF("event_id", "user_id", "ts", "value")
    def joined() = EventOps.asofJoinNative(left, col("event_id"),
      col("user_id"), col("ts"), right, col("event_id"), col("user_id"),
      col("ts"), col("value"))
    val filtered = joined().where(col("k") > 12)
    // the rule fires: no Filter remains ABOVE the AsOfJoin node, and both
    // children carry the pushed predicate
    val opt = filtered.queryExecution.optimizedPlan
    val asOfNodes = opt.collect { case j: graft.plans.AsOfJoin => j }
    assert(asOfNodes.nonEmpty, "optimized plan keeps the AsOfJoin node")
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[graft.plans.AsOfJoin] => f
    }.isEmpty, "the key filter must not remain above the join")
    assert(asOfNodes.head.left.toString.contains("> 12") &&
      asOfNodes.head.right.toString.contains("> 12"),
      "both children must carry the pushed predicate")
    val got = filtered.select("left_id", "matched_id", "matched_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == Set((2L, Some(8L), Some(2.5)), (3L, Some(9L), Some(3.5))))
  }

  test("AsOfJoinExec reports numOutputRows and numMatched metrics") {
    val left = Seq((1L, 1L, ts(5000)), (2L, 1L, ts(100)), (3L, 2L, ts(5000)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts(4000), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val df = EventOps.asofJoinNative(left, col("event_id"), col("user_id"),
      col("ts"), right, col("event_id"), col("user_id"), col("ts"),
      col("value"))
    // collect() executes THIS queryExecution (count() would plan a fresh
    // aggregate tree whose exec instance is a different object)
    df.collect()
    // AQE wraps the final plan in query stages whose inner plans are NOT
    // tree children — unwrap them explicitly
    def findExec(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinExec] = p match {
      case e: graft.plans.AsOfJoinExec => Some(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findExec(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findExec(s.plan)
      case other => other.children.view.flatMap(findExec(_)).headOption
    }
    val exec = findExec(df.queryExecution.executedPlan)
    assert(exec.nonEmpty, "custom exec present in the executed plan")
    assert(exec.get.metrics("numOutputRows").value == 3L)
    // only left row 1 matches (row 2 precedes the purchase; user 2 has none)
    assert(exec.get.metrics("numMatched").value == 1L)
  }

  test("forward as-of: first right row at-or-after, lowest id at the " +
      "instant, null when nothing follows") {
    val left = Seq((100L, 1L, ts(5000)), (101L, 1L, ts(9000)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
        (10L, 1L, ts(5000), 1.0),  // AT the instant — eligible forward
        (11L, 1L, ts(5000), 2.0),  // equal ts: LOWEST id wins forward
        (12L, 1L, ts(7000), 3.0))  // before left 101's ts=9000: no match
      .toDF("event_id", "user_id", "ts", "value")
    val out = EventOps.asofJoinNative(left, col("event_id"), col("user_id"),
        col("ts"), right, col("event_id"), col("user_id"), col("ts"),
        col("value"), forward = true)
      .select("left_id", "matched_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(100L -> Some(10L), 101L -> None))
  }

  test("tolerance: a match staler than the bound is dropped, the bound " +
      "itself is inclusive") {
    val left = Seq((100L, 1L, ts(10000L)), (101L, 2L, ts(10000L)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
        (10L, 1L, ts(9000L), 1.0),   // exactly 1000 ms stale: kept
        (11L, 2L, ts(8999L), 2.0))   // 1001 ms stale: dropped
      .toDF("event_id", "user_id", "ts", "value")
    val out = EventOps.asofJoinNative(left, col("event_id"), col("user_id"),
        col("ts"), right, col("event_id"), col("user_id"), col("ts"),
        col("value"), toleranceMs = 1000L)
      .select("left_id", "matched_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(100L -> Some(10L), 101L -> None))
  }

  test("asofJoinNative tie-breaks: at-instant right row eligible, greatest " +
      "id wins on equal ts, null when nothing precedes") {
    val left = Seq((100L, 1L, ts(5000)), (101L, 1L, ts(999)),
        (102L, 2L, ts(5000)), (103L, 3L, ts(5000)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
        (10L, 1L, ts(5000), 1.0),  // AT the left instant — eligible
        (11L, 1L, ts(5000), 2.0),  // equal ts: greatest id wins
        (12L, 1L, ts(1000), 3.0),  // after left 101's ts=999 — ineligible
        (13L, 2L, ts(4000), 4.0))  // user 3 has no right rows at all
      .toDF("event_id", "user_id", "ts", "value")
    val out = EventOps.asofJoinNative(left, col("event_id"), col("user_id"),
        col("ts"), right, col("event_id"), col("user_id"), col("ts"),
        col("value"))
      .select("left_id", "matched_id", "matched_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(out(100L) == (Some(11L), Some(2.0)))
    assert(out(101L) == (None, None))
    assert(out(102L) == (Some(13L), Some(4.0)))
    assert(out(103L) == (None, None))
  }
}
