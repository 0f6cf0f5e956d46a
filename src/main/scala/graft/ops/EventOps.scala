package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators the reference's loader world doesn't
  * have but any training-data/telemetry pipeline at scale does: the as-of
  * join (latest right row at-or-before each left row, per key — kdb/
  * QuestDB/DuckDB `ASOF JOIN`), ordered funnel-stage attribution, and the
  * bounded-window range join.
  *
  * Scale design:
  *  - [[asofJoin]] is NOT an inequality join (which Spark plans as a
  *    broadcast-nested-loop — quadratic and driver-bound).  Both sides are
  *    tagged and unioned, hash-shuffled ONCE on the key, and the match is a
  *    running `last(ignoreNulls)` over the interleaved timeline — linear
  *    work per key, no per-row range probe, no second shuffle.
  *  - [[funnelStages]] folds each user's time-ordered event-type sequence
  *    through a stage automaton INSIDE an aggregate over `sort_array` —
  *    one hash shuffle on the user key, no window, no re-sort.
  *  - [[rangeJoinPairs]] rewrites `0 <= tB−tA <= Δ` as an equi-join on
  *    `floor(t/Δ)` against the bucket and its successor (every qualifying
  *    pair spans at most one boundary), so Catalyst plans a shuffled hash
  *    join keyed by (key, bucket) instead of a nested loop.
  */
object EventOps {

  /** As-of join: for every left row, attach the single latest right row
    * with `right.ts <= left.ts` under the same key (null columns when no
    * right row precedes).  Ties on ts: a right row AT the left row's
    * timestamp is eligible (the `>=` convention of DuckDB/kdb), and equal
    * right timestamps resolve to the greatest right id — deterministic.
    *
    * Output: leftId as `left_id`, key, ts, then `matched_id` /
    * `matched_value` from the right side.
    */
  def asofJoin(left: DataFrame, leftId: Column, leftKey: Column,
      leftTs: Column, right: DataFrame, rightId: Column, rightKey: Column,
      rightTs: Column, rightVal: Column): DataFrame = {
    val l = left.select(leftKey.as("k"), leftTs.as("ts"),
      leftId.as("left_id"), lit(null).cast("long").as("r_id"),
      lit(null).cast("double").as("r_val"), lit(1).as("side"))
    val r = right.select(rightKey.as("k"), rightTs.as("ts"),
      lit(null).cast("long").as("left_id"), rightId.cast("long").as("r_id"),
      rightVal.cast("double").as("r_val"), lit(0).as("side"))
    // One shuffle: partition by key, order the interleaved timeline so
    // every right row sorts before any left row at the same instant
    // (side 0 < 1) and equal-ts right rows sort ascending by id — the
    // running last() then IS the as-of match.
    val w = Window.partitionBy("k")
      .orderBy(col("ts"), col("side"), col("r_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("matched_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("matched_value", last(col("r_val"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("left_id"), col("k"), col("ts"),
        col("matched_id"), col("matched_value"))
  }

  /** The same as-of join as the NATIVE whole-operator plan node
    * ([[graft.plans.AsOfJoin]]): one co-partitioned shuffle + sort per
    * side, then a streaming two-pointer merge with O(1) state per
    * partition — no union row-widening, no window buffer.  Output and
    * tie-breaks are identical to [[asofJoin]] (same oracle).
    *
    * The planner strategy is appended to `spark.experimental
    * .extraStrategies` idempotently so the operator works on sessions
    * built without `spark.sql.extensions=graft.GraftExtensions`. */
  def asofJoinNative(left: DataFrame, leftId: Column, leftKey: Column,
      leftTs: Column, right: DataFrame, rightId: Column, rightKey: Column,
      rightTs: Column, rightVal: Column, forward: Boolean = false,
      toleranceMs: Long = -1L, nearest: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.AsOfJoinKeyFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.AsOfJoinKeyFilterPushdown
    val l = left.select(leftKey.cast("long").as("k"),
      unix_micros(leftTs).as("ts"), leftId.cast("long").as("left_id"))
    val r = right.select(rightKey.cast("long").as("k"),
      unix_micros(rightTs).as("ts"), rightId.cast("long").as("r_id"),
      rightVal.cast("double").as("r_val"))
    // SQL null semantics live IN AsOfJoinExec's merge (nulls sort first
    // under the declared ordering; left nulls emit unmatched, right
    // nulls never match) — no wrapper probe, no filter, no union, so the
    // plan stays one scan per side and keeps the exec's partitioning
    // regardless of schema nullability or data drift between planning
    // and execution.
    org.apache.spark.sql.GraftBridge.ofRows(spark,
        graft.plans.AsOfJoin(l.queryExecution.analyzed,
          r.queryExecution.analyzed, forward = forward,
          toleranceUs = if (toleranceMs < 0) -1L else toleranceMs * 1000L,
          nearest = nearest))
      .select(col("left_id"), col("k"),
        timestamp_micros(col("ts")).as("ts"),
        col("matched_id"), col("matched_value"))
  }

  /** Ordered funnel attribution: each key's events are time-ordered and
    * folded through the stage automaton — stage s advances to s+1 exactly
    * when the next event's type equals `steps(s)`.  Returns one row per
    * key with the furthest stage reached (0 = none).  Ordering ties on ts
    * break by event id, so the fold is deterministic.
    *
    * One hash shuffle (groupBy key); the fold is a codegen'd `aggregate`
    * over the collected per-key sequence — no window, no driver loop.
    * Per-key state is the event list: bounded by per-user activity, the
    * same envelope any sessionizer carries.
    */
  def funnelStages(events: DataFrame, key: Column, ts: Column, id: Column,
      typ: Column, steps: Seq[String]): DataFrame = {
    val stepArr = array(steps.map(lit): _*)
    events
      .select(key.as("k"), struct(ts.as("ts"), id.as("id"),
        typ.as("typ")).as("e"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .select(col("k").as("user_id"),
        aggregate(col("seq"), lit(0),
          (acc, e) => when(acc < steps.size &&
            e.getField("typ") === element_at(stepArr, acc + 1), acc + 1)
            .otherwise(acc)).as("stage"))
  }

  /** Windowed funnel attribution: like [[funnelStages]], but each stage
    * after the first must occur within `windowMs` of the PREVIOUS stage's
    * event (the "converted within an hour of the view" product-analytics
    * form).  The fold state is (stage, last-stage timestamp) carried as a
    * struct through the same per-key `aggregate` — still one hash
    * shuffle, no window function, no driver loop.  Tie order (ts, id) is
    * deterministic, and the timestamps fold as exact integer micros. */
  def funnelStagesWindowed(events: DataFrame, key: Column, ts: Column,
      id: Column, typ: Column, steps: Seq[String],
      windowMs: Long): DataFrame = {
    val stepArr = array(steps.map(lit): _*)
    val wUs = windowMs * 1000L
    events
      .select(key.as("k"), struct(unix_micros(ts).as("us"), id.as("id"),
        typ.as("typ")).as("e"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .select(col("k").as("user_id"),
        aggregate(col("seq"),
          struct(lit(0).as("stage"), lit(0L).as("us")),
          (acc, e) => {
            val stage = acc.getField("stage")
            val advances = stage < steps.size &&
              e.getField("typ") === element_at(stepArr, stage + 1) &&
              (stage === 0 ||
                e.getField("us") - acc.getField("us") <= wUs)
            when(advances,
              struct((stage + 1).as("stage"),
                e.getField("us").as("us"))).otherwise(acc)
          }).getField("stage").as("stage"))
  }

  /** Bounded-window range join: all ordered pairs (a, b) under the same
    * key with `0 <= tsB − tsA <= windowMs` and (optionally) distinct
    * event types for the two sides.  Output: a_id, b_id, key, gap_ms.
    *
    * Every qualifying pair has `floor(tB/Δ) ∈ {floor(tA/Δ), +1}`, so side
    * A is duplicated into its own and its successor bucket and the join is
    * a plain equi-join on (key, bucket) — shuffled hash join, no nested
    * loop, parallelism = #(key, bucket) groups.  Self-pairs (same id) are
    * excluded.
    */
  def rangeJoinPairs(eventsA: DataFrame, aId: Column, aKey: Column,
      aTs: Column, eventsB: DataFrame, bId: Column, bKey: Column,
      bTs: Column, windowMs: Long): DataFrame = {
    // exact integer milliseconds: unix_micros/1000 stays inside the
    // double mantissa (~1.7e12), unlike seconds-as-double * 1000
    val ms = (c: Column) => floor(unix_micros(c) / 1000).cast("long")
    val a = eventsA.select(aId.as("a_id"), aKey.as("k"), ms(aTs).as("a_ms"))
      .withColumn("bucket",
        explode(array(floor(col("a_ms") / windowMs),
          floor(col("a_ms") / windowMs) + 1)))
    val b = eventsB.select(bId.as("b_id"), bKey.as("bk"), ms(bTs).as("b_ms"),
      floor(ms(bTs) / windowMs).as("b_bucket"))
    a.join(b, col("k") === col("bk") && col("bucket") === col("b_bucket"))
      .where(col("b_ms") >= col("a_ms") &&
        col("b_ms") - col("a_ms") <= windowMs &&
        col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("k"),
        (col("b_ms") - col("a_ms")).as("gap_ms"))
  }

  /** Cohort retention matrix: users bucketed by the fixed-length period of
    * their FIRST event (`cohort` = floor(firstMs / periodMs)), then the
    * distinct-active-user count per (cohort, period offset) — the classic
    * "week-0 signups still active in week k" triangle.
    *
    * ONE user-keyed shuffle: the (user, period) pairs collapse to a per-user
    * period SET via a map-side-combinable `collect_set`, the cohort is the
    * set's min, and the final count groups the re-exploded (cohort, offset)
    * rows — each (user, cohort, offset) row is unique by construction, so a
    * plain `count` IS the distinct-user count (no distinct expansion).
    * Per-user state is the period set, bounded by lifetime activity span in
    * periods (weeks/years), not by event count.
    *
    * Output: (cohort, period_offset, n_users), all longs. */
  def cohortRetention(events: DataFrame, user: Column, ts: Column,
      periodMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val p = floor(floor(unix_micros(ts) / 1000) / periodMs).cast("long")
    events.select(user.as("uid"), p.as("p"))
      .groupBy("uid")
      .agg(collect_set("p").as("ps"))
      .select(col("uid"), array_min(col("ps")).as("cohort"),
        explode(col("ps")).as("p"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gap-timeout sessionized conversion rate per user: events more than
    * `gapMs` apart open a new session; a session "converts" when it
    * contains at least one `convType` event.  Output: (user_id,
    * n_sessions, n_converted, conv_rate) — the funnel-adjacent metric
    * product analytics computes per cohort.
    *
    * One hash shuffle (groupBy user); sessionization AND conversion
    * counting happen in a single `aggregate` fold over the (ts, id)-sorted
    * per-user sequence — no window-function session id, no second pass,
    * no re-shuffle of the event stream.  Fold state is four scalars
    * (last-ms, session count, converted count, current-session-converted
    * flag); per-key collected state is the event list, the same envelope
    * as [[funnelStages]]. */
  def sessionConversion(events: DataFrame, user: Column, ts: Column,
      id: Column, typ: Column, convType: String, gapMs: Long): DataFrame = {
    require(gapMs > 0, "gapMs must be positive")
    val ms = floor(unix_micros(ts) / 1000).cast("long")
    val init = struct(lit(-1L).as("last"), lit(0L).as("ns"),
      lit(0L).as("nc"), lit(0).as("cur"))
    events
      .select(user.as("user_id"),
        struct(ms.as("ms"), id.cast("long").as("id"),
          (typ === convType).cast("int").as("cv")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .select(col("user_id"),
        aggregate(col("seq"), init, (acc, e) => {
          val isNew = acc.getField("last") === -1L ||
            (e.getField("ms") - acc.getField("last")) > gapMs
          val ncInc = when(isNew, e.getField("cv").cast("long"))
            .otherwise(when(acc.getField("cur") === 0 &&
              e.getField("cv") === 1, 1L).otherwise(0L))
          struct(e.getField("ms").as("last"),
            (acc.getField("ns") + when(isNew, 1L).otherwise(0L)).as("ns"),
            (acc.getField("nc") + ncInc).as("nc"),
            when(isNew, e.getField("cv"))
              .otherwise(greatest(acc.getField("cur"), e.getField("cv")))
              .as("cur"))
        }).as("st"))
      .select(col("user_id"), col("st.ns").as("n_sessions"),
        col("st.nc").as("n_converted"),
        round(col("st.nc").cast("double") / col("st.ns"), 6).as("conv_rate"))
  }

  /** Per-type z-score outlier flagging on the event value, exact to the
    * last bit: values are integerized to milli-units ONCE, the per-type
    * moment sums are exact integers (count/sum as 64-bit, sum-of-squares
    * as DECIMAL(38,0) — overflow-proof at any corpus size), and
    * mean/variance/z derive from those integers through one fixed double
    * expression — no accumulation-order drift, so the flagged set is
    * deterministic and oracle-reproducible.  Flags rows with |z| >
    * `zThreshold` (on the unrounded z; the emitted z is 6-dp).
    *
    * Scale: one hash aggregate to the |types|-row moment table, broadcast
    * back over a narrow second pass — the event stream shuffles zero
    * times.  Constant-typed degenerate groups (variance 0) emit
    * nothing. */
  def valueOutliers(events: DataFrame, id: Column, typ: Column,
      value: Column, zThreshold: Double = 3.0): DataFrame = {
    val e = events.select(id.as("event_id"), typ.as("event_type"),
      round(value * 1000).cast("long").as("vm"))
    val st = e.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum("vm").as("s"),
      sum((col("vm") * col("vm")).cast("decimal(38,0)")).as("sq"))
    val mean = col("s").cast("double") / col("n")
    val variance = col("sq").cast("double") / col("n") -
      (col("s").cast("double") / col("n")) *
      (col("s").cast("double") / col("n"))
    val z = (col("vm").cast("double") - mean) / sqrt(variance)
    e.join(broadcast(st), "event_type")
      .where(variance > 0 && abs(z) > zThreshold)
      .select(col("event_id"), col("event_type"),
        col("vm").as("value_milli"), round(z, 6).as("z"))
  }

  /** Seasonal traffic-anomaly detection: each (type, absolute hour)'s
    * event count z-scored against that type's SAME-HOUR-OF-DAY baseline —
    * "is 3 am Tuesday unusually busy *for 3 am*", the monitoring shape a
    * flat threshold cannot express.  Counts are exact integers, the
    * per-(type, hour-of-day) moments are exact 64-bit sums, and z derives
    * through one fixed double expression — the same
    * determinism contract as [[valueOutliers]].  Two hash aggregates (the
    * hour-count table, then the |types|×24 baseline) and a broadcast
    * join back; the event stream shuffles once.  Output: flagged
    * (event_type, h, n, z) rows with |z| > `zThreshold`. */
  def hourlyAnomalies(events: DataFrame, typ: Column, ts: Column,
      zThreshold: Double = 2.0): DataFrame = {
    val h = floor(floor(unix_micros(ts) / 1000) / 3600000).cast("long")
    val hc = events.select(typ.as("event_type"), h.as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("n"))
      .withColumn("hod", pmod(col("h"), lit(24L)))
    val st = hc.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("m"), sum("n").as("s"),
        sum(col("n") * col("n")).as("sq"))
    val mean = col("s").cast("double") / col("m")
    val variance = col("sq").cast("double") / col("m") -
      (col("s").cast("double") / col("m")) *
      (col("s").cast("double") / col("m"))
    val z = (col("n").cast("double") - mean) / sqrt(variance)
    hc.join(broadcast(st), Seq("event_type", "hod"))
      .where(variance > 0 && abs(z) > zThreshold)
      .select(col("event_type"), col("h"), col("n"), round(z, 6).as("z"))
  }

  /** First-order Markov transition matrix over event types: corpus-wide
    * counts of consecutive (from → to) pairs on each user's time-ordered
    * event sequence, plus the per-from transition probability — the
    * user-journey structure behind funnel design.
    *
    * One user-keyed shuffle; the consecutive pairs are an array transform
    * over the sorted per-user sequence INSIDE the aggregate row (no
    * window, no self-join), and the output is |types|²-bounded regardless
    * of corpus size.  Ordering ties on ts break by event id —
    * deterministic.  Output: (from_type, to_type, n, p) with p the 6-dp
    * row-normalized probability. */
  def transitionMatrix(events: DataFrame, user: Column, ts: Column,
      id: Column, typ: Column): DataFrame = {
    val ms = floor(unix_micros(ts) / 1000).cast("long")
    val pairs = events
      .select(user.as("u"),
        struct(ms.as("ms"), id.cast("long").as("id"), typ.as("typ")).as("e"))
      .groupBy("u")
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .select(explode(when(size(col("seq")) > 1,
        transform(sequence(lit(1), size(col("seq")) - 1), i =>
          struct(element_at(col("seq"), i).getField("typ").as("from_type"),
            element_at(col("seq"), i + 1).getField("typ").as("to_type")))))
        .as("p"))
      .select(col("p.from_type"), col("p.to_type"))
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("tot"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
  }

  /** Pearson correlation between the event value and the hour-of-day, per
    * event type — the "is this metric diurnal" diagnostic — computed from
    * EXACT integer moments: value in milli-units, hour in [0, 24), the
    * five cross-sums as 64-bit/DECIMAL(38,0) integers, and the closed-form
    * r as ONE double expression over them (6-dp) — no accumulation-order
    * drift, same contract as [[valueOutliers]] and `TextOps.zipfFit`.
    * One hash aggregate to a |types|-row table; the event stream never
    * shuffles.  Degenerate types (zero variance on either side) emit a
    * null r. */
  def valueHourCorr(events: DataFrame, typ: Column, value: Column,
      ts: Column): DataFrame = {
    val vm = round(value * 1000).cast("long")
    val h = pmod(floor(floor(unix_micros(ts) / 1000) / 3600000).cast("long"),
      lit(24L))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val st = events.select(typ.as("event_type"), vm.as("vm"), h.as("h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vm").as("sx"), sum("h").as("sy"),
        sum(col("vm") * col("h")).as("sxy"),
        sum((col("vm") * col("vm")).cast("decimal(38,0)")).as("sxx"),
        sum(col("h") * col("h")).as("syy"))
    val varX = (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
      .cast("double")
    val varY = (dec(col("n")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy")))
      .cast("double")
    val num = (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy")))
      .cast("double")
    st.select(col("event_type"), col("n"),
      when(varX > 0 && varY > 0,
        round(num / (sqrt(varX) * sqrt(varY)), 6)).as("corr"))
  }

  /** Stateless per-row z-score against a DRIVER-HELD per-type stats map
    * (means/sds in milli-units, e.g. from a prior [[valueOutliers]]
    * moment pass) — the score-at-ingestion form: no join, no state, no
    * shuffle, usable unchanged on a streaming frame
    * ([[graft.streaming.StreamingOps.outlierScoreStream]]).  Types absent
    * from the map score null.  Bit-equal to the broadcast-join form on
    * the same stats. */
  def outlierScoreStateless(events: DataFrame, id: Column, typ: Column,
      value: Column, stats: Map[String, (Double, Double)]): DataFrame = {
    val means = typedLit(stats.map { case (k, v) => k -> v._1 })
    val sds = typedLit(stats.map { case (k, v) => k -> v._2 })
    val vm = round(value * 1000).cast("long")
    val mean = element_at(means, typ)
    val sd = element_at(sds, typ)
    events.select(id.as("event_id"), typ.as("event_type"),
      vm.as("value_milli"),
      when(sd > 0, round((vm.cast("double") - mean) / sd, 6)).as("z"))
  }

  /** Driver-side per-type (mean, sd) in milli-units from the exact integer
    * moments — the stats payload for [[outlierScoreStateless]].  Collects
    * |types| rows. */
  def valueStats(events: DataFrame, typ: Column,
      value: Column): Map[String, (Double, Double)] = {
    val vm = round(value * 1000).cast("long")
    events.select(typ.as("t"), vm.as("vm"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), sum("vm").as("s"),
        sum((col("vm") * col("vm")).cast("decimal(38,0)")).as("sq"))
      .select(col("t"), (col("s").cast("double") / col("n")).as("mean"),
        sqrt(col("sq").cast("double") / col("n") -
          (col("s").cast("double") / col("n")) *
          (col("s").cast("double") / col("n"))).as("sd"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
  }

  /** Per-user inter-event gap statistics over the sorted event timeline:
    * event count, first→last span, maximum gap, and the exact lower-median
    * gap (element ⌈m/2⌉ of the m sorted gaps) — the burstiness/dormancy
    * card behind session-timeout and retention-window choices.
    *
    * One hash shuffle (groupBy user); the sorted-timestamp diffs, max, and
    * rank-exact median are all array folds INSIDE the aggregate row — the
    * event stream never shuffles twice and there is no window.  All values
    * are exact integer milliseconds; gap columns are null for single-event
    * users.  Per-user state is the event-timestamp list — the same
    * per-user-activity envelope as [[funnelStages]]. */
  def interEventGaps(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val ms = floor(unix_micros(ts) / 1000).cast("long")
    events.select(user.as("user_id"), ms.as("ms"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("ms"))).as("arr"))
      .select(col("user_id"), col("arr"),
        when(size(col("arr")) > 1,
          transform(sequence(lit(1), size(col("arr")) - 1),
            i => element_at(col("arr"), i + 1) - element_at(col("arr"), i)))
          .as("gaps"))
      .select(col("user_id"),
        size(col("arr")).cast("long").as("n_events"),
        (element_at(col("arr"), size(col("arr"))) - element_at(col("arr"), 1))
          .as("span_ms"),
        array_max(col("gaps")).as("max_gap_ms"),
        element_at(array_sort(col("gaps")),
          ceil(size(col("gaps")) / lit(2.0)).cast("int")).as("median_gap_ms"))
  }

  /** Gap-filled hourly value series per group with LINEAR interpolation:
    * exact fixed-point hourly sums (micro-units, partitioning-immune), a
    * dense hour spine per group spanning its observed [min, max] hours, and
    * interior gaps filled as
    * `prev + (next − prev) · (h − prevH)/(nextH − prevH)` — the standard
    * resample-and-interpolate step feeding any downstream per-hour model
    * (the seasonal baseline, drift monitors) that assumes a dense series.
    *
    * Scale shape: the one heavy pass is the hourly `groupBy` over the raw
    * events, which combines map-side to one row per (group, hour).  The
    * spine, join, and the four ignore-null window scans all run on that
    * hourly table — cardinality (groups × hours-in-range), bounded by the
    * calendar, not the data; a year of hours is 8 760 rows per group no
    * matter how many trillion events fed them.  Spine endpoints are
    * observed hours, so every gap has both neighbours and no output is
    * null.  The interpolation arithmetic is fixed operand order over
    * micro-unit longs, reproducible across engines at 6 dp. */
  def interpolateHourly(events: DataFrame, typ: Column, ts: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hr = floor(unix_micros(ts) / lit(3600000000L)).cast("long")
    val hourly = events
      .select(typ.as("event_type"), hr.as("hr"),
        floor(value * lit(1000000.0)).cast("long").as("vmic"))
      .groupBy("event_type", "hr").agg(sum("vmic").as("vmic"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hr"))
    val wPrev = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(0, Window.unboundedFollowing)
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("pv", last(col("vmic"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(col("vmic").isNotNull, col("hr")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("vmic"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when(col("vmic").isNotNull, col("hr")),
        ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("hr"),
        col("vmic").isNull.as("interpolated"),
        round(
          when(col("vmic").isNotNull, col("vmic").cast("double") / lit(1000000.0))
            .otherwise(
              (col("pv").cast("double") / lit(1000000.0)) +
                ((col("nv") - col("pv")).cast("double") / lit(1000000.0)) *
                  ((col("hr") - col("ph")).cast("double") /
                    (col("nh") - col("ph")).cast("double"))),
          6).as("val"))
  }

  /** Slowly-changing-dimension (type 2) intervalization of an event log:
    * each key's time-ordered attribute observations become validity
    * intervals `[valid_from, valid_to)` — `valid_to` is the NEXT
    * observation's timestamp (exclusive), null for the current row.  The
    * event-sourcing → dimension-table build: replaying a mutation log into
    * the temporal table that point-in-time joins (the as-of join) probe.
    *
    * One hash shuffle on the key; the `lead` window partitions BY KEY, so
    * parallelism is the key cardinality and per-partition state is one
    * key's history — no global sort, no single-partition window.  Ties on
    * ts are ordered by `id` (the deterministic arrival tiebreak).
    * Timestamps are exact microsecond longs. */
  def scd2Intervals(events: DataFrame, key: Column, ts: Column, id: Column,
      attr: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("us"), col("id"))
    events.select(key.as("key"), unix_micros(ts).as("us"), id.as("id"),
        attr.as("attr"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("key"), col("attr"), col("us").as("valid_from_us"),
        col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Top path n-grams: each key's time-ordered event-type sequence is cut
    * into sliding n-grams and the corpus-wide n-gram counts returned — the
    * sequence-mining card behind funnel design ("what do users actually do
    * in order?"), generalizing the first-order [[transitionMatrix]] to
    * order `n`.
    *
    * One hash shuffle groups each key's events (map-side list collect);
    * sorting and n-gram slicing happen INSIDE the per-key aggregate row
    * (the same per-key-history envelope as [[funnelStages]] — per-key
    * sequence length is the bound, not the corpus), and the n-gram count
    * is a second map-side-combinable aggregate.  Ties on ts order by id. */
  def pathNgrams(events: DataFrame, key: Column, ts: Column, id: Column,
      typ: Column, n: Int): DataFrame = {
    require(n >= 2, "n must be at least 2")
    val seqs = events
      .select(key.as("key"), struct(unix_micros(ts).as("us"), id.as("id"),
        typ.as("typ")).as("ev"))
      .groupBy("key")
      .agg(array_sort(collect_list(col("ev"))).as("evs"))
      .select(transform(col("evs"), e => e.getField("typ")).as("types"))
    seqs.where(size(col("types")) >= n)
      .select(explode(transform(sequence(lit(0), size(col("types")) - n),
        i => concat_ws(">", slice(col("types"), i + 1, lit(n))))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
  }

  /** Point-in-time trailing-window features: for every `target`-type event,
    * the count of `signal`-type events by the same key inside each trailing
    * horizon `[t − h, t]` — the feature-backfill primitive for training
    * tables ("clicks in the last hour / day at purchase time"), computed
    * WITHOUT a self-join: one per-key window pass with RANGE frames over
    * the microsecond timeline produces every horizon at once.
    *
    * Leakage-safe by construction: frames end at the current row, so no
    * future event can contribute to a feature (the train-serve-skew bug a
    * naive join-on-hour commits).  One hash shuffle on the key; the window
    * partitions BY KEY (parallelism = key cardinality, state = one key's
    * history).  Counting is indicator-sum, so the pass is a native codegen
    * window aggregate. */
  def trailingFeatures(events: DataFrame, key: Column, ts: Column,
      id: Column, typ: Column, target: String, signal: String,
      horizonsMs: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(horizonsMs.nonEmpty, "at least one horizon required")
    val base = events.select(key.as("key"), unix_micros(ts).as("us"),
      id.as("id"), typ.as("typ"),
      when(typ === signal, 1L).otherwise(0L).as("sig"))
    val withFeatures = horizonsMs.foldLeft(base) { (d, h) =>
      val w = Window.partitionBy("key").orderBy("us")
        .rangeBetween(-h * 1000L, 0L)
      d.withColumn(s"n_${signal}_${h}ms", sum(col("sig")).over(w))
    }
    withFeatures.where(col("typ") === target)
      .select(col("id").as("event_id") +: col("key") +: col("us") +:
        horizonsMs.map(h => col(s"n_${signal}_${h}ms")): _*)
  }

  /** Per-group OLS trend of hourly activity: the least-squares slope (and
    * intercept) of hourly event counts against the hour index — the
    * is-this-source-growing gauge.  Hours are re-based to each group's
    * first hour so every sum (Σx, Σx², Σxy, Σy) stays an exact long at any
    * calendar span; slope/intercept are ONE double division over integer
    * sums — bit-reproducible across engines, no rounding needed.  Two
    * map-side-combinable aggregates (events → hourly, hourly → sums) and a
    * broadcast-sized per-group min-hour join. */
  def trendSlope(events: DataFrame, typ: Column, ts: Column): DataFrame = {
    val hr = floor(unix_micros(ts) / lit(3600000000L)).cast("long")
    // persisted: both the min-hour probe and the re-based sums derive
    // from the hourly table — one corpus pass, not two
    val hourly = graft.core.CacheScope.persist(
      events.select(typ.as("event_type"), hr.as("hr"))
        .groupBy("event_type", "hr").agg(count(lit(1)).as("y")),
      eager = false)
    val mins = hourly.groupBy("event_type").agg(min("hr").as("mn"))
    val sums = hourly.join(broadcast(mins), "event_type")
      .withColumn("x", col("hr") - col("mn"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    sums
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select("event_type", "n", "slope", "intercept")
  }

  /** Exact per-group distribution-shape card: skewness and excess kurtosis
    * of the value column from integer power sums.  Values integerize to
    * milli-units; the four power sums accumulate in decimal(38,0) (vm⁴ at
    * vm ≈ 5·10⁵ needs 128-bit headroom), so every sufficient statistic is
    * an exact integer under any partitioning.  The final central-moment
    * arithmetic is fixed-operand-order doubles with `sqrt` (IEEE
    * correctly-rounded) instead of `pow` (libm) — reproducible across
    * engines at 6 dp.  One map-side-combinable aggregate. */
  def valueMoments(events: DataFrame, typ: Column, value: Column): DataFrame = {
    val vm = round(value * 1000).cast("long")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val sums = events.select(typ.as("event_type"), vm.as("vm"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vm").as("s1"),
        sum(d(col("vm")) * col("vm")).as("s2"),
        sum(d(col("vm")) * col("vm") * col("vm")).as("s3"),
        sum(d(col("vm")) * col("vm") * col("vm") * col("vm")).as("s4"))
    val n = col("n").cast("double")
    val mean = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - mean * mean
    val m3 = col("s3").cast("double") / n -
      lit(3.0) * mean * (col("s2").cast("double") / n) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4").cast("double") / n -
      lit(4.0) * mean * (col("s3").cast("double") / n) +
      lit(6.0) * mean * mean * (col("s2").cast("double") / n) -
      lit(3.0) * mean * mean * mean * mean
    sums.select(col("event_type"), col("n"),
      round(mean / lit(1000.0), 6).as("mean"),
      round(m3 / (m2 * sqrt(m2)), 6).as("skewness"),
      round(m4 / (m2 * m2) - lit(3.0), 6).as("excess_kurtosis"))
  }

  /** Two-sample experiment card: per-variant count/mean and the Welch
    * z-statistic of the metric difference, from ONE map-side-combinable
    * aggregate (conditional fixed-point power sums per arm — the metric
    * stream shuffles six longs, not rows).  Variance is the population
    * form (÷n); z = (m₁−m₀)/√(v₁/n₁+v₀/n₀) with `sqrt` (IEEE-exact), all
    * operand order fixed — reproducible at 6 dp.  The experimentation
    * readout behind data-mix A/B runs. */
  def abTestCard(events: DataFrame, variant: Column,
      value: Column): DataFrame = {
    val vm = round(value * 1000).cast("long")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val s = events.select(variant.as("arm"), vm.as("vm"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("vm")).otherwise(0L)).as("s0"),
        sum(when(col("arm") === 0, d(col("vm")) * col("vm"))
          .otherwise(d(lit(0)))).as("q0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("vm")).otherwise(0L)).as("s1"),
        sum(when(col("arm") === 1, d(col("vm")) * col("vm"))
          .otherwise(d(lit(0)))).as("q1"))
    val n0 = col("n0").cast("double"); val n1 = col("n1").cast("double")
    val m0 = col("s0").cast("double") / n0
    val m1 = col("s1").cast("double") / n1
    val v0 = col("q0").cast("double") / n0 - m0 * m0
    val v1 = col("q1").cast("double") / n1 - m1 * m1
    s.select(col("n0"), col("n1"),
      round(m0 / lit(1000.0), 6).as("mean0"),
      round(m1 / lit(1000.0), 6).as("mean1"),
      round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6).as("z"))
  }

  /** Item co-occurrence with lift: for every item pair (i < j), the count
    * of users who touched BOTH, and `lift = n_co·N / (n_i·n_j)` (observed
    * over expected-under-independence co-engagement) — the co-visitation
    * similarity behind item-to-item recommendation and bundle mining.
    *
    * The (user, item) incidence is deduplicated first, so a user counts
    * once per item; the pair generation is a same-user self-join whose
    * fan-out is each user's ITEM-SET size (catalog-bounded), not their
    * event count.  At a web-scale catalog, cap per-user item sets or
    * df-filter hot items first (the same postings-cap discipline as the
    * Jaccard pair miner).  Lift is integer-exact until one final double
    * division. */
  def itemCooc(events: DataFrame, user: Column, item: Column): DataFrame = {
    val ui = events.select(user.as("u"), item.as("item"))
      .where(col("item").isNotNull).distinct()
    val ni = ui.groupBy("item").agg(count(lit(1)).as("n_item"))
    val nu = ui.agg(countDistinct(col("u")).as("n_users"))
    val b = ui.select(col("u"), col("item").as("item_b"))
    val pairs = ui.join(b, ui("u") === b("u") && col("item") < col("item_b"))
      .groupBy(col("item").as("i"), col("item_b").as("j"))
      .agg(count(lit(1)).as("n_co"))
    pairs
      .join(broadcast(ni.select(col("item").as("i"), col("n_item").as("n_i"))), "i")
      .join(broadcast(ni.select(col("item").as("j"), col("n_item").as("n_j"))), "j")
      .crossJoin(broadcast(nu))
      .select(col("i"), col("j"), col("n_co"),
        ((col("n_co") * col("n_users")).cast("double") /
          (col("n_i") * col("n_j")).cast("double")).as("lift"))
  }

  /** RFM (recency / frequency / monetary) segmentation: per-user last
    * activity, event count, and exact micro-unit value mass, each ranked
    * into quintiles by the range-partitioned [[graft.core.Ranker]] (NO
    * single-partition window over the user space — the classic `ntile(5)`
    * formulation cannot scale out), then the (R, F, M) cell census.
    * Quintile 1 = most recent / most frequent / highest value; all
    * boundaries are exact integer arithmetic with (metric, user_id)
    * tie-breaks, so the segmentation is deterministic and
    * engine-reproducible. */
  def rfmSegments(events: DataFrame, user: Column, ts: Column,
      value: Column): DataFrame = {
    val perUser = events.select(user.as("user_id"),
        unix_micros(ts).as("us"),
        floor(value * lit(1000000.0)).cast("long").as("vmi"))
      .groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("f"),
        sum("vmi").as("m"))
    val ref = perUser.agg(max("last_us").as("ref_us"),
      count(lit(1)).as("n"))
    val x = perUser.crossJoin(broadcast(ref))
      .withColumn("r_days", expr("(ref_us - last_us) div 86400000000"))
    val ranked = Seq(
      ("rk_r", Seq(col("r_days").asc, col("user_id").asc)),
      ("rk_f", Seq(col("f").desc, col("user_id").asc)),
      ("rk_m", Seq(col("m").desc, col("user_id").asc))
    ).foldLeft(x) { case (d, (name, ord)) =>
      graft.core.Ranker.withRank(d, name, ord: _*)
    }
    ranked
      .select(expr("1 + (5*rk_r) div n").as("r_q"),
        expr("1 + (5*rk_f) div n").as("f_q"),
        expr("1 + (5*rk_m) div n").as("m_q"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Within-session item co-occurrence: item pairs (i < j) touched by the
    * same user inside the same gap-session, with pair counts — the
    * co-visitation table restricted to one browsing intent, which is the
    * principled granularity for item-to-item affinity (the all-time
    * per-user variant, [[itemCooc]], conflates months-apart interests).
    * One keyed window builds the session ids (partitioned by user — never
    * single-partition), the (user, session, item) incidence is
    * deduplicated, and the pair join's fan-out is the per-SESSION item-set
    * size — far smaller than per-user at scale. */
  def sessionItemCooc(events: DataFrame, item: Column,
      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val si = events
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("item", item)
      .withColumn("is_start",
        when(col("ts_ms") - lag("ts_ms", 1).over(byUser) > gapMs, 1)
          .when(lag("ts_ms", 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("is_start").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("item").isNotNull)
      .select("user_id", "session_id", "item").distinct()
    val b = si.select(col("user_id").as("u2"), col("session_id").as("s2"),
      col("item").as("item_b"))
    si.join(b, col("user_id") === col("u2") &&
        col("session_id") === col("s2") && col("item") < col("item_b"))
      .groupBy(col("item").as("i"), col("item_b").as("j"))
      .agg(count(lit(1)).as("n_co"))
  }

  /** Gini concentration of a weight across keys (0 = uniform, →1 = one
    * key holds everything) — the catalog/source-skew gauge.  Weights are
    * ranked ascending via the range-partitioned [[graft.core.Ranker]] (no
    * single-partition window over the key space) and the classic
    * `(2·Σ rank·w − (n+1)·Σw) / (n·Σw)` form is computed from exact
    * integer sums with ONE final double division.  Tied weights get
    * arbitrary rank order among themselves, which provably does not change
    * Σ rank·w. */
  def giniConcentration(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val counts = df.select(key.as("k"), weight.cast("long").as("w"))
      .groupBy("k").agg(sum("w").as("w"))
    val ranked = graft.core.Ranker.withRank(counts, "__r",
      col("w").asc, col("k"))
    ranked.agg(count(lit(1)).as("n"), sum("w").as("s"),
        sum((col("__r") + 1) * col("w")).as("s1"))
      .select(col("n"), col("s").as("total"),
        ((lit(2) * col("s1") - (col("n") + 1) * col("s")).cast("double") /
          (col("n") * col("s")).cast("double")).as("gini"))
  }

  /** Cross-correlation of two event types' hourly series at lags
    * 0..maxLag: Pearson r between a(h) and b(h+ℓ) over the dense shared
    * hour spine (missing hours are true zeros, not gaps) — the does-A-
    * lead-B probe behind attribution-window and feature-horizon choices.
    *
    * The heavy pass is the hourly count aggregate; the spine, the ℓ-shift
    * join, and the per-lag moment sums all run on the calendar-bounded
    * hourly table.  Every sufficient statistic (n, Σa, Σb, Σab, Σa², Σb²)
    * is an exact long; r is one fixed-order double expression with IEEE
    * `sqrt`, reproducible at 6 dp. */
  def crossCorrelation(events: DataFrame, typ: Column, ts: Column,
      typeA: String, typeB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, "maxLag must be non-negative")
    val hr = floor(unix_micros(ts) / lit(3600000000L)).cast("long")
    val hourly = events.select(typ.as("t"), hr.as("hr"))
      .where(col("t").isin(typeA, typeB))
      .groupBy("t", "hr").agg(count(lit(1)).as("y"))
    val spine = hourly.agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("hr"))
    def series(t: String) = spine.join(
      hourly.where(col("t") === t).select(col("hr"), col("y")),
      Seq("hr"), "left").select(col("hr"), coalesce(col("y"), lit(0L)).as("y"))
    val a = series(typeA).select(col("hr"), col("y").as("ya"))
    val b = series(typeB).select(col("hr").as("hrb"), col("y").as("yb"))
    val lagged = a
      .select(col("hr"), col("ya"),
        explode(sequence(lit(0), lit(maxLag))).as("lag"))
      .join(b, col("hrb") === col("hr") + col("lag"))
    val sums = lagged.groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("ya").as("sa"), sum("yb").as("sb"),
        sum(col("ya") * col("yb")).as("sab"),
        sum(col("ya") * col("ya")).as("saa"),
        sum(col("yb") * col("yb")).as("sbb"))
    sums.select(col("lag"), col("n"),
      round((col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
        (sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double")) *
          sqrt((col("n") * col("sbb") - col("sb") * col("sb")).cast("double"))),
        6).as("r"))
  }
}
