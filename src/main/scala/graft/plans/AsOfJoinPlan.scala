package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, HashPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator custom plan node: the backward as-of join as a first-
  * class Catalyst operator — `LogicalPlan` + `SparkStrategy` + physical
  * `BinaryExecNode` — instead of the union + keyed-window composition in
  * [[graft.ops.EventOps.asofJoin]].
  *
  * The physical operator declares `requiredChildDistribution` (both sides
  * clustered on the key) and `requiredChildOrdering` ((key, ts, id)
  * ascending), so EnsureRequirements plans ONE co-partitioned shuffle +
  * sort per side, and the join itself is a streaming two-pointer merge:
  * per partition, O(|L| + |R|) with O(1) state — no window buffer, no
  * union row-widening, no per-row range probe.  This is the plan shape a
  * dedicated engine (kdb, QuestDB, DuckDB ASOF) uses, expressed as a
  * Spark operator so Catalyst still handles distribution, AQE, and
  * column pruning around it.
  *
  * Child contracts (the DSL wrapper in [[graft.ops.EventOps]] arranges
  * these projections): left = (k long, ts long, left_id long);
  * right = (k long, ts long, r_id long, r_val double).  Match: the right
  * row with the greatest (ts, r_id) such that `r.ts <= l.ts` under the
  * same key — ties at the left instant are eligible, equal right
  * timestamps resolve to the greatest id, exactly the composed
  * operator's documented tie-break.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    forward: Boolean = false, toleranceUs: Long = -1L,
    nearest: Boolean = false,
    output: Seq[Attribute] = AsOfJoin.defaultOutput())
  extends org.apache.spark.sql.catalyst.plans.logical.BinaryNode {
  // the output attributes are PRODUCED here, not projected from children —
  // without this the analyzer reads them as missing references
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the merge consumes EVERY child column (the wrapper already projects
  // the children to the minimal (k, ts, id[, val]) shape); without this
  // ColumnPruning sees no referenced child attributes and empties both
  // sides
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  def defaultOutput(): Seq[Attribute] = Seq(
    AttributeReference("left_id", LongType, nullable = true)(),
    AttributeReference("k", LongType, nullable = true)(),
    AttributeReference("ts", LongType, nullable = true)(),
    AttributeReference("matched_id", LongType, nullable = true)(),
    AttributeReference("matched_value", DoubleType, nullable = true)())
}

/** Optimizer rule: a Filter above [[AsOfJoin]] whose condition references
  * ONLY the key output column pushes to BOTH children (the key passes
  * through the join unchanged, and every match shares the left row's key,
  * so filtering the right side by the same predicate drops only rows that
  * could never match).  This is the pushdown Catalyst cannot derive for a
  * black-box node — after it fires, the ordinary rules carry the
  * predicate all the way into the parquet scan.
  * Registered via `injectOptimizerRule` / `experimental.extraOptimizations`. */
object AsOfJoinKeyFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoin)
        if cond.references.subsetOf(
          org.apache.spark.sql.catalyst.expressions.AttributeSet(
            Seq(j.output(1)))) &&
          cond.deterministic =>
      val kOut = j.output(1)
      def remap(target: CExpr): CExpr = cond.transform {
        case a: AttributeReference if a.exprId == kOut.exprId => target
      }
      val newLeft = Filter(remap(j.left.output.head), j.left)
      val newRight = Filter(remap(j.right.output.head), j.right)
      j.copy(left = newLeft, right = newRight)
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]].  Registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * appended to `spark.experimental.extraStrategies` by the DSL wrapper. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, fwd, tol, near, out) =>
      AsOfJoinExec(out, planLater(l), planLater(r), fwd, tol, near) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge.  `forward = false` (default): match the right
  * row with the greatest (ts, id) such that `r.ts <= l.ts`; `forward =
  * true`: the right row with the SMALLEST (ts, id) such that
  * `r.ts >= l.ts`.  `toleranceUs >= 0` bounds the match's staleness
  * (backward: `l.ts − r.ts`; forward: `r.ts − l.ts`) — the single
  * nearest candidate is checked at emit, which is sufficient because any
  * other eligible row is strictly farther. */
case class AsOfJoinExec(output: Seq[Attribute], left: SparkPlan,
    right: SparkPlan, forward: Boolean = false,
    toleranceUs: Long = -1L, nearest: Boolean = false)
  extends BinaryExecNode {

  // standard operator observability: output rows and how many actually
  // matched (the null-match rate is the first thing to check when an
  // as-of enrichment looks wrong)
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output.head)),
    ClusteredDistribution(Seq(right.output.head)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    left.output.take(3).map(SortOrder(_, Ascending)),
    right.output.take(3).map(SortOrder(_, Ascending)))

  // the left child is hash-partitioned on ITS `k` attribute; downstream
  // operators only see THIS node's output attributes, so the partitioning
  // must be re-expressed in terms of output(1) (the k we emit) or it can
  // never satisfy a downstream distribution requirement and a chained
  // keyed op on k pays a needless shuffle
  override def outputPartitioning: Partitioning = {
    val remap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute] =
      Map(left.output(0).exprId -> output(1),  // k
          left.output(1).exprId -> output(2),  // ts
          left.output(2).exprId -> output(0))  // left_id
    left.outputPartitioning match {
      case h: HashPartitioning
          if h.references.forall(a => remap.contains(a.exprId)) =>
        h.copy(expressions = h.expressions.map(_.transform {
          case a: Attribute if remap.contains(a.exprId) => remap(a.exprId)
        }))
      case p => UnknownPartitioning(p.numPartitions)
    }
  }

  // the merge emits left rows in their incoming order — the left child is
  // sorted (k, ts, left_id) ascending, and those columns map to
  // output(1), output(2), output(0) of THIS node's schema.  Declaring the
  // output-column order (left_id first) would let EnsureRequirements
  // elide a downstream Sort on left_id that the data does not satisfy.
  override def outputOrdering: Seq[SortOrder] =
    Seq(output(1), output(2), output(0)).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val types = output.map(_.dataType).toArray
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(types)
      val out = new GenericInternalRow(5)
      new Iterator[InternalRow] {
        // lookahead right row not yet consumed (rows from execute() are
        // reused buffers — only primitive fields are retained, never rows)
        private var rRow: InternalRow = _
        // current as-of candidate: the latest right (ts, id) seen for candK
        private var candK = 0L
        private var candHas = false
        private var candTs = 0L
        private var candId = 0L
        private var candVal = 0.0
        private var candValNull = false

        override def hasNext: Boolean = lIt.hasNext

        // SQL null semantics handled IN the merge (no wrapper probe, no
        // union): the declared ASC ordering sorts nulls FIRST, so
        // null-keyed/null-ts rows arrive before any mergeable row —
        // left nulls emit unmatched, right nulls are discarded on
        // sight, and the two-pointer invariant is untouched.
        private def rNull: Boolean =
          rRow.isNullAt(0) || rRow.isNullAt(1)

        override def next(): InternalRow = {
          val l = lIt.next()
          if (l.isNullAt(0) || l.isNullAt(1)) {
            if (l.isNullAt(2)) out.setNullAt(0) else out.setLong(0, l.getLong(2))
            if (l.isNullAt(0)) out.setNullAt(1) else out.setLong(1, l.getLong(0))
            if (l.isNullAt(1)) out.setNullAt(2) else out.setLong(2, l.getLong(1))
            out.setNullAt(3); out.setNullAt(4)
            numOut += 1
            return proj(out)
          }
          val k = l.getLong(0)
          val ts = l.getLong(1)
          // left_id nullability is independent of (k, ts): a null id with a
          // valid key still merges, it just emits a null id (not id 0)
          val lidNull = l.isNullAt(2)
          val lid = if (lidNull) 0L else l.getLong(2)
          var done = false
          if (nearest) {
            // like backward, but park at the first row STRICTLY after the
            // left instant: rows AT the instant are backward candidates
            // (Δ=0, and the nearest tie rule prefers the backward side)
            while (!done) {
              if (rRow == null) {
                if (rIt.hasNext) rRow = rIt.next() else done = true
              }
              if (!done) {
                if (rNull) { rRow = null }
                else {
                val rk = rRow.getLong(0)
                val rts = rRow.getLong(1)
                if (rk < k) rRow = null
                else if (rk == k && rts <= ts) {
                  candK = k
                  candHas = true
                  candTs = rts
                  candId = rRow.getLong(2)
                  candValNull = rRow.isNullAt(3)
                  candVal = if (candValNull) 0.0 else rRow.getDouble(3)
                  rRow = null
                } else done = true
                }
              }
            }
            val bwdOk = candHas && candK == k &&
              (toleranceUs < 0L || ts - candTs <= toleranceUs)
            val fwdParked = rRow != null && rRow.getLong(0) == k
            val fwdOk = fwdParked && (toleranceUs < 0L ||
              rRow.getLong(1) - ts <= toleranceUs)
            // smaller |Δ| wins; a tie goes to the backward row
            val useFwd = fwdOk &&
              (!bwdOk || (rRow.getLong(1) - ts) < (ts - candTs))
            if (lidNull) out.setNullAt(0) else out.setLong(0, lid)
            out.setLong(1, k)
            out.setLong(2, ts)
            if (useFwd) {
              out.setLong(3, rRow.getLong(2))
              if (rRow.isNullAt(3)) out.setNullAt(4)
              else out.setDouble(4, rRow.getDouble(3))
            } else if (bwdOk) {
              out.setLong(3, candId)
              if (candValNull) out.setNullAt(4) else out.setDouble(4, candVal)
            } else { out.setNullAt(3); out.setNullAt(4) }
            numOut += 1
            if (useFwd || bwdOk) numMatched += 1
            return proj(out)
          }
          if (!forward) {
            while (!done) {
              if (rRow == null) {
                if (rIt.hasNext) rRow = rIt.next() else done = true
              }
              if (!done) {
                if (rNull) { rRow = null }
                else {
                val rk = rRow.getLong(0)
                val rts = rRow.getLong(1)
                if (rk < k) rRow = null // behind the left cursor: discard
                else if (rk == k && rts <= ts) {
                  candK = k
                  candHas = true
                  candTs = rts
                  candId = rRow.getLong(2)
                  candValNull = rRow.isNullAt(3)
                  candVal = if (candValNull) 0.0 else rRow.getDouble(3)
                  rRow = null
                } else done = true // ahead of the left cursor: keep for later
                }
              }
            }
          } else {
            // forward: park the cursor on the FIRST right row with
            // (rk, rts) >= (k, ts); rows strictly before it can never
            // match a later left row either (left ts is ascending)
            while (!done) {
              if (rRow == null) {
                if (rIt.hasNext) rRow = rIt.next() else done = true
              }
              if (!done) {
                if (rNull) { rRow = null }
                else {
                val rk = rRow.getLong(0)
                val rts = rRow.getLong(1)
                if (rk < k || (rk == k && rts < ts)) rRow = null
                else done = true
                }
              }
            }
            candHas = rRow != null && rRow.getLong(0) == k
            if (candHas) {
              candK = k
              candTs = rRow.getLong(1)
              candId = rRow.getLong(2)
              candValNull = rRow.isNullAt(3)
              candVal = if (candValNull) 0.0 else rRow.getDouble(3)
            }
          }
          val within = candHas && candK == k && (toleranceUs < 0L ||
            (if (forward) candTs - ts else ts - candTs) <= toleranceUs)
          if (lidNull) out.setNullAt(0) else out.setLong(0, lid)
          out.setLong(1, k)
          out.setLong(2, ts)
          if (within) {
            out.setLong(3, candId)
            if (candValNull) out.setNullAt(4) else out.setDouble(4, candVal)
          } else { out.setNullAt(3); out.setNullAt(4) }
          numOut += 1
          if (within) numMatched += 1
          proj(out)
        }
      }
    }
  }
}
