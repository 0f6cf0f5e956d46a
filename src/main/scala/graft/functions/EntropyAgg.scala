package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Shannon entropy of a categorical column as ONE typed aggregate — the
  * single-operator form of the three-stage count/window/sum pipeline in the
  * `a2_batch_entropy` query (reference metric: benchmarks/utils.py:246-259).
  *
  * The buffer is the per-group category→count map (map-side combinable, so
  * partial aggregation applies); `finish` folds the counts in KEY-SORTED
  * order from 0.0, making the double result independent of merge order and
  * partitioning.  Register with `functions.udaf(EntropyAgg)` for untyped
  * `groupBy(...).agg(...)` use.
  */
object EntropyAgg extends Aggregator[String, Map[String, Long], Double] {

  override def zero: Map[String, Long] = Map.empty

  /** Nulls are skipped (SQL-aggregate convention: count(col) ignores NULL);
    * admitting them would also NPE finish's String key sort. */
  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(m: Map[String, Long]): Double = {
    if (m.isEmpty) return 0.0
    val tot = m.values.sum.toDouble
    val ln2 = math.log(2.0)
    val ent = m.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
      val p = c / tot
      acc + p * (math.log(p) / ln2)
    }
    0.0 - ent
  }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
