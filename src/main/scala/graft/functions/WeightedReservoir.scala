package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact distributed top-k selection for A-Res weighted reservoir sampling
  * (key = ln(u)/w; the k largest keys win — reference
  * BlockWeightedSampling without replacement, strategy.py:833-844).
  *
  * One narrow pass instead of a full sort: each partition keeps a bounded
  * mutable buffer (O(1) amortized append, compacted to the top k whenever
  * it doubles), merge unions and re-truncates, finish emits the selected
  * ids.  Order is total — (key DESC, id ASC) — so the selection is EXACTLY
  * the rows a global `ORDER BY key DESC, id LIMIT k` would pick,
  * independent of partitioning and merge order.  Buffers move between
  * executors kryo-serialized; the live object is mutated in place.
  *
  * Intended for k ≪ n (the typical reservoir regime — pick thousands from
  * billions).  For k comparable to n a data-wide rank is cheaper; callers
  * choose (see BlockWeightedSampling).
  */
case class WeightedReservoir(k: Int)
    extends Aggregator[(Double, Long), ArrayBuffer[(Double, Long)], Array[Long]] {
  require(k > 0)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    if (buf.length <= k) buf
    else {
      val top = buf.toArray.sortWith(better)
      buf.clear()
      buf ++= top.iterator.take(k)
      buf
    }

  override def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Double, Long)],
      a: (Double, Long)): ArrayBuffer[(Double, Long)] = {
    b += a
    if (b.length >= 2 * k) compact(b) else b
  }

  override def merge(x: ArrayBuffer[(Double, Long)],
      y: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    compact(x ++= y)

  override def finish(r: ArrayBuffer[(Double, Long)]): Array[Long] =
    r.toArray.sortWith(better).take(k).map(_._2)

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
