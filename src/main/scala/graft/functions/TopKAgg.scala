package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k per group as ONE typed aggregate: the buffer never
  * holds more than k (score, id) pairs, so the map-side partial aggregate
  * reduces each partition to k rows per group BEFORE the shuffle — the
  * scale-out alternative to `row_number() OVER (PARTITION BY g ORDER BY s)
  * <= k`, whose window must shuffle and sort EVERY row of every group.
  * At 100 TB the difference is the whole game: the window moves the corpus,
  * this moves (groups × k) rows.
  *
  * Ordering: by score DESCENDING, ties broken by id ASCENDING — the
  * deterministic total order every engine can mirror.  The buffer is kept
  * as a sorted Vector (k is small — the insert is a linear scan, not a
  * heap, so the state encoder stays a plain array).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {
  require(k > 0, "k must be positive")

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ x) ++ buf.drop(at).take(k - at - 1)
    }

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    insert(b, a)

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    y.foldLeft(x)(insert)

  /** ids in rank order (best first). */
  override def finish(r: Seq[(Long, Long)]): Seq[Long] = r.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
