package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact fixed-point Gram/covariance statistics of a d-dim vector column
  * as ONE typed aggregate — the distributed-linear-algebra primitive
  * behind PCA/whitening (MLlib's Gramian pattern: each partition folds its
  * rows into a d×d upper triangle locally, and only the
  * `1 + d + d(d+1)/2` longs ever merge or shuffle, never the vectors).
  *
  * Fixed point makes the result partitioning/merge-order immune AND
  * engine-portable: per row, `q_ij += floor(x_i·x_j·10^12)` and
  * `s_i += floor(x_i·10^9)` — float32 inputs widen to double exactly, the
  * product is one IEEE op, so any engine computes the identical integer.
  *
  * Buffer layout: `[n, s_0..s_{d-1}, q_00, q_01, .., q_0(d-1), q_11, ..]`
  * (upper triangle, row-major).  Rows whose vector is null or wrongly
  * sized are skipped (counted rows all contributed fully).
  */
class GramAgg(d: Int)
    extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
  require(d > 0, "d must be positive")
  private val size = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(b: Array[Long], a: Seq[Float]): Array[Long] = {
    if (a == null || a.size != d) return b
    b(0) += 1L
    var i = 0
    var qOff = 1 + d
    while (i < d) {
      val xi = a(i).toDouble
      b(1 + i) += math.floor(xi * 1e9).toLong
      var j = i
      while (j < d) {
        b(qOff + (j - i)) += math.floor(xi * a(j).toDouble * 1e12).toLong
        j += 1
      }
      qOff += d - i
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
