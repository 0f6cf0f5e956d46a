package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed contiguous ranking and ordered prefix-sums.
  *
  * The reference engine materializes the entire sample order as one int64
  * index array on the driver (reference: src/scdataset/scdataset.py:487-488)
  * — impossible at 100 TB.  These helpers produce the same information as
  * *columns*, computed with a range-partitioned sort + per-partition offsets
  * (the TeraSort pattern): no global single-partition window, no driver-side
  * index arrays. Cost is one extra Spark job per call (to count rows per
  * partition), which is amortized over the downstream plan.
  */
object Ranker {

  /** Adds `out` = 0-based dense rank of each row under `order`.  `order`
    * must be a total order (include a unique tiebreaker column) so the rank
    * is deterministic.  Equivalent to SQL `row_number() OVER (ORDER BY
    * order) - 1` but scales: the sort is range-partitioned instead of
    * collapsing to a single partition.
    */
  def withRank(df: DataFrame, out: String, order: Column*): DataFrame =
    rankOf(df.orderBy(order: _*), out)

  private def rankOf(sorted: DataFrame, out: String): DataFrame = {
    val spark = sorted.sparkSession
    val schema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(out, LongType, nullable = false))
    // InternalRow path: no external-Row conversion.  toRdd rows are reused
    // by the scan, so copy() before retaining them in the JoinedRow.
    val rdd = sorted.queryExecution.toRdd.zipWithIndex().map { case (row, i) =>
      new org.apache.spark.sql.catalyst.expressions.JoinedRow(
        row.copy(), org.apache.spark.sql.catalyst.InternalRow(i))
        : org.apache.spark.sql.catalyst.InternalRow
    }
    org.apache.spark.sql.GraftBridge.internalDF(spark, rdd, schema)
  }

  /** Adds `out` = running sum of LONG column `value` (inclusive) in the
    * total order given by the existing contiguous rank column `rankCol`.
    * Exact (integer) arithmetic, so the result is independent of
    * partitioning — bit-identical to a sequential scan.  Two-phase:
    * per-partition partial sums are collected (one tiny row per partition)
    * and re-broadcast as offsets.
    */
  def withCumsumLong(df: DataFrame, rankCol: String, value: Column,
                     out: String): DataFrame =
    withCumsumLongAndTotal(df, rankCol, value, out)._1

  /** [[withCumsumLong]] plus the grand total (= the final running-sum
    * value), which the two-phase pass computes anyway from the per-partition
    * partials — callers that need `max(out)` save an entire extra pass over
    * the data.
    *
    * Physical shape, fast path first: in this engine the cumsum input is
    * almost always the output of [[withRank]] (sort + zipWithIndex), a
    * previous cumsum, or a ranked scan — whose partitions already TILE the
    * rank order (each partition holds a sorted run of ranks strictly below
    * the next partition's).  The probe pass verifies that property while
    * computing the per-partition partial sums; when it holds, offsets apply
    * directly on the existing partitioning — no repartitionByRange (which
    * costs a range-sampling job), no shuffle, no sort.  Only when the probe
    * finds out-of-order partitions does it fall back to the range-sort
    * path.  Integer partial sums are associative, so both paths are
    * bit-identical. */
  def withCumsumLongAndTotal(df: DataFrame, rankCol: String, value: Column,
                             out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val rankIsLong = df.schema(rankCol).dataType == LongType
    if (rankIsLong) {
      val prep = df.withColumn("__cs_v", value.cast(LongType))
      val base = prep.queryExecution.toRdd
      val vIdx = prep.schema.fieldIndex("__cs_v")
      val rIdx = prep.schema.fieldIndex(rankCol)
      // probe: per-partition (sum, min rank, max rank, sorted?, count)
      val probe = base.mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; var cnt = 0L; var sorted = true
        var minR = Long.MaxValue; var maxR = Long.MinValue; var prev = Long.MinValue
        it.foreach { r =>
          val rk = r.getLong(rIdx)
          if (rk < prev) sorted = false
          prev = rk
          if (rk < minR) minR = rk
          if (rk > maxR) maxR = rk
          s += r.getLong(vIdx); cnt += 1
        }
        Iterator((pid, s, minR, maxR, sorted, cnt))
      }.collect().sortBy(_._1)
      val tiled = {
        var prevMax = Long.MinValue; var ok = true
        probe.foreach { case (_, _, mn, mx, srt, cnt) =>
          if (cnt > 0) {
            if (!srt || mn <= prevMax) ok = false
            prevMax = mx
          }
        }
        ok
      }
      if (tiled) {
        val offsets: Map[Int, Long] = {
          var acc = 0L
          probe.map { case (pid, s, _, _, _, _) =>
            val o = (pid, acc); acc += s; o
          }.toMap
        }
        val bc = spark.sparkContext.broadcast(offsets)
        val schema = StructType(prep.schema.fields :+
          org.apache.spark.sql.types.StructField(out, LongType, nullable = false))
        val rdd = base.mapPartitionsWithIndex { (pid, it) =>
          var run = bc.value.getOrElse(pid, 0L)
          it.map { row =>
            run += row.getLong(vIdx)
            new org.apache.spark.sql.catalyst.expressions.JoinedRow(
              row.copy(), org.apache.spark.sql.catalyst.InternalRow(run))
              : org.apache.spark.sql.catalyst.InternalRow
          }
        }
        val result = org.apache.spark.sql.GraftBridge.internalDF(spark, rdd, schema)
          .drop("__cs_v")
        return (result, probe.map(_._2).sum)
      }
    }
    sortedCumsum(df, rankCol, value, out)
  }

  /** Range-sort cumsum — the fallback for inputs whose partitioning does
    * not already tile the rank order. */
  private def sortedCumsum(df: DataFrame, rankCol: String, value: Column,
                           out: String): (DataFrame, Long) = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val n = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val prepared = df
      .withColumn("__cs_v", value.cast(LongType))
      .repartitionByRange(n, col(rankCol))
      .sortWithinPartitions(col(rankCol))
    // CRITICAL: both passes (partial sums, offset-apply) must run over the
    // SAME RDD instance — the zipWithIndex pattern.  Deriving them from two
    // DataFrame plans (e.g. a pruned .select for the partials) lets AQE
    // coalesce the two shuffles into DIFFERENT partitionings, silently
    // misaligning the offsets (observed: 132/30000 rows lost).  A single
    // instance has an immutable partition array and job 2 reuses job 1's
    // shuffle files.  No cache needed — this also fixes the former
    // never-unpersisted full-DataFrame cache leak.
    val base = prepared.queryExecution.toRdd
    val vIdx = prepared.schema.fieldIndex("__cs_v")
    val partials: Array[(Int, Long)] = base
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((pid, s))
      }.collect()
    val offsets: Map[Int, Long] = {
      val sorted = partials.sortBy(_._1)
      var acc = 0L
      sorted.map { case (pid, s) => val o = (pid, acc); acc += s; o }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(prepared.schema.fields :+
      org.apache.spark.sql.types.StructField(out, LongType, nullable = false))
    val rdd = base.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value.getOrElse(pid, 0L)
      it.map { row =>
        run += row.getLong(vIdx)
        new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          row.copy(), org.apache.spark.sql.catalyst.InternalRow(run))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val result = org.apache.spark.sql.GraftBridge.internalDF(spark, rdd, schema)
      .drop("__cs_v")
    (result, partials.map(_._2).sum)
  }
}
