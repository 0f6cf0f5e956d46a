package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-12am surface: the DSv2 generator source. */
class R12amSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gen(rows: Long, parts: Int, seed: Long) =
    spark.read.format("graft.sources.GraftGenSource")
      .option("rows", rows.toString).option("parts", parts.toString)
      .option("seed", seed.toString).load()

  test("generator emits exactly rows across the declared partitions") {
    val df = gen(10000L, 8, 7L)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 10000L)
    assert(df.agg(sum("id")).head().getLong(0) == 10000L * 9999L / 2)
    // cell formulas match the scalar reference
    val r = df.where(col("id") === 123L).head()
    assert(r.getInt(1) == graft.sources.GraftGenSource.bucketOf(123L, 7L))
    assert(r.getDouble(2) == graft.sources.GraftGenSource.valOf(123L, 7L))
  }

  test("column pruning reaches the connector (pruned schema, same rows)") {
    val pruned = gen(1000L, 4, 0L).select("bucket")
    assert(pruned.schema.fieldNames.toSeq == Seq("bucket"))
    assert(pruned.count() == 1000L)
    // the scan's read schema (what the reader materializes) is pruned
    val scanLine = pruned.queryExecution.executedPlan.toString
    assert(scanLine.contains("ReadSchema") || scanLine.contains("bucket"))
    // uneven division: last partition short
    assert(gen(10L, 3, 0L).count() == 10L)
  }
}
