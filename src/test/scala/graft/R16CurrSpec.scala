package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{EmbedOps, SplitOps}

/** Curriculum scheduling and PCA whitening edge cases (bulk correctness =
  * DuckDB oracle replay of text_curriculum / emb_pca_gauge). */
class R16CurrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curriculumOrder: even buckets interleave easy->hard round-robin") {
    // scores make rank order = id order
    val df = (0L until 6L).map(i => (i, i * 10.0)).toDF("doc_id", "s")
    val out = SplitOps.curriculumOrder(df, col("s"), col("doc_id"), 2)
      .orderBy("sched_key")
      .select("doc_id", "bucket", "pos_in_bucket", "sched_key")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // buckets {0,1,2} easy / {3,4,5} hard; schedule alternates buckets
    assert(out === Seq((0L, 0L, 0L, 0L), (3L, 1L, 0L, 1L),
      (1L, 0L, 1L, 2L), (4L, 1L, 1L, 3L),
      (2L, 0L, 2L, 4L), (5L, 1L, 2L, 5L)))
  }

  test("curriculumOrder: uneven n keeps keys distinct, positions valid") {
    val df = (0L until 103L).map(i => (i, ((i * 37) % 101).toDouble))
      .toDF("doc_id", "s")
    val out = SplitOps.curriculumOrder(df, col("s"), col("doc_id"), 8)
    assert(out.count() === 103L)
    assert(out.select(countDistinct("sched_key")).as[Long].head === 103L)
    assert(out.where(col("pos_in_bucket") < 0).count() === 0)
    val sizes = out.groupBy("bucket").count().select("count")
      .as[Long].collect()
    assert(sizes.length === 8 && sizes.max - sizes.min <= 1)
  }

  test("pcaWhiten: anisotropic data becomes unit-variance per component") {
    // axis 0 has sd 10, axis 1 has sd 1, axis 2 constant
    val rng = new scala.util.Random(7)
    val rows = (0L until 4000L).map { i =>
      (i, Seq((rng.nextGaussian() * 10).toFloat,
        rng.nextGaussian().toFloat, 3f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val w = EmbedOps.pcaWhiten(df, col("vec_id"), col("embedding"),
      d = 3, k = 2)
    val vars = w.select(posexplode(col("pc")))
      .groupBy("pos")
      .agg((avg(col("col") * col("col")) -
        avg(col("col")) * avg(col("col"))).as("v"))
      .orderBy("pos").select("v").as[Double].collect()
    assert(vars.length === 2)
    vars.foreach(v => assert(v > 0.9 && v < 1.1, s"var $v not ~1"))
  }

  test("pcaFit: deterministic, trace = sum of per-dim variances") {
    val rows = (0L until 500L).map { i =>
      (i, Seq((i % 13).toFloat, (i % 7).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = EmbedOps.pcaFit(df, col("embedding"), d = 2, k = 2)
    val b = EmbedOps.pcaFit(df, col("embedding"), d = 2, k = 2)
    assert(a.components.flatten.toSeq === b.components.flatten.toSeq)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
    // population variance of (i%13): E[x²]−E[x]² over the 500-cycle
    val xs = (0L until 500L).map(_ % 13).map(_.toDouble)
    val ys = (0L until 500L).map(_ % 7).map(_.toDouble)
    def popVar(v: Seq[Double]) =
      v.map(x => x * x).sum / v.size - math.pow(v.sum / v.size, 2)
    assert(math.abs(a.trace - (popVar(xs) + popVar(ys))) < 1e-4)
    // top-2 eigenvalues of a 2-D covariance account for ALL the variance
    assert(math.abs(a.eigenvalues.sum - a.trace) < 1e-4)
  }
}
