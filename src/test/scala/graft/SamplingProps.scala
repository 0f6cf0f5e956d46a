package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.core._

/** Property-style invariants over randomized shapes/seeds, mirroring the
  * reference's hand-rolled invariant helpers (reference:
  * tests/conftest.py:104-117 assert_batches_cover_data /
  * assert_all_indices_unique; remainder-block semantics
  * strategy.py:536-554).  Each case runs a real local Spark plan, so the
  * trial count is kept deliberately small. */
object SamplingProps extends Properties("sampling") {
  lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private def collection(n: Int): ScCollection =
    ScCollection.fromDataFrame(
      spark.range(n.toLong).toDF("k")
        .withColumn("w", pmod(col("k"), lit(7)) + 1), col("k"))

  private val genShape = for {
    n <- Gen.choose(1, 400)
    bs <- Gen.choose(1, 64)
    seed <- Gen.choose(0L, 1000000L)
  } yield (n, bs, seed)

  property("blockShuffling covers every row exactly once, keeps intra-block order") =
    Prop.forAll(genShape) { case (n, bs, seed) =>
      val out = BlockShuffling(blockSize = bs).plan(collection(n), seed)
        .select("k", SamplingStrategy.Ord).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
      val ks = out.map(_._1)
      val coverage = ks.sorted.toSeq == (0L until n.toLong)
      val ordContig = out.map(_._2).toSeq == (0L until n.toLong)
      // within each source block, relative order of consecutive members kept
      val intraBlock = ks.toSeq.sliding(2).forall {
        case Seq(a, b) => (a / bs != b / bs) || b == a + 1
        case _ => true
      }
      coverage && ordContig && intraBlock
    }

  property("dropLast removes exactly n % blockSize rows, all blocks full") =
    Prop.forAll(genShape) { case (n, bs, seed) =>
      val st = BlockShuffling(blockSize = bs, dropLast = true)
      val kept = st.plan(collection(n), seed).select("k").collect().map(_.getLong(0))
      kept.length == n - n % bs && kept.distinct.length == kept.length &&
        st.outputLen(n.toLong) == n - n % bs
    }

  property("weighted with-replacement emits exactly totalSize rows") =
    Prop.forAll(for {
      (n, bs, seed) <- genShape
      total <- Gen.choose(1, 3 * n)
    } yield (n, bs, seed, total)) { case (n, bs, seed, total) =>
      val out = BlockWeightedSampling(col("w"), totalSize = total.toLong,
        blockSize = bs).plan(collection(n), seed)
      val ords = out.select(SamplingStrategy.Ord).collect().map(_.getLong(0))
      ords.length == total && ords.sorted.toSeq == (0L until total.toLong)
    }

  property("same seed reproduces the plan; different seed diverges (n large)") =
    Prop.forAll(Gen.choose(64, 300), Gen.choose(0L, 100000L)) { (n, seed) =>
      val sc = collection(n)
      val st = BlockShuffling(blockSize = 4)
      def ordMap(s: Long) = st.plan(sc, s).select("k", SamplingStrategy.Ord)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      ordMap(seed) == ordMap(seed) && ordMap(seed) != ordMap(seed + 1)
    }

  property("fetch windows confine the within-fetch permutation") =
    Prop.forAll(for {
      n <- Gen.choose(50, 400)
      bs <- Gen.choose(2, 32)
      ff <- Gen.choose(1, 8)
    } yield (n, bs, ff)) { case (n, bs, ff) =>
      val ds = ScDataset(collection(n), Streaming(shuffle = true),
        batchSize = bs, fetchFactor = ff, seed = 7L)
      val rows = ds.planFrame(0).select("k", "fetch_id", "__pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val fs = ds.fetchSize
      rows.forall { case (k, f, p) => p / fs == f && k / fs == f } &&
        rows.map(_._3).sorted.toSeq == (0L until n.toLong)
    }

  property("mixture sampling realizes the target domain shares") =
    Prop.forAll(for {
      seed <- Gen.choose(0L, 1000000L)
      pa <- Gen.choose(1L, 5L)
      pb <- Gen.choose(1L, 5L)
      pc <- Gen.choose(1L, 5L)
    } yield (seed, pa, pb, pc)) { case (seed, pa, pb, pc) =>
      val n = 900
      // hash-scattered domain layout: a PERIODIC layout (k % 3) can resonate
      // with the systematic-resampling threshold stride and bias the shares
      // — the documented caveat on BlockWeightedSampling; real corpora are
      // not weight-periodic
      val df = spark.range(n.toLong).toDF("k")
        .withColumn("dom", concat(lit("d"), pmod(abs(hash(col("k"))), lit(3))))
      val sc = ScCollection.fromDataFrame(df, col("k"))
      val parts = Map("d0" -> pa, "d1" -> pb, "d2" -> pc)
      val total = 2L * n
      val realized = MixtureSampling(col("dom"), parts, totalSize = total,
        blockSize = 8).plan(sc, seed)
        .groupBy("dom").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val p = (pa + pb + pc).toDouble
      realized.values.sum == total && parts.forall { case (d, pd) =>
        // the sampling unit is the BLOCK (reference semantics), so a
        // domain's realized count quantizes at block granularity: allow
        // 5% of target PLUS a couple of blocks — a per-row bound is too
        // tight for small domains (observed: smallest domain off by ~1.8
        // blocks at every seed for some weight combos)
        val expect = total * pd / p
        math.abs(realized.getOrElse(d, 0L) - expect) <=
          math.max(3.0, 0.05 * expect + 2.0 * 8)
      }
    }
}
