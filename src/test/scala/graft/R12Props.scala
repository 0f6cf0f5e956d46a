package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops._

/** Property-style invariants over randomized shapes/seeds for the
  * round-12 samplers and divergence ops — real local Spark plans per
  * trial, so the trial counts stay small (the SamplingProps convention). */
object R12Props extends Properties("round12") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  private val genShape = for {
    n <- Gen.choose(20, 300)
    seed <- Gen.choose(0L, 1000000L)
  } yield (n, seed)

  property("bootstrapSample is deterministic and Poisson-mass-bounded") =
    Prop.forAll(genShape) { case (n, seed) =>
      val df = (1L to n.toLong).toDF("id")
      val a = SplitOps.bootstrapSample(df, col("id"), seed)
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      val b = SplitOps.bootstrapSample(df, col("id"), seed)
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      val total = a.values.sum
      // identical under re-run; total mass within 5 sd of n at λ=1
      a == b && math.abs(total - n.toLong) <= 5 * math.sqrt(n.toDouble) + 5
    }

  property("weightedQuotaSample keeps min(k, classSize) per class, deterministically") =
    Prop.forAll(genShape, Gen.choose(1, 10)) { case ((n, seed), k) =>
      val df = (1L to n.toLong).map(i => (i, (i % 3).toString, i % 5 + 1))
        .toDF("id", "cls", "w")
      val out = SplitOps.weightedQuotaSample(df, col("cls"), col("id"),
        col("w"), seed, k)
      val sizes = df.groupBy("cls").count().as[(String, Long)].collect().toMap
      val got = out.groupBy("cls").count().as[(String, Long)].collect().toMap
      val again = SplitOps.weightedQuotaSample(df, col("cls"), col("id"),
          col("w"), seed, k)
        .select("id").as[Long].collect().toSet
      got.forall { case (c, m) => m == math.min(k.toLong, sizes(c)) } &&
        again == out.select("id").as[Long].collect().toSet
    }

  property("jsDivergence stays in [0, ln 2] and is symmetric") =
    Prop.forAll(Gen.choose(0L, 100000L), Gen.choose(2, 30)) { (seed, nd) =>
      val r = new scala.util.Random(seed)
      val words = Vector("a", "b", "c", "dd", "ee", "ff", "gg")
      def corpus(tag: Int) = (1 to nd).map { i =>
        (0 until (r.nextInt(8) + 1)).map(_ =>
          words(r.nextInt(words.size))).mkString(" ")
      }.toDF("text")
      val x = corpus(0); val y = corpus(1)
      val ab = TextOps.jsDivergence(x, col("text"), y, col("text"))
        .select("js_nats").as[Double].head()
      val ba = TextOps.jsDivergence(y, col("text"), x, col("text"))
        .select("js_nats").as[Double].head()
      ab == ba && ab >= -1e-9 && ab <= math.log(2.0) + 1e-9
    }

  property("transitionMatrix probabilities normalize per from-type") =
    Prop.forAll(genShape) { case (n, seed) =>
      val r = new scala.util.Random(seed)
      val types = Vector("a", "b", "c")
      val ev = (1L to n.toLong).map(i =>
        (i % 7, new java.sql.Timestamp(1700000000000L + r.nextInt(1000000)),
          i, types(r.nextInt(3))))
        .toDF("user_id", "ts", "event_id", "event_type")
      val sums = EventOps.transitionMatrix(ev, col("user_id"), col("ts"),
          col("event_id"), col("event_type"))
        .groupBy("from_type").agg(sum("p").as("sp"))
        .select("sp").as[Double].collect()
      sums.forall(s => math.abs(s - 1.0) < 1e-4)
    }
}
