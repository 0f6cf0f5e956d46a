package graft.core

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Round-15 hardening of [[ScDataset.PrefetchedBatches]]: lazy start (a
  * close()d-unused handle never launches a Spark job), fail-fast producer
  * errors (never served stale buffered batches after a scan failure), and
  * close() surfacing an error the consumer never observed. */
class R15PrefetchSpec extends AnyFunSuite {

  private def producerAlive() = Thread.getAllStackTraces.keySet.asScala
    .exists(t => t.getName == "graft-batch-prefetch" && t.isAlive)

  private def awaitProducerDead(): Unit = {
    val deadline = System.nanoTime() + 5000000000L
    while (producerAlive() && System.nanoTime() < deadline) Thread.sleep(20)
  }

  test("lazy start: a handle close()d before any consumption never invokes " +
      "the source thunk (no Spark job) and starts no producer thread") {
    awaitProducerDead()
    var invoked = 0
    val it = new ScDataset.PrefetchedBatches(() => {
      invoked += 1
      java.util.Collections.emptyIterator[Row]()
    }, depth = 4)
    it.close()
    assert(invoked == 0, "source must not be touched before consumption")
    assert(!producerAlive(), "no producer thread for an unused handle")
    assert(!it.hasNext, "closed-unused handle is empty, not an error")
  }

  test("fail fast: a mid-stream producer failure surfaces on the next " +
      "hasNext even while batches sit buffered ahead of it") {
    val boom = new RuntimeException("scan died")
    // the producer blocks at its failure point until the consumer has
    // legitimately consumed row 1 — without the handshake this is a
    // race (fail-fast checks err BEFORE staged rows by design, so a
    // producer that reaches the failure before the consumer's first
    // hasNext makes even row 1 unservable — correct behavior, but not
    // the scenario this test pins)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val it = new ScDataset.PrefetchedBatches(() => new java.util.Iterator[Row] {
      private var i = 0
      def hasNext: Boolean = true
      def next(): Row = {
        i += 1
        if (i > 3) { gate.await(); throw boom }
        Row(i.toLong)
      }
    }, depth = 8)
    assert(it.hasNext) // starts the producer, stages row 1
    // row 1 is already staged and legitimately consumable; rows 2..3 are
    // buffered BEHIND the failure and must NOT be served
    it.next()
    gate.countDown() // release the failure
    awaitProducerDead()
    val e = intercept[RuntimeException](it.hasNext)
    assert(e eq boom, "the original producer error must propagate")
    // after delivery, the handle is closed and idempotent
    it.close()
  }

  test("close() rethrows a producer error the consumer never observed") {
    val boom = new RuntimeException("scan died early")
    val it = new ScDataset.PrefetchedBatches(() => new java.util.Iterator[Row] {
      def hasNext: Boolean = true
      def next(): Row = throw boom
    }, depth = 2)
    assert(intercept[RuntimeException](it.hasNext) eq boom)
    // error already delivered via hasNext → close() is a clean no-op
    it.close()

    // the undelivered-error path: the producer is started (first row read)
    // but fails in the background; the consumer abandons without another
    // hasNext — close() is the only place the error can surface
    val boom3 = new RuntimeException("fails after first row")
    val it3 = new ScDataset.PrefetchedBatches(() => new java.util.Iterator[Row] {
      private var i = 0
      def hasNext: Boolean = true
      def next(): Row = { i += 1; if (i > 1) throw boom3 else Row(1L) }
    }, depth = 4)
    assert(it3.hasNext) // row 1 staged; producer then fails in background
    awaitProducerDead()
    // consumer abandons mid-stream without seeing the error:
    val e = intercept[RuntimeException](it3.close())
    assert(e eq boom3, "close() must not swallow an unobserved scan failure")
    it3.close() // idempotent once delivered
  }

  test("multi-epoch reuse: per-epoch handles built eagerly, one skipped " +
      "(zero jobs launched for it), the other equal to its plain epoch") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    val jobStarts = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.incrementAndGet(); ()
      }
    }
    val base = spark.range(5000L).toDF("k")
    val sc = ScCollection.fromDataFrame(base, col("k"))
    val ds = ScDataset(sc, BlockShuffling(blockSize = 128), batchSize = 250,
      seed = 7L)
    val plain1 = ds.toBatches(1, Seq("k")).map(_.toString).toVector
    // build BOTH epoch handles up front (the multi-epoch training shape)
    val e0 = ds.toBatchesPrefetched(0, Seq("k"))
    val e1 = ds.toBatchesPrefetched(1, Seq("k"))
    spark.sparkContext.addSparkListener(listener)
    try {
      e0.close() // epoch 0 skipped — must strand nothing and launch nothing
      awaitProducerDead()
      Thread.sleep(300) // let any (erroneous) job-start events reach the bus
      assert(jobStarts.get() == 0,
        s"closing an unconsumed epoch handle launched ${jobStarts.get()} jobs")
      val got = e1.map(_.toString).toVector
      assert(got == plain1, "the surviving epoch streams its own plan")
    } finally spark.sparkContext.removeSparkListener(listener)
    awaitProducerDead()
    assert(!producerAlive(), "no producer leaked across epochs")
    CacheScope.release()
  }
}
