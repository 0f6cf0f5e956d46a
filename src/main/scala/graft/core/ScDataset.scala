package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Hook pipeline, mirroring the reference's four-stage transform surface
  * (reference: src/scdataset/scdataset.py:48-60, executed in order
  * fetch_callback → fetch_transform → batch_callback → batch_transform at
  * scdataset.py:523-558).  On Spark the fetch hooks are row/window-level
  * DataFrame transforms; the batch hook operates on the materialized batch
  * frame (one row per batch).
  */
final case class Hooks(
    /** U2 `fetch_transform`: bulk transform applied to the planned/fetched
      * frame (reference scdataset.py:530-531). */
    fetchTransform: DataFrame => DataFrame = identity,
    /** U3 `batch_callback`: overrides how batches are ASSEMBLED from the
      * planned frame (reference scdataset.py:551-553).  Given the plan
      * frame (with batch_id/pos_in_batch) and the payload columns, must
      * return one row per batch.  None = default collect_list assembly. */
    batchAssemble: Option[(DataFrame, Seq[String]) => DataFrame] = None,
    /** U4 `batch_transform`: per-batch finalization on the batch frame
      * (reference scdataset.py:557-558). */
    batchTransform: DataFrame => DataFrame = identity)

/** The distributed analogue of `scDataset` (reference:
  * src/scdataset/scdataset.py:131-561): an epoch-ordered, windowed, batched
  * view over a collection.
  *
  * Column semantics of [[planFrame]]:
  *  - `__ord`   strategy order (position in the epoch stream)
  *  - `fetch_id` window of `batchSize*fetchFactor` consecutive positions
  *               (reference B1: scdataset.py:223,491-502)
  *  - `__pos`   final yield position after the optional within-fetch
  *               permutation (reference O6: scdataset.py:533-536)
  *  - `batch_id`, `pos_in_batch` batch slicing (reference B2:
  *               scdataset.py:539-561)
  *
  * Spark owns physical distribution: partitioning by `fetch_id` replaces the
  * reference's DDP round-robin + DataLoader-worker sharding
  * (reference B4/B5: scdataset.py:495-515) — `rankStream` exposes the same
  * disjoint+exhaustive split for emitting per-consumer streams.
  */
final case class ScDataset(
    collection: ScCollection,
    strategy: SamplingStrategy,
    batchSize: Int,
    fetchFactor: Int = 1,
    dropLast: Boolean = false,
    seed: Long = 42L,
    hooks: Hooks = Hooks()) {
  import SamplingStrategy.Ord
  require(batchSize > 0 && fetchFactor > 0)

  val fetchSize: Long = batchSize.toLong * fetchFactor

  /** Epoch seed derivation (reference B6: scdataset.py:472-478). */
  def epochSeed(epoch: Int): Long = seed + 1000L * epoch

  /** The full logical plan for one epoch. */
  def planFrame(epoch: Int): DataFrame = {
    val s = epochSeed(epoch)
    var df = strategy.plan(collection, s)
    df = df.withColumn("fetch_id", floor(col(Ord) / fetchSize))
    val pos =
      if (strategy.shuffleBeforeYield) {
        // permute within each fetch window; window is partitioned by
        // fetch_id so this is a distributed (not global) sort.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fetch_id"))
          .orderBy(strategy.rng.sortKey(s, "yield", col(Ord)), col(Ord))
        col("fetch_id") * fetchSize + row_number().over(w) - 1
      } else col(Ord)
    df = df.withColumn("__pos", pos)
    df = df.withColumn("batch_id", floor(col("__pos") / batchSize))
      .withColumn("pos_in_batch", col("__pos") % batchSize)
    if (dropLast) {
      val m = strategy.outputLen(collection.length)
      df = df.where(col("__pos") < (m / batchSize) * batchSize)
    }
    // fetchTransform runs AFTER fetch_id/__pos/batch_id are derived: the
    // reference applies fetch_transform to already-fetched window data
    // (scdataset.py:530-531), so it cannot perturb the ordering math.  A
    // transform that drops/duplicates rows changes batch contents only.
    hooks.fetchTransform(df)
  }

  /** Exact batch count without executing — the reference's heavily-tested
    * `__len__` math (reference B3: scdataset.py:333-413), for a single
    * consumer (worldSize=1). Fetch windows are multiples of batchSize, so
    * only the globally-last batch can be short. */
  def batchCount: Long = {
    val m = strategy.outputLen(collection.length)
    if (dropLast) m / batchSize
    else (m + batchSize - 1) / batchSize
  }

  /** Per-consumer batch count under round-robin fetch distribution
    * (reference: scdataset.py:372-413 — rank r takes fetch windows
    * r, r+W, r+2W, ...). */
  def batchCount(rank: Int, worldSize: Int): Long = {
    require(worldSize > 0 && rank >= 0 && rank < worldSize)
    val m = strategy.outputLen(collection.length)
    val nFetches = (m + fetchSize - 1) / fetchSize
    var batches = 0L
    var f = rank.toLong
    while (f < nFetches) {
      val inFetch = math.min(fetchSize, m - f * fetchSize)
      batches += (if (dropLast) inFetch / batchSize
                  else (inFetch + batchSize - 1) / batchSize)
      f += worldSize
    }
    batches
  }

  /** The fetch windows owned by one consumer (reference B4 round-robin). */
  def rankStream(epoch: Int, rank: Int, worldSize: Int): DataFrame =
    planFrame(epoch).where(pmod(col("fetch_id"), lit(worldSize)) === rank)

  /** Mid-epoch checkpoint resume: the epoch's plan from batch `fromBatch`
    * onward.  The plan is a pure function of (seed, epoch), so the resumed
    * stream is exactly the suffix of the full epoch stream — the
    * reproducibility contract the reference tests for checkpointed DDP runs
    * (reference: tests/test_ddp_real.py:891-957).  The batch_id predicate is
    * an ordinary filter: it prunes before any batch assembly, so a resume
    * late in a long epoch re-plans but never re-materializes the consumed
    * prefix. */
  def resumeFrom(epoch: Int, fromBatch: Long): DataFrame =
    planFrame(epoch).where(col("batch_id") >= fromBatch)

  /** Per-consumer resume: rank r's fetch windows from batch `fromBatch`
    * onward (batch ids are global — a checkpoint records the last GLOBAL
    * batch each rank consumed). */
  def resumeFrom(epoch: Int, fromBatch: Long, rank: Int,
      worldSize: Int): DataFrame =
    rankStream(epoch, rank, worldSize).where(col("batch_id") >= fromBatch)

  /** Batches remaining in an epoch after resuming at `fromBatch`. */
  def remainingBatches(fromBatch: Long): Long =
    math.max(0L, batchCount - fromBatch)

  /** One row per batch: `batch_id`, `n`, and `rows` = the ordered array of
    * selected columns (reference's yielded minibatch). Keep selected columns
    * small — each batch array is materialized. */
  def toBatchFrame(epoch: Int, cols: Seq[String]): DataFrame =
    assembleBatches(planFrame(epoch), cols)

  /** The resumed batch stream: batches `fromBatch` onward, assembled
    * through the same hook pipeline as [[toBatchFrame]]. */
  def resumeBatchFrame(epoch: Int, fromBatch: Long,
      cols: Seq[String]): DataFrame =
    assembleBatches(resumeFrom(epoch, fromBatch), cols)

  private def assembleBatches(pf: DataFrame, cols: Seq[String]): DataFrame = {
    val bf = hooks.batchAssemble match {
      case Some(assemble) => assemble(pf, cols)
      case None => ScDataset.defaultAssembly(pf, cols)
    }
    hooks.batchTransform(bf)
  }

  /** Batch sink (S6): materialize the epoch's batches as parquet, one row
    * per batch, so downstream trainers (or another Spark job) stream them
    * without replanning the epoch. */
  def writeBatches(dir: String, epoch: Int, cols: Seq[String]): Unit =
    toBatchFrame(epoch, cols).write.mode("overwrite").parquet(dir)

  /** Driver-side iterator over batches in order — the analogue of the
    * reference's `__iter__` yield loop, for feeding a single-process
    * trainer. Streams one batch at a time (no full collect). */
  def toBatches(epoch: Int, cols: Seq[String]): Iterator[Row] = {
    val it = toBatchFrame(epoch, cols).orderBy(col("batch_id")).toLocalIterator()
    new Iterator[Row] {
      def hasNext: Boolean = it.hasNext
      def next(): Row = it.next()
    }
  }

  /** [[toBatches]] with ASYNC READ-AHEAD: a daemon producer thread drains
    * Spark's batch iterator into a bounded queue of `prefetch` batches
    * while the consumer trains on the current one, so fetch latency
    * overlaps compute instead of serializing with it — the reference's
    * `prefetch_factor` pipelining (reference README.md:156-164,
    * src/scdataset/auto_config.py:470-471: prefetch = fetch_factor + 1,
    * the default here).  Batch order and content are identical to
    * [[toBatches]] (the queue preserves producer order); a producer-side
    * failure re-throws in the consumer at the point it is observed.  The
    * queue bound means at most `prefetch` materialized batches exist
    * beyond the one being consumed — same memory envelope the reference's
    * DataLoader prefetch holds.  Exhausting the iterator releases the
    * producer automatically; a consumer that stops early (exception,
    * pilot break) should `close()` it — otherwise the daemon producer
    * stays parked holding its buffered batches until the JVM exits. */
  def toBatchesPrefetched(epoch: Int, cols: Seq[String],
      prefetch: Int = 0): ScDataset.PrefetchedBatches = {
    val depth = if (prefetch > 0) prefetch else fetchFactor + 1
    // LAZY start: the toLocalIterator (and its Spark jobs) is created by
    // the producer thread on first consumption, not here — a handle that
    // is close()d before use (epoch skipped, early break in a multi-epoch
    // loop) never launches a job, and nothing is stranded.
    val frame = toBatchFrame(epoch, cols).orderBy(col("batch_id"))
    new ScDataset.PrefetchedBatches(() => frame.toLocalIterator(), depth)
  }
}

object ScDataset {

  /** The async read-ahead iterator behind
    * [[ScDataset.toBatchesPrefetched]]: a daemon producer drains the
    * source iterator into a bounded queue; the consumer reads batches in
    * order.
    *
    * LAZY start — the source (a `toLocalIterator`, i.e. Spark jobs) is
    * only created on the first `hasNext`/`next`, so a handle that is
    * `close()`d unused never launches a job (multi-epoch loops can
    * construct per-epoch handles ahead of time and skip some).
    *
    * FAIL FAST — a producer failure surfaces on the very next
    * `hasNext`/`next`, BEFORE any still-buffered batches are served: a
    * consumer never keeps training on stale read-ahead after the scan
    * has died.  `close()` rethrows a producer error the consumer never
    * observed (so an early `close()` cannot silently swallow a scan
    * failure); call it from a position that tolerates that, or drain
    * first.  Safe from any thread, idempotent once the error (if any)
    * has been delivered. */
  final class PrefetchedBatches private[core] (
      mkSrc: () => java.util.Iterator[Row],
      depth: Int) extends Iterator[Row] with AutoCloseable {
    require(depth > 0, "prefetch depth must be positive")
    private val queue =
      new java.util.concurrent.ArrayBlockingQueue[AnyRef](depth)
    private val endMark = new Object
    @volatile private var closed = false
    @volatile private var err: Throwable = _
    @volatile private var errDelivered = false
    private var producer: Thread = _

    private def ensureStarted(): Unit = synchronized {
      if (producer == null && !closed) {
        producer = new Thread(() => {
          try {
            val src = mkSrc()
            while (!closed && src.hasNext) {
              val row = src.next()
              var ok = false
              while (!ok && !closed)
                ok = queue.offer(row, 100,
                  java.util.concurrent.TimeUnit.MILLISECONDS)
            }
          } catch { case e: Throwable => err = e }
          finally {
            var ok = closed
            while (!ok)
              ok = closed || queue.offer(endMark, 100,
                java.util.concurrent.TimeUnit.MILLISECONDS)
          }
        }, "graft-batch-prefetch")
        producer.setDaemon(true)
        producer.start()
      }
    }

    // Pulls the next element, checking `err` BEFORE serving anything the
    // producer buffered ahead of its failure.
    private def takeNext(): AnyRef = {
      while (true) {
        val e = err
        if (e != null) { doClose(); errDelivered = true; throw e }
        if (closed) return endMark
        val x = queue.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (x != null) {
          if (x eq endMark) {
            doClose()
            val e2 = err
            if (e2 != null) { errDelivered = true; throw e2 }
          }
          return x
        }
      }
      endMark // unreachable
    }

    private var staged: AnyRef = _

    private def stage(): Unit =
      if (staged == null) { ensureStarted(); staged = takeNext() }

    def hasNext: Boolean = { stage(); staged ne endMark }

    def next(): Row = {
      stage()
      if (staged eq endMark) throw new NoSuchElementException("exhausted")
      val r = staged.asInstanceOf[Row]
      staged = null
      r
    }

    private def doClose(): Unit = { closed = true; queue.clear() }

    /** Stop the producer and drop buffered batches.  If the producer
      * failed and the consumer never saw the error, rethrows it here —
      * errors are never silently discarded.  Idempotent after the error
      * (if any) is delivered. */
    def close(): Unit = {
      doClose()
      val e = err
      if (e != null && !errDelivered) { errDelivered = true; throw e }
    }
  }

  /** The default batch assembly (one row per batch: batch_id, n, ordered
    * payload array) — shared with [[AutoConfig.estimateSampleBytes]] so the
    * A5 size probe measures exactly what the real pipeline materializes. */
  private[core] def defaultAssembly(pf: DataFrame,
      cols: Seq[String]): DataFrame = {
    val payload = struct((col("pos_in_batch") +: cols.map(col)): _*)
    pf.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(payload)).as("rows"))
  }
}
