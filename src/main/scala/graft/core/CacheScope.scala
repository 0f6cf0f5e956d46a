package graft.core

import org.apache.spark.sql.DataFrame

/** Central registry for intermediate frames the engine persists while
  * building a plan (ranked sampling bases, shingle postings).
  *
  * A strategy's `plan` returns a LAZY DataFrame, so the operator that
  * persisted an intermediate can never know when the final consumer is done
  * with it — only the caller does.  Operators therefore `register` every
  * handle they persist, and the consumer (Bench/Verify per query; a user
  * pipeline after its terminal action) calls [[release]] exactly once.
  * Without that call the storage leaks until the session dies — previously
  * this was masked by Bench's `clearCache`, which also evicted frames the
  * USER had persisted; the registry only ever drops the engine's own
  * intermediates.
  *
  * CONTRACT — one pipeline at a time per JVM: the registry is process-
  * global, so `release` drops the intermediates of EVERY in-flight plan,
  * and eager persists mean plan CONSTRUCTION may trigger Spark jobs.
  * Build + execute + release one query before starting the next (what
  * Bench/Verify and a training loop naturally do).  Releasing under a
  * concurrent pipeline is not a correctness hazard — unpersisted frames
  * recompute — but it forfeits the reuse the persist was buying.  If
  * concurrent pipelines ever become a requirement, hand out per-query
  * scope handles instead of this object.
  */
object CacheScope {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and track the handle for the next [[release]].
    * `eager` materializes the cache immediately — use when MULTIPLE
    * independent downstream stages consume the frame: AQE submits them
    * concurrently, and against a lazy cache they contend on the block locks
    * (duplicated compute + stalled tasks) instead of reading a filled
    * cache. */
  def persist(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      eager: Boolean = false): DataFrame = {
    val p = df.persist(level)
    frames.add(p)
    if (eager) p.count()
    p
  }

  /** Track an ALREADY-persisted handle for the next [[release]] (for
    * operators that manage persistence themselves, e.g. iterative loops). */
  def register(df: DataFrame): Unit = frames.add(df)

  /** Unpersist every engine-registered intermediate (non-blocking). */
  def release(): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = frames.poll()
    }
  }
}
