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
  * recompute — but it forfeits the reuse the persist was buying.
  *
  * One-call convenience APIs (fuzzyDedup, semanticDedup, …) that must
  * clean up after THEMSELVES use [[scoped]] instead of the global
  * `release()`: persists made while a scope is active on the current
  * thread collect in that scope, and `Scope.releaseExcept` drops exactly
  * those — never a frame the caller (or a concurrent pipeline in the same
  * JVM) registered — while promoting the surviving handles outward so the
  * caller's usual `release()` still drops them.
  */
object CacheScope {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private val stack = new ThreadLocal[List[Scope]] {
    override def initialValue: List[Scope] = Nil
  }

  /** Where a persist/register on this thread currently lands: the
    * innermost active scope, or the global registry. */
  private def sink: java.util.Queue[DataFrame] = stack.get() match {
    case s :: _ => s.collected
    case Nil    => frames
  }

  /** A private collector for one operator invocation — see [[scoped]]. */
  final class Scope private[CacheScope] () {
    private[CacheScope] val collected =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

    /** Unpersist every frame this scope collected EXCEPT `keep`; each
      * `keep` handle (collected here or persisted directly by the caller)
      * is promoted to the enclosing scope — or the global registry — so
      * the pipeline's consumer releases it with its usual call. */
    def releaseExcept(keep: DataFrame*): Unit = {
      val outer: java.util.Queue[DataFrame] = {
        val st = stack.get()
        val idx = st.indexWhere(_ eq this)
        (if (idx >= 0) st.drop(idx + 1) else st) match {
          case s :: _ => s.collected
          case Nil    => frames
        }
      }
      val pending = new java.util.IdentityHashMap[DataFrame, Boolean]()
      keep.foreach(k => pending.put(k, true))
      val promoted = new java.util.IdentityHashMap[DataFrame, Boolean]()
      var f = collected.poll()
      while (f != null) {
        if (keep.exists(_ eq f)) {
          if (!promoted.containsKey(f)) { outer.add(f); promoted.put(f, true) }
          pending.remove(f)
        } else if (!promoted.containsKey(f)) {
          try f.unpersist(blocking = false) catch { case _: Throwable => () }
        }
        f = collected.poll()
      }
      pending.forEach((k, _) => outer.add(k))
    }
  }

  /** Run `body` with a fresh [[Scope]] active on this thread: every
    * [[persist]]/[[register]] inside lands in the scope, not the global
    * registry.  `body` is responsible for calling `Scope.releaseExcept`
    * (typically as its last effect) — frames left in the scope when it
    * exits stay persisted until then. */
  def scoped[T](body: Scope => T): T = {
    val s = new Scope
    stack.set(s :: stack.get())
    try body(s)
    finally stack.set(stack.get().filterNot(_ eq s))
  }

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
    sink.add(p)
    if (eager) p.count()
    p
  }

  /** Track an ALREADY-persisted handle for the next [[release]] (for
    * operators that manage persistence themselves, e.g. iterative loops). */
  def register(df: DataFrame): Unit = sink.add(df)

  /** Unpersist every GLOBALLY-registered intermediate (non-blocking).
    * Frames collected by an active [[Scope]] are untouched — they belong
    * to the operator that opened the scope. */
  def release(): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = frames.poll()
    }
  }
}
