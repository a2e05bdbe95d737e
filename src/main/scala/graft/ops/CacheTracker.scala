package graft.ops

import org.apache.spark.sql.Dataset

/** Registry of operator-persisted frames (ngram-dedup candidates,
  * decontaminate benchmark grams, http source snapshots). Operators
  * persist for the lifetime of the RUN — consumers execute at
  * sink-action time, after build() returns — so they cannot unpersist
  * locally without defeating the cache. `Pipeline.execute` drains the
  * registry once its sink actions complete, so long-lived sessions
  * don't accrete cached blocks run over run. Harnesses that drive
  * build() + their own actions (Verify/Bench) keep using
  * `spark.catalog.clearCache()` between pipelines.
  */
object CacheTracker {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register it for end-of-run release. */
  def trackPersist[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    tracked.add(p)
    p
  }

  /** Unpersist every tracked frame (non-blocking). */
  def releaseAll(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => } // session may already be stopped
      d = tracked.poll()
    }
  }
}
