package graft.ops

import org.apache.spark.sql.Dataset

/** Registry of operator-persisted frames (ngram-dedup candidates,
  * decontaminate benchmark grams, http source snapshots). Operators
  * persist for the lifetime of the RUN — consumers execute at
  * sink-action time, after build() returns — so they cannot unpersist
  * locally without defeating the cache.
  *
  * `Pipeline.execute` wraps each run in a SCOPE (graph construction
  * runs on the caller's thread, so a thread-local collector is
  * exact): frames tracked during the run are released when its sink
  * actions complete — unless the run started streaming queries, whose
  * live micro-batch plans may reference a tracked frame; those frames
  * are left for session cleanup. Scoping keeps one long-lived
  * streaming run from suppressing release for every later batch run,
  * and keeps one run's release from unpersisting another's frames.
  * Harnesses that drive build() + their own actions (Verify/Bench)
  * keep using `spark.catalog.clearCache()` between pipelines. */
object CacheTracker {
  private val scope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[Dataset[_]]]()

  /** Persist `ds`; registered to the current run scope when one is
    * open (untracked otherwise — the pre-scope behavior). */
  def trackPersist[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    val buf = scope.get()
    if (buf != null) buf.synchronized { buf += p }
    p
  }

  /** Open a run scope on this thread. Returns a handle to close it:
    * `close(release = true)` unpersists the scope's frames. */
  def beginScope(): ScopeHandle = {
    val prev = scope.get()
    val buf = scala.collection.mutable.ArrayBuffer[Dataset[_]]()
    scope.set(buf)
    new ScopeHandle(buf, prev)
  }

  final class ScopeHandle(
      buf: scala.collection.mutable.ArrayBuffer[Dataset[_]],
      prev: scala.collection.mutable.ArrayBuffer[Dataset[_]]) {
    def close(release: Boolean): Unit = {
      scope.set(prev)
      if (release) buf.foreach { d =>
        try d.unpersist(blocking = false)
        catch { case _: Throwable => } // session may already be stopped
      }
    }
  }
}
