package graft.ops

/** Local-FS helpers shared by the pane publisher and the bench
  * harness — one definition so a future symlink/retry fix lands
  * everywhere. */
object FsUtil {
  /** Recursive delete, children first. For SCRATCH (checkpoints,
    * staged batches, stale publish targets) only — never durable
    * data; per-entry failures are surfaced by the caller's later
    * move/write, not here. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete(); ()
  }
}
