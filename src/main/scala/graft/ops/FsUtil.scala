package graft.ops

/** Local-FS helpers shared by the pane publisher and the bench
  * harness — one definition so a future symlink/retry fix lands
  * everywhere. */
object FsUtil {
  /** Root for all engine/gate SCRATCH temp dirs. Defaults to the
    * shared system tmpdir; a harness that wants its scratch
    * confined (the bench battery's per-query sweep must never touch
    * another JVM's live checkpoints) points this at a dir only it
    * owns. A JVM property can't do this job: the JDK caches the
    * java.io.tmpdir location at the first Files temp call, which
    * under an sbt fork happens before main(). */
  @volatile var scratchRoot: java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))

  /** `Files.createTempDirectory` under [[scratchRoot]] — the one
    * temp-dir constructor engine code and gates use. */
  def scratchDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix)

  /** Recursive delete, children first. For SCRATCH (checkpoints,
    * staged batches, stale publish targets) only — never durable
    * data; per-entry failures are surfaced by the caller's later
    * move/write, not here. Symlinks are UNLINKED, never followed:
    * recursing through a link planted in scratch (world-writable
    * /tmp) would delete content outside the scratch tree. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(); ()
  }
}
