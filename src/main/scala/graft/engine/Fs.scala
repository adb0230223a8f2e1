package graft.engine

import java.nio.file.{Files, Path}

/** Small local-filesystem helpers shared by the sinks, the publish
  * disciplines and the verify driver — one copy of the recursive
  * delete instead of one per call site.
  */
object Fs {

  /** Delete `p` and everything under it; a missing path is a no-op.
    * NOFOLLOW throughout: a symlink is deleted as a link, never
    * descended into or skipped — link-following exists() reports a
    * BROKEN link as absent, which would leave it behind and make the
    * parent's delete throw DirectoryNotEmptyException, and a link to
    * a directory must never recurse into data the caller does not
    * own (the streaming staging dirs hold links into the read-only
    * fixtures). Local-FS only (fixture staging dirs, temp publish
    * roots and verify output dirs) — production object stores delete
    * by prefix listing, not recursion.
    */
  def deleteRecursively(p: Path): Unit =
    // the exists(NOFOLLOW) guard is NOT just an optimization dodge:
    // deleteIfExists only swallows ENOENT — a path whose parent
    // component is a regular file (ENOTDIR) or is unstattable
    // (EACCES) would throw where the "missing path is a no-op"
    // contract promises silence, and the strict callers (Verify,
    // Incremental, the staging seams) rely on that silence
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p); ()
    }

  /** [[deleteRecursively]] for best-effort cleanup paths (a finally
    * block that must not mask the real failure, the JVM-exit temp-dir
    * drain, the bench's scratch area): an IO failure leaves the
    * remainder in place instead of propagating — worst case is the
    * old leave-in-tmp behavior. Catches UncheckedIOException too:
    * that is how `Files.list`'s stream surfaces iteration errors.
    */
  def deleteRecursivelyQuietly(p: Path): Unit =
    try deleteRecursively(p)
    catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException => ()
    }
}
