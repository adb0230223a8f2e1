package graft.engine

import java.nio.file.{Files, Path}

/** Small local-filesystem helpers shared by the sinks, the publish
  * disciplines and the verify driver — one copy of the recursive
  * delete instead of one per call site.
  */
object Fs {

  /** Delete `p` and everything under it; a missing path is a no-op.
    * Local-FS only (the fixture staging dirs, temp publish roots and
    * verify output dirs) — production object stores delete by prefix
    * listing, not recursion.
    */
  def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p); ()
  }

  /** [[deleteRecursively]] for best-effort cleanup paths (a finally
    * block that must not mask the real failure, the JVM-exit temp-dir
    * drain, the bench's scratch area): an IO failure leaves the
    * remainder in place instead of propagating — worst case is the
    * old leave-in-tmp behavior.
    */
  def deleteRecursivelyQuietly(p: Path): Unit =
    try deleteRecursively(p) catch { case _: java.io.IOException => () }
}
