package graft.engine

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The delete contracts the round-16 review waves flip-flopped on,
  * pinned so they cannot regress again (no SparkSession needed):
  *
  *  - NOFOLLOW: a symlink is deleted AS A LINK — a link to a
  *    directory is never descended into (the streaming staging dirs
  *    hold links into the read-only fixtures), and a BROKEN link is
  *    still deleted (link-following exists() reported it absent,
  *    leaving it behind so the parent delete threw
  *    DirectoryNotEmptyException — a hard q295 cold failure);
  *  - missing path is a no-op EVEN when the parent component is a
  *    regular file (deleteIfExists alone only swallows ENOENT, not
  *    ENOTDIR — the wave-5 lesson: the exists() guard is a contract,
  *    not an optimization);
  *  - the quiet variant returns normally where the strict one throws.
  */
class FsSpec extends AnyFunSuite with Matchers {

  private def tmp() = Files.createTempDirectory("graft-fs-spec")

  test("a symlink to a directory is deleted as a link; the target " +
      "and its contents survive") {
    val root = tmp()
    try {
      val target = Files.createDirectory(root.resolve("target"))
      Files.write(target.resolve("keep.txt"), "fixture".getBytes)
      val holder = Files.createDirectory(root.resolve("holder"))
      val link = holder.resolve("link")
      Files.createSymbolicLink(link, target)
      Fs.deleteRecursively(holder)
      Files.exists(holder) shouldBe false
      Files.exists(target.resolve("keep.txt")) shouldBe true
    } finally Fs.deleteRecursivelyQuietly(root)
  }

  test("a BROKEN symlink child is deleted, not skipped — the parent " +
      "delete must not throw DirectoryNotEmptyException") {
    val root = tmp()
    try {
      val holder = Files.createDirectory(root.resolve("holder"))
      Files.createSymbolicLink(holder.resolve("dangling"),
        root.resolve("never-existed"))
      noException should be thrownBy Fs.deleteRecursively(holder)
      Files.exists(holder,
        java.nio.file.LinkOption.NOFOLLOW_LINKS) shouldBe false
    } finally Fs.deleteRecursivelyQuietly(root)
  }

  test("missing path is a no-op, including when the parent component " +
      "is a regular file (ENOTDIR, which deleteIfExists would throw on)") {
    val root = tmp()
    try {
      noException should be thrownBy
        Fs.deleteRecursively(root.resolve("absent"))
      val file = Files.write(root.resolve("plain.txt"), "x".getBytes)
      noException should be thrownBy
        Fs.deleteRecursively(file.resolve("child-of-a-file"))
      Files.exists(file) shouldBe true
    } finally Fs.deleteRecursivelyQuietly(root)
  }

  test("plain tree delete removes everything; quiet variant is quiet " +
      "on a live tree too") {
    val root = tmp()
    val sub = Files.createDirectories(root.resolve("a/b/c"))
    Files.write(sub.resolve("f.txt"), "data".getBytes)
    Fs.deleteRecursivelyQuietly(root)
    Files.exists(root) shouldBe false
  }

  test("TempDirs.createCleanedAtExit creates a real dir and registers " +
      "it; registerAtExit returns its argument") {
    val d = TempDirs.createCleanedAtExit("graft-fs-spec-reg")
    Files.isDirectory(d) shouldBe true
    val p = Paths.get(d.toString)
    TempDirs.registerAtExit(p) shouldBe p
    // the hook fires at JVM exit (not testable here); eager cleanup
    // keeps this spec from relying on it
    Fs.deleteRecursivelyQuietly(d)
  }
}
