package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared test harness: one SparkSession for the whole forked test JVM
  * (built by the same factory the mains use, so extensions and config are
  * exercised too), plus temp-dir helpers.
  */
object SparkSpec {
  lazy val spark: SparkSession = engine.Sessions.local("graft-test")
}

trait SparkSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  def withTempDir[T](f: String => T): T = {
    val dir = Files.createTempDirectory("graft-test").toFile
    try f(dir.getAbsolutePath)
    finally deleteRecursively(dir)
  }

  /** Test-side recursive delete (checkpoint wipes, temp dirs) —
    * delegates to the engine's one copy; quiet because test cleanup
    * must never mask the assertion that actually failed.
    */
  def deleteRecursively(f: java.io.File): Unit =
    engine.Fs.deleteRecursivelyQuietly(f.toPath)
}
