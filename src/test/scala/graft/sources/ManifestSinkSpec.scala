package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** The graft-manifest DSv2 batch write: round-trip fidelity, manifest
  * accounting, orphan invisibility (the exactly-once contract), and
  * overwrite-by-commit semantics.
  */
class ManifestSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def writeRows(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "name").repartition(3)
      .write.format("graft-manifest").option("path", dir)
      .mode("append").save()

  test("round-trip: rows written through the sink read back exactly") {
    withTempDir { dir =>
      val rows = (1L to 100L).map(i => (i, s"row-$i\twith\"specials\""))
      writeRows(dir, rows)
      val back = ManifestSink.readData(spark, dir, schema)
        .as[(Long, String)].collect().toSet
      back shouldBe rows.toSet
      // manifest accounting: per-file rows sum to the total
      val m = ManifestSink.readManifest(spark, dir)
        .as[(String, Long, Long)].collect()
      m.map(_._2).sum shouldBe 100L
      m.foreach { case (_, _, bytes) => bytes should be > 0L }
    }
  }

  test("control chars and non-ASCII survive the JSON round trip") {
    withTempDir { dir =>
      // \b and \f are NOT in the \n\r\t shortcut set — they must escape
      // as \u00XX or the reader silently nulls the row; é/∑ pin UTF-8
      val rows = Seq(
        (1L, "bell back\b feed\f"),
        (2L, "café ∑ mixed\t\nline"),
        (3L, "nul-adjacent"))
      writeRows(dir, rows)
      val back = ManifestSink.readData(spark, dir, schema)
        .as[(Long, String)].collect().toSet
      back shouldBe rows.toSet
    }
  }

  test("mode(overwrite) routes through truncate and replaces the snapshot") {
    withTempDir { dir =>
      writeRows(dir, Seq((1L, "old")))
      Seq((2L, "new")).toDF("id", "name")
        .write.format("graft-manifest").option("path", dir)
        .mode("overwrite").save()
      val back = ManifestSink.readData(spark, dir, schema)
        .as[(Long, String)].collect().toSet
      back shouldBe Set((2L, "new"))
    }
  }

  test("orphan files from lost attempts are invisible to readers") {
    withTempDir { dir =>
      writeRows(dir, Seq((1L, "a"), (2L, "b")))
      // simulate a speculative attempt whose task never committed:
      // its file exists in the directory but not in the manifest
      Files.write(Paths.get(dir, "part-00099-12345.jsonl"),
        "{\"id\":999,\"name\":\"ghost\"}\n".getBytes)
      val back = ManifestSink.readData(spark, dir, schema)
        .as[(Long, String)].collect().toSet
      back shouldBe Set((1L, "a"), (2L, "b")) // visibility IS the manifest
    }
  }

  test("a second commit atomically replaces visibility") {
    withTempDir { dir =>
      writeRows(dir, Seq((1L, "old")))
      writeRows(dir, Seq((2L, "new"), (3L, "newer")))
      // the manifest now lists only the second job's files (same
      // partition ids, new task ids); readers see exactly the new set
      val back = ManifestSink.readData(spark, dir, schema)
        .as[(Long, String)].collect().toSet
      back shouldBe Set((2L, "new"), (3L, "newer"))
    }
  }

  test("unsupported column types fail loudly, not by corrupt output") {
    withTempDir { dir =>
      val err = intercept[Exception] {
        Seq((1L, Seq("x"))).toDF("id", "arr")
          .write.format("graft-manifest").option("path", dir)
          .mode("append").save()
      }
      // the UnsupportedOperationException may arrive wrapped in a task
      // failure — walk the cause chain for the declared-scope message
      val msgs = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      msgs should include("primitive")
    }
  }

  test("empty partitions still commit, keeping file accounting total") {
    withTempDir { dir =>
      // 1 row over 3 partitions: two partitions are empty
      Seq((7L, "only")).toDF("id", "name").repartition(3)
        .write.format("graft-manifest").option("path", dir)
        .mode("append").save()
      val m = ManifestSink.readManifest(spark, dir)
        .as[(String, Long, Long)].collect()
      m.length shouldBe 3
      m.map(_._2).sum shouldBe 1L
    }
  }
}
