package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** The monoid identity behind incremental gold maintenance:
  * `mergeAdditive(agg(A), agg(B)) == agg(A ++ B)` for sum/count/max
  * measures, on random data and random splits — plus the full-outer
  * edge cases (key only in gold, only in delta, NULL keys via <=>).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def aggOf(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        max(col("v")).as("mx"))

  test("merge of per-split aggregates equals the one-shot aggregate " +
      "on random data and random split points") {
    val rowsGen = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 7L), Gen.choose(-100L, 100L))))
    (1 to 15).foreach { _ =>
      val rows = rowsGen.sample.getOrElse(List(1L -> 1L))
      val cut = Gen.choose(0, rows.size).sample.getOrElse(rows.size / 2)
      val (a, b) = rows.splitAt(cut)
      val merged =
        if (a.isEmpty) aggOf(b)
        else if (b.isEmpty) aggOf(a)
        else Incremental.mergeAdditive(aggOf(a), aggOf(b),
          Seq("k"), Seq("n", "s"), Seq("mx"))
      val m = merged.orderBy("k")
        .as[(Long, Long, Long, Long)].collect().toList
      val o = aggOf(rows).orderBy("k")
        .as[(Long, Long, Long, Long)].collect().toList
      m shouldBe o
    }
  }

  test("keys present in only one side pass through unchanged") {
    val gold = Seq((1L, 5L), (2L, 7L)).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"),
        max("v").as("mx"))
    val delta = Seq((2L, 3L), (9L, 4L)).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"),
        max("v").as("mx"))
    val out = Incremental.mergeAdditive(gold, delta,
      Seq("k"), Seq("n", "s"), Seq("mx"))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toList
    out shouldBe List(
      (1L, 1L, 5L, 5L),  // gold-only: untouched
      (2L, 2L, 10L, 7L), // merged: counts add, sums add, max greatest
      (9L, 1L, 4L, 4L))  // delta-only: inserted
  }

  test("NULL keys merge with each other (null-safe join), not explode") {
    val gold = Seq((Option.empty[Long], 5L), (Some(1L), 2L))
      .toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
    val delta = Seq((Option.empty[Long], 7L))
      .toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
    val out = Incremental.mergeAdditive(gold, delta,
      Seq("k"), Seq("n", "s"), Seq("mx"))
      .as[(Option[Long], Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (None, 2L, 12L, 7L), // the two NULL-key rows combined once
      (Some(1L), 1L, 2L, 2L))
  }

  private def deltaOf(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))

  private def goldOf(root: java.nio.file.Path): Set[(Long, Long, Long)] =
    spark.read.parquet(root.resolve("gold").toString)
      .as[(Long, Long, Long)].collect().toSet

  test("publishAdditiveBatch: a replayed batchId is skipped, not " +
      "double-merged") {
    withTempDir { d =>
      val root = java.nio.file.Paths.get(d)
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(1L -> 10L, 2L -> 5L)), 0L,
        Seq("k"), Seq("n", "s")) shouldBe true
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(3L -> 7L)), 1L, Seq("k"), Seq("n", "s")) shouldBe true
      val afterTwo = goldOf(root)
      // the engine replays batch 1 after a crash past the publish:
      // the marker inside the snapshot recognizes it — no double count
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(3L -> 7L)), 1L, Seq("k"), Seq("n", "s")) shouldBe false
      goldOf(root) shouldBe afterTwo
      afterTwo shouldBe Set((1L, 1L, 10L), (2L, 1L, 5L), (3L, 1L, 7L))
    }
  }

  test("publishAdditiveBatch: recovery restores the set-aside snapshot " +
      "after a crash between the two publish renames") {
    withTempDir { d =>
      import java.nio.file.Files
      val root = java.nio.file.Paths.get(d)
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(1L -> 10L)), 0L, Seq("k"), Seq("n", "s"))
      // simulate the crash window: gold was renamed aside to gold_prev
      // and the process died before tmp moved in
      Files.move(root.resolve("gold"), root.resolve("gold_prev"))
      // next batch must restore prev -> gold FIRST (not delete it) and
      // then fold its delta on top of the recovered snapshot
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(1L -> 2L)), 1L, Seq("k"), Seq("n", "s")) shouldBe true
      goldOf(root) shouldBe Set((1L, 2L, 12L))
      Files.exists(root.resolve("gold_prev")) shouldBe false
    }
  }

  test("publishAdditiveBatch: a crash after the publish leaves a stale " +
      "prev that a replay skips and the next batch cleans up") {
    withTempDir { d =>
      import java.nio.file.Files
      val root = java.nio.file.Paths.get(d)
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(1L -> 10L)), 0L, Seq("k"), Seq("n", "s"))
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(1L -> 5L)), 1L, Seq("k"), Seq("n", "s"))
      // simulate dying between move(tmp, gold) and the final rm(prev):
      // batch 1 is fully published but its set-aside predecessor (the
      // batch-0 snapshot) is still on disk, and the engine replays 1
      val stale = root.resolve("gold_prev")
      spark.read.parquet(root.resolve("gold").toString)
        .write.parquet(stale.toString) // any stale content
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(1L -> 5L)), 1L, Seq("k"), Seq("n", "s")) shouldBe false
      // gold exists, so the stale prev must NOT be restored over it,
      // and the replayed batch must not double-merge
      goldOf(root) shouldBe Set((1L, 2L, 15L))
      // the next real batch clears the leftover and lands on top
      Incremental.publishAdditiveBatch(spark, root,
        deltaOf(Seq(2L -> 1L)), 2L, Seq("k"), Seq("n", "s")) shouldBe true
      goldOf(root) shouldBe Set((1L, 2L, 15L), (2L, 1L, 1L))
      Files.exists(stale) shouldBe false
    }
  }

  test("publishAdditiveBatch: sequence of batches equals the one-shot " +
      "aggregate and the marker never leaks into the read") {
    withTempDir { d =>
      val root = java.nio.file.Paths.get(d)
      val batches = Seq(
        Seq(1L -> 1L, 2L -> 2L), Seq(2L -> 3L), Seq(1L -> -1L, 3L -> 9L))
      batches.zipWithIndex.foreach { case (rows, i) =>
        Incremental.publishAdditiveBatch(spark, root, deltaOf(rows),
          i.toLong, Seq("k"), Seq("n", "s"))
      }
      val oneShot = deltaOf(batches.flatten)
        .as[(Long, Long, Long)].collect().toSet
      goldOf(root) shouldBe oneShot
    }
  }
}
