package graft.sources

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Model-based randomized test of the manifest table format: a seeded
  * random sequence of the format's five operations (append, overwrite,
  * compact, vacuum, time-travel read) is replayed against an in-memory
  * REFERENCE MODEL — a map version -> expected row multiset — and after
  * every operation the real table must agree with the model on:
  *   - the committed version list,
  *   - the LATEST snapshot's exact row multiset,
  *   - every still-retained historical version's exact row multiset,
  *   - expired versions raising (not silently reading something else).
  *
  * The point of the model test is the INTERACTIONS the per-path unit
  * specs can't enumerate: a compact after an overwrite after a vacuum,
  * a vacuum that lands on a compaction boundary, an append whose base
  * snapshot shares files with three expired predecessors. 60 random
  * operations x 3 seeds ~ a few hundred cross-path transitions, all
  * checked exactly. Seeded, so a failure replays deterministically.
  */
class ManifestModelSpec extends SparkSpec {
  import spark.implicits._

  private def readRows(dir: String, v: Option[Long]): Seq[(Long, String)] =
    ManifestSink.read(spark, dir, v)
      .as[(Long, String)].collect().toSeq

  private def sortedRows(rows: Seq[(Long, String)]): Seq[(Long, String)] =
    rows.sortBy(r => (r._1, r._2))

  private def runModel(seed: Int, nOps: Int): Unit = withTempDir { dir =>
    val rnd = new Random(seed)
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, String)] =
      (0 until n).map { _ =>
        nextId += 1
        (nextId, s"r$nextId-${rnd.nextInt(1000)}")
      }
    // version -> expected multiset (sorted canonical form)
    var model = Map.empty[Long, Seq[(Long, String)]]
    // version -> what the CHANGE FEED owes for that version: an
    // append's fresh rows, an overwrite's own rows, NOTHING for a
    // compaction (data_change=false)
    var feedDelta = Map.empty[Long, Seq[(Long, String)]]
    var latest = 0L

    def checkAll(): Unit = {
      ManifestSink.listVersions(dir) shouldBe model.keys.toSeq.sorted
      model.foreach { case (v, expected) =>
        withClue(s"seed=$seed version=$v of latest=$latest: ") {
          sortedRows(readRows(dir, Some(v))) shouldBe expected
        }
      }
      if (model.nonEmpty)
        sortedRows(readRows(dir, None)) shouldBe model(latest)
    }

    (0 until nOps).foreach { i =>
      val op = rnd.nextInt(10)
      if (model.isEmpty || op <= 3) { // append (always legal)
        val rows = freshRows(1 + rnd.nextInt(5))
        rows.toDF("id", "name").repartition(1 + rnd.nextInt(3))
          .write.format("graft-manifest").option("path", dir)
          .mode("append").save()
        latest += 1
        model += latest -> sortedRows(model.getOrElse(latest - 1,
          Seq.empty) ++ rows)
        feedDelta += latest -> rows
      } else if (op <= 6) { // overwrite
        val rows = freshRows(1 + rnd.nextInt(4))
        rows.toDF("id", "name").repartition(1 + rnd.nextInt(3))
          .write.format("graft-manifest").option("path", dir)
          .mode("overwrite").save()
        latest += 1
        model += latest -> sortedRows(rows)
        feedDelta += latest -> rows
      } else if (op == 7) { // compact: content-identical new version
        val v = ManifestSink.compact(spark, dir, 1 + rnd.nextInt(2))
        v shouldBe latest + 1
        latest += 1
        model += latest -> model(latest - 1)
        feedDelta += latest -> Seq.empty // rewrite, not a data change
      } else if (op == 8) { // vacuum: keep a random suffix
        val keep = 1 + rnd.nextInt(math.max(model.size, 1))
        ManifestSink.expireVersions(dir, keepLast = keep)
        val kept = model.keys.toSeq.sorted.takeRight(keep).toSet
        val dropped = model.keys.filterNot(kept).toSeq
        model = model.filter { case (v, _) => kept(v) }
        // expired versions must fail loudly, not read something stale
        dropped.foreach { v =>
          intercept[Exception] { readRows(dir, Some(v)) }
        }
      } else { // time-travel read of a random retained version
        if (model.nonEmpty) {
          val v = model.keys.toSeq(rnd.nextInt(model.size))
          sortedRows(readRows(dir, Some(v))) shouldBe model(v)
        }
      }
      // full cross-check every few ops (every op would be O(n^2) reads)
      if (i % 5 == 4 || i == nOps - 1) checkAll()
    }

    // END-OF-SEQUENCE FEED CHECK: a fresh stream over the final log
    // must deliver the oldest retained snapshot (its initial-state
    // batch) plus every later version's data-change delta — appends'
    // and overwrites' own rows, NOTHING for compactions — exactly
    // once, whatever cross-path history the random walk produced.
    if (model.nonEmpty) {
      val retained = model.keys.toSeq.sorted
      val expected = sortedRows(model(retained.head) ++
        retained.tail.flatMap(feedDelta))
      val seen =
        withTempDir { cp => ManifestFeedHarness.drain(spark, dir, cp) }
      withClue(s"seed=$seed change feed over the final log: ") {
        sortedRows(seen) shouldBe expected
      }
    }
  }

  test("random op sequences agree with the reference model (seed 1)") {
    runModel(seed = 1, nOps = 60)
  }

  test("random op sequences agree with the reference model (seed 2)") {
    runModel(seed = 2, nOps = 60)
  }

  test("random op sequences agree with the reference model (seed 3)") {
    runModel(seed = 3, nOps = 60)
  }
}
