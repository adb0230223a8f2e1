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
  *
  * `tailer = true` walks additionally weave a PERSISTENT TAILING
  * CONSUMER through the history: one change-feed checkpoint for the
  * whole walk, drained at random points. This models the live CDC
  * subscriber the end-of-sequence fresh drain cannot — resume-after-
  * vacuum is where round 13's silent snapshot re-emission bug lived —
  * and the model predicts exactly when a resume must SUCCEED (every
  * needed manifest still retained: the version's own, plus its
  * predecessor's for data-changing versions; compactions need no
  * predecessor) vs FAIL LOUDLY (reader lag overran vacuum retention),
  * after which the documented remedy — restart fresh — must deliver
  * the retained snapshot plus later deltas exactly once.
  */
class ManifestModelSpec extends SparkSpec {
  import spark.implicits._

  private def readRows(dir: String, v: Option[Long]): Seq[(Long, String)] =
    ManifestSink.read(spark, dir, v)
      .as[(Long, String)].collect().toSeq

  private def sortedRows(rows: Seq[(Long, String)]): Seq[(Long, String)] =
    rows.sortBy(r => (r._1, r._2))

  private def runModel(seed: Int, nOps: Int, tailer: Boolean = false)
      : Unit = withTempDir { dir => withTempDir { tailCp =>
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

    // Persistent tailing consumer (tailer walks only): the version the
    // stream has committed through, or None before the first drain /
    // after a fresh restart. See the class doc for the model's
    // success/fail prediction rules.
    var tailOffset: Option[Long] = None
    // the fresh-tail contract, stated ONCE (used by both the mid-walk
    // fresh drains and the end-of-sequence check): the oldest retained
    // snapshot plus every later version's data-change delta
    def freshFeedExpectation(): Seq[(Long, String)] = {
      val retained = model.keys.toSeq.sorted
      sortedRows(model(retained.head) ++ retained.tail.flatMap(feedDelta))
    }
    def drainTailer(): Unit = {
      // a version's delta is reconstructible iff its own manifest is
      // retained AND (v=1 full-files short-circuit, or rewrite-only
      // compaction, or the predecessor's manifest is retained too)
      def deltaReconstructible(v: Long): Boolean =
        model.contains(v) &&
          (v <= 1 || feedDelta(v).isEmpty || model.contains(v - 1))
      val expected: Option[Seq[(Long, String)]] = tailOffset match {
        case None => Some(freshFeedExpectation())
        case Some(s) =>
          val range = (s + 1) to latest
          if (range.forall(deltaReconstructible))
            Some(sortedRows(range.flatMap(feedDelta)))
          else None
      }
      expected match {
        case Some(rows) =>
          val seen = ManifestFeedHarness.drain(spark, dir, tailCp)
          withClue(s"seed=$seed tail drain from $tailOffset at " +
              s"latest=$latest: ") {
            sortedRows(seen) shouldBe rows
          }
          tailOffset = Some(latest)
        case None =>
          // reader lag overran vacuum retention: the ONLY honest
          // outcome is a loud failure (silent loss or snapshot
          // re-emission is the round-13 bug class)
          val ex = intercept[org.apache.spark.sql.streaming
              .StreamingQueryException] {
            ManifestFeedHarness.drain(spark, dir, tailCp)
          }
          val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
          withClue(s"seed=$seed failed-resume diagnostics: ") {
            msgs should include("vacuum")
          }
          // the documented remedy: restart the stream fresh
          Option(new java.io.File(tailCp).listFiles)
            .foreach(_.foreach(deleteRecursively))
          tailOffset = None
      }
    }

    (0 until nOps).foreach { i =>
      val op = rnd.nextInt(if (tailer) 12 else 10)
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
      } else if (op == 9) { // time-travel read of a random retained version
        if (model.nonEmpty) {
          val v = model.keys.toSeq(rnd.nextInt(model.size))
          sortedRows(readRows(dir, Some(v))) shouldBe model(v)
        }
      } else { // op 10-11 (tailer walks only): incremental feed drain
        drainTailer()
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
      val expected = freshFeedExpectation()
      val seen =
        withTempDir { cp => ManifestFeedHarness.drain(spark, dir, cp) }
      withClue(s"seed=$seed change feed over the final log: ") {
        sortedRows(seen) shouldBe expected
      }
    }
  } }

  // ---------------------------------------------------------------
  // SCHEMA-EVOLVING walks (round-16, r14 verdict ask #4): the same
  // walk plus two evolution ops — ADD-COLUMN (an append carrying a new
  // `extra` column; every later write keeps the widened shape, the
  // monotone-evolution posture of real lake formats) and
  // NULLABLE-WIDEN (an append whose writer schema relaxes `name` from
  // NOT NULL to nullable and whose rows carry some NULL names; the
  // commit's constraint-relax induction must record a DDL every listed
  // file satisfies). The model normalizes every read to one canonical
  // (id, name?, extra?) shape: pre-widening versions read with their
  // own 2-column recorded schema (extra ⇒ None), post-widening
  // versions surface pre-widening files' extra as NULL, and each feed
  // drain — a NEW stream over the persistent checkpoint — resolves the
  // CURRENT schema, so a drain that crosses the widening boundary
  // reads old deltas with extra = NULL. Seeds 1-6 above keep their
  // original op distribution and replay history byte-stable.
  // ---------------------------------------------------------------
  private type R3 = (Long, Option[String], Option[Long])

  private def sorted3(rows: Seq[R3]): Seq[R3] =
    rows.sortBy(r => (r._1, r._2.map("S" + _).getOrElse("N"),
      r._3.map(v => "S" + v).getOrElse("N")))

  private def readRows3(dir: String, v: Option[Long]): Seq[R3] = {
    val df = ManifestSink.read(spark, dir, v)
    val hasExtra = df.columns.contains("extra")
    df.collect().toSeq.map { r =>
      val ni = r.fieldIndex("name")
      val ei = if (hasExtra) r.fieldIndex("extra") else -1
      (r.getLong(r.fieldIndex("id")),
        if (r.isNullAt(ni)) None else Some(r.getString(ni)),
        if (ei < 0 || r.isNullAt(ei)) None else Some(r.getLong(ei)))
    }
  }

  private def runEvolveModel(seed: Int, nOps: Int): Unit =
    withTempDir { dir => withTempDir { tailCp =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val rnd = new Random(seed)
      var nextId = 0L
      // write-shape state: monotone once evolved
      var widened = false        // writes carry `extra`
      var nameNullable = false   // writer schema allows NULL names
      def freshRows(n: Int): Seq[R3] =
        (0 until n).map { _ =>
          nextId += 1
          val name = if (nameNullable && rnd.nextInt(5) == 0) None
                     else Some(s"r$nextId-${rnd.nextInt(1000)}")
          val extra = if (widened && rnd.nextInt(4) != 0)
                        Some(rnd.nextInt(100).toLong) else None
          (nextId, name, extra)
        }
      def writeFrame(rows: Seq[R3], mode: String): Unit = {
        val fields = Seq(
          StructField("id", LongType, nullable = false),
          StructField("name", StringType, nullable = nameNullable)) ++
          (if (widened) Seq(StructField("extra", LongType)) else Nil)
        val rws = rows.map { r =>
          if (widened) Row(r._1, r._2.orNull, r._3.map(Long.box).orNull)
          else Row(r._1, r._2.orNull)
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rws, 1 + rnd.nextInt(3)),
          StructType(fields))
          .write.format("graft-manifest").option("path", dir)
          .mode(mode).save()
      }

      var model = Map.empty[Long, Seq[R3]]
      var feedDelta = Map.empty[Long, Seq[R3]]
      var latest = 0L

      def checkAll(): Unit = {
        ManifestSink.listVersions(dir) shouldBe model.keys.toSeq.sorted
        model.foreach { case (v, expected) =>
          withClue(s"evolve seed=$seed version=$v of latest=$latest: ") {
            sorted3(readRows3(dir, Some(v))) shouldBe expected
          }
        }
        if (model.nonEmpty)
          sorted3(readRows3(dir, None)) shouldBe model(latest)
      }

      var tailOffset: Option[Long] = None
      def freshFeedExpectation(): Seq[R3] = {
        val retained = model.keys.toSeq.sorted
        sorted3(model(retained.head) ++ retained.tail.flatMap(feedDelta))
      }
      def drainTailer(): Unit = {
        def deltaReconstructible(v: Long): Boolean =
          model.contains(v) &&
            (v <= 1 || feedDelta(v).isEmpty || model.contains(v - 1))
        val expected: Option[Seq[R3]] = tailOffset match {
          case None => Some(freshFeedExpectation())
          case Some(s) =>
            val range = (s + 1) to latest
            if (range.forall(deltaReconstructible))
              Some(sorted3(range.flatMap(feedDelta)))
            else None
        }
        expected match {
          case Some(rows) =>
            val seen = ManifestFeedHarness.drainEvolve(spark, dir, tailCp)
            withClue(s"evolve seed=$seed tail drain from $tailOffset " +
                s"at latest=$latest: ") {
              sorted3(seen) shouldBe rows
            }
            tailOffset = Some(latest)
          case None =>
            val ex = intercept[org.apache.spark.sql.streaming
                .StreamingQueryException] {
              ManifestFeedHarness.drainEvolve(spark, dir, tailCp)
            }
            val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
              .takeWhile(_ != null)
              .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
            withClue(s"evolve seed=$seed failed-resume diagnostics: ") {
              msgs should include("vacuum")
            }
            Option(new java.io.File(tailCp).listFiles)
              .foreach(_.foreach(deleteRecursively))
            tailOffset = None
        }
      }

      (0 until nOps).foreach { i =>
        val op = rnd.nextInt(14)
        if (model.isEmpty || op <= 3) { // append
          val rows = freshRows(1 + rnd.nextInt(5))
          writeFrame(rows, "append")
          latest += 1
          model += latest -> sorted3(model.getOrElse(latest - 1,
            Seq.empty) ++ rows)
          feedDelta += latest -> rows
        } else if (op <= 6) { // overwrite
          val rows = freshRows(1 + rnd.nextInt(4))
          writeFrame(rows, "overwrite")
          latest += 1
          model += latest -> sorted3(rows)
          feedDelta += latest -> rows
        } else if (op == 7) { // compact
          val v = ManifestSink.compact(spark, dir, 1 + rnd.nextInt(2))
          v shouldBe latest + 1
          latest += 1
          model += latest -> model(latest - 1)
          feedDelta += latest -> Seq.empty
        } else if (op == 8) { // vacuum
          val keep = 1 + rnd.nextInt(math.max(model.size, 1))
          ManifestSink.expireVersions(dir, keepLast = keep)
          val kept = model.keys.toSeq.sorted.takeRight(keep).toSet
          val dropped = model.keys.filterNot(kept).toSeq
          model = model.filter { case (v, _) => kept(v) }
          dropped.foreach { v =>
            intercept[Exception] { readRows3(dir, Some(v)) }
          }
        } else if (op == 9) { // time travel
          if (model.nonEmpty) {
            val v = model.keys.toSeq(rnd.nextInt(model.size))
            sorted3(readRows3(dir, Some(v))) shouldBe model(v)
          }
        } else if (op <= 11) { // drain
          drainTailer()
        } else if (op == 12) { // ADD-COLUMN: widen, then append wide
          widened = true
          val rows = freshRows(1 + rnd.nextInt(4))
          writeFrame(rows, "append")
          latest += 1
          model += latest -> sorted3(model.getOrElse(latest - 1,
            Seq.empty) ++ rows)
          feedDelta += latest -> rows
          // non-vacuous: the commit recorded the widened DDL, with
          // `extra` relaxed to nullable whenever base files predate it
          val ddl = ManifestSink.schemaOf(dir, Some(latest))
          ddl.fieldNames should contain("extra")
          if (latest > 1) ddl("extra").nullable shouldBe true
        } else { // op 13, NULLABLE-WIDEN: name may be NULL from now on
          nameNullable = true
          val rows = freshRows(1 + rnd.nextInt(4))
          writeFrame(rows, "append")
          latest += 1
          model += latest -> sorted3(model.getOrElse(latest - 1,
            Seq.empty) ++ rows)
          feedDelta += latest -> rows
          // non-vacuous: the recorded DDL must carry the relaxation
          ManifestSink.schemaOf(dir, Some(latest))("name")
            .nullable shouldBe true
        }
        if (i % 5 == 4 || i == nOps - 1) checkAll()
      }

      if (model.nonEmpty) {
        val expected = freshFeedExpectation()
        val seen = withTempDir { cp =>
          ManifestFeedHarness.drainEvolve(spark, dir, cp)
        }
        withClue(s"evolve seed=$seed change feed over the final log: ") {
          sorted3(seen) shouldBe expected
        }
      }
    } }

  test("random op sequences agree with the reference model (seed 1)") {
    runModel(seed = 1, nOps = 60)
  }

  test("random op sequences agree with the reference model (seed 2)") {
    runModel(seed = 2, nOps = 60)
  }

  test("random op sequences agree with the reference model (seed 3)") {
    runModel(seed = 3, nOps = 60)
  }

  // Tailing-consumer walks: the same five ops PLUS a persistent
  // change-feed subscriber drained at random points (see class doc).
  // Seeds 1-3 keep their original op distribution so their replay
  // history stays byte-stable; these walks draw from the wider range.
  test("random op sequences with a persistent tailing consumer (seed 4)") {
    runModel(seed = 4, nOps = 60, tailer = true)
  }

  test("random op sequences with a persistent tailing consumer (seed 5)") {
    runModel(seed = 5, nOps = 60, tailer = true)
  }

  test("random op sequences with a persistent tailing consumer (seed 6)") {
    runModel(seed = 6, nOps = 60, tailer = true)
  }

  // Schema-evolving tailing walks (new seeds only; see the block
  // comment above runEvolveModel — seeds 1-6 stay replay-stable).
  test("schema-evolving walk with a persistent tailing consumer (seed 7)") {
    runEvolveModel(seed = 7, nOps = 60)
  }

  test("schema-evolving walk with a persistent tailing consumer (seed 8)") {
    runEvolveModel(seed = 8, nOps = 60)
  }

  test("schema-evolving walk with a persistent tailing consumer (seed 9)") {
    runEvolveModel(seed = 9, nOps = 60)
  }

  test("extended soak: GRAFT_EVOLVE_SOAK_SEEDS extra evolving walks") {
    // opt-in, like the tailing soak below: N more 100-op evolving
    // walks on seeds 100..99+N; any failure replays by seed
    val n = sys.env.get("GRAFT_EVOLVE_SOAK_SEEDS")
      .map(_.trim.toInt).getOrElse(0)
    assume(n > 0, "set GRAFT_EVOLVE_SOAK_SEEDS=N to enable")
    (100 until 100 + n).foreach(s => runEvolveModel(seed = s, nOps = 100))
  }

  test("extended soak: GRAFT_MODEL_SOAK_SEEDS extra tailing walks") {
    // opt-in deep soak for bug hunts (not part of the default suite's
    // time budget): GRAFT_MODEL_SOAK_SEEDS=N runs N more 100-op
    // tailing walks on seeds 7..6+N; any failure replays by seed
    val n = sys.env.get("GRAFT_MODEL_SOAK_SEEDS")
      .map(_.trim.toInt).getOrElse(0)
    assume(n > 0, "set GRAFT_MODEL_SOAK_SEEDS=N to enable")
    (7 until 7 + n).foreach(s => runModel(seed = s, nOps = 100,
      tailer = true))
  }
}
