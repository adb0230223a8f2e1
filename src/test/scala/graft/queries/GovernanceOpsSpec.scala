package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the governance operators (PII redaction accounting, SCD
  * Type-2 folding, NFC canonicalization, interval merge) on crafted
  * fixtures small enough to reason about by hand. The oracle harness
  * checks engine parity; these pin the intended MEANING.
  */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q98 PII accounting: planted categories counted by residue class") {
    withTempDir { dir =>
      // ids 1..10: %3 -> {3,6,9} emails, %5 -> {5,10} IPs, %7 -> {7}
      // phone; union of PII-bearing docs = {3,5,6,7,9,10}
      writeDocs(dir, (1L to 10L).map(i => i -> "plain words only"))
      val out = GovernanceQueries.q98PiiRedact.fn(spark, dir)
        .select("source", "n_docs", "docs_with_pii", "emails", "ips",
          "phones", "chars_removed")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
      out.size shouldBe 1
      val (_, nDocs, withPii, emails, ips, phones, removed) = out.head
      nDocs shouldBe 10L
      withPii shouldBe 6L
      emails shouldBe 3L
      ips shouldBe 2L
      phones shouldBe 1L
      // redaction deltas: email "uN@ex.com" (9 ch) -> "<EMAIL>" (7) = +2
      // each; ip "10.0.5.7" (8 ch) -> "<IP>" (4) = +4 and "10.0.10.7"
      // (9 ch) = +5; phone "555-123-4567" (12) -> "<PHONE>" (7) = +5
      removed shouldBe (3L * 2 + 4 + 5 + 5)
    }
  }

  test("q98 redaction leaves PII-free docs untouched") {
    withTempDir { dir =>
      // ids coprime to 3, 5, 7 -> nothing planted, nothing matched
      writeDocs(dir, Seq(1L, 2L, 4L, 8L).map(i => i -> "no pii here"))
      val out = GovernanceQueries.q98PiiRedact.fn(spark, dir)
        .select("docs_with_pii", "chars_removed")
        .as[(Long, Long)].collect().toList
      out shouldBe List((0L, 0L))
    }
  }

  private def writeCustomer(dir: String, keys: Seq[Long]): Unit =
    keys.map(k => (k, s"c$k", 0, k * 100.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

  test("q99 SCD2: change, gap, late-birth and truncation each fold right") {
    withTempDir { dir =>
      writeCustomer(dir, Seq(1L, 3L, 7L, 8L, 10L))
      val out = GovernanceQueries.q99Scd2Snapshots.fn(spark, dir)
        .select("c_custkey", "valid_from", "valid_to", "bal", "is_current")
        .as[(Long, Long, Long, Double, Boolean)].collect().toList
      val byKey = out.groupBy(_._1)
      // key 1: in all snapshots, never mutated -> one current interval
      byKey(1L) shouldBe List((1L, 1L, 3L, 100.0, true))
      // key 3: %3 mutation applies only in v2 -> three intervals
      // (base / base+100 / base), only the last current
      byKey(3L) shouldBe List(
        (3L, 1L, 1L, 300.0, false),
        (3L, 2L, 2L, 400.0, false),
        (3L, 3L, 3L, 300.0, true))
      // key 7: absent from v2 (%7) -> presence gap splits the history
      byKey(7L) shouldBe List(
        (7L, 1L, 1L, 700.0, false),
        (7L, 3L, 3L, 700.0, true))
      // key 8: absent from v3 (%8) -> history truncated, nothing current
      byKey(8L) shouldBe List((8L, 1L, 2L, 800.0, false))
      // key 10: absent from v1 (%10) -> born at v2
      byKey(10L) shouldBe List((10L, 2L, 3L, 1000.0, true))
    }
  }

  test("q195 SCD2 invariants: the q99 fixture audits to zero overlaps, " +
      "one presence gap, and a depth-3 history") {
    withTempDir { dir =>
      writeCustomer(dir, Seq(1L, 3L, 7L, 8L, 10L))
      // intervals (see the q99 spec): 1:[1,3]; 3:[1][2][3]; 7:[1],[3]
      // (gap); 8:[1,2]; 10:[2,3] -> 8 intervals, current = 1,3,7,10
      val out = GovernanceQueries.q195Scd2Invariants.fn(spark, dir)
        .select("n_keys", "n_intervals", "n_overlaps", "n_gaps",
          "n_current", "max_per_key")
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
      out shouldBe ((5L, 8L, 0L, 1L, 4L, 3L))
    }
  }

  test("q197 domain audit: a planted out-of-vocabulary value lands in " +
      "exactly its constraint's row") {
    withTempDir { dir =>
      writeCustomer(dir, Seq(1L)) // segment "SEG" violates the domain
      writeDocs(dir, Seq((1L, "a b")))
      writeEvents(dir, Seq((1L, 1L, 1000000000L, "view", 0.0),
        (2L, 2L, 2000000000L, "weird", 0.0)))
      Seq(("O", "F", "R"), ("F", "O", "A"))
        .toDF("o_orderstatus", "l_linestatus", "l_returnflag")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Seq(Tuple1("O")).toDF("o_orderstatus")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = GovernanceQueries.q197DomainAudit.fn(spark, dir)
        .select("constraint", "n_rows", "n_bad", "bad_ppm")
        .as[(String, Long, Long, Long)].collect().toList
      out shouldBe List(
        ("customer.c_mktsegment", 1L, 1L, 1000000L),
        ("documents.lang", 1L, 0L, 0L),
        ("events.event_type", 2L, 1L, 500000L),
        ("lineitem.l_linestatus", 2L, 0L, 0L),
        ("lineitem.l_returnflag", 2L, 0L, 0L),
        ("orders.o_orderstatus", 1L, 0L, 0L))
    }
  }

  test("q198 uniqueness audit: a duplicated event_id and a composite-key " +
      "collision are both counted") {
    withTempDir { dir =>
      writeCustomer(dir, Seq(1L, 2L))
      writeDocs(dir, Seq((1L, "a")))
      // event_id 5 appears twice -> 1 dupe
      writeEvents(dir, Seq((5L, 1L, 1000000000L, "view", 0.0),
        (5L, 2L, 2000000000L, "view", 0.0)))
      // composite key: (1,1) repeats -> 1 dupe; (1,2) distinct
      Seq((1L, 1), (1L, 1), (1L, 2))
        .toDF("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Seq(Tuple1(1L)).toDF("o_orderkey")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Seq(Tuple1(1L)).toDF("p_partkey")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      Seq(Tuple1(1L)).toDF("n_nationkey")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      Seq(Tuple1(1L)).toDF("r_regionkey")
        .write.mode("overwrite").parquet(s"$dir/region.parquet")
      Seq(Tuple1(1L)).toDF("s_suppkey")
        .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      val out = GovernanceQueries.q198UniquenessAudit.fn(spark, dir)
        .select("key", "n_dupes").as[(String, Long)].collect().toMap
      out("events.event_id") shouldBe 1L
      out("lineitem.(l_orderkey,l_linenumber)") shouldBe 1L
      out("customer.c_custkey") shouldBe 0L
    }
  }

  test("q99 intervals partition each key's observed versions") {
    withTempDir { dir =>
      writeCustomer(dir, (1L to 40L).toSeq)
      val out = GovernanceQueries.q99Scd2Snapshots.fn(spark, dir)
        .select("c_custkey", "valid_from", "valid_to")
        .as[(Long, Long, Long)].collect().toList
      out.groupBy(_._1).foreach { case (k, ivs) =>
        val sorted = ivs.sortBy(_._2)
        // non-overlapping, ordered
        sorted.sliding(2).foreach {
          case Seq((_, _, t1), (_, f2, _)) => assert(t1 < f2, s"key $k")
          case _ => ()
        }
        // covered versions = exactly the snapshots that contain the key
        val covered = sorted.flatMap(iv => iv._2 to iv._3).toSet
        val expected = Seq(1L, 2L, 3L).filter {
          case 1L => k % 10 != 0
          case 2L => k % 7 != 0
          case _  => k % 8 != 0
        }.toSet
        covered shouldBe expected
      }
    }
  }

  test("q100 NFC: two combining marks compose, codepoint count drops by 2") {
    withTempDir { dir =>
      writeDocs(dir, Seq(4L -> "abcd", 8L -> "abcd"))
      val out = GovernanceQueries.q100NfcNormalize.fn(spark, dir)
        .select("doc_id", "pre_codepoints", "post_codepoints", "composed")
        .as[(Long, Long, Long, Boolean)].collect().toList
      out.size shouldBe 2
      out.foreach { case (_, pre, post, composed) =>
        // 4 text chars + " e<acute>-A<ring>-e'" = 4 + 8 pre-NFC codepoints
        pre shouldBe 12L
        post shouldBe 10L
        composed shouldBe true
      }
      // identical planted text -> identical normalized digests
      val md5s = GovernanceQueries.q100NfcNormalize.fn(spark, dir)
        .select("norm_md5").as[String].collect().toList
      md5s.distinct.size shouldBe 1
    }
  }

  test("q101 interval merge: overlap merges, containment, gap splits") {
    withTempDir { dir =>
      val sec = 1000000000L // ns
      writeEvents(dir, Seq(
        // user 1: 0s and 100s overlap (span 300s) -> [0,400s];
        // 1000s stands alone -> [1000,1300s]
        (1L, 1L, 0 * sec, "a", 0.0),
        (2L, 1L, 100 * sec, "a", 0.0),
        (3L, 1L, 1000 * sec, "a", 0.0),
        // user 2: chain 0,10,20s collapses into [0,320s]
        (4L, 2L, 0 * sec, "a", 0.0),
        (5L, 2L, 10 * sec, "a", 0.0),
        (6L, 2L, 20 * sec, "a", 0.0),
        // user 3: single event
        (7L, 3L, 50 * sec, "a", 0.0)))
      val out = GovernanceQueries.q101IntervalMerge.fn(spark, dir)
        .select("user_id", "n_intervals", "covered_us")
        .as[(Long, Long, Long)].collect().toList
      out shouldBe List(
        (1L, 2L, 700000000L),  // 400 s + 300 s in epoch-µs
        (2L, 1L, 320000000L),
        (3L, 1L, 300000000L))
    }
  }

  test("q101 coverage bounded by n_events * span and >= one span") {
    withTempDir { dir =>
      val ms = 1000000L
      writeEvents(dir, (1L to 50L).map(i =>
        (i, i % 5, (i * 37) % 900 * 1000 * ms, "a", 0.0)))
      val out = GovernanceQueries.q101IntervalMerge.fn(spark, dir)
        .select("user_id", "n_intervals", "covered_us")
        .as[(Long, Long, Long)].collect().toList
      out.foreach { case (_, n, cov) =>
        assert(cov >= 300000000L)
        assert(cov <= 50L * 300000000L)
        assert(n >= 1L)
      }
    }
  }

  test("q164 l-diversity: homogeneous, at-risk and diverse classes are " +
      "each tagged from their band count, not their size") {
    withTempDir { dir =>
      // class (0,A): bands neg/low/high -> diverse
      // class (1,A): two members, ONE band -> homogeneous (the
      //   homogeneity attack: k-large yet fully leaking)
      // class (2,A): bands low/high -> at_risk
      Seq(
        (1L, 0, -5.0, "A"), (2L, 0, 100.0, "A"), (3L, 0, 6000.0, "A"),
        (4L, 1, 100.0, "A"), (5L, 1, 200.0, "A"),
        (6L, 2, 100.0, "A"), (7L, 2, 6000.0, "A"))
        .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val out = GovernanceQueries.q164LDiversity.fn(spark, dir)
        .select("nation", "class_size", "n_bands", "status")
        .as[(Int, Long, Long, String)].collect().toList
      out shouldBe List(
        (0, 3L, 3L, "diverse"),
        (1, 2L, 1L, "homogeneous"),
        (2, 2L, 2L, "at_risk"))
    }
  }

  test("q178 t-closeness: a class with all three bands still violates " +
      "when its distribution skews from the global one") {
    withTempDir { dir =>
      // class (0,A): 4 neg + 1 low + 1 high — close to the global mix
      // it dominates (TV = 5/18 ≈ 0.278, within). class (1,A): 3 high —
      // l-DIVERSE checks would need band variety, but the skew ALONE
      // leaks (TV = 5/9 ≈ 0.556, violates).
      val rows =
        Seq((-10.0, 0), (-20.0, 0), (-30.0, 0), (-40.0, 0),
          (100.0, 0), (6000.0, 0),
          (7000.0, 1), (8000.0, 1), (9000.0, 1))
      rows.zipWithIndex.map { case ((bal, nation), i) =>
        (i.toLong + 1, nation, bal, "A")
      }.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val out = GovernanceQueries.q178TCloseness.fn(spark, dir)
        .select("nation", "class_size", "tv", "status")
        .as[(Int, Long, Double, String)].collect().toList
      out.map(r => (r._1, r._2, r._4)) shouldBe List(
        (0, 6L, "within"), (1, 3L, "violates"))
      out(1)._3 should be > out.head._3
    }
  }
}
