package graft.queries

import graft.SparkSpec

/** Semantics of the round-7 additions (q120 CMS heavy hitters, q121 PIT
  * enrichment, q122 Markov transitions, q123 rolling distinct, q124 MAD
  * outliers, q125 PPS sampling) on crafted fixtures — the oracle harness
  * checks engine parity; these pin the intended MEANING.
  */
class RobustOpsSpec extends SparkSpec {
  import spark.implicits._

  private val HourNs = 3600L * 1000000000L
  private val DayNs = 24L * HourNs

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = // (ns, user, id, type)
    rows.map { case (ns, u, id, t) => (id, ns, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q120: CMS estimate never undercounts, and the heavy key leads") {
    withTempDir { dir =>
      // one heavy user (60 events) + 30 distinct light users: with only
      // 64 buckets some light users MUST collide somewhere, but min over
      // 4 independent rows keeps every estimate >= exact
      val heavy = (1L to 60L).map(i => (i * HourNs, 7L, i, "x"))
      val light = (1L to 30L).map(i => (i * HourNs, 100L + i, 1000L + i, "x"))
      writeEvents(dir, heavy ++ light)
      val rows = EventQueries.q120CmsHeavyHitters.fn(spark, dir)
        .select("user_id", "exact_cnt", "cms_est", "within_bound")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      rows.head._1 shouldBe 7L // heavy hitter ranks first
      rows.head._2 shouldBe 60L
      all(rows.map(r => r._3 >= r._2)) shouldBe true // CMS one-sided error
      all(rows.map(_._4)) shouldBe true
    }
  }

  test("q121: an order as-of a version its customer is absent from is " +
    "uncovered") {
    withTempDir { dir =>
      // custkey 10 is dropped from snapshot 1 (10 % 10 == 0) but present
      // in 2 and 3; custkey 11 is in all three
      Seq((10L, "a", 1, 500.0, "s"), (11L, "b", 1, 700.0, "s"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
          "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      // orderkey % 3 + 1 = as-of version: 3 -> v1, 1 -> v2, 2 -> v3
      Seq((3L, 10L), (1L, 10L), (3L, 11L))
        .map { case (ok, ck) => (ok, ck, "O", 1.0,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "p") }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val rows = GovernanceQueries.q121PitEnrich.fn(spark, dir)
        .select("as_of_ver", "n_orders", "n_covered")
        .as[(Long, Long, Long)].collect().toSeq
      // v1: cust 10 absent (uncovered), cust 11 covered; v2: cust 10 covered
      rows shouldBe Seq((1L, 2L, 1L), (2L, 1L, 1L))
    }
  }

  test("q122: transition counts and row-normalized probabilities") {
    withTempDir { dir =>
      // user 1: A,B,A,C  ->  A->B, B->A, A->C; user 2: A,B -> A->B
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 1L, "A"), (2L * HourNs, 1L, 2L, "B"),
        (3L * HourNs, 1L, 3L, "A"), (4L * HourNs, 1L, 4L, "C"),
        (1L * HourNs, 2L, 5L, "A"), (2L * HourNs, 2L, 6L, "B")))
      val rows = EventQueries.q122MarkovTransitions.fn(spark, dir)
        .as[(String, String, Long, Double)].collect().toSeq
      rows shouldBe Seq(("A", "B", 2L, 2.0 / 3), ("A", "C", 1L, 1.0 / 3),
        ("B", "A", 1L, 1.0))
    }
  }

  test("q122: simultaneous timestamps order by event_id") {
    withTempDir { dir =>
      // same ts for both events of user 1 -> event_id decides A before B
      writeEvents(dir, Seq(
        (HourNs, 1L, 1L, "A"), (HourNs, 1L, 2L, "B")))
      val rows = EventQueries.q122MarkovTransitions.fn(spark, dir)
        .as[(String, String, Long, Double)].collect().toSeq
      rows shouldBe Seq(("A", "B", 1L, 1.0))
    }
  }

  test("q123: a user active on two days counts once per 7-day window") {
    withTempDir { dir =>
      // users 1,2 on day 0; user 1 again on day 3
      writeEvents(dir, Seq(
        (1L, 1L, 1L, "x"), (2L, 2L, 2L, "x"),
        (3 * DayNs + 1L, 1L, 3L, "x")))
      val rows = EventQueries.q123RollingDistinct.fn(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq
      // day 0: 2 today / 2 in window; day 3: 1 today, window {day0,day3}
      // still has exactly users {1,2}
      rows shouldBe Seq((0L, 2L, 2L), (3L, 1L, 2L))
    }
  }

  test("q124: a planted spike is the only row beyond 3 x MAD") {
    withTempDir { dir =>
      // orderkey 997 trips the plant (997 % 997 == 0) -> x = 100 * 50
      val rows = (1L to 20L).map(k => (k, "F", 40.0 + k)) :+ (997L, "F", 50.0)
      rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("o_custkey", org.apache.spark.sql.functions.lit(1L))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = RelationalQueries.q124MadOutliers.fn(spark, dir)
        .select("flag", "n", "n_outliers").as[(String, Long, Long)]
        .collect().toSeq
      out shouldBe Seq(("F", 21L, 1L))
    }
  }

  test("q125: a document heavier than the stride is sampled once per " +
    "crossed multiple") {
    withTempDir { dir =>
      // weights 4x100 + 2000 = 2400 total, k=20 -> stride 120;
      // doc 5 spans (400, 2400]: multiples 480..2400 -> 16 hits... exact:
      // 2400/120 - 400/120 = 20 - 3 = 17
      Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, 2000L))
        .map { case (id, n) => (id, "t", "en", "s", n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = CorpusQueries.q125PpsSample.fn(spark, dir)
        .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
      rows(5L) shouldBe 17L
      rows.values.sum shouldBe 20L // exactly k draws in total
    }
  }

  test("q126: delete wins, update wins, and a later insert resurrects") {
    withTempDir { dir =>
      // key 3 -> updated (+100) at seq 2; key 5 -> deleted at seq 3;
      // key 15 -> deleted at 3 then re-inserted at 4 (bal 0); key 1 ->
      // untouched original insert
      Seq((1L, 10.0), (3L, 30.0), (5L, 50.0), (15L, 150.0))
        .map { case (k, b) => (k, "n", 1, b, "s") }
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
          "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val rows = GovernanceQueries.q126CdcApply.fn(spark, dir)
        .as[(Long, Double, Long)].collect().toSeq
      rows shouldBe Seq((1L, 10.0, 1L), (3L, 130.0, 2L), (15L, 0.0, 4L))
    }
  }

  test("q127: gini impurity is exact-integer (n² - Σc²)/n²") {
    withTempDir { dir =>
      // user 1: A,A,B -> (9 - (4+1))/9 = 4/9; user 2: A -> 0
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 1L, "A"), (2L * HourNs, 1L, 2L, "A"),
        (3L * HourNs, 1L, 3L, "B"), (1L * HourNs, 2L, 4L, "A")))
      val rows = EventQueries.q127GiniDiversity.fn(spark, dir)
        .as[(Long, Long, Long, Double)].collect().toSeq
      rows shouldBe Seq((1L, 3L, 2L, 4.0 / 9), (2L, 1L, 1L, 0.0))
    }
  }

  test("q128: a perfectly independent table has zero contributions") {
    withTempDir { dir =>
      // 2 types x 2 cohorts (user_id % 4 = 1 or 2), all cells = 1 ->
      // expected = obs everywhere -> every contrib exactly 0.0
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 1L, "A"), (2L * HourNs, 2L, 2L, "A"),
        (3L * HourNs, 1L, 3L, "B"), (4L * HourNs, 2L, 4L, "B")))
      val rows = EventQueries.q128Chi2Cells.fn(spark, dir)
        .select("obs", "expected", "contrib")
        .as[(Long, Double, Double)].collect().toSeq
      rows should have size 4
      all(rows.map(_._1)) shouldBe 1L
      all(rows.map(_._2)) shouldBe 1.0
      all(rows.map(_._3)) shouldBe 0.0
    }
  }

  test("q129: week-over-week delta and ratio against the prior week") {
    withTempDir { dir =>
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"1970-01-$day%02d 00:00:00")
      // week 0 (days 1-7): 10.0; week 1 (days 8-14): 25.0
      Seq((1L, ts(2), 10.0), (2L, ts(9), 20.0), (3L, ts(10), 5.0))
        .map { case (k, d, p) => (k, 1L, "O", p, d, "pr") }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = RelationalQueries.q129WowGrowth.fn(spark, dir)
        .as[(Long, Long, Double, Option[Double], Option[Double])]
        .collect().toSeq
      out shouldBe Seq((0L, 1L, 10.0, None, None),
        (1L, 2L, 25.0, Some(15.0), Some(2.5)))
    }
  }

  test("q130: no false negatives, and present keys always hit") {
    withTempDir { dir =>
      (1L to 200L).map(k => (k, "n", 1, 0.0, "s"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
          "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      // probes = keys + 100: 101..200 present, 201..300 absent
      val rows = RelationalQueries.q130BloomMembership.fn(spark, dir)
        .as[(Boolean, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      val (_, nPresent, hitsPresent, fnPresent, fpPresent) = rows(true)
      nPresent shouldBe 100L
      hitsPresent shouldBe 100L // every member hits — bloom contract
      fnPresent shouldBe 0L
      fpPresent shouldBe 0L
      val (_, nAbsent, _, fnAbsent, fpAbsent) = rows(false)
      nAbsent shouldBe 100L
      fnAbsent shouldBe 0L
      fpAbsent should be <= 5L // 1000 lit bits of 2^17 -> FP ~ 1e-10
    }
  }

  test("q131: the EARLIEST click in the lookback wins, not the latest") {
    withTempDir { dir =>
      // clicks at t=1h and t=2h, purchase at t=3h: first-touch credits
      // the 1h click (as-of q37 would credit the 2h one); a purchase
      // 25h after the only click goes unattributed
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 10L, "click"), (2L * HourNs, 1L, 11L, "click"),
        (3L * HourNs, 1L, 12L, "purchase"),
        (1L * HourNs, 2L, 20L, "click"),
        (26L * HourNs, 2L, 21L, "purchase")))
      val rows = EventQueries.q131FirstTouch.fn(spark, dir)
        .select("pur_id", "clk_id")
        .as[(Long, Option[Long])].collect().toMap
      rows shouldBe Map(12L -> Some(10L), 21L -> None)
    }
  }

  test("q132: dwell is credited to the state being left") {
    withTempDir { dir =>
      // user 1: A(1h) -> B(2h) -> A(4h): A dwells 1h, B dwells 2h,
      // final A is open-ended and excluded
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 1L, "A"), (2L * HourNs, 1L, 2L, "B"),
        (4L * HourNs, 1L, 3L, "A")))
      val rows = EventQueries.q132DwellTime.fn(spark, dir)
        .select("event_type", "n_transitions", "total_dwell_us")
        .as[(String, Long, Long)].collect().toSeq
      val hourUs = 3600L * 1000000L
      rows shouldBe Seq(("A", 1L, hourUs), ("B", 1L, 2 * hourUs))
    }
  }

  test("q133: ties share rank, dense_rank stays gapless") {
    withTempDir { dir =>
      def ord(k: Long, p: Double) = (k, 1L, "F", p,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "pr")
      // prices 30,30,20: rank 1,1,3 / dense 1,1,2 / percent 0,0,1
      Seq(ord(1, 30.0), ord(2, 30.0), ord(3, 20.0))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val rows = RelationalQueries.q133RankFamily.fn(spark, dir)
        .select("o_orderkey", "rnk", "drnk", "prnk", "cdist")
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
      rows shouldBe Seq((1L, 1L, 1L, 0.0, 2.0 / 3),
        (2L, 1L, 1L, 0.0, 2.0 / 3), (3L, 3L, 2L, 1.0, 1.0))
    }
  }

  test("q134: punctuation runs segment; terminal-free text is one sentence") {
    withTempDir { dir =>
      Seq((1L, "Hi! How are you?? Done."), (2L, "no terminals here"))
        .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextQueries.q134SentenceStats.fn(spark, dir)
        .select("doc_id", "n_sentences").as[(Long, Long)].collect().toMap
      rows shouldBe Map(1L -> 3L, 2L -> 1L)
    }
  }

  test("q135: the snowflake chain is all broadcast joins, no SMJ") {
    val plan = RelationalQueries.q135SnowflakeChain
      .fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      .toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("SortMergeJoin")
  }

  test("q136: per-flag bucket rows sum to the partition size, bounds nest") {
    withTempDir { dir =>
      // 16 distinct values, one row each -> 8 buckets of exactly 2 rows
      (1 to 16).map(i => ("A", i.toDouble))
        .toDF("l_returnflag", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = RelationalQueries.q136EquidepthHistogram.fn(spark, dir)
        .select("bucket", "n_rows", "lo", "hi")
        .as[(Long, Long, Double, Double)].collect().toSeq
      rows.map(_._1) shouldBe (0L to 7L)
      all(rows.map(_._2)) shouldBe 2L
      // bounds tile the domain in order without overlap
      rows.sliding(2).foreach {
        case Seq(a, b) => a._4 should be < b._3
        case _ => ()
      }
    }
  }

  test("q137: rotations sharing a deletion variant are verified away") {
    withTempDir { dir =>
      // abcde and bcdea share deletion variant "bcde" but sit at
      // Levenshtein distance 2: the equi-join proposes them, the verify
      // must reject them. The planted first-char deletions (bcde, cdea)
      // pair with their sources at distance 1 and must survive.
      val text = Array.fill(5)("abcde bcdea").mkString(" ")
      Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val pairs = TextQueries.q137SymspellJoin.fn(spark, dir)
        .as[(String, String)].collect().toSet
      pairs should contain("abcde" -> "bcde")   // planted typo recovered
      pairs should contain("bcde" -> "bcdea")   // trailing-char deletion
      (pairs should not).contain("abcde" -> "bcdea") // lev-2 rotation
    }
  }

  test("q138: every subspace partitions the whole corpus across codes") {
    val rows = SimilarityQueries.q138PqCodebook
      .fn(spark, "/root/testdata/sf0.001")
      .select("subspace", "n_vecs", "total_err")
      .as[(Long, Long, Double)].collect().toSeq
    val n = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.values
      .foreach(_ shouldBe n) // each of the 4 subspaces assigns every vec
    all(rows.map(_._3)) should be >= 0.0 // distortion is non-negative
  }

  test("q140: identical halves give zero drift; a vanished type gives " +
    "its full mass") {
    withTempDir { dir =>
      // A occurs in both halves equally; B only in the first half
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 1L, "A"), (10L * HourNs, 1L, 2L, "A"),
        (2L * HourNs, 1L, 3L, "B")))
      // range [1h,10h], midpoint 5.5h: first half = {A@1h, B@2h}
      val rows = EventQueries.q140TvDrift.fn(spark, dir)
        .select("event_type", "tv_term").as[(String, Double)]
        .collect().toMap
      // p(A)=1/2 vs q(A)=1 -> |1/2-1|/2 = 1/4; B: |1/2-0|/2 = 1/4
      rows shouldBe Map("A" -> 0.25, "B" -> 0.25)
    }
  }

  test("q141: sketch union never misses small exact counts") {
    withTempDir { dir =>
      // 3 users on day 0, 2 of them again plus 1 new on day 2
      writeEvents(dir, Seq(
        (1L, 1L, 1L, "x"), (2L, 2L, 2L, "x"), (3L, 3L, 3L, "x"),
        (2 * DayNs + 1L, 1L, 4L, "x"), (2 * DayNs + 2L, 4L, 5L, "x")))
      val rows = EventQueries.q141HllUnion.fn(spark, dir)
        .as[(Long, Long, Boolean)].collect().toSeq
      rows.map(r => (r._1, r._2)) shouldBe Seq((0L, 3L), (2L, 4L))
      all(rows.map(_._3)) shouldBe true // HLL exact at tiny cardinality
    }
  }

  test("q143: a planted level shift puts the change point at the shift") {
    withTempDir { dir =>
      // days 0-9 at 1.00/day, days 10-19 at 5.00/day: CUSUM deviation
      // peaks exactly at the last low day (k=10, day 9)
      val rows = (0 until 20).map { d =>
        val v = if (d < 10) 1.0 else 5.0
        (d * DayNs + 1L, 1L, d.toLong, "A", v)
      }
      rows.map { case (ns, u, id, t, v) => (id, ns, u, t, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = EventQueries.q143CusumChangepoint.fn(spark, dir)
        .select("event_type", "change_day").as[(String, Long)]
        .collect().toSeq
      out shouldBe Seq(("A", 9L))
    }
  }

  test("q142: confidence is directional, lift is symmetric") {
    withTempDir { dir =>
      // 30 baskets with A; 20 of them also B -> conf(A->B)=2/3,
      // conf(B->A)=1.0, lift identical both directions
      val evs = (0 until 30).flatMap { d =>
        val base = Seq((d * DayNs + 1L, 1L, d * 10L, "A"))
        if (d < 20) base :+ ((d * DayNs + 2L, 1L, d * 10L + 1L, "B"))
        else base
      }
      writeEvents(dir, evs)
      val rows = EventQueries.q142AssocRules.fn(spark, dir)
        .select("lhs", "rhs", "confidence", "lift")
        .as[(String, String, Double, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      rows(("A", "B"))._1 shouldBe 2.0 / 3
      rows(("B", "A"))._1 shouldBe 1.0
      rows(("A", "B"))._2 shouldBe rows(("B", "A"))._2
    }
  }

  test("q144: censoring shrinks the risk set without a death step") {
    withTempDir { dir =>
      // all sign up at t=0; u1 converts at 1h (n=3 -> S=2/3), u2 is
      // censored at 2h (no step), u3 converts at 3h with n=1 -> S=0
      writeEvents(dir, Seq(
        (1L, 1L, 1L, "signup"), (1L, 2L, 2L, "signup"),
        (1L, 3L, 3L, "signup"),
        (1L * HourNs, 1L, 4L, "purchase"),
        (2L * HourNs, 2L, 5L, "view"),
        (3L * HourNs, 3L, 6L, "purchase")))
      val rows = EventQueries.q144SurvivalKm.fn(spark, dir)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val h = 3600L * 1000000L // signups at 1 ns floor to t0 = 0 µs
      rows shouldBe Seq((1L * h, 1L, 3L, 2.0 / 3), (3L * h, 1L, 1L, 0.0))
    }
  }

  test("q145: missing keys null out, nested round-trip recovers k") {
    withTempDir { dir =>
      // ids 1..7, k=5 via props; id 7 trips the planted '{}' (7 % 7)
      (1L to 7L).map(id => (id, 3600L * 1000000000L, 1L, "A", 1.0,
        """{"k": 5}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val rows = EventQueries.q145JsonSurface.fn(spark, dir)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      // n=7, one missing k, sum_k=30, all docs have 3 vals, the 0-based
      // [1] element recovers k (0 for the planted missing row)
      rows shouldBe Seq(("A", 7L, 1L, 30L, 7L, 30L))
    }
  }

  test("q146: two touches split the purchase credit exactly in half") {
    withTempDir { dir =>
      val evs = Seq(
        (1L * HourNs + 1L, 1L, 1L, "click"),
        (2L * HourNs + 1L, 1L, 2L, "click"),
        (3L * HourNs, 1L, 3L, "purchase"))
      evs.map { case (ns, u, id, t) =>
        (id, ns, u, t, if (t == "purchase") 10.0 else 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val rows = EventQueries.q146LinearAttribution.fn(spark, dir)
        .select("hour_of_day", "credited_micro").as[(Long, Long)]
        .collect().toMap
      // 1000 cents x 1e6 / 2 touches = 5e8 micro-cents per hour bucket
      rows shouldBe Map(1L -> 500000000L, 2L -> 500000000L)
    }
  }

  test("q147: a planted exact plane is recovered coefficient-for-" +
    "coefficient") {
    withTempDir { dir =>
      // cents = 10 + 2·day + 3·hour exactly (the +0.5 makes the
      // floor(value*100) round-trip robust to the /100 representation)
      val evs = for (d <- 0 until 5; h <- 0 until 6) yield {
        val cents = 10 + 2 * d + 3 * h
        val ns = d.toLong * DayNs + h.toLong * HourNs + 1L
        (ns / 1000 * 1000 + 1000L, (cents + 0.5) / 100.0, d * 100L + h)
      }
      evs.zipWithIndex.map { case ((ns, v, _), i) =>
        (i.toLong, ns, 1L, "A", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val rows = EventQueries.q147Ols2.fn(spark, dir)
        .select("b0_cents", "b1_per_day", "b2_per_hour")
        .as[(Double, Double, Double)].collect().head
      rows shouldBe ((10.0, 2.0, 3.0))
    }
  }

  test("q148: a total cohort split is flagged significant") {
    withTempDir { dir =>
      // even users sign up and purchase an hour later; odd users sign
      // up and never purchase -> p1=1, p2=0, |z| >> 1.96
      val evs = (1L to 40L).flatMap { u =>
        val base = Seq((u * HourNs, u, u * 100L, "signup"))
        if (u % 2 == 0) base :+ ((u * HourNs + HourNs, u, u * 100L + 1L,
          "purchase"))
        else base
      }
      writeEvents(dir, evs)
      val row = EventQueries.q148AbZtest.fn(spark, dir)
        .select("p1", "p2", "significant").as[(Double, Double, Boolean)]
        .collect().head
      row shouldBe ((1.0, 0.0, true))
    }
  }

  test("q149: bitmap intersections equal the row-level distinct join") {
    withTempDir { dir =>
      // view={1,2,3,40}, purchase={2,3}, click={1}, error={3}, signup={2}
      // users 3 and 40 land in different 32-bit words
      val evs = Seq((1L, "view"), (2L, "view"), (3L, "view"), (40L, "view"),
        (2L, "purchase"), (3L, "purchase"), (1L, "click"), (3L, "error"),
        (2L, "signup"))
      writeEvents(dir, evs.zipWithIndex.map { case ((u, t), i) =>
        ((i + 1L) * HourNs, u, i + 1L, t) })
      val rows = EventQueries.q149BitmapIntersect.fn(spark, dir)
        .select("ta", "tb", "bitmap_n", "agree")
        .as[(String, String, Long, Boolean)].collect().toSeq
      rows shouldBe Seq(("click", "error", 0L, true),
        ("signup", "purchase", 1L, true), ("view", "purchase", 2L, true))
    }
  }

  test("q151: TWAP weights each value by its holding span") {
    withTempDir { dir =>
      // 1.00 held 1h, then 3.00 held 3h -> (100·1 + 300·3)/4 = 250
      val evs = Seq((0L * HourNs + 1000L, 1L, 1L, "x", 1.0),
        (1L * HourNs + 1000L, 1L, 2L, "x", 3.0),
        (4L * HourNs + 1000L, 1L, 3L, "x", 9.9))
      evs.map { case (ns, u, id, t, v) => (id, ns, u, t, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val rows = EventQueries.q151Twap.fn(spark, dir)
        .select("user_id", "twap_cents").as[(Long, Double)].collect().toSeq
      rows shouldBe Seq((1L, 250.0))
    }
  }

  test("q152: overlapping intervals stack, closed ends stay inclusive") {
    withTempDir { dir =>
      // u1 active [1h,3h], u2 [2h,4h], u3 [5h,6h] on one day:
      // peak is 2 at t=2h (u1+u2); u3 never overlaps
      writeEvents(dir, Seq(
        (1L * HourNs, 1L, 1L, "x"), (3L * HourNs, 1L, 2L, "x"),
        (2L * HourNs, 2L, 3L, "x"), (4L * HourNs, 2L, 4L, "x"),
        (5L * HourNs, 3L, 5L, "x"), (6L * HourNs, 3L, 6L, "x")))
      val rows = EventQueries.q152MaxConcurrency.fn(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq
      rows shouldBe Seq((0L, 2L, 2L * 3600L * 1000000L))
    }
  }

  test("q154: new, retained, resurrected and churned partition the " +
    "actives") {
    withTempDir { dir =>
      val week = 7L * DayNs
      // u1 weeks {0,1,2}; u2 {0,2} (churns, then resurrects); u3 {1}
      val evs = Seq((0L, 1L), (1L, 1L), (2L, 1L), (0L, 2L), (2L, 2L),
        (1L, 3L))
      writeEvents(dir, evs.zipWithIndex.map { case ((w, u), i) =>
        (w * week + 1000L, u, i + 1L, "x") })
      val rows = EventQueries.q154GrowthAccounting.fn(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      rows shouldBe Seq(
        (0L, 2L, 2L, 0L, 0L, 0L), // u1,u2 both new
        (1L, 2L, 1L, 1L, 0L, 1L), // u3 new, u1 retained, u2 churned
        (2L, 2L, 0L, 1L, 1L, 1L)) // u1 retained, u2 resurrected, u3 churned
    }
  }

  test("q155: a dominant user covers 80% alone") {
    withTempDir { dir =>
      // revenues 80.00 / 10.00 / 10.00: top-1 covers exactly 80%
      val evs = Seq((1L, 80.0), (2L, 10.0), (3L, 10.0))
      evs.zipWithIndex.map { case ((u, v), i) =>
        (i + 1L, (i + 1L) * HourNs, u, "purchase", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val row = EventQueries.q155ParetoCoverage.fn(spark, dir)
        .as[(Long, Long, Long, Long, Double)].collect().head
      row shouldBe ((1L, 3L, 8000L, 10000L, 1.0 / 3))
    }
  }

  test("q156: an exact duplicate document has zero novelty") {
    withTempDir { dir =>
      val t1 = "alpha beta gamma delta epsilon"
      val t3 = "zeta eta theta iota kappa"
      Seq((1L, t1), (2L, t1), (3L, t3)) // doc 2 duplicates doc 1
        .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = DedupQueries.q156NoveltyRate.fn(spark, dir)
        .select("doc_id", "novelty_rate").as[(Long, Double)]
        .collect().toMap
      rows shouldBe Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0)
    }
  }

  test("q157: the spike clamps to the rank-picked p95 element") {
    withTempDir { dir =>
      // values 1..19 plus a 1000 spike: p05 = 1, p95 = 19 (actual
      // elements), only the spike clamps, sum drops 1000 -> 19
      val rows = (1L to 19L).map(k => (k, k.toDouble)) :+ (20L, 1000.0)
      rows.map { case (k, v) => (k, 1L, "F", v,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "pr") }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = RelationalQueries.q157Winsorize.fn(spark, dir)
        .select("n_clamped_low", "n_clamped_high", "p05", "p95",
          "raw_sum", "winsorized_sum")
        .as[(Long, Long, Double, Double, Double, Double)].collect().head
      out shouldBe ((0L, 1L, 1.0, 19.0, 1190.0, 209.0))
    }
  }

  test("q158/q159: ties break deterministically, not impl-defined") {
    withTempDir { dir =>
      // user 1: A x2, B x2 -> modal type is 'A' (alphabetical tie-break);
      // two equal top purchases -> argmax takes the higher event_id
      val evs = Seq(
        (1L * HourNs, 1L, 1L, "A", 1.0), (2L * HourNs, 1L, 2L, "A", 1.0),
        (3L * HourNs, 1L, 3L, "B", 1.0), (4L * HourNs, 1L, 4L, "B", 1.0),
        (5L * HourNs, 1L, 5L, "purchase", 7.0),
        (6L * HourNs, 1L, 6L, "purchase", 7.0))
      evs.map { case (ns, u, id, t, v) => (id, ns, u, t, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      EventQueries.q158ModalType.fn(spark, dir)
        .select("modal_type").as[String].collect().head shouldBe "A"
      EventQueries.q159ArgmaxPurchase.fn(spark, dir)
        .select("max_cents", "max_event_id").as[(Long, Long)]
        .collect().head shouldBe ((700L, 6L))
    }
  }

  test("q160: a zero-success group's Wilson bound stays non-negative") {
    withTempDir { dir =>
      // priority A: 0/5 fulfilled (normal approx would give lo < 0);
      // priority B: 5/5
      val rows = (1L to 5L).map(k => (k, "O", "A")) ++
        (6L to 10L).map(k => (k, "F", "B"))
      rows.map { case (k, st, pr) => (k, 1L, st, 1.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), pr) }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = RelationalQueries.q160WilsonInterval.fn(spark, dir)
        .select("priority", "rate", "wilson_lo", "wilson_hi")
        .as[(String, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      out("A")._2 shouldBe 0.0
      out("A")._3 should be >= 0.0 // Wilson never goes negative
      out("A")._4 should be > 0.0  // but admits upside uncertainty
      out("B")._2 shouldBe 1.0
      out("B")._4 should be <= 1.0
    }
  }

  test("q161: an alternating series has strongly negative lag-1 r") {
    withTempDir { dir =>
      // daily cents alternate 1.00 / 2.00 for 10 days
      val evs = (0 until 10).map { d =>
        (d.toLong * DayNs + 1000L, 1L, d.toLong + 1,
          if (d % 2 == 0) 1.0 else 2.0)
      }
      evs.map { case (ns, u, id, v) => (id, ns, u, "A", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val r = EventQueries.q161Autocorr.fn(spark, dir)
        .select("r_lag1").as[Double].collect().head
      r should be < -0.9
    }
  }

  test("q125: two-phase prefix sum equals the flat cumulative sum") {
    withTempDir { dir =>
      // doc_ids crossing bucket boundaries (div 100): 99|100, 199|200
      val docs = Seq(99L, 100L, 101L, 199L, 200L, 300L)
      docs.zipWithIndex
        .map { case (id, i) => (id, "t", "en", "s", 50L + 13L * i) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // with k=20 and total 405, stride = 20: every doc crosses >= 1
      // multiple; n_hits must equal w div 20 +- 1 boundary effects —
      // assert against an independently computed flat prefix sum
      val ws = docs.zipWithIndex.map { case (_, i) => 50L + 13L * i }
      val cum = ws.scanLeft(0L)(_ + _)
      val stride = ws.sum / 20L
      val expected = docs.zip(cum.zip(cum.tail)).map {
        case (id, (lo, hi)) => id -> (hi / stride - lo / stride)
      }.filter(_._2 > 0).toMap
      val rows = CorpusQueries.q125PpsSample.fn(spark, dir)
        .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
      rows shouldBe expected
    }
  }
}
