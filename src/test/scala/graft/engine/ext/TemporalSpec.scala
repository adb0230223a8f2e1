package graft.engine.ext

import graft.SparkSpec

/** As-of and range join semantics on hand-built timelines. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left row") {
    val quotes = Seq( // key, ts, px
      (1L, 5L, 100.0), (1L, 15L, 101.0), (1L, 20L, 102.0),
      (2L, 50L, 7.0))
      .toDF("k", "q_ts", "px")
    val trades = Seq( // key, ts
      (1L, 10L), (1L, 20L), (1L, 3L), (2L, 49L), (3L, 1L))
      .toDF("k", "t_ts")
    val out = Temporal.asofJoin(trades, quotes, "k", "t_ts", "q_ts",
        rightPayload = Seq("q_ts", "px"))
      .select($"k", $"t_ts", $"__matched.q_ts".as("q_ts"), $"__matched.px".as("px"))
      .as[(Long, Long, Long, Double)].collect().toSet
    out shouldBe Set(
      (1L, 10L, 5L, 100.0),  // latest quote <= 10 is ts=5
      (1L, 20L, 20L, 102.0)) // equality matches (<=)
    // dropped (inner semantics): trade at ts=3 (no earlier quote),
    // (2, 49) (its only quote is at 50), and key 3 (no quotes at all)
  }

  test("asofJoin forward direction picks the earliest right row at-or-after") {
    val quotes = Seq(
      (1L, 5L, 100.0), (1L, 15L, 101.0), (1L, 20L, 102.0),
      (2L, 50L, 7.0))
      .toDF("k", "q_ts", "px")
    val trades = Seq(
      (1L, 10L), (1L, 20L), (1L, 25L), (2L, 49L))
      .toDF("k", "t_ts")
    val out = Temporal.asofJoin(trades, quotes, "k", "t_ts", "q_ts",
        rightPayload = Seq("q_ts", "px"), direction = "forward")
      .select($"k", $"t_ts", $"__matched.q_ts".as("q_ts"), $"__matched.px".as("px"))
      .as[(Long, Long, Long, Double)].collect().toSet
    out shouldBe Set(
      (1L, 10L, 15L, 101.0), // earliest quote >= 10 is ts=15
      (1L, 20L, 20L, 102.0), // equality matches (>=)
      (2L, 49L, 50L, 7.0))
    // (1, 25): no later quote -> dropped (inner semantics)
  }

  test("asofJoin tolerance drops matches farther than the bound") {
    val quotes = Seq((1L, 5L, 100.0), (1L, 40L, 101.0)).toDF("k", "q_ts", "px")
    val trades = Seq((1L, 10L), (1L, 40L), (1L, 100L)).toDF("k", "t_ts")
    val out = Temporal.asofJoin(trades, quotes, "k", "t_ts", "q_ts",
        rightPayload = Seq("px"), toleranceUs = Some(10L))
      .select($"t_ts", $"__matched.px".as("px"))
      .as[(Long, Double)].collect().toSet
    // 10 matches q@5 (gap 5 <= 10); 40 matches q@40 (gap 0);
    // 100 would match q@40 but gap 60 > 10 -> dropped
    out shouldBe Set((10L, 100.0), (40L, 101.0))
  }

  test("rangeJoin equals the inequality join") {
    val ev = Seq(
      (1L, 1L, 100L), (1L, 2L, 150L), (1L, 3L, 260L), (1L, 4L, 900L),
      (2L, 5L, 100L), (2L, 6L, 199L))
      .toDF("user_id", "event_id", "ts_us")
    val a = ev.select($"user_id", $"event_id".as("id1"), $"ts_us".as("ts1"))
    val b = ev.select($"user_id", $"event_id".as("id2"), $"ts_us".as("ts2"))
    val got = Temporal.rangeJoin(a, b, "user_id", "ts1", "ts2", 100L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // pairs with 0 < dt <= 100: (1,2) dt=50, (2,3) dt=110 NO, (1,3) dt=160 NO,
    // (5,6) dt=99
    got shouldBe Set((1L, 2L), (5L, 6L))
    // cross-cell pair: ts 150 -> 260 is dt=110 > 100 (excluded), but
    // 900 pairs with nothing
    val wide = Temporal.rangeJoin(a, b, "user_id", "ts1", "ts2", 120L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    wide shouldBe Set((1L, 2L), (2L, 3L), (5L, 6L)) // 110 <= 120 now included
  }
}
