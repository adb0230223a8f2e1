package graft.streaming

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.streaming.EventStreams.{Ev, Session}

/** Streaming semantics under a real micro-batch executor (MemoryStream ->
  * memory sink): watermark-driven window finalization, in-watermark
  * dedup, and stateful session emission via event-time timeout.
  */
/** Top-level so the encoder codegens (a spec-nested case class captures
  * the outer class and forces interpreter fallback). */
final case class Raw(user_id: Long, event_type: String, ts_us: Long, value: Double)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000 // one hour in µs

  private def runUntilIdle(q: StreamingQuery): Unit = q.processAllAvailable()

  test("hourly counts finalize when the watermark passes (append mode)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Raw]
    val q = EventStreams.hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("append")
      .start()
    try {
      in.addData(Raw(1, "view", 10 * H + 1, 1.0), Raw(2, "view", 10 * H + 2, 1.0))
      runUntilIdle(q)
      // watermark still inside hour 10: nothing final yet
      spark.table("hourly").count() shouldBe 0
      // an event 2 hours later pushes the watermark past hour 10's end
      in.addData(Raw(3, "view", 12 * H + 1, 1.0))
      runUntilIdle(q)
      spark.table("hourly").as[(Long, String, Long)].collect().toSet shouldBe
        Set((10 * H, "view", 2L))
    } finally q.stop()
  }

  test("dropDuplicates within watermark dedups across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Raw]
    val q = EventStreams.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .start()
    try {
      in.addData(Raw(1, "click", 10 * H, 1.0))
      runUntilIdle(q)
      in.addData(Raw(1, "click", 10 * H, 99.0)) // same key+ts: duplicate
      in.addData(Raw(1, "click", 10 * H + 5, 1.0)) // new ts: kept
      runUntilIdle(q)
      spark.table("dedup").count() shouldBe 2
    } finally q.stop()
  }

  test("stream-static enrich joins each micro-batch to the dim table") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val in = MemoryStream[Raw]
    val q = EventStreams.enrich(in.toDF(), dim, "user_id")
      .select("user_id", "event_type", "segment")
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .start()
    try {
      in.addData(Raw(1, "view", 10 * H, 1.0), Raw(3, "view", 10 * H, 1.0))
      runUntilIdle(q)
      spark.table("enriched").as[(Long, String, Option[String])]
        .collect().toSet shouldBe
        Set((1L, "view", Some("gold")), (3L, "view", None)) // left join keeps unmatched
    } finally q.stop()
  }

  test("foreachBatch lands micro-batches through the partitioned sink") {
    implicit val sq = spark.sqlContext
    withTempDir { dir =>
      val in = MemoryStream[Raw]
      val out = s"$dir/events_silver"
      val q = in.toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.engine.Sinks.writePartitionedParquet(
            batch.withColumn("hour", (col("ts_us") / H).cast("long")), out,
            partitionCols = Seq("hour"), mode = SaveMode.Append)
        }
        .start()
      try {
        in.addData(Raw(1, "view", 10 * H, 1.0), Raw(2, "click", 11 * H, 2.0))
        runUntilIdle(q)
        in.addData(Raw(3, "view", 12 * H, 3.0))
        runUntilIdle(q)
        val back = spark.read.parquet(out)
        back.count() shouldBe 3
        // hive-style partition directories exist per hour
        new java.io.File(out).list().count(_.startsWith("hour=")) shouldBe 3
        // partition pruning path reads the right subset
        back.filter(col("hour") === 11).count() shouldBe 1
      } finally q.stop()
    }
  }

  test("stream-stream interval join pairs events within the window only") {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[Raw]
    val rIn = MemoryStream[Raw]
    val q = EventStreams.intervalJoin(
        lIn.toDF(), rIn.toDF(), "user_id", windowUs = 600L * 1000000)
      .writeStream.format("memory").queryName("ivj").outputMode("append")
      .start()
    try {
      val t0 = 10 * H
      lIn.addData(Raw(1, "error", t0, 1.0))
      rIn.addData(
        Raw(1, "purchase", t0 + 300L * 1000000, 5.0),  // +5 min: in window
        Raw(1, "purchase", t0 + 900L * 1000000, 6.0),  // +15 min: out
        Raw(2, "purchase", t0 + 60L * 1000000, 7.0))   // other key: out
      runUntilIdle(q)
      spark.table("ivj")
        .select("user_id", "r_ts_us").as[(Long, Long)].collect().toSet shouldBe
        Set((1L, t0 + 300L * 1000000))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits sessions on gap and on timeout") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    try {
      // user 1: two events 5 min apart -> one open session
      in.addData(Ev(1, 10 * H, 1.0), Ev(1, 10 * H + 300L * 1000000, 2.0))
      runUntilIdle(q)
      spark.table("sessions").count() shouldBe 0 // still open
      // user 1 again, 2 hours later: closes the first session in-batch
      in.addData(Ev(1, 12 * H, 4.0))
      runUntilIdle(q)
      val afterGap = spark.table("sessions").as[Session].collect()
      afterGap.map(s => (s.user_id, s.start_us, s.end_us, s.n_events, s.total_value))
        .toSet shouldBe Set((1L, 10 * H, 10 * H + 300L * 1000000, 2L, 3.0))
      // push the watermark far ahead with another user: the open session
      // times out and is emitted
      in.addData(Ev(2, 20 * H, 1.0))
      runUntilIdle(q)
      in.addData(Ev(2, 30 * H, 1.0)) // advance again so user 2's also fires
      runUntilIdle(q)
      val users = spark.table("sessions").as[Session].collect().map(_.user_id).toSet
      users should contain(1L)
      spark.table("sessions").as[Session].collect()
        .find(s => s.user_id == 1L && s.start_us == 12 * H)
        .map(_.n_events) shouldBe Some(1L)
    } finally q.stop()
  }

  test("q64 bounded file stream: rerun-stable and held-back last window") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.EventQueries.q64StreamHourly.fn(spark, dir).collect()
    // bench executes each query repeatedly in one session — the memory
    // sink and checkpoint must reset cleanly
    val b = graft.queries.EventQueries.q64StreamHourly.fn(spark, dir).collect()
    a.toSeq shouldBe b.toSeq
    a should not be empty
    // append-mode emission: the window containing max(ts) is NOT final
    val maxUs = graft.engine.Tables.load(spark, dir, "events")
      .selectExpr("max(ts div 1000)").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .head()
    val lastWindowStart = maxUs - maxUs % (3600L * 1000000)
    a.map(_.getLong(0)).max should be < lastWindowStart
  }

  test("q66 streaming dedup: rerun-stable, equals the batch distinct") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.EventQueries.q66StreamDedup.fn(spark, dir).collect()
    val b = graft.queries.EventQueries.q66StreamDedup.fn(spark, dir).collect()
    a.toSeq shouldBe b.toSeq
    val batch = graft.engine.Tables.load(spark, dir, "events")
      .selectExpr("user_id",
        "unix_micros(date_trunc('hour', timestamp_micros(ts div 1000))) AS h")
      .distinct().count()
    a.length.toLong shouldBe batch
  }

  test("q76 late-data stream: watermark REALLY drops rows, rerun-stable") {
    val dir = "/root/testdata/sf0.001"
    val (df1, dropped1) = graft.queries.EventQueries.runQ76(spark, dir)
    val a = df1.collect()
    // the whole point of the out-of-order staging: a nonzero drop count,
    // so the oracle match below can't be the degenerate nothing-was-late
    // case q64 already covers
    dropped1 should be > 0L
    val (df2, dropped2) = graft.queries.EventQueries.runQ76(spark, dir)
    a.toSeq shouldBe df2.collect().toSeq
    dropped2 shouldBe dropped1
    // dropped rows are ABSENT from their windows: the total across all
    // emitted windows is short of the full row count by at least the
    // drop count (trailing windows account for the rest)
    val total = a.map(_.getLong(2)).sum
    val allRows = spark.read.parquet(s"$dir/events.parquet").count()
    total should be <= (allRows - dropped1)
  }

  test("q78 stream-stream interval join equals the batch join, rerun-stable") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.EventQueries.q78StreamIntervalJoin.fn(spark, dir).collect()
    val b = graft.queries.EventQueries.q78StreamIntervalJoin.fn(spark, dir).collect()
    a.toSeq shouldBe b.toSeq
    a should not be empty
    // single-batch drain: the streamed result IS the batch interval join
    val ev = graft.engine.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 AS us", "event_type")
    val batch = ev.as("x").join(ev.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("y.us") > col("x.us") &&
          col("y.us") <= col("x.us") + 600L * 1000000)
      .select(col("x.user_id"), col("x.us"), col("x.event_type"),
        col("y.us"), col("y.event_type"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val streamed = a.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    streamed shouldBe batch
  }

  test("session watermark delay is derived exactly, in milliseconds") {
    EventStreams.SessionGapUs % 1000 shouldBe 0
    EventStreams.SessionWatermark shouldBe
      s"${EventStreams.SessionGapUs / 1000} milliseconds"
    // the delay round-trips through Spark's interval parser unchanged
    val parsed = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String
          .fromString(EventStreams.SessionWatermark))
    parsed.microseconds shouldBe EventStreams.SessionGapUs
  }

  test("q75 streaming sessions: rerun-stable, a subset of batch sessions") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.EventQueries.q75StreamSessions.fn(spark, dir).collect()
    val b = graft.queries.EventQueries.q75StreamSessions.fn(spark, dir).collect()
    a.toSeq shouldBe b.toSeq
    a should not be empty
    // every emitted session is a session of the batch gaps-and-islands
    // relation, and at least each user's last one is withheld when its
    // timeout hasn't fired (strictly fewer emitted than batch sessions)
    val batch = graft.queries.EventQueries.q33Sessionize.fn(spark, dir)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val emitted = a.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    emitted.subsetOf(batch) shouldBe true
    emitted.size should be < batch.size
  }
}
