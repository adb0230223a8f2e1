package graft.queries

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Catalog.Q
import graft.engine.Tables

/** Event-time suite over `events` (SURVEY.md §2.7/§7.4 extension surface):
  * `from_json` property extraction, tumbling and sliding event-time
  * windows, sessionization both ways (gaps-and-islands and Spark's
  * `session_window`), and keyed first-event dedup. These run in batch so
  * the DuckDB oracle can check them; the same expressions run unchanged
  * under Structured Streaming (see graft.streaming) with `withWatermark`
  * bounding state.
  *
  * ## 100 TB notes
  *  - Tumbling/sliding windows are plain hash aggregates on
  *    (window, keys): partial agg map-side, one shuffle on the group key.
  *    A sliding window multiplies rows by windows-per-event (2 here) BEFORE
  *    the partial agg — still linear, never materialized globally.
  *  - Sessionization shuffles once on user_id (the window partition key),
  *    then every window function and the final session aggregate reuse
  *    that partitioning — Catalyst plans a single Exchange.
  *  - Timestamps: the load seam normalizes `ts` to BIGINT ns whatever
  *    the fixture stores (see Tables.normalizeEventTs); DuckDB reads the
  *    same file via CAST(ts AS TIMESTAMP) — outputs are epoch-µs BIGINTs
  *    on both sides (never raw timestamps).
  */
object EventQueries {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** `events.ts` reaches every query as BIGINT nanoseconds — that is
    * the engine-wide contract [[graft.engine.Tables.normalizeEventTs]]
    * establishes at the load seam regardless of the fixture's physical
    * encoding (TIMESTAMP(NANOS)-as-long or µs TIMESTAMP_NTZ; see
    * Tables). Everything downstream works on epoch-µs BIGINTs /
    * explicit µs timestamps:
    */
  /** epoch-µs from the ns BIGINT (floor division; all fixture ts > 0). */
  private val tsUs: Column = expr("ts div 1000")
  /** µs TIMESTAMP (LTZ; session is UTC) for window()/session_window(). */
  private val tsStamp: Column = timestamp_micros(tsUs)
  /** epoch-µs of a window-struct bound (already LTZ). */
  private def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))

  private val duckUs = (e: String) => s"epoch_us(CAST($e AS TIMESTAMP))"

  /** The session gap, single-sourced from the streaming implementation so
    * the batch relations (q33/q34), the streaming path, and every oracle
    * agree by construction.
    */
  private val GapUs: Long = graft.streaming.EventStreams.SessionGapUs

  /** Gaps-and-islands session core shared by the q33/q34/q75 oracles:
    * CTEs `e(user_id, event_id, value, ts_us)` →
    * `sess(..., is_new, session_seq)`.
    */
  private def duckSessionCtes: String =
    s"""e AS (SELECT user_id, event_id, event_type, value,
                          ${duckUs("ts")} AS ts_us FROM events),
             flags AS (SELECT *, CASE WHEN prev_us IS NULL
                           OR ts_us - prev_us > $GapUs THEN 1 ELSE 0 END AS is_new
                       FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev_us FROM e)),
             sess AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS session_seq
                      FROM flags)"""

  /** Run a streaming DataFrame to completion through a memory sink
    * (append mode, AvailableNow) and return the drained table — the
    * bounded-stream harness shared by q64/q66/q75. Drops any stale view
    * from a prior run in the same session first.
    */
  private def runToMemorySink(s: SparkSession, df: DataFrame,
      name: String, outputMode: String = "append"): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    s.catalog.dropTempView(name)
    // the memory sink APPENDS each batch's rows in update mode too, so
    // an update-mode run materializes the full per-batch emission log —
    // exactly what q119's oracle models
    val query = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    s.table(name)
  }

  /** Tumbling 1-hour windows: counts, exact-decimal value sums, and the
    * sum of the JSON-extracted `props.k` per (window, event_type).
    */
  val q31HourlyFromJson: Q = Q(
    "q31_hourly_from_json",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.select(tsStamp.as("tss"), col("event_type"), col("value"),
          from_json(col("props"), propsSchema).getField("k").as("k"))
        .groupBy(window(col("tss"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(30,10)")), 2).cast("double")
            .as("total_value"),
          sum(col("k").cast("long")).as("sum_k"))
        .select(us(col("w.start")).as("window_start_us"), col("event_type"),
          col("n_events"), col("total_value"), col("sum_k"))
        .orderBy("window_start_us", "event_type")
    },
    Some(s"""SELECT ${duckUs("date_trunc('hour', CAST(ts AS TIMESTAMP))")}
               AS window_start_us,
             event_type, count(*) AS n_events,
             CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
               AS total_value,
             CAST(sum(CAST(json_extract(props, 'k') AS INT)) AS BIGINT) AS sum_k
             FROM events
             GROUP BY 1, 2 ORDER BY window_start_us, event_type"""))

  /** Sliding windows (2 h length, 1 h slide) over error events: each event
    * lands in 2 windows; per-window counts + distinct users.
    */
  val q32SlidingWindow: Q = Q(
    "q32_sliding_window",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.filter(col("event_type") === "error")
        .select(col("user_id"), tsStamp.as("tss"))
        .groupBy(window(col("tss"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
        .select(us(col("w.start")).as("window_start_us"),
          col("n_events"), col("n_users"))
        .orderBy("window_start_us")
    },
    // each event belongs to windows starting at trunc(hour) and
    // trunc(hour) - 1h — enumerate them relationally
    Some(s"""SELECT ${duckUs("ws")} AS window_start_us,
             count(*) AS n_events, count(DISTINCT user_id) AS n_users
             FROM (SELECT user_id,
                     date_trunc('hour', CAST(ts AS TIMESTAMP))
                       - i * INTERVAL 1 HOUR AS ws
                   FROM events, range(0, 2) r(i)
                   WHERE event_type = 'error')
             GROUP BY ws ORDER BY window_start_us"""))

  /** Sessionization via gaps-and-islands: a 30-min silence per user starts
    * a new session; emits per-session span, size, and exact value total.
    */
  val q33Sessionize: Q = Q(
    "q33_sessionize",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val newSession = when(
        col("prev_us").isNull || (col("ts_us") - col("prev_us")) > GapUs, 1L)
        .otherwise(0L)
      ev.select(col("user_id"), col("event_id"), col("value"),
          tsUs.as("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("is_new", newSession)
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
          count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(30,10)")), 2).cast("double")
            .as("total_value"))
        .orderBy("user_id", "session_seq")
    },
    Some(s"""WITH $duckSessionCtes
             SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               min(ts_us) AS start_us,
               max(ts_us) AS end_us, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                 AS total_value
             FROM sess GROUP BY user_id, session_seq
             ORDER BY user_id, session_seq"""))

  /** Spark's built-in `session_window` (30-min gap): window end is
    * last-event + gap by definition; the oracle reproduces that via
    * gaps-and-islands (end = max(ts) + 30 min).
    */
  val q34SessionWindow: Q = Q(
    "q34_session_window",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.select(col("user_id"), tsStamp.as("tss"))
        .groupBy(col("user_id"), session_window(col("tss"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), us(col("w.start")).as("start_us"),
          us(col("w.end")).as("end_us"), col("n_events"))
        .orderBy("user_id", "start_us")
    },
    Some(s"""WITH $duckSessionCtes
             SELECT user_id, min(ts_us) AS start_us,
               max(ts_us) + $GapUs AS end_us, count(*) AS n_events
             FROM sess GROUP BY user_id, session_seq
             ORDER BY user_id, start_us"""))

  /** Keyed first-event dedup (batch analog of streaming
    * `dropDuplicates(user_id, event_type)` within a watermark).
    */
  val q35EventFirst: Q = Q(
    "q35_event_first",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      ev.select(col("user_id"), col("event_type"), col("event_id"),
          tsUs.as("ts_us"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
        .orderBy("user_id", "event_type")
    },
    Some(s"""SELECT user_id, event_type, event_id, ts_us
             FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                     ORDER BY ts_us, event_id) AS rn
                   FROM (SELECT user_id, event_type, event_id,
                           ${duckUs("ts")} AS ts_us FROM events))
             WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** AS-OF join (engine ext operator): for each error event, the latest
    * purchase by the same user at or before it. One shuffle on user_id
    * (the union trick in [[graft.engine.ext.Temporal.asofJoin]]); the
    * oracle is an inequality join with a deterministic max-(ts, id)
    * window pick — same tie-break the engine operator pins.
    */
  /** (errors, purchases) frames shared by the as-of queries q37/q50. */
  private def errorsAndPurchases(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsUs.as("ts_us"))
    (ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts_us").as("err_ts_us")),
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pur_id"), col("user_id"),
          col("ts_us").as("pur_ts_us")))
  }

  val q37AsofJoin: Q = Q(
    "q37_asof_join",
    (s, dir) => {
      val (errors, purchases) = errorsAndPurchases(s, dir)
      graft.engine.ext.Temporal
        .asofJoin(errors, purchases, "user_id", "err_ts_us", "pur_ts_us",
          rightPayload = Seq("pur_id", "pur_ts_us"))
        .select(col("user_id"), col("err_id"), col("err_ts_us"),
          col("__matched.pur_id").as("pur_id"),
          col("__matched.pur_ts_us").as("pur_ts_us"),
          (col("err_ts_us") - col("__matched.pur_ts_us")).as("gap_us"))
        .orderBy("err_id")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
                           ${duckUs("ts")} AS ts_us FROM events),
             e AS (SELECT event_id AS err_id, user_id, ts_us AS err_ts_us
                   FROM ev WHERE event_type = 'error'),
             p AS (SELECT event_id AS pur_id, user_id, ts_us AS pur_ts_us
                   FROM ev WHERE event_type = 'purchase')
             SELECT user_id, err_id, err_ts_us, pur_id, pur_ts_us,
               err_ts_us - pur_ts_us AS gap_us
             FROM (SELECT e.user_id, err_id, err_ts_us, pur_id, pur_ts_us,
                     row_number() OVER (PARTITION BY err_id
                       ORDER BY pur_ts_us DESC, pur_id DESC) AS rn
                   FROM e JOIN p
                     ON e.user_id = p.user_id AND p.pur_ts_us <= e.err_ts_us)
             WHERE rn = 1 ORDER BY err_id"""))

  /** Forward AS-OF join with tolerance (the other half of the as-of
    * surface): for each error, the NEXT purchase by the same user within
    * 2 hours — "did the error block the conversion?". Same single-shuffle
    * union-trick plan as q37, scanned from the future end; the tolerance
    * is a post-filter on the carried match timestamp.
    */
  val q50AsofForward: Q = Q(
    "q50_asof_forward",
    (s, dir) => {
      val (errors, purchases) = errorsAndPurchases(s, dir)
      graft.engine.ext.Temporal
        .asofJoin(errors, purchases, "user_id", "err_ts_us", "pur_ts_us",
          rightPayload = Seq("pur_id", "pur_ts_us"),
          direction = "forward", toleranceUs = Some(2L * 3600 * 1000000))
        .select(col("user_id"), col("err_id"), col("err_ts_us"),
          col("__matched.pur_id").as("pur_id"),
          col("__matched.pur_ts_us").as("pur_ts_us"),
          (col("__matched.pur_ts_us") - col("err_ts_us")).as("gap_us"))
        .orderBy("err_id")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
                           ${duckUs("ts")} AS ts_us FROM events),
             e AS (SELECT event_id AS err_id, user_id, ts_us AS err_ts_us
                   FROM ev WHERE event_type = 'error'),
             p AS (SELECT event_id AS pur_id, user_id, ts_us AS pur_ts_us
                   FROM ev WHERE event_type = 'purchase')
             SELECT user_id, err_id, err_ts_us, pur_id, pur_ts_us, gap_us
             FROM (SELECT e.user_id, err_id, err_ts_us, pur_id, pur_ts_us,
                     pur_ts_us - err_ts_us AS gap_us,
                     row_number() OVER (PARTITION BY err_id
                       ORDER BY pur_ts_us ASC, pur_id DESC) AS rn
                   FROM e JOIN p
                     ON e.user_id = p.user_id AND p.pur_ts_us >= e.err_ts_us)
             WHERE rn = 1 AND gap_us <= ${2L * 3600 * 1000000}
             ORDER BY err_id"""))

  /** Bounded RANGE join (engine ext operator): same-user event pairs at
    * most 10 minutes apart, via time-cell bucketing (equi-join + 2x
    * probe, never an inequality cross product). Oracle: the plain
    * inequality join, safe at oracle scale.
    */
  val q38RangeJoin: Q = Q(
    "q38_range_join",
    (s, dir) => {
      val tenMinUs = 600L * 1000000
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), tsUs.as("ts_us"))
      val a = ev.select(col("user_id"), col("event_id").as("id1"),
        col("ts_us").as("ts1"))
      val b = ev.select(col("user_id"), col("event_id").as("id2"),
        col("ts_us").as("ts2"))
      graft.engine.ext.Temporal
        .rangeJoin(a, b, "user_id", "ts1", "ts2", tenMinUs)
        .select(col("user_id"), col("id1"), col("id2"),
          (col("ts2") - col("ts1")).as("dt_us"))
        .orderBy("id1", "id2")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, ${duckUs("ts")} AS ts_us
                         FROM events)
             SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
               b.ts_us - a.ts_us AS dt_us
             FROM ev a JOIN ev b
               ON a.user_id = b.user_id AND b.ts_us > a.ts_us
               AND b.ts_us - a.ts_us <= 600000000
             ORDER BY id1, id2"""))

  /** Staging dir for the streaming queries: the file source requires a
    * DIRECTORY, and the fixture is one file in a dir shared with other
    * tables, so expose it alone via a symlink (read-only fixtures stay
    * untouched). The staging name embeds the sanitized source path
    * (collision-free, unlike a hash), the link is validated against its
    * expected target (a stale/dangling link from a moved fixture is
    * recreated, never silently streamed), and a concurrent creator
    * winning the race is fine because the name pins the target.
    */
  private def eventsStreamDir(dir: String): String = {
    val streamDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_events_" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
    java.nio.file.Files.createDirectories(streamDir)
    val target = java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath
    val link = streamDir.resolve("events.parquet")
    val linkOk = java.nio.file.Files.isSymbolicLink(link) &&
      java.nio.file.Files.readSymbolicLink(link) == target &&
      java.nio.file.Files.exists(link) // target still resolves
    if (!linkOk) {
      java.nio.file.Files.deleteIfExists(link)
      try java.nio.file.Files.createSymbolicLink(link, target)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    streamDir.toString
  }

  /** Three-file OUT-OF-ORDER staging for the late-data oracle (q76),
    * admitted oldest-mtime-first as one micro-batch each
    * (`maxFilesPerTrigger=1`):
    *   - `a.parquet`: the even event_ids (full time span) — batch 0
    *     advances the watermark to max(a) − delay;
    *   - `b.parquet`: the odd ids BEYOND max(a) (may be empty) — batch 1
    *     exists because Spark's late filter LAGS eviction by one batch
    *     (SPARK-40925: late events are filtered with the PREVIOUS
    *     batch's watermark, state is evicted with the current one), so
    *     rows dropped in batch k must be late against the watermark that
    *     batch k−1 already started with;
    *   - `c.parquet`: the odd ids at or before max(a) — batch 2, where
    *     every row whose hour window closed at or before max(a) − delay
    *     is DROPPED. The dropping half of the watermark contract, which
    *     the in-arrival-order staging ([[eventsStreamDir]]) can never
    *     exercise.
    * Rebuilt whenever the marker's recorded source (size, mtime) stops
    * matching: a regenerated fixture invalidates the staging, a repeated
    * run reuses it.
    */
  private def eventsOooStreamDir(s: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Paths}
    val staging = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stream_events_ooo_" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
    val src = Paths.get(s"$dir/events.parquet")
    val stamp =
      s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
    val marker = staging.resolve("_STAGED")
    val fresh = Files.exists(marker) && Files.readString(marker) == stamp
    if (!fresh) {
      graft.engine.Fs.deleteRecursively(staging)
      Files.createDirectories(staging)
      val ev = s.read.parquet(src.toString)
      def stageOne(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = staging.resolve(name + ".tmp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val l = Files.list(tmp)
        val part =
          try l.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(
              s"no part file written under $tmp"))
          finally l.close()
        Files.move(part, staging.resolve(name))
        graft.engine.Fs.deleteRecursively(tmp)
        Files.setLastModifiedTime(staging.resolve(name),
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      // 30 s apart: unambiguous ordering even on coarse-mtime filesystems
      val now = System.currentTimeMillis()
      // staged files must keep the fixture's PHYSICAL ts encoding (the
      // consumer reads them with schema(batchSchema)), so the µs
      // arithmetic dispatches on the raw type instead of normalizing
      val rawUs = Tables.rawTsUs(ev.schema("ts").dataType)
      val evens = ev.filter(col("event_id") % 2 === 0)
      val odds = ev.filter(col("event_id") % 2 =!= 0)
      val maxEvenUs = evens.agg(max(rawUs)).head().getLong(0)
      stageOne(evens, "a.parquet", now - 90000)
      stageOne(odds.filter(rawUs > maxEvenUs), "b.parquet", now - 60000)
      stageOne(odds.filter(rawUs <= maxEvenUs), "c.parquet", now - 30000)
      Files.writeString(marker, stamp)
    }
    staging.toString
  }

  /** Build (or validate) both streaming staging dirs ahead of time, so a
    * timed bench pass measures the streaming data path, not one-time
    * symlink/file staging. Both stagings are content-stamped and reused
    * across runs, so this is idempotent and cheap when already built.
    */
  def prestage(s: SparkSession, dir: String): Unit = {
    eventsStreamDir(dir)
    eventsOooStreamDir(s, dir)
    ()
  }

  /** The q66 and q78 oracles are valid only while the bounded stream
    * drains in ONE micro-batch: across batches,
    * `dropDuplicatesWithinWatermark` may legitimately re-emit a key that
    * recurs more than the delay apart once the first occurrence's state
    * is evicted (q66), and a stream-stream join may drop cross-batch
    * pairs once the watermark passes one side's buffered rows (q78).
    * That precondition is enforced HERE, in code — a regenerated
    * multi-file staging dir fails at this check, never as an opaque
    * driver-side VALUES diff.
    */
  private[queries] def requireSingleDataFile(stagingDir: String): Unit = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(stagingDir))
    val n =
      try {
        val it = s.iterator()
        var c = 0
        while (it.hasNext) {
          if (it.next().getFileName.toString.endsWith(".parquet")) c += 1
        }
        c
      } finally s.close()
    if (n != 1) throw new IllegalStateException(
      s"single-micro-batch oracle precondition: expected exactly 1 data " +
        s"file in $stagingDir, found $n")
  }

  /** An ACTUAL Structured Streaming run, hash-checked by the oracle —
    * closing the "streaming is not oracle-able" gap: a bounded file
    * stream over the same events parquet, `AvailableNow` trigger,
    * 10-minute watermark, append-mode tumbling hourly counts into a
    * memory sink; the materialized sink table is the query result.
    *
    * The oracle mirrors the APPEND-MODE EMISSION RULE, not just the
    * aggregate: only windows whose end is at or before
    * `max(event time) - watermark delay` have been finalized when the
    * bounded stream drains (the trailing window is deliberately absent
    * on both sides — 719 of 720 at sf0.01/0.1). Equality at the
    * boundary cannot occur on this data (watermarks carry sub-second
    * precision, window ends are exact hours), so the <= mirror is exact.
    *
    * ## 100 TB notes
    * This is the replayable-backfill path of the lambda-free design: the
    * SAME windowed aggregation runs unbounded with watermark-bounded
    * state (see graft.streaming for the state-size story); `AvailableNow`
    * over a file listing is how a 100 TB backlog is drained in bounded
    * batches with streaming semantics preserved.
    */
  val q64StreamHourly: Q = Q(
    "q64_stream_hourly",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val agg = s.readStream.schema(batchSchema)
        .parquet(eventsStreamDir(dir))
        .transform(Tables.normalizeEventTs)
        .select(tsStamp.as("tss"), col("event_type"))
        .withWatermark("tss", "10 minutes")
        .groupBy(window(col("tss"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(us(col("w.start")).as("window_start_us"), col("event_type"),
          col("n_events"))
      runToMemorySink(s, agg, "q64_stream_hourly_mem")
        .orderBy("window_start_us", "event_type")
    },
    Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type
              FROM events),
            mx AS (SELECT max(t) AS mt FROM e)
            SELECT epoch_us(date_trunc('hour', t)) AS window_start_us,
              event_type, count(*) AS n_events
            FROM e, mx
            WHERE date_trunc('hour', t) + INTERVAL 1 HOUR
              <= mt - INTERVAL 10 MINUTE
            GROUP BY 1, 2 ORDER BY window_start_us, event_type"""))

  /** Streaming dedup through the REAL state-store path
    * (`StreamingDeduplicateWithinWatermarkExec`):
    * `dropDuplicatesWithinWatermark` on (user_id, hour) over the bounded
    * file stream, emitting each kept key once. Within-watermark is the
    * form whose state the watermark actually EVICTS (a plain
    * `dropDuplicates` on non-event-time keys never drops state — its
    * eviction predicate requires the watermark-tagged column in the key
    * set); the trade, by design, is that at scale a key recurring more
    * than the delay apart may re-emit. Only the KEY columns are output,
    * so on the drained bounded stream (one batch, nothing evicted
    * mid-run) the result is the deterministic distinct-key set and the
    * oracle is the plain DISTINCT.
    */
  val q66StreamDedup: Q = Q(
    "q66_stream_dedup",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stagingDir = eventsStreamDir(dir)
      requireSingleDataFile(stagingDir)
      val dedup = s.readStream.schema(batchSchema)
        .parquet(stagingDir)
        .transform(Tables.normalizeEventTs)
        .select(tsStamp.as("tss"), col("user_id"))
        .withColumn("hour_us", us(date_trunc("hour", col("tss"))))
        .withWatermark("tss", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id", "hour_us")
        .select(col("user_id"), col("hour_us"))
      runToMemorySink(s, dedup, "q66_stream_dedup_mem")
        .orderBy("user_id", "hour_us")
    },
    Some(s"""SELECT DISTINCT user_id,
              ${duckUs("date_trunc('hour', CAST(ts AS TIMESTAMP))")} AS hour_us
            FROM events ORDER BY user_id, hour_us"""))

  /** Skew-safe two-phase aggregation under oracle check: salt each row
    * (from its IDENTITY, not the group key — `engine/Skew`'s rule), run
    * the partial aggregate on (key, salt), then merge the partials per
    * key. The result is provably identical to the plain groupBy — counts
    * add, and the value sums are exact decimals, so merge order cannot
    * change them — which is exactly what the plain-SQL oracle asserts.
    * This is the manual form of what map-side partial aggregation does
    * automatically, made explicit for the case where ONE key dominates:
    * the salt bounds any single reduce task to 1/16 of the hot key.
    *
    * ## 100 TB notes
    * Two shuffles instead of one, but the first is on (key, salt) — 16
    * reducers share the hot key's rows, and the second shuffle carries
    * only 16 partial rows per key. The plain groupBy's partial agg
    * already handles MODERATE skew; explicit salting is for the key so
    * hot that even one reducer's merge of its map-side partials is the
    * straggler. Exact-decimal sums make the two-phase merge value-stable.
    */
  val q73SaltedAgg: Q = Q(
    "q73_salted_agg",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      events
        .select(col("event_type"), col("value"),
          pmod(col("event_id"), lit(16)).as("salt"))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(30,10)")).as("pv"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n_events"),
          round(sum(col("pv")), 2).cast("double").as("total_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n_events,
              CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                AS total_value
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Per-user inter-arrival gap accounting — the measurement that SIZES
    * the 30-minute session gap (q33/q34) and a streaming watermark
    * before anyone picks them: per user's event stream, the gaps between
    * consecutive events, aggregated per event_type of the later event
    * (count, max, and mean — the mean as one double division of exact
    * integer sums, bit-identical across engines). A session gap of G
    * merges every pair with gap < G; reading this table against a
    * candidate G is how the threshold is justified. (The fixture's
    * arrival order equals event-time order, so a LATENESS audit would be
    * all zeros here — gap sizing is the non-degenerate half of the same
    * watermark question.)
    *
    * ## 100 TB notes
    * One shuffle on user_id for the lag window (the same partitioning
    * every per-user analysis reuses), then a low-cardinality group-by.
    * lag(1) is O(1) state per row.
    */
  val q74EventGaps: Q = Q(
    "q74_event_gaps",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      // (us, event_id) order: µs truncation can tie two events, and a
      // nondeterministic tie order would attribute gaps to different
      // event_types on each engine
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      events
        .select(col("event_type"), col("user_id"), col("event_id"),
          tsUs.as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          max(col("gap_us")).as("max_gap_us"),
          (sum(col("gap_us")).cast("double")
            / count(lit(1)).cast("double")).as("avg_gap_us"))
        .orderBy("event_type")
    },
    Some(s"""WITH t AS (SELECT event_type, user_id, event_id,
                    ${duckUs("ts")} AS us FROM events),
            g AS (SELECT event_type,
                    us - lag(us, 1) OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS gap_us
                  FROM t)
            SELECT event_type, count(*) AS n_gaps,
              CAST(max(gap_us) AS BIGINT) AS max_gap_us,
              CAST(sum(gap_us) AS DOUBLE) / count(*)::DOUBLE AS avg_gap_us
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY event_type ORDER BY event_type"""))

  /** STATEFUL streaming under oracle hash check — the third and hardest
    * real-streaming oracle after q64 (windowed agg) and q66 (state-store
    * dedup): `flatMapGroupsWithState` sessionization
    * ([[graft.streaming.EventStreams.sessionize]]) over the bounded file
    * stream. The oracle mirrors the append-mode emission rule exactly:
    *  - a session CLOSED by a later same-user event emits from the data
    *    batch — every session except each user's last;
    *  - each user's LAST (still-open) session emits only if its
    *    event-time timeout fires in the no-data final micro-batch, i.e.
    *    `floor((end+gap)/1000) < floor(max_ts/1000) − delay_ms` (Spark
    *    tracks watermarks in ms and fires on STRICT less-than; both
    *    floors mirrored in the SQL); otherwise it is held in state and
    *    is verified ABSENT on both sides.
    * Only the integer columns are emitted: the per-session value total
    * is accumulated in ts-sort order inside the state function, and
    * equal-µs ties would make a double sum order-ambiguous (q33 checks
    * the session totals with exact decimals on the batch path).
    */
  val q75StreamSessions: Q = Q(
    "q75_stream_sessions",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val evs = s.readStream.schema(batchSchema)
        .parquet(eventsStreamDir(dir))
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"), tsUs.as("ts_us"), col("value"))
        .as[graft.streaming.EventStreams.Ev]
      val out = graft.streaming.EventStreams.sessionize(evs)
        .select(col("user_id"), col("start_us"), col("end_us"),
          col("n_events"))
      runToMemorySink(s, out, "q75_stream_sessions_mem")
        .orderBy("user_id", "start_us")
    },
    Some(duckStreamSessionsOracle))

  /** Oracle for the append-mode sessionization emissions — shared
    * verbatim by q75 (flatMapGroupsWithState + EventTimeTimeout) and
    * q266 (transformWithState + explicit event-time timers): one SQL
    * matching BOTH runs proves the two timeout mechanisms fire on the
    * same boundaries.
    */
  private lazy val duckStreamSessionsOracle: String =
    s"""WITH $duckSessionCtes,
            mx AS (SELECT max(ts_us) AS max_us FROM e),
            agg AS (SELECT user_id, session_seq, min(ts_us) AS start_us,
                max(ts_us) AS end_us, count(*) AS n_events
              FROM sess GROUP BY user_id, session_seq),
            last AS (SELECT user_id, max(session_seq) AS last_seq
                     FROM agg GROUP BY user_id)
            SELECT a.user_id, a.start_us, a.end_us,
              CAST(a.n_events AS BIGINT) AS n_events
            FROM agg a JOIN last l ON a.user_id = l.user_id CROSS JOIN mx
            WHERE a.session_seq <> l.last_seq
               OR (a.end_us + $GapUs) // 1000
                  < max_us // 1000 - ${GapUs / 1000}
            ORDER BY a.user_id, a.start_us"""

  /** q75's stateful sessionization through Spark 4's
    * `transformWithState` with EXPLICIT event-time timers
    * ([[graft.streaming.EventStreams.SessionProcessor]]): identical
    * staging and the SAME oracle SQL, so the hash match of both
    * sessionizers against one oracle proves
    * flatMapGroupsWithState's EventTimeTimeout and the successor API's
    * registered timers fire on the same boundaries — q265's
    * API-equivalence pattern extended to the timer half of the state
    * surface. Pinned to the RocksDB provider like q265.
    */
  val q266StreamTwsSessions: Q = Q(
    "q266_stream_tws_sessions",
    (s, dir) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prior = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
        val evs = s.readStream.schema(batchSchema)
          .parquet(eventsStreamDir(dir))
          .transform(Tables.normalizeEventTs)
          .select(col("user_id"), tsUs.as("ts_us"), col("value"))
          .as[graft.streaming.EventStreams.Ev]
        val out = graft.streaming.EventStreams.sessionizeTws(evs)
          .select(col("user_id"), col("start_us"), col("end_us"),
            col("n_events"))
        runToMemorySink(s, out, "q266_stream_tws_sessions_mem")
          .orderBy("user_id", "start_us")
      } finally prior match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },
    Some(duckStreamSessionsOracle))

  /** Run q76's two-batch late-data stream and surface the state
    * operator's `numRowsDroppedByWatermark` alongside the drained result
    * — the spec asserts the drop count is REALLY nonzero, so a future
    * fixture/split change can't silently degenerate this back into the
    * in-order (nothing-late) case while the oracle still matches.
    */
  private[graft] def runQ76(s: SparkSession, dir: String): (DataFrame, Long) = {
    import org.apache.spark.sql.streaming.Trigger
    val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
    val agg = s.readStream.schema(batchSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsOooStreamDir(s, dir))
      .transform(Tables.normalizeEventTs)
      .select(tsStamp.as("tss"), col("event_type"))
      .withWatermark("tss", "10 minutes")
      .groupBy(window(col("tss"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(us(col("w.start")).as("window_start_us"), col("event_type"),
        col("n_events"))
    val name = "q76_stream_late_mem"
    s.catalog.dropTempView(name)
    val query = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val dropped = query.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsDroppedByWatermark)).sum
    (s.table(name).orderBy("window_start_us", "event_type"), dropped)
  }

  /** The DROPPING half of the watermark contract under oracle hash check
    * — the complement of q64, whose in-arrival-order fixture never drops
    * a row: the same hourly aggregation drains the three-file
    * out-of-order staging ([[eventsOooStreamDir]]) in three
    * micro-batches. Batch 0 (file `a`: even event_ids, full time span)
    * advances the watermark to wm0 = max(a) − 10 min; batch 1 (file `b`:
    * the trailing odds) cements wm0 as the PREVIOUS-batch watermark the
    * late filter lags on; batch 2 (file `c`: the remaining odds) then
    * finds most of its rows late — every row whose hour window closed at
    * or before wm0 is dropped before the aggregation and must be absent
    * from its window's count on BOTH engines.
    *
    * The oracle mirrors the full contract in milliseconds (Spark tracks
    * watermarks as floor-ms of the max event time):
    *   - acceptance: batches 0/1 are filtered against watermark 0
    *     (nothing drops); a batch-2 row survives iff its window's end is
    *     strictly after wm0 = floor(max_a_us / 1000) − 600000;
    *   - no double emission: state evicted before batch 2 covers exactly
    *     the windows at or before wm0 — the same bound the late filter
    *     applies to batch 2 — so an accepted row can never re-open an
    *     already-emitted window;
    *   - emission: a window is final iff its end is at or before
    *     wm_final = floor(max_all_us / 1000) − 600000 — q64's append
    *     rule. Boundary ties cannot occur: window ends are whole hours,
    *     watermarks carry the fixture's sub-second precision.
    */
  val q76StreamLateDrop: Q = Q(
    "q76_stream_late_drop",
    (s, dir) => runQ76(s, dir)._1,
    Some(s"""WITH e AS (SELECT event_id, event_type,
                   CAST(ts AS TIMESTAMP) AS t, ${duckUs("ts")} AS us
                 FROM events),
            m0 AS (SELECT max(us) AS us FROM e WHERE event_id % 2 = 0),
            wm0 AS (SELECT us // 1000 - 600000 AS ms FROM m0),
            wmf AS (SELECT max(us) // 1000 - 600000 AS ms FROM e),
            acc AS (SELECT t, event_type FROM e WHERE event_id % 2 = 0
                    UNION ALL
                    SELECT e.t, e.event_type FROM e, m0
                    WHERE e.event_id % 2 = 1 AND e.us > m0.us
                    UNION ALL
                    SELECT e.t, e.event_type FROM e, m0, wm0
                    WHERE e.event_id % 2 = 1 AND e.us <= m0.us
                      AND epoch_ms(date_trunc('hour', e.t)
                                   + INTERVAL 1 HOUR) > wm0.ms)
            SELECT epoch_us(date_trunc('hour', t)) AS window_start_us,
              event_type, count(*) AS n_events
            FROM acc, wmf
            WHERE epoch_ms(date_trunc('hour', t) + INTERVAL 1 HOUR)
              <= wmf.ms
            GROUP BY 1, 2 ORDER BY window_start_us, event_type"""))

  /** STREAM-STREAM interval join under oracle hash check — the fourth
    * real-streaming oracle (after q64 windowed agg, q66 state-store
    * dedup, q75 stateful sessions) and the last streaming operator that
    * was only unit-tested: [[graft.streaming.EventStreams.intervalJoin]]
    * with both sides reading the SAME bounded file stream, each-side
    * watermarks, and a two-sided time-bound join condition — the only
    * shape Spark admits for an append-mode stream-stream inner join.
    *
    * On the single-file staging both sides drain in one micro-batch with
    * watermark 0, so no buffered row is ever evicted before its partner
    * arrives and the result is exactly the batch interval join — which
    * is what the oracle asserts (same relation as q38, keyed by types
    * instead of ids). [[requireSingleDataFile]] enforces that
    * precondition in code; cross-batch eviction semantics are exercised
    * separately by q76's late-drop path.
    *
    * ## 100 TB notes
    * Each side buffers only watermark + window of rows per key — the
    * join never holds history. The equi-key (`user_id`) carries the
    * shuffle; the time bound is evaluated within the key's buffered
    * rows. This is the unbounded form of the batch time-cell bucketed
    * range join (q38): same join surface, state bounded by the
    * watermark instead of the bucket width.
    */
  val q78StreamIntervalJoin: Q = Q(
    "q78_stream_interval_join",
    (s, dir) => {
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stagingDir = eventsStreamDir(dir)
      requireSingleDataFile(stagingDir)
      def side(): DataFrame = s.readStream.schema(batchSchema)
        .parquet(stagingDir)
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_type"))
      val joined = graft.streaming.EventStreams.intervalJoin(
        side(), side(), "user_id", windowUs = 600L * 1000000)
      runToMemorySink(s, joined, "q78_stream_interval_mem")
        .orderBy("user_id", "l_ts_us", "r_ts_us", "l_type", "r_type")
    },
    Some(s"""WITH ev AS (SELECT user_id, ${duckUs("ts")} AS us, event_type
                         FROM events)
            SELECT a.user_id, a.us AS l_ts_us, a.event_type AS l_type,
              b.us AS r_ts_us, b.event_type AS r_type
            FROM ev a JOIN ev b ON a.user_id = b.user_id
              AND b.us > a.us AND b.us - a.us <= 600000000
            ORDER BY a.user_id, l_ts_us, r_ts_us, l_type, r_type"""))

  /** Cohort retention — the day-grain activity matrix every
    * product-analytics stack derives from an event stream: each user's
    * cohort is their first active day; each (cohort, day-offset) cell
    * counts the distinct users from that cohort active that many days
    * later. Offset 0 is the cohort size, so a row's n_users / its
    * cohort's offset-0 n_users is the retention curve.
    *
    * ## 100 TB notes
    * Two aggregations, one reusable partitioning: the first-touch min
    * and the activity dedup both shuffle on user_id (the first-touch
    * table is |users| rows — AQE broadcasts it back), and only the
    * already-tiny (cohort, offset, user-distinct) partials hit the
    * second shuffle. No window function, no per-user history held.
    */
  val q80CohortRetention: Q = Q(
    "q80_cohort_retention",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(tsStamp).as("day"))
      val first = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      e.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH e AS (SELECT user_id,
                         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                       FROM events),
            f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
            j AS (SELECT e.user_id, f.cohort_day,
                    (e.day - f.cohort_day)::INT AS day_offset
                  FROM e JOIN f USING (user_id))
            SELECT strftime(j.cohort_day, '%Y-%m-%d') AS cohort_day,
              day_offset, count(DISTINCT user_id) AS n_users
            FROM j GROUP BY j.cohort_day, day_offset
            ORDER BY cohort_day, day_offset"""))

  /** Stream-STATIC broadcast enrichment — the remaining streaming join
    * shape (q78 covers stream-stream): the unbounded event stream joins
    * a bounded dimension (`customer`) that Spark re-broadcasts per
    * micro-batch, no state store involved (the static side is not
    * buffered, so no watermark is needed and the join is stateless).
    * The streamed surface is the JOIN; the drained sink is then
    * aggregated in batch per (segment, event_type) so the oracle is the
    * plain relational join+agg — on an inner join with a static side,
    * batch and streaming semantics coincide row-for-row.
    *
    * ## 100 TB notes
    * This is the canonical streaming enrich: dimension small enough to
    * broadcast → zero shuffle of the stream, map-side hash join per
    * batch. A dimension too big to broadcast flips to the state-store
    * stream-stream join (q78's shape) or a pre-bucketed side input;
    * nothing in between survives at scale.
    */
  val q83StreamStaticEnrich: Q = Q(
    "q83_stream_static_enrich",
    (s, dir) => {
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = s.readStream.schema(batchSchema)
        .parquet(eventsStreamDir(dir))
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"), col("event_type"), col("value"))
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("c_mktsegment"), col("event_type"), col("value"))
      runToMemorySink(s, enriched, "q83_stream_static_mem")
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(30,10)")), 2).cast("double")
            .as("total_value"))
        .orderBy("c_mktsegment", "event_type")
    },
    Some("""SELECT c_mktsegment, event_type, count(*) AS n_events,
              CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                AS total_value
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY 1, 2 ORDER BY c_mktsegment, event_type"""))

  /** foreachBatch + latest-wins MERGE — the streaming WRITE surface the
    * sink-format queries don't cover: each micro-batch upserts into a
    * keyed parquet state table through [[graft.engine.Sinks.upsertLatestWins]]
    * (the engine's MERGE stand-in), landing via write-new-then-swap so
    * the table being read is never the table being overwritten. Driven
    * over the THREE-batch out-of-order staging ([[eventsOooStreamDir]]),
    * so merges genuinely cross batch boundaries and late arrivals lose
    * to the newer version already in state — the final table is each
    * user's globally-latest event regardless of arrival order, which is
    * exactly what the oracle asserts.
    *
    * Determinism precondition, enforced in code: no two events share
    * (user_id, ts_us). A cross-batch tie would otherwise be resolved by
    * ARRIVAL order (updates-beat-base), which the relational oracle
    * cannot see. foreachBatch is at-least-once, and that is the point:
    * latest-wins is idempotent, so a replayed batch re-merges to the
    * same state.
    *
    * ## 100 TB notes
    * This is the streaming-ingest-to-serving-table pattern: merge cost
    * per batch is one shuffle of batch+state on the key; at scale the
    * swap becomes a transactional table commit (Delta/Iceberg MERGE)
    * and state stays partitioned by the key so only touched partitions
    * rewrite (Sinks' dynamic-overwrite posture). The idempotent merge is
    * what makes at-least-once delivery exactly-once at the table.
    */
  /** Run q84's merge stream; returns the final state table plus how many
    * micro-batches carried data — the spec pins >= 2 so a staging change
    * can't quietly collapse the cross-batch merge into one batch.
    */
  private[graft] def runQ84(s: SparkSession, dir: String): (DataFrame, Long) = {
      import org.apache.spark.sql.streaming.Trigger
      import java.nio.file.Files
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val ties = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), tsUs.as("ts_us"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
      if (ties > 0) throw new IllegalStateException(
        "q84 precondition: duplicate (user_id, ts_us) would make the " +
          "cross-batch merge arrival-order-dependent")
      val root = Files.createTempDirectory("graft_q84")
      val stateDir = root.resolve("state")
      val src = s.readStream.schema(batchSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(eventsOooStreamDir(s, dir))
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_type"),
          col("value"))
      val query = src.writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val base =
            if (Files.exists(stateDir)) s.read.parquet(stateDir.toString)
            else batch.limit(0)
          val merged = graft.engine.Sinks.upsertLatestWins(
            base, batch, keyCols = Seq("user_id"), versionCol = "ts_us")
          val tmp = root.resolve("state_tmp")
          merged.write.mode("overwrite").parquet(tmp.toString)
          graft.engine.Fs.deleteRecursively(stateDir)
          Files.move(tmp, stateDir)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      val dataBatches =
        query.recentProgress.toSeq.count(_.numInputRows > 0).toLong
      // one row per user after the merge, so user_id is a total order
      (s.read.parquet(stateDir.toString).orderBy("user_id"), dataBatches)
  }

  val q84ForeachBatchUpsert: Q = Q(
    "q84_foreachbatch_upsert",
    (s, dir) => runQ84(s, dir)._1,
    Some(s"""SELECT user_id, ts_us, event_type, value FROM (
              SELECT user_id, ${duckUs("ts")} AS ts_us, event_type, value,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ${duckUs("ts")} DESC) AS rn
              FROM events) WHERE rn = 1 ORDER BY user_id"""))

  /** Trailing 3-hour moving average over hourly counts — the RANGE-frame
    * window the suite lacked (q14's cumsum is a ROWS frame, q32's
    * sliding window re-buckets rows): the frame is defined by the VALUE
    * of the ordering column (micros within 2 hours before the current
    * hour), so hours with no events are genuinely absent from the
    * average's denominator — which the emitted (sum, hours, avg) triple
    * makes visible. The average is one double division of two exact
    * integers, bit-identical across engines.
    *
    * ## 100 TB notes
    * The hourly pre-aggregation collapses the raw stream map-side (one
    * shuffle on (type, hour)); the range window then runs over
    * |types| x |hours| rows — trivial at any corpus size. This is the
    * two-level shape for ALL calendar analytics at scale: aggregate to
    * the grain first, window over the grain table, never window over
    * raw events.
    */
  val q85MovingAverage: Q = Q(
    "q85_moving_average",
    (s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .select(col("event_type"),
          us(date_trunc("hour", tsStamp)).as("hour_us"))
        .groupBy(col("event_type"), col("hour_us"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
        .rangeBetween(-7200000000L, 0) // 2 h back + the current hour
      hourly
        .withColumn("w_events", sum(col("n_events")).over(w))
        .withColumn("w_hours", count(lit(1)).over(w))
        .select(col("event_type"), col("hour_us"), col("n_events"),
          col("w_events"), col("w_hours"),
          (col("w_events").cast("double") / col("w_hours")).as("w_avg"))
        .orderBy("event_type", "hour_us")
    },
    Some(s"""WITH h AS (SELECT event_type,
                   ${duckUs("date_trunc('hour', CAST(ts AS TIMESTAMP))")}
                     AS hour_us,
                   count(*) AS n_events
                 FROM events GROUP BY 1, 2)
            SELECT event_type, hour_us, n_events,
              CAST(sum(n_events) OVER w AS BIGINT) AS w_events,
              count(*) OVER w AS w_hours,
              CAST(sum(n_events) OVER w AS BIGINT)::DOUBLE
                / (count(*) OVER w) AS w_avg
            FROM h
            WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
              RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
            ORDER BY event_type, hour_us"""))

  /** Sessionized conversion funnel — ORDERED sequence detection inside
    * q33's sessions: a session converts through view -> click ->
    * purchase only if each stage's event happens strictly AFTER the
    * previous stage's first occurrence (a purchase before the first
    * view does not count). Emits the one-row corpus funnel: session
    * count, stage survivals, end-to-end conversion rate.
    *
    * ## 100 TB notes
    * Session assignment shuffles once on user_id; every stage is then a
    * conditional-min aggregate plus an equi-join on (user_id,
    * session_seq) — all riding that same partitioning, no window over
    * raw history beyond the lag q33 already pays. Stages prune hard
    * (each join's right side only holds surviving sessions), so later
    * stages get cheaper, not costlier.
    */
  val q86SessionFunnel: Q = Q(
    "q86_session_funnel",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val newSession = when(
        col("prev_us").isNull || (col("ts_us") - col("prev_us")) > GapUs, 1L)
        .otherwise(0L)
      // materialized: the per-event session table feeds all three stage
      // scans and the session universe
      val sess = Tables.eager(ev
        .select(col("user_id"), col("event_id"), col("event_type"),
          tsUs.as("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("is_new", newSession)
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("session_seq"), col("event_type"),
          col("ts_us")))
      val keys = Seq("user_id", "session_seq")
      val v = sess.filter(col("event_type") === "view")
        .groupBy(keys.map(col): _*).agg(min(col("ts_us")).as("v_us"))
      val c = sess.filter(col("event_type") === "click")
        .join(v, keys).filter(col("ts_us") > col("v_us"))
        .groupBy(keys.map(col): _*).agg(min(col("ts_us")).as("c_us"))
      val p = sess.filter(col("event_type") === "purchase")
        .join(c, keys).filter(col("ts_us") > col("c_us"))
        .groupBy(keys.map(col): _*).agg(min(col("ts_us")).as("p_us"))
      sess.select(keys.map(col): _*).distinct()
        .join(v, keys, "left").join(c, keys, "left").join(p, keys, "left")
        .agg(count(lit(1)).as("n_sessions"),
          count(col("v_us")).as("n_view"),
          count(col("c_us")).as("n_view_click"),
          count(col("p_us")).as("n_view_click_purchase"),
          (count(col("p_us")).cast("double") / count(lit(1)))
            .as("conversion"))
    },
    Some(s"""WITH $duckSessionCtes,
             k AS (SELECT DISTINCT user_id, session_seq FROM sess),
             v AS (SELECT user_id, session_seq, min(ts_us) AS v_us
                   FROM sess WHERE event_type = 'view' GROUP BY 1, 2),
             c AS (SELECT s.user_id, s.session_seq, min(s.ts_us) AS c_us
                   FROM sess s JOIN v USING (user_id, session_seq)
                   WHERE s.event_type = 'click' AND s.ts_us > v.v_us
                   GROUP BY 1, 2),
             p AS (SELECT s.user_id, s.session_seq, min(s.ts_us) AS p_us
                   FROM sess s JOIN c USING (user_id, session_seq)
                   WHERE s.event_type = 'purchase' AND s.ts_us > c.c_us
                   GROUP BY 1, 2)
             SELECT count(*) AS n_sessions, count(v_us) AS n_view,
               count(c_us) AS n_view_click,
               count(p_us) AS n_view_click_purchase,
               count(p_us)::DOUBLE / count(*) AS conversion
             FROM k LEFT JOIN v USING (user_id, session_seq)
                    LEFT JOIN c USING (user_id, session_seq)
                    LEFT JOIN p USING (user_id, session_seq)"""))

  /** Gap-filled hourly series: a generated hour spine (min..max event
    * hour) crossed with the event-type domain, left-joined to the
    * observed hourly counts so absent hours emit EXPLICIT zeros — the
    * date-spine densification every downstream time-series consumer
    * (q85's RANGE frame, anomaly baselines) wants as input.
    *
    * Shape at scale: the spine is derived from a 1-row bounds aggregate
    * (`sequence` + explode — never a driver-side loop) and the type
    * domain is a fixed small set, so the cross join is spine-rows ×
    * |types|; the only fact-sized work is the observed-counts group-by.
    */
  val q90GapFill: Q = Q(
    "q90_gap_fill",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 3600000000").as("h"),
          col("event_type"))
      val counts = ev.groupBy(col("h"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val bounds = ev.agg(min("h").as("lo"), max("h").as("hi")) // 1 row
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"), lit(1L))).as("h"))
      val types = ev.select(col("event_type")).distinct() // fixed domain
      spine.crossJoin(broadcast(types))
        .join(counts, Seq("h", "event_type"), "left")
        .select((col("h") * 3600000000L).as("hour_us"), col("event_type"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("hour_us", "event_type")
    },
    Some("""WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                          AS h, event_type
                        FROM events),
            c AS (SELECT h, event_type, count(*) AS n_events
                  FROM ev GROUP BY h, event_type),
            b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
            spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
            t AS (SELECT DISTINCT event_type FROM ev)
            SELECT spine.h * 3600000000 AS hour_us,
              t.event_type AS event_type,
              coalesce(c.n_events, 0) AS n_events
            FROM spine CROSS JOIN t
            LEFT JOIN c ON spine.h = c.h AND t.event_type = c.event_type
            ORDER BY hour_us, event_type"""))

  /** Hourly anomaly detection: per event type, z-score every observed
    * hour's count against that type's own mean/std (population moments
    * over observed hours), report the 10 most anomalous hours. The
    * moments come from EXACT integer sums (n, Σn, Σn²) with one fixed
    * double op tree (E[x²] − E[x]², then one sqrt — IEEE sqrt is
    * correctly rounded, so bit-identical across engines); z is one
    * subtraction and one division on top. At scale this is the q31
    * aggregation plus a broadcast of the |types|-row moment table.
    */
  val q95HourlyAnomaly: Q = Q(
    "q95_hourly_anomaly",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 3600000000").as("h"),
          col("event_type"))
      val hourly = ev.groupBy("h", "event_type")
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("n").as("sn"),
          sum(col("n") * col("n")).as("snn"))
        .select(col("event_type"),
          (col("sn").cast("double") / col("cnt")).as("mean"),
          sqrt((col("snn").cast("double") / col("cnt")) -
            (col("sn").cast("double") / col("cnt")) *
              (col("sn").cast("double") / col("cnt"))).as("std"))
      hourly.join(broadcast(stats), "event_type")
        .select(col("event_type"), (col("h") * 3600000000L).as("hour_us"),
          col("n").as("n_events"),
          ((col("n").cast("double") - col("mean")) / col("std")).as("z"))
        .orderBy(abs(col("z")).desc, col("event_type"), col("hour_us"))
        .limit(10)
    },
    Some("""WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                          AS h, event_type
                        FROM events),
            hourly AS (SELECT h, event_type, count(*) AS n
                       FROM ev GROUP BY h, event_type),
            st AS (SELECT event_type,
                     CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*)
                       AS mean,
                     sqrt(CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE)
                         / count(*)
                       - (CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*))
                         * (CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)
                            / count(*))) AS std
                   FROM hourly GROUP BY event_type)
            SELECT event_type, h * 3600000000 AS hour_us, n AS n_events,
              (CAST(n AS DOUBLE) - mean) / std AS z
            FROM hourly JOIN st USING (event_type)
            ORDER BY abs(z) DESC, event_type, hour_us LIMIT 10"""))

  /** Time-decayed engagement: recency-weighted per-user activity, the
    * feature-engineering staple behind "recent behavior matters more"
    * signals. Weight halves per day of age relative to the corpus
    * horizon (the max event time), and — per the Catalog determinism
    * contract — the whole computation is EXACT integer arithmetic:
    * value -> floor(cents), weight 2^-age applied as a 10-bit
    * fixed-point shift (`cents * 1024 div 2^age`), summed as bigints.
    * No double ever enters an aggregate. The horizon is a 1-row global
    * aggregate broadcast to the scan (q74's spine pattern); one shuffle
    * on user_id.
    */
  val q103DecayedEngagement: Q = Q(
    "q103_decayed_engagement",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value"), tsUs.as("us"))
      val horizon = events.agg(max(col("us")).as("h"))
      events.crossJoin(broadcast(horizon))
        .withColumn("age_d", expr("(h - us) div 86400000000"))
        .withColumn("cents", floor(col("value") * 100))
        // the exponent is clamped at 40: a contribution is already 0
        // once 2^age_d exceeds cents*1024 (cents < 2^30 on any sane
        // value column), and an UNclamped 2^63+ would saturate to
        // Long.MaxValue in Spark's non-ANSI cast while DuckDB raises a
        // conversion error — the clamp keeps both engines in-range and
        // identical for arbitrarily old events
        .withColumn("contrib",
          expr("(cents * 1024) div CAST(pow(2, least(age_d, 40)) AS BIGINT)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("contrib")).as("decayed_milli"))
        .orderBy("user_id")
    },
    Some(s"""WITH ev AS (SELECT user_id, value, ${duckUs("ts")} AS us
                         FROM events),
            h AS (SELECT max(us) AS h FROM ev),
            c AS (SELECT user_id,
                    (h.h - us) // 86400000000 AS age_d,
                    CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM ev, h)
            SELECT user_id, count(*) AS n_events,
              CAST(sum((cents * 1024)
                  // CAST(power(2, least(age_d, 40)) AS BIGINT))
                AS BIGINT) AS decayed_milli
            FROM c GROUP BY user_id ORDER BY user_id"""))

  /** Join-key skew profiler — the diagnostic that SIZES a skew
    * mitigation before it runs (q73's salt factor, AQE's skew-join
    * thresholds). Per event_type: distinct-key and row counts, the
    * heaviest key's share in exact ppm (integer cross-multiplication,
    * no doubles), and how many keys exceed 8x the mean frequency
    * (`cnt * n_keys > 8 * total`, the integer form of cnt > 8*mean).
    * Two chained aggregations over one shuffle each; the per-key table
    * is the same shape the salted-agg query consumes.
    */
  val q105SkewProfile: Q = Q(
    "q105_skew_profile",
    (s, dir) => {
      val w = Window.partitionBy("event_type")
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("nk", count(lit(1)).over(w))
        .withColumn("tot", sum(col("cnt")).over(w))
        .groupBy(col("event_type"))
        .agg(
          max(col("nk")).as("n_keys"),
          max(col("tot")).cast("long").as("n_rows"),
          max(col("cnt")).as("max_cnt"),
          count(when(col("cnt") * col("nk") > col("tot") * 8, 1))
            .as("hot_keys"))
        .select(col("event_type"), col("n_keys"), col("n_rows"),
          col("max_cnt"),
          expr("max_cnt * 1000000 div n_rows").as("top1_ppm"),
          col("hot_keys"))
        .orderBy("event_type")
    },
    Some("""WITH pk AS (
              SELECT event_type, user_id, count(*) AS cnt
              FROM events GROUP BY 1, 2),
            x AS (SELECT *,
                count(*) OVER (PARTITION BY event_type) AS nk,
                sum(cnt) OVER (PARTITION BY event_type) AS tot
              FROM pk)
            SELECT event_type,
              CAST(max(nk) AS BIGINT) AS n_keys,
              CAST(max(tot) AS BIGINT) AS n_rows,
              CAST(max(cnt) AS BIGINT) AS max_cnt,
              CAST(max(cnt) AS BIGINT) * 1000000
                // CAST(max(tot) AS BIGINT) AS top1_ppm,
              count(CASE WHEN cnt * nk > tot * 8 THEN 1 END) AS hot_keys
            FROM x GROUP BY event_type ORDER BY event_type"""))

  /** Stream-stream LEFT OUTER interval join — the null-completion half
    * of the q78 join surface, and the subtlest append-mode semantics in
    * the engine: matched pairs emit from the data batch (single-file
    * staging, watermark 0, nothing evicted early — q78's precondition),
    * while a left event that never matched emits `(left, NULL)` only at
    * STATE EVICTION, i.e. in the final AvailableNow batch once the
    * advanced watermark proves no future right row can complete it:
    * `l_us + window < watermark_ms * 1000` with
    * `watermark_ms = floor(max_us/1000) - delay_ms` (Spark tracks
    * watermarks in ms; strict less-than). Unmatched rows INSIDE the
    * final horizon stay in state unemitted — the oracle mirrors the
    * cutoff exactly, making the eviction rule itself hash-checked.
    *
    * ## 100 TB notes
    * Same bounded state as the inner form (watermark + window per side);
    * the outer semantics add no state — only the emission of evicted
    * never-matched rows. Result completeness is traded against state
    * retention via the watermark delay, which is THE knob at scale.
    */
  val q107StreamOuterJoin: Q = Q(
    "q107_stream_outer_join",
    (s, dir) => {
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stagingDir = eventsStreamDir(dir)
      requireSingleDataFile(stagingDir)
      def side(): DataFrame = s.readStream.schema(batchSchema)
        .parquet(stagingDir)
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_type"))
      val joined = graft.streaming.EventStreams.intervalJoin(
        side(), side(), "user_id", windowUs = 600L * 1000000,
        watermark = "10 minutes", joinType = "leftOuter")
      runToMemorySink(s, joined, "q107_stream_outer_mem")
        .orderBy(col("user_id"), col("l_ts_us"), col("l_type"),
          col("r_ts_us").asc_nulls_last, col("r_type").asc_nulls_last)
    },
    Some(s"""WITH ev AS (SELECT user_id, ${duckUs("ts")} AS us, event_type
                         FROM events),
            m AS (SELECT a.user_id, a.us AS l_ts_us, a.event_type AS l_type,
                    b.us AS r_ts_us, b.event_type AS r_type
                  FROM ev a JOIN ev b ON a.user_id = b.user_id
                    AND b.us > a.us AND b.us - a.us <= 600000000),
            wm AS (SELECT max(us) // 1000 - 600000 AS ms FROM ev),
            um AS (SELECT a.user_id, a.us, a.event_type
                   FROM ev a, wm
                   WHERE NOT EXISTS (
                       SELECT 1 FROM ev b
                       WHERE b.user_id = a.user_id AND b.us > a.us
                         AND b.us - a.us <= 600000000)
                     AND a.us + 600000000 < wm.ms * 1000)
            SELECT * FROM (
              SELECT * FROM m
              UNION ALL
              SELECT user_id, us, event_type, NULL, NULL FROM um)
            ORDER BY user_id, l_ts_us, l_type,
              r_ts_us NULLS LAST, r_type NULLS LAST"""))

  /** Multi-granularity rollup REUSE: the daily table is aggregated from
    * the HOURLY table, not from raw events — the rollup-chain contract
    * every metrics warehouse runs (hour → day → month), where each grain
    * re-aggregates the previous one at 1/24th the rows. Counts add;
    * decimal sums add exactly (order-independent, so re-aggregating
    * partials is lossless — the reason the chain is valid at all);
    * min/max compose. The oracle aggregates the SAME two-step chain.
    * Per grain: one shuffle over a table that is already an aggregate.
    */
  val q106RollupReuse: Q = Q(
    "q106_rollup_reuse",
    (s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 3600000000").as("hour_id"),
          col("event_type"), col("value"))
        .groupBy(col("hour_id"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(30,10)")).as("val_dec"),
          max(col("value")).as("max_v"))
      hourly
        .groupBy(expr("hour_id div 24").as("day_id"), col("event_type"))
        .agg(sum(col("n_events")).cast("long").as("n_events"),
          count(lit(1)).as("n_hours"),
          round(sum(col("val_dec")), 2).cast("double").as("total_value"),
          max(col("max_v")).as("max_v"))
        .orderBy("day_id", "event_type")
    },
    Some("""WITH hourly AS (
              SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                  AS hour_id,
                event_type, count(*) AS n_events,
                sum(CAST(value AS DECIMAL(30,10))) AS val_dec,
                max(value) AS max_v
              FROM events GROUP BY 1, 2)
            SELECT hour_id // 24 AS day_id, event_type,
              CAST(sum(n_events) AS BIGINT) AS n_events,
              count(*) AS n_hours,
              CAST(round(sum(val_dec), 2) AS DOUBLE) AS total_value,
              max(max_v) AS max_v
            FROM hourly GROUP BY 1, 2 ORDER BY day_id, event_type"""))

  /** Grouped OLS trend via exact sufficient statistics: per event_type,
    * the least-squares slope and intercept of value over time from the
    * five sufficient sums (n, Σx, Σy, Σxy, Σx²) — the one-reduce shape
    * that computes a regression over any group size with a single
    * shuffle and no iteration. x is the hour index since 2024-01-01 and
    * y the floor-centi value — small exact integers, so every sum is an
    * order-independent BIGINT reduce and the emitted sufficient
    * statistics are themselves hash-checked; the ONLY double is the
    * final slope division (identical IEEE op tree on both engines, per
    * the Catalog contract).
    */
  val q108TrendOls: Q = Q(
    "q108_trend_ols",
    (s, dir) => {
      // x = hour index since 2024-01-01 (<= 3 digits on the fixture
      // month), y = centi-value — both small exact BIGINTs, so every
      // sufficient sum AND the two slope cross-terms stay in exact
      // 64-bit range through ~sf1 (documented bound; beyond that the
      // sums widen to decimal). Only the final divisions are doubles.
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("(ts div 1000000000 - 1704067200) div 3600").as("x"),
          floor(col("value") * 100).as("y"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("n").as("n_events"),
          col("sx"), col("sy"), col("sxy"), col("sxx"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("slope_centi_per_hour"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
              SELECT event_type,
                (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                  - 1704067200) // 3600 AS x,
                CAST(floor(value * 100) AS BIGINT) AS y
              FROM events),
            a AS (SELECT event_type, count(*) AS n,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM ev GROUP BY 1)
            SELECT event_type, n AS n_events, sx, sy, sxy, sxx,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                AS slope_centi_per_hour
            FROM a ORDER BY event_type"""))

  /** Compaction (OPTIMIZE) planner — the file-layout maintenance pass a
    * lakehouse runs to fight small files: per partition, files in name
    * order are greedily packed into bins of a target size by
    * exclusive-prefix-sum division, and the plan reports each output
    * bin's file count and byte total. Everything is a window cumsum and
    * integer division — one shuffle on the partition key; the plan table
    * is what the rewrite job would execute. (File inventory is simulated
    * from events: one "file" per (event_type, user_id) with its row
    * count ×100 as bytes — the planner's arithmetic is the operator
    * under test, not the listing.)
    */
  val q109CompactionPlan: Q = Q(
    "q109_compaction_plan",
    (s, dir) => {
      val target = 4000L
      val files = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg((count(lit(1)) * 100).as("bytes"))
      val w = Window.partitionBy("event_type").orderBy("user_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("prior", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin", expr(s"prior div $target"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("bytes")).cast("long").as("bin_bytes"))
        .orderBy("event_type", "bin")
    },
    Some("""WITH files AS (
              SELECT event_type, user_id, count(*) * 100 AS bytes
              FROM events GROUP BY 1, 2),
            c AS (SELECT event_type, user_id, bytes,
                coalesce(sum(bytes) OVER (PARTITION BY event_type
                  ORDER BY user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS prior
              FROM files)
            SELECT event_type, CAST(prior // 4000 AS BIGINT) AS bin,
              count(*) AS n_files,
              CAST(sum(bytes) AS BIGINT) AS bin_bytes
            FROM c GROUP BY 1, 2 ORDER BY event_type, bin"""))

  /** [[graft.engine.Skew.saltedJoin]] under oracle check — the salted
    * AGGREGATION is proven equal to the plain groupBy by q73; this is
    * the same proof for the salted JOIN helper: events (the skewed fact
    * — q105 profiles user_id's hot keys) joined to the customer
    * dimension through the salt-and-replicate path, aggregated per user,
    * hash-compared against the plain-SQL inner join. The salt spreads
    * rows of ONE key across 16 shuffle tasks and the dimension is
    * replicated 16x, so equality with the unsalted join is exactly the
    * helper's correctness claim (no pair lost, no pair duplicated).
    *
    * ## 100 TB notes
    * The salted path exists for the key so hot that even AQE's skew
    * split leaves a straggler: replication cost is |dim| x saltBuckets
    * rows shuffled, bounded and chosen; the hot key's probe cost drops
    * by 1/16. Per-user grouping after the join keeps the oracle row
    * count |matched users|, not |events|.
    */
  val q115SaltedJoin: Q = Q(
    "q115_salted_join",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.engine.Skew.saltedJoin(events, cust, Seq("user_id"), 16)
        .groupBy(col("user_id"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(30,10)")), 2).cast("double")
            .as("total_value"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, c_mktsegment, count(*) AS n_events,
              CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                AS total_value
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY 1, 2 ORDER BY user_id"""))

  /** Update-mode `mapGroupsWithState` under oracle check — the
    * one-emission-per-touched-key-per-batch stateful API the suite
    * lacked (q75's flatMapGroupsWithState is the zero-or-many append
    * form). Per-user running (count, exact-cent total, max event time)
    * counters fold across the THREE-batch out-of-order staging
    * ([[eventsOooStreamDir]], `maxFilesPerTrigger=1`), so state
    * genuinely carries between micro-batches; the update-mode memory
    * sink appends each batch's emissions, so the materialized table is
    * the full emission LOG — one row per (user, batch-that-touched-it)
    * with the cumulative totals as of that batch.
    *
    * The oracle reconstructs the same log relationally: the staging's
    * batch assignment is a deterministic function of (event_id parity,
    * event time vs the even side's max), so "user's cumulative totals
    * over batches 1..k, for each batch k that touched the user" is a
    * self-join aggregate. Cumulative n_events strictly increases per
    * touched batch, so (user_id, n_events) is a total order.
    *
    * Cents are computed IN THE PLAN (`floor(value*100)`, the q103
    * idiom) and folded as longs in state — no double crosses a batch
    * boundary, so the cross-batch sum is exact on any arrival order.
    */
  val q119StreamRunningTotals: Q = Q(
    "q119_stream_running_totals",
    (s, dir) => {
      import s.implicits._
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val src = s.readStream.schema(batchSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(eventsOooStreamDir(s, dir))
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          tsUs.as("us"))
        .as[graft.streaming.EventStreams.Counted]
      graft.streaming.EventStreams.runningTotals(src).toDF()
        .transform(df => runToMemorySink(s, df,
          "q119_stream_running_totals_mem", outputMode = "update"))
        .orderBy("user_id", "n_events")
    },
    Some(duckRunningTotalsOracle))

  /** Oracle for the update-mode running-totals emission log — shared
    * verbatim by q119 (mapGroupsWithState) and q265 (transformWithState):
    * the same SQL matching BOTH runs is the engine-side proof the two
    * state APIs are semantically identical.
    */
  private lazy val duckRunningTotalsOracle: String =
    s"""WITH e AS (SELECT user_id, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS cents,
                   ${duckUs("ts")} AS us
                 FROM events),
            mx AS (SELECT max(us) AS m FROM e WHERE event_id % 2 = 0),
            b AS (SELECT e.*, CASE WHEN event_id % 2 = 0 THEN 1
                                   WHEN us > mx.m THEN 2 ELSE 3 END AS batch
                  FROM e, mx),
            touched AS (SELECT DISTINCT user_id, batch FROM b),
            cum AS (SELECT t.user_id,
                      count(*) AS n_events,
                      CAST(sum(x.cents) AS BIGINT) AS total_cents,
                      max(x.us) AS max_us
                    FROM touched t JOIN b x
                      ON x.user_id = t.user_id AND x.batch <= t.batch
                    GROUP BY t.user_id, t.batch)
            SELECT user_id, n_events, total_cents, max_us
            FROM cum ORDER BY user_id, n_events"""

  /** q119's running per-user totals through Spark 4's
    * `transformWithState` (typed named-state handles + per-state TTL —
    * the successor stateful API; see
    * [[graft.streaming.EventStreams.RunningTotalProcessor]]): identical
    * staging, identical emissions, SAME oracle SQL — the hash match of
    * both queries against one oracle proves the two state APIs fold
    * identically, the q24/q153 relational-vs-native pattern applied to
    * streaming state. transformWithState only runs on the RocksDB state
    * store provider, so the runner pins the provider for this query and
    * restores the session conf after — which also makes this a real
    * RocksDB-backed run in every verify pass, not just in
    * RocksDbStateSpec.
    */
  val q265StreamTwsTotals: Q = Q(
    "q265_stream_tws_totals",
    (s, dir) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prior = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
        val src = s.readStream.schema(batchSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(eventsOooStreamDir(s, dir))
          .transform(Tables.normalizeEventTs)
          .select(col("user_id"),
            floor(col("value") * 100).cast("long").as("cents"),
            tsUs.as("us"))
          .as[graft.streaming.EventStreams.Counted]
        graft.streaming.EventStreams.runningTotalsTws(src).toDF()
          .transform(df => runToMemorySink(s, df,
            "q265_stream_tws_totals_mem", outputMode = "update"))
          .orderBy("user_id", "n_events")
      } finally prior match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },
    Some(duckRunningTotalsOracle))

  /** Pin the RocksDB state store provider for the duration of `body`
    * and restore the prior session conf after — transformWithState
    * only runs on RocksDB, and pinning per-query keeps every verify
    * pass a real RocksDB-backed run (q265's posture, shared by the
    * list/map-state queries).
    */
  private def withRocksDb[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Streaming per-user top-3 amounts via `transformWithState` LIST
    * state (see [[graft.streaming.EventStreams.TopkProcessor]]: a
    * bounded `ListState[Long]` leaderboard plus a `ValueState[Long]`
    * counter — two named state handles in one processor, the state
    * shape q265/q266 didn't cover). Same three-batch out-of-order
    * staging as q119; the emission log is one row per
    * (user, touched batch) carrying the cumulative event count and the
    * 3 largest cents so far. Top-k is a commutative fold, so the log
    * is deterministic under any partitioning; `(user_id, n_events)` is
    * a total order because every touched batch adds at least one
    * event. The oracle reconstructs the log relationally with a ranked
    * self-join over the deterministic batch assignment.
    */
  val q275StreamTwsTopk: Q = Q(
    "q275_stream_tws_topk",
    (s, dir) => {
      import s.implicits._
      withRocksDb(s) {
        val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
        val src = s.readStream.schema(batchSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(eventsOooStreamDir(s, dir))
          .transform(Tables.normalizeEventTs)
          .select(col("user_id"),
            floor(col("value") * 100).cast("long").as("cents"),
            tsUs.as("us"))
          .as[graft.streaming.EventStreams.Counted]
        graft.streaming.EventStreams.topkTws(src).toDF()
          .transform(df => runToMemorySink(s, df,
            "q275_stream_tws_topk_mem", outputMode = "update"))
          .orderBy("user_id", "n_events")
      }
    },
    Some(s"""WITH e AS (SELECT user_id, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS cents,
                   ${duckUs("ts")} AS us
                 FROM events),
            mx AS (SELECT max(us) AS m FROM e WHERE event_id % 2 = 0),
            b AS (SELECT e.*, CASE WHEN event_id % 2 = 0 THEN 1
                                   WHEN us > mx.m THEN 2 ELSE 3 END AS batch
                  FROM e, mx),
            touched AS (SELECT DISTINCT user_id, batch FROM b),
            j AS (SELECT t.user_id, t.batch, x.cents
                  FROM touched t JOIN b x
                    ON x.user_id = t.user_id AND x.batch <= t.batch),
            r AS (SELECT user_id, batch, cents,
                    row_number() OVER (PARTITION BY user_id, batch
                      ORDER BY cents DESC) AS rn,
                    count(*) OVER (PARTITION BY user_id, batch)
                      AS n_events
                  FROM j)
            SELECT user_id, n_events,
              max(CASE WHEN rn = 1 THEN cents END) AS top1,
              max(CASE WHEN rn = 2 THEN cents END) AS top2,
              max(CASE WHEN rn = 3 THEN cents END) AS top3
            FROM r GROUP BY user_id, batch, n_events
            ORDER BY user_id, n_events"""))

  /** Streaming per-(user, type) counters via `transformWithState` MAP
    * state (see [[graft.streaming.EventStreams.TypeCountProcessor]]:
    * one `MapState[String, Long]` per user — the per-type sub-key
    * lives in the state-store key, so a batch touches only the
    * entries it changes instead of rewriting a serialized map). Each
    * batch emits one row per type it touched with the type's new
    * cumulative count, so the log never repeats a row and
    * `(user_id, event_type, n)` is a total order. Counting is
    * commutative — partitioning-invariant by construction.
    */
  val q276StreamTwsTypeCounts: Q = Q(
    "q276_stream_tws_typecounts",
    (s, dir) => {
      import s.implicits._
      withRocksDb(s) {
        val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
        val src = s.readStream.schema(batchSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(eventsOooStreamDir(s, dir))
          .transform(Tables.normalizeEventTs)
          .select(col("user_id"), col("event_type"), lit(1L).as("n"))
          .as[graft.streaming.EventStreams.TypeCount]
        graft.streaming.EventStreams.typeCountsTws(src).toDF()
          .transform(df => runToMemorySink(s, df,
            "q276_stream_tws_typecounts_mem", outputMode = "update"))
          .orderBy("user_id", "event_type", "n")
      }
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, event_type,
                   ${duckUs("ts")} AS us
                 FROM events),
            mx AS (SELECT max(us) AS m FROM e WHERE event_id % 2 = 0),
            b AS (SELECT e.*, CASE WHEN event_id % 2 = 0 THEN 1
                                   WHEN us > mx.m THEN 2 ELSE 3 END AS batch
                  FROM e, mx),
            touched AS (SELECT DISTINCT user_id, event_type, batch
                        FROM b),
            cum AS (SELECT t.user_id, t.event_type, count(*) AS n
                    FROM touched t JOIN b x
                      ON x.user_id = t.user_id
                         AND x.event_type = t.event_type
                         AND x.batch <= t.batch
                    GROUP BY t.user_id, t.event_type, t.batch)
            SELECT user_id, event_type, n FROM cum
            ORDER BY user_id, event_type, n"""))

  /** Incremental gold maintenance under oracle check: the per-user
    * totals table built by folding THREE per-batch aggregates through
    * [[graft.engine.Incremental.mergeAdditive]] (full-outer join +
    * monoid combine: counts/sums add, max takes greatest) must equal
    * the one-shot aggregation over all events — `agg(A ∪ B) =
    * merge(agg(A), agg(B))`, the identity every "process only today's
    * partition" pipeline silently relies on. The oracle IS the
    * one-shot aggregation, so the hash match proves the incremental
    * path exactly, not approximately; the batch split reuses q119's
    * deterministic assignment (event-id parity + event time vs the
    * even side's max) so the same three deltas exist on both engines.
    *
    * ## 100 TB notes
    * Each delta aggregation is one map-side-combined shuffle over ITS
    * batch only; each merge joins key-space-sized aggregates (gold
    * bucketed on the key at scale → co-located join; AQE broadcasts
    * small deltas). History is never re-read — that is the point.
    */
  val q277IncrementalGold: Q = Q(
    "q277_incremental_gold",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          tsUs.as("us"))
      val mx = ev.filter(col("event_id") % 2 === 0)
        .agg(max(col("us")).as("m")) // 1 row
      val batched = ev.crossJoin(broadcast(mx))
        .withColumn("batch", when(col("event_id") % 2 === 0, 1)
          .when(col("us") > col("m"), 2).otherwise(3))
      def aggBatch(b: Int) = batched.filter(col("batch") === b)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("total_cents"),
          max(col("us")).as("max_us"))
      Seq(2, 3).foldLeft(aggBatch(1)) { (gold, b) =>
        graft.engine.Incremental.mergeAdditive(gold, aggBatch(b),
          Seq("user_id"), Seq("n_events", "total_cents"), Seq("max_us"))
      }.orderBy("user_id")
    },
    Some(s"""SELECT user_id, count(*) AS n_events,
              CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                AS total_cents,
              max(${duckUs("ts")}) AS max_us
            FROM events GROUP BY 1 ORDER BY user_id"""))

  /** Retractable aggregates — incremental maintenance under DELETES
    * (the Z-set / differential-dataflow move): a retraction is just a
    * delta with NEGATED measures, so the same
    * [[graft.engine.Incremental.mergeAdditive]] that applies inserts
    * applies erasures, followed by zero-weight elimination
    * (`n > 0` — a key whose every row was retracted must vanish, not
    * linger at zero). The demo erases the deterministic
    * `event_id % 7 = 0` cohort from the standing per-user totals; the
    * oracle aggregates the SURVIVORS directly, so the hash match
    * proves subtract-then-eliminate equals never-having-seen-them.
    * Only SUBTRACTABLE measures qualify (count/sum form a group;
    * max does not — q277 carries max through insert-only merges, this
    * query deliberately excludes it: after a delete, a max must be
    * recomputed from survivors or kept in a sketch).
    *
    * ## 100 TB notes
    * An RTBF purge (q213's blast radius) becomes one key-space-sized
    * merge of the negated erasure cohort — no fact-table recompute.
    * The retraction delta aggregates map-side like any other batch.
    */
  val q278RetractableAgg: Q = Q(
    "q278_retractable_agg",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      def totals(df: DataFrame) = df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val gold = totals(ev)
      val retraction = totals(ev.filter(col("event_id") % 7 === 0))
        .select(col("user_id"), (-col("n")).as("n"),
          (-col("cents")).as("cents"))
      graft.engine.Incremental
        .mergeAdditive(gold, retraction, Seq("user_id"),
          Seq("n", "cents"))
        .filter(col("n") > 0) // Z-set zero-weight elimination
        .orderBy("user_id")
    },
    Some("""SELECT user_id, count(*) AS n,
              CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                AS cents
            FROM events WHERE event_id % 7 <> 0
            GROUP BY 1 ORDER BY user_id"""))

  /** Watermark restatement scope — how much already-finalized output
    * does the lateness profile force an incremental pipeline to
    * restate? Using q119's deterministic three-batch arrival order,
    * batch 1's completion sets the watermark (max event time seen
    * minus a 1-hour allowed delay); an hourly (user, hour) cell is
    * FINALIZED once its end sits at or below that watermark. Every
    * later-arriving row landing in a finalized cell is a restatement:
    * per subsequent batch the audit counts rows, restating rows, the
    * distinct finalized cells they reopen, and the exact-ppm
    * restatement rate. Batch 2 (the genuinely-new rows) restates
    * nothing by construction; batch 3 (the stragglers) is the
    * correction load — the number that decides between "reprocess the
    * partition" and "serve approximate until compaction".
    *
    * ## 100 TB notes
    * One broadcast scalar (the watermark), one two-level group-by
    * ((batch, user, hour) cells with map-side partials, then per
    * batch). The cell relation is the same size as the streaming
    * state the watermark would have bounded — this is the BATCH
    * measurement of that streaming contract.
    */
  val q279RestatementScope: Q = Q(
    "q279_restatement_scope",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), tsUs.as("us"))
      val mx = ev.filter(col("event_id") % 2 === 0)
        .agg(max(col("us")).as("m")) // 1 row: batch-1 max event time
      val cells = ev.crossJoin(broadcast(mx))
        .withColumn("batch", when(col("event_id") % 2 === 0, 1L)
          .when(col("us") > col("m"), 2L).otherwise(3L))
        .filter(col("batch") =!= 1)
        .withColumn("hr", expr("us div 3600000000"))
        .withColumn("restates",
          (col("hr") + 1) * 3600000000L <= col("m") - 3600000000L)
      cells.groupBy(col("batch"), col("user_id"), col("hr"),
          col("restates"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("batch"))
        .agg(sum(col("cnt")).as("n_rows"),
          sum(when(col("restates"), col("cnt")).otherwise(0L))
            .as("n_restating"),
          count(when(col("restates"), 1)).as("n_cells_reopened"))
        .select(col("batch"), col("n_rows"), col("n_restating"),
          col("n_cells_reopened"),
          expr("n_restating * 1000000 div n_rows").as("restate_ppm"))
        .orderBy("batch")
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, ${duckUs("ts")} AS us
                 FROM events),
            mx AS (SELECT max(us) AS m FROM e WHERE event_id % 2 = 0),
            c AS (SELECT CASE WHEN event_id % 2 = 0 THEN 1
                              WHEN us > m THEN 2 ELSE 3 END AS batch,
                    user_id, us // 3600000000 AS hr,
                    (us // 3600000000 + 1) * 3600000000
                      <= m - 3600000000 AS restates
                  FROM e, mx),
            g AS (SELECT batch, user_id, hr, restates, count(*) AS cnt
                  FROM c WHERE batch <> 1 GROUP BY 1, 2, 3, 4),
            a AS (SELECT batch, CAST(sum(cnt) AS BIGINT) AS n_rows,
                    CAST(sum(CASE WHEN restates THEN cnt ELSE 0 END)
                      AS BIGINT) AS n_restating,
                    count(CASE WHEN restates THEN 1 END)
                      AS n_cells_reopened
                  FROM g GROUP BY 1)
            SELECT batch, n_rows, n_restating, n_cells_reopened,
              n_restating * 1000000 // n_rows AS restate_ppm
            FROM a ORDER BY batch"""))

  /** Watermark tuning curve — the state-vs-restatement tradeoff that
    * picks an allowed-delay, computed exactly per candidate delay
    * (0/1/2/4/8/16 hours): a larger delay keeps more (user, hour)
    * cells OPEN at batch-1 close (streaming state the store must
    * hold), but fewer straggler rows land in already-FINALIZED cells
    * (restatements the serving layer must correct). q279 reads one
    * point off this curve; this emits the whole decision table —
    * `open_cells` rises and `restating_rows` falls monotonically in
    * the delay, and the knee is the watermark you deploy.
    *
    * ## 100 TB notes
    * The cell relation (distinct user-hours) is computed ONCE with
    * map-side partials, then crossed with the 6-row delay dimension —
    * broadcast, no re-scan per delay. Exact integer µs arithmetic
    * throughout; the curve is 6 rows at any scale.
    */
  val q280WatermarkCurve: Q = Q(
    "q280_watermark_curve",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), tsUs.as("us"))
      val mx = ev.filter(col("event_id") % 2 === 0)
        .agg(max(col("us")).as("m")) // 1 row
      val tagged = ev.crossJoin(broadcast(mx))
        .withColumn("batch", when(col("event_id") % 2 === 0, 1L)
          .when(col("us") > col("m"), 2L).otherwise(3L))
        .withColumn("hr", expr("us div 3600000000"))
      // one pass to cells: batch-1 cells (candidate state) and
      // straggler rows per cell (candidate restatements)
      val cells = tagged.groupBy(col("user_id"), col("hr"), col("m"))
        .agg(count(when(col("batch") === 1, 1)).as("b1_rows"),
          count(when(col("batch") === 3, 1)).as("late_rows"))
      val delays = s.range(0, 1).select(
        explode(array(Seq(0L, 1L, 2L, 4L, 8L, 16L).map(lit): _*))
          .as("delay_h"))
      cells.crossJoin(broadcast(delays))
        .withColumn("finalized",
          (col("hr") + 1) * 3600000000L <=
            col("m") - col("delay_h") * 3600000000L)
        .groupBy(col("delay_h"))
        .agg(count(when(!col("finalized") && col("b1_rows") > 0, 1))
            .as("open_cells"),
          sum(when(col("finalized"), col("late_rows")).otherwise(0L))
            .as("restating_rows"),
          count(when(col("finalized") && col("late_rows") > 0, 1))
            .as("reopened_cells"))
        .orderBy("delay_h")
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, ${duckUs("ts")} AS us
                 FROM events),
            mx AS (SELECT max(us) AS m FROM e WHERE event_id % 2 = 0),
            t AS (SELECT user_id, us // 3600000000 AS hr, m,
                    CASE WHEN event_id % 2 = 0 THEN 1
                         WHEN us > m THEN 2 ELSE 3 END AS batch
                  FROM e, mx),
            c AS (SELECT user_id, hr, m,
                    count(CASE WHEN batch = 1 THEN 1 END) AS b1_rows,
                    count(CASE WHEN batch = 3 THEN 1 END) AS late_rows
                  FROM t GROUP BY 1, 2, 3),
            d AS (SELECT unnest([0, 1, 2, 4, 8, 16]) AS delay_h),
            j AS (SELECT c.*, d.delay_h,
                    (hr + 1) * 3600000000
                      <= m - delay_h * 3600000000 AS finalized
                  FROM c CROSS JOIN d)
            SELECT CAST(delay_h AS BIGINT) AS delay_h,
              count(CASE WHEN NOT finalized AND b1_rows > 0 THEN 1 END)
                AS open_cells,
              CAST(sum(CASE WHEN finalized THEN late_rows ELSE 0 END)
                AS BIGINT) AS restating_rows,
              count(CASE WHEN finalized AND late_rows > 0 THEN 1 END)
                AS reopened_cells
            FROM j GROUP BY 1 ORDER BY delay_h"""))

  /** The incremental-gold identity (q277) run END-TO-END through
    * Structured Streaming: `foreachBatch` aggregates each micro-batch
    * to a per-user delta and folds it into a parquet-landed gold
    * snapshot via [[graft.engine.Incremental.mergeAdditive]]
    * (tmp-write + directory swap per batch — q84's sink discipline,
    * additive instead of latest-wins). After the three staged batches
    * drain, the landed snapshot must equal the one-shot aggregation
    * over all events — the oracle — proving the streaming incremental
    * path exact, not just the relational identity q277 already
    * pinned. Counts and exact-cent sums are commutative, so the
    * result is arrival-order- and partitioning-invariant.
    *
    * ## 100 TB/day notes
    * This is the production shape for continuous gold maintenance
    * when the serving store is a table, not a state store: per-batch
    * work is one map-side-combined delta aggregation + one
    * key-space-sized merge join; nothing re-reads history. The
    * per-batch publish is two directory renames (old aside, tmp in),
    * so a reader sees batch N or N+1 — never a torn merge, and never
    * the no-snapshot window a delete-then-move would open (only the
    * instant between the two renames remains; a real deployment swaps
    * a symlink or a metastore pointer for true atomicity). The
    * snapshot embeds the last-applied batchId, so a batch REPLAYED
    * after a crash past the publish (but before the checkpoint commit)
    * is recognized and skipped — the additive merge is guarded into
    * exactly-once, not just at-least-once.
    */
  val q284StreamIncrementalGold: Q = Q(
    "q284_stream_incremental_gold",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import java.nio.file.Files
      val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
      val root = Files.createTempDirectory("graft_q284")
      val goldDir = root.resolve("gold")
      val src = s.readStream.schema(batchSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(eventsOooStreamDir(s, dir))
        .transform(Tables.normalizeEventTs)
        .select(col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      val query = src.writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // delta aggregation here; recovery, replay-idempotence (the
          // _applied_batch marker) and the gap-free two-rename publish
          // live in the unit-tested Incremental.publishAdditiveBatch
          val delta = batch.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_events"),
              sum(col("cents")).as("total_cents"))
          graft.engine.Incremental.publishAdditiveBatch(
            s, root, delta, batchId,
            Seq("user_id"), Seq("n_events", "total_cents"))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      s.read.parquet(goldDir.toString).orderBy("user_id")
    },
    Some("""SELECT user_id, count(*) AS n_events,
              CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                AS total_cents
            FROM events GROUP BY 1 ORDER BY user_id"""))

  /** Manifest table format, END-TO-END through the driver's oracle:
    * writes the `part` table through `graft-manifest` (v1 = the full
    * table, range-partitioned on p_size so each committed file's zone
    * map covers a narrow slice; v2 = a truncating-overwrite DECOY
    * subset), then reads back `versionAsOf = 1` with a pushed p_size
    * filter and aggregates. Reading LATEST would return the decoy —
    * only correct time travel reproduces the oracle, and the pushed
    * range filter drives zone-map FILE SKIPPING inside the timed,
    * hash-checked path (the range layout makes most files provably
    * dead for `p_size >= 40`). This promotes the format's unit specs
    * (ManifestSinkSpec: commit protocol, CAS races, vacuum, stats)
    * to a driver-verified correctness row, the same promotion q77
    * gave the decode stub. The oracle reads the SAME rows straight
    * from the original parquet — the manifest roundtrip must be
    * byte-faithful for the hashes to meet.
    *
    * ## 100 TB notes
    * Write path is one range-shuffle + embarrassingly-parallel file
    * writes + an O(#files) driver commit; read path plans from
    * manifest metadata only (no directory listing) and skips files on
    * zone maps before any IO — the Iceberg/Delta read posture. The
    * aggregate is partitioning-invariant (count + exact BIGINT cents),
    * so the result is identical at any parallelism.
    */
  /** q283's two-version manifest table, keyed by fixture signature so
    * a rewritten fixture rebuilds — the same once-per-JVM discipline
    * as [[graft.engine.Tables.landed]].
    */
  private val q283Tables =
    scala.collection.concurrent.TrieMap.empty[String, String]

  val q283ManifestTimeTravel: Q = Q(
    "q283_manifest_timetravel",
    (s, dir) => {
      import java.nio.file.Files
      // the two-version table is BUILT once per (JVM, fixture): building
      // it inside DataFrame construction would re-run both write jobs
      // (and leak a temp dir) on every plan-only consumer — PlanAudit,
      // the warm bench pass, repeated Verify calls. Memoized, the writes
      // run once and every later call exercises exactly the READ path
      // (time travel + zone-map skipping) this query certifies.
      val root = q283Tables.getOrElseUpdate(
        s"$dir@${Tables.fileSignature(dir, "part")}", {
          val r = Files.createTempDirectory("graft_q283")
            .resolve("tbl").toString
          val part = Tables.load(s, dir, "part")
            .withColumn("price_cents",
              floor(col("p_retailprice") * 100).cast("long"))
            .select("p_partkey", "p_brand", "p_size", "price_cents")
          part.repartitionByRange(8, col("p_size"))
            .write.format("graft-manifest").option("path", r)
            .mode("append").save()
          part.filter(col("p_size") <= lit(3))
            .write.format("graft-manifest").option("path", r)
            .mode("overwrite").save()
          r
        })
      s.read.format("graft-manifest")
        .option("path", root).option("versionAsOf", "1").load()
        .filter(col("p_size") >= lit(40))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("price_cents")).as("sum_price_cents"),
          max(col("p_size")).as("max_size"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n_parts,
              CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_price_cents,
              max(p_size) AS max_size
            FROM part WHERE p_size >= 40
            GROUP BY 1 ORDER BY p_brand"""))

  /** q293's three-version manifest table, keyed by fixture signature —
    * the same once-per-JVM build discipline as [[q283Tables]].
    */
  private val q293Tables =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Manifest CHANGE FEED, end-to-end through the driver's oracle —
    * the streaming counterpart of q283's batch promotion. The customer
    * table is committed in FOUR versions (append custkey%3=0, append
    * %3=1, a COMPACTION rewriting those two appends' files, then a
    * truncating OVERWRITE with %3=2); the `graft-manifest` streaming
    * tail drains the change feed under Trigger.AvailableNow with
    * `max_versions_per_trigger=1` (one version per micro-batch, the
    * admission-control path) into a parquet sink, and the drained rows
    * are aggregated per market segment. The three slices partition the
    * table, so the feed must deliver EXACTLY the whole customer table:
    * a duplicated append delta, an overwrite delta computed as a union
    * instead of the version's own files, a lost or re-emitted version
    * — each breaks the count and the exact cents hash against DuckDB
    * reading the original parquet. The compaction version (round-12
    * ask #4) puts the rewrite-is-invisible rule on the driver's gate:
    * its micro-batch must contribute ZERO rows — a regression to
    * name-diff re-emission would re-deliver every %3∈{0,1} customer
    * and double those segments' counts (previously this rule was
    * spec+model-tested only, never inside the hash-checked path).
    *
    * ## 100 TB notes
    * The feed plans one micro-batch per committed version from
    * manifest metadata only — no directory listing, no full-table
    * rescan per batch; per-batch work is bounded by the version's own
    * delta. This is the CDC posture of real lake formats (Delta CDF /
    * Iceberg incremental scan): gold maintenance tails the log instead
    * of diffing snapshots.
    */
  val q293ManifestChangeFeed: Q = Q(
    "q293_manifest_changefeed",
    (s, dir) => {
      import java.nio.file.Files
      import org.apache.spark.sql.streaming.Trigger
      val root = q293Tables.getOrElseUpdate(
        s"$dir@${Tables.fileSignature(dir, "customer")}", {
          val r = Files.createTempDirectory("graft_q293")
            .resolve("tbl").toString
          val cust = Tables.load(s, dir, "customer")
            .withColumn("bal_cents",
              round(col("c_acctbal") * 100).cast("long"))
            .select("c_custkey", "c_mktsegment", "bal_cents")
          cust.filter(col("c_custkey") % 3 === 0)
            .write.format("graft-manifest").option("path", r)
            .mode("append").save()
          cust.filter(col("c_custkey") % 3 === 1)
            .write.format("graft-manifest").option("path", r)
            .mode("append").save()
          // rewrite-only version between the appends and the overwrite:
          // the drained feed must skip it (see Scaladoc above)
          graft.sources.ManifestSink.compact(s, r, numFiles = 1)
          cust.filter(col("c_custkey") % 3 === 2)
            .write.format("graft-manifest").option("path", r)
            .mode("overwrite").save()
          r
        })
      val out = Files.createTempDirectory("graft_q293_out")
      val q = s.readStream.format("graft-manifest")
        .option("path", root)
        .option("max_versions_per_trigger", "1").load()
        .writeStream.format("parquet")
        .option("path", out.resolve("data").toString)
        .option("checkpointLocation", out.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(out.resolve("data").toString)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("bal_cents")).as("sum_bal_cents"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_cust,
              CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                AS sum_bal_cents
            FROM customer GROUP BY 1 ORDER BY c_mktsegment"""))

  /** Shuffle-partition balance planner — pick
    * `spark.sql.shuffle.partitions` from DATA, not folklore: for each
    * candidate partition count p ∈ {8, 32, 128}, hash every event's
    * key (the engine-portable md5-derived `hash32`, so DuckDB builds
    * the IDENTICAL assignment) into p reducers and report the load
    * envelope — partitions actually used, max/min rows, and the
    * hottest reducer's EXCESS over the perfect share in exact ppm
    * (`(max*p - n)*1e6 div n`). q105 profiles hot KEYS; this profiles
    * the reducer LOADS those keys induce at each candidate width —
    * the number that says whether raising p actually flattens the
    * wave or just shards the same hot key thinner.
    *
    * ## 100 TB notes
    * One explode (×3 candidate widths) into a map-side-combined
    * (p, part) count — the shuffle carries at most p rows per
    * partition per width. The output is Σp rows regardless of data
    * size. At real scale this query IS the tuning loop's feedback.
    */
  val q287PartitionBalance: Q = Q(
    "q287_partition_balance",
    (s, dir) => {
      val h = graft.engine.ext.Text.hash32(col("user_id").cast("string"))
      val ev = Tables.load(s, dir, "events").select(h.as("h"))
      val widths = explode(array(Seq(8L, 32L, 128L).map(lit): _*)).as("p")
      val loads = ev.select(col("h"), widths)
        .select(col("p"), pmod(col("h"), col("p")).as("part"))
        .groupBy(col("p"), col("part"))
        .agg(count(lit(1)).as("rows"))
      loads.groupBy(col("p"))
        .agg(count(lit(1)).as("parts_used"), sum(col("rows")).as("n_rows"),
          max(col("rows")).as("max_rows"), min(col("rows")).as("min_rows"))
        .select(col("p"), col("parts_used"), col("n_rows"),
          col("max_rows"), col("min_rows"),
          expr("(max_rows * p - n_rows) * 1000000 div n_rows")
            .as("hot_excess_ppm"))
        .orderBy("p")
    },
    Some("""WITH e AS (SELECT
                ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT
                  AS h
              FROM events),
            w AS (SELECT unnest([8, 32, 128]) AS p),
            l AS (SELECT p, h % p AS part, count(*) AS rows
                  FROM e CROSS JOIN w GROUP BY 1, 2),
            a AS (SELECT p, count(*) AS parts_used,
                    CAST(sum(rows) AS BIGINT) AS n_rows,
                    CAST(max(rows) AS BIGINT) AS max_rows,
                    CAST(min(rows) AS BIGINT) AS min_rows
                  FROM l GROUP BY 1)
            SELECT CAST(p AS BIGINT) AS p, parts_used, n_rows, max_rows,
              min_rows,
              (max_rows * p - n_rows) * 1000000 // n_rows
                AS hot_excess_ppm
            FROM a ORDER BY p"""))

  /** Salting effectiveness, measured — q287 shows widening the
    * shuffle only shards hot keys thinner; this query closes the
    * argument by measuring what SALTING does to the same reducer-load
    * envelope at a fixed width (p = 32): the raw key layout vs the
    * salted key (`(key, hash % 16)` — q73/q115's split) side by side,
    * with the hottest reducer's excess over the perfect share in
    * exact ppm. Salting multiplies distinct keys ×16, so the
    * law-of-large-numbers flattening that more PARTITIONS cannot buy
    * (same hot keys, thinner shards) more KEYS can. The two rows are
    * the before/after of the q73 design decision.
    *
    * ## 100 TB notes
    * Same economics as q287: map-side-combined (strategy, part)
    * counts, output 2 rows. The salt hash reuses the engine-portable
    * md5 derivation so DuckDB reproduces the assignment exactly.
    */
  val q289SaltingBalance: Q = Q(
    "q289_salting_balance",
    (s, dir) => {
      val h = graft.engine.ext.Text.hash32(col("user_id").cast("string"))
      val salt = pmod(graft.engine.ext.Text.hash32(
        concat(col("event_id").cast("string"), lit(":salt"))), lit(16L))
      val ev = Tables.load(s, dir, "events")
        .select(h.as("h"), salt.as("salt"))
      val loads = ev
        .select(lit("raw").as("strategy"), pmod(col("h"), lit(32L)).as("part"))
        .unionAll(ev.select(lit("salted").as("strategy"),
          pmod(col("h") * 16 + col("salt"), lit(32L)).as("part")))
        .groupBy(col("strategy"), col("part"))
        .agg(count(lit(1)).as("rows"))
      loads.groupBy(col("strategy"))
        .agg(count(lit(1)).as("parts_used"), sum(col("rows")).as("n_rows"),
          max(col("rows")).as("max_rows"), min(col("rows")).as("min_rows"))
        .select(col("strategy"), col("parts_used"), col("n_rows"),
          col("max_rows"), col("min_rows"),
          expr("(max_rows * 32 - n_rows) * 1000000 div n_rows")
            .as("hot_excess_ppm"))
        .orderBy("strategy")
    },
    Some("""WITH e AS (SELECT
                ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT
                  AS h,
                ('0x' || substring(md5(event_id::VARCHAR || ':salt'),
                  1, 8))::BIGINT % 16 AS salt
              FROM events),
            t AS (SELECT 'raw' AS strategy, h % 32 AS part FROM e
                  UNION ALL
                  SELECT 'salted', (h * 16 + salt) % 32 FROM e),
            l AS (SELECT strategy, part, count(*) AS rows
                  FROM t GROUP BY 1, 2),
            a AS (SELECT strategy, count(*) AS parts_used,
                    CAST(sum(rows) AS BIGINT) AS n_rows,
                    CAST(max(rows) AS BIGINT) AS max_rows,
                    CAST(min(rows) AS BIGINT) AS min_rows
                  FROM l GROUP BY 1)
            SELECT strategy, parts_used, n_rows, max_rows, min_rows,
              (max_rows * 32 - n_rows) * 1000000 // n_rows
                AS hot_excess_ppm
            FROM a ORDER BY strategy"""))

  /** Quantile treatment effect — the DISTRIBUTIONAL A/B readout a
    * mean-difference test (q148) cannot give: per seeded-hash arm
    * (q188's assignment), the exact discrete deciles of purchase
    * cents and their per-decile difference. A treatment that moves
    * the tail but not the median shows a flat diff at d5 and a wide
    * one at d9 — invisible to the mean. Deciles come from the
    * histogram-cumulative walk (per-(arm, cents) counts, per-arm
    * cumulative over DISTINCT values only), and the decile election
    * is the exact integer predicate `cum * 10 >= n * k` — the q175
    * discipline, no percentile_disc engine-semantics roulette.
    *
    * ## 100 TB notes
    * One shuffle to the (arm, cents) histogram with map-side
    * partials; the per-arm window walks distinct values only; the
    * decile election crosses the histogram with a broadcast 9-row
    * dimension. Output is 9 rows at any scale.
    */
  val q288QteDeciles: Q = Q(
    "q288_qte_deciles",
    (s, dir) => {
      val arm = pmod(graft.engine.ext.Text.hash32(
        concat(col("user_id").cast("string"), lit(":ab1"))), lit(2L))
      val pur = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(arm.as("arm"),
          floor(col("value") * 100).cast("long").as("cents"))
      val hist = pur.groupBy(col("arm"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val byArm = Window.partitionBy(col("arm"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          byArm.orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byArm))
      val ks = s.range(1, 10).select(col("id").as("k"))
      cum.crossJoin(broadcast(ks))
        .filter(col("cum") * 10 >= col("n") * col("k"))
        .groupBy(col("k"))
        .agg(min(when(col("arm") === 0, col("cents"))).as("d_control"),
          min(when(col("arm") === 1, col("cents"))).as("d_treat"))
        .select(col("k"), col("d_control"), col("d_treat"),
          (col("d_treat") - col("d_control")).as("qte_cents"))
        .orderBy("k")
    },
    Some("""WITH p AS (SELECT
                ('0x' || substring(md5(user_id::VARCHAR || ':ab1'), 1, 8))
                  ::BIGINT % 2 AS arm,
                CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            h AS (SELECT arm, cents, count(*) AS c FROM p GROUP BY 1, 2),
            cum AS (SELECT arm, cents,
                      sum(c) OVER (PARTITION BY arm ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      sum(c) OVER (PARTITION BY arm) AS n
                    FROM h),
            ks AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k)
            SELECT CAST(k AS BIGINT) AS k,
              min(CASE WHEN arm = 0 THEN cents END) AS d_control,
              min(CASE WHEN arm = 1 THEN cents END) AS d_treat,
              min(CASE WHEN arm = 1 THEN cents END)
                - min(CASE WHEN arm = 0 THEN cents END) AS qte_cents
            FROM cum CROSS JOIN ks
            WHERE cum * 10 >= n * k
            GROUP BY k ORDER BY k"""))

  /** Metronome ranking — the timing-regularity bot signal: humans
    * produce ragged inter-event gaps, schedulers produce constant
    * ones, so the per-user gap SPREAD (`(max-min)*1e6 div max`, exact
    * ppm — 0 means perfectly periodic) ranks accounts by
    * machine-likeness. The top-20 most regular senders with at least
    * 5 gaps is the triage list an abuse pipeline reviews first; gap
    * stats ride along (n, min/max µs). All exact integer µs
    * arithmetic — no variance estimate needed, the min/max envelope
    * IS the periodicity test (a metronome's min equals its max).
    *
    * ## 100 TB notes
    * Gaps are a lag window PARTITIONED BY user (bounded state); the
    * rollup is map-side combined; the top-20 is
    * TakeOrderedAndProject (per-partition heap, no global sort
    * materialization). The total order (spread, user) makes the cut
    * deterministic.
    */
  val q286MetronomeRank: Q = Q(
    "q286_metronome_rank",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), tsUs.as("us"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val gaps = ev
        .withColumn("prev", lag(col("us"), 1).over(byUser))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), (col("us") - col("prev")).as("gap"))
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap")).as("min_gap_us"),
          max(col("gap")).as("max_gap_us"))
        .filter(col("n_gaps") >= 5 && col("max_gap_us") > 0)
        .select(col("user_id"), col("n_gaps"), col("min_gap_us"),
          col("max_gap_us"),
          expr("(max_gap_us - min_gap_us) * 1000000 div max_gap_us")
            .as("spread_ppm"))
        .orderBy(col("spread_ppm").asc, col("user_id").asc)
        .limit(20)
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, ${duckUs("ts")} AS us
                 FROM events),
            g AS (SELECT user_id,
                    us - lag(us) OVER (PARTITION BY user_id
                      ORDER BY us ASC, event_id ASC) AS gap
                  FROM e),
            a AS (SELECT user_id, count(*) AS n_gaps,
                    min(gap) AS min_gap_us, max(gap) AS max_gap_us
                  FROM g WHERE gap IS NOT NULL GROUP BY 1)
            SELECT user_id, n_gaps, min_gap_us, max_gap_us,
              (max_gap_us - min_gap_us) * 1000000 // max_gap_us
                AS spread_ppm
            FROM a WHERE n_gaps >= 5 AND max_gap_us > 0
            ORDER BY spread_ppm ASC, user_id ASC LIMIT 20"""))

  /** Run-length profile per layout — the COMPRESSION side of the
    * clustering trade q267 prices for pruning: within each file, in
    * the layout's physical sort order, how many value RUNS do the two
    * key columns carry? Parquet's RLE cost is proportional to runs,
    * so `runs * 1e6 div rows` (exact ppm; lower = fewer, longer runs)
    * is the encoded-size proxy per column per layout. The fixture
    * measures the real trade: lexicographic is PERFECT on x (one
    * value per file, runs_x = n_files = 32) and ndv-bound on y
    * (runs_y 960); Morton order pays 30× on x (runs_x 960) but
    * HALVES y's runs (464) — the curve keeps both keys locally
    * coherent instead of one perfectly. So z-order buys
    * two-dimensional pruning (q267) at a one-sided compression cost,
    * not a total one. Reading both tables is the actual OPTIMIZE
    * decision.
    *
    * ## 100 TB notes
    * One pass; the run detection is a `lag` window PARTITIONED BY
    * (layout, file) in the file's sort order — per-file state only,
    * exactly the writer's own encoding pass. The rollup to 2 rows is
    * map-side combined. The Morton code is the native
    * [[graft.functions.MortonCode]]; the oracle keeps per-bit
    * arithmetic (the q267 cross-engine equality discipline).
    */
  val q282RleProfile: Q = Q(
    "q282_rle_profile",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("user_id % 32").as("x"),
          expr("(ts div 86400000000000) % 32").as("y"))
      val keyed = ev.select(col("event_id"), col("x"), col("y"),
        graft.functions.GraftFunctions.mortonCode(col("x"), col("y"))
          .as("zv"))
      val tagged = keyed
        .select(lit("linear").as("layout"), (col("x") * 32 + col("y"))
            .as("sk"), col("event_id"), col("x"), col("y"))
        .unionAll(keyed.select(lit("zorder").as("layout"),
          col("zv").as("sk"), col("event_id"), col("x"), col("y")))
        .withColumn("file_id", expr("sk div 32"))
      val inFile = Window.partitionBy(col("layout"), col("file_id"))
        .orderBy(col("sk").asc, col("event_id").asc)
      val runs = tagged
        .withColumn("px", lag(col("x"), 1).over(inFile))
        .withColumn("py", lag(col("y"), 1).over(inFile))
        .withColumn("rx", when(col("px").isNull ||
          col("px") =!= col("x"), 1L).otherwise(0L))
        .withColumn("ry", when(col("py").isNull ||
          col("py") =!= col("y"), 1L).otherwise(0L))
      runs.groupBy(col("layout"))
        .agg(count_distinct(col("file_id")).as("n_files"),
          count(lit(1)).as("n_rows"),
          sum(col("rx")).as("runs_x"), sum(col("ry")).as("runs_y"))
        .select(col("layout"), col("n_files"), col("n_rows"),
          col("runs_x"), col("runs_y"),
          expr("runs_x * 1000000 div n_rows").as("rle_x_ppm"),
          expr("runs_y * 1000000 div n_rows").as("rle_y_ppm"))
        .orderBy("layout")
    },
    Some {
      val morton = (0 until 5).map { i =>
        val p = 1L << i; val zx = 1L << (2 * i); val zy = 1L << (2 * i + 1)
        s"((x // $p) % 2) * $zx + ((y // $p) % 2) * $zy"
      }.mkString(" + ")
      s"""WITH ev AS (SELECT event_id, user_id % 32 AS x,
                (${duckUs("ts")} // 86400000000) % 32 AS y
              FROM events),
            keyed AS (SELECT event_id, x, y, $morton AS zv FROM ev),
            tagged AS (
              SELECT 'linear' AS layout, x * 32 + y AS sk, event_id, x, y
              FROM keyed
              UNION ALL
              SELECT 'zorder' AS layout, zv AS sk, event_id, x, y
              FROM keyed),
            runs AS (SELECT layout, sk // 32 AS file_id, x, y,
                       lag(x) OVER (PARTITION BY layout, sk // 32
                         ORDER BY sk ASC, event_id ASC) AS px,
                       lag(y) OVER (PARTITION BY layout, sk // 32
                         ORDER BY sk ASC, event_id ASC) AS py
                     FROM tagged)
            SELECT layout, count(DISTINCT file_id) AS n_files,
              count(*) AS n_rows,
              CAST(sum(CASE WHEN px IS NULL OR px <> x THEN 1 ELSE 0 END)
                AS BIGINT) AS runs_x,
              CAST(sum(CASE WHEN py IS NULL OR py <> y THEN 1 ELSE 0 END)
                AS BIGINT) AS runs_y,
              CAST(sum(CASE WHEN px IS NULL OR px <> x THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000 // count(*) AS rle_x_ppm,
              CAST(sum(CASE WHEN py IS NULL OR py <> y THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000 // count(*) AS rle_y_ppm
            FROM runs GROUP BY layout ORDER BY layout"""
    })

  /** Count–min sketch heavy hitters, expressed as dataflow: the sketch
    * is a (depth x width) counter table built by one explode + group-by
    * (map-side partial agg collapses the exploded stream to at most
    * depth x width rows per partition), estimates are `min` over the
    * depth rows after a broadcast join of the candidate keys against the
    * counter table. Carter–Wegman row hashes `((a_i k + b_i) mod p) mod w`
    * are pure int64 arithmetic, so DuckDB rebuilds the IDENTICAL sketch
    * and the estimates hash-match exactly — the oracle checks the real
    * CMS values, not just the error bound (the bound, est <= exact +
    * 2N/w, is also emitted and must hold by construction).
    *
    * ## 100 TB notes
    * The sketch table is depth x width rows REGARDLESS of input size —
    * that is the whole point of the sketch: the only full-data pass is
    * the explode + partial agg, which shuffles at most
    * depth x width x partitions pre-combined rows. Width is deliberately
    * small here (64) so collisions actually occur at test SF and the
    * `overcount` column is exercised above zero.
    */
  val q120CmsHeavyHitters: Q = Q(
    "q120_cms_heavy_hitters",
    (s, dir) => {
      val depth = 4L
      val width = 64L
      val prime = 2147483647L // 2^31 - 1
      def bucket(k: Column, i: Column): Column =
        (k * (i * 1000003L + 1L) + (i * 999983L + 12345L)) % prime % width
      val ev = Tables.load(s, dir, "events").select(col("user_id"))
      val sketch = ev
        .select(col("user_id"),
          explode(sequence(lit(0L), lit(depth - 1))).as("i"))
        .groupBy(col("i"), bucket(col("user_id"), col("i")).as("bucket"))
        .agg(count(lit(1)).as("c"))
      val total = ev.agg(count(lit(1)).as("n")) // 1 row
      val top = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("user_id").asc)
        .limit(10)
      val counters = sketch
        .select(col("i").as("sk_i"), col("bucket"), col("c"))
      top
        .select(col("user_id"), col("exact_cnt"),
          explode(sequence(lit(0L), lit(depth - 1))).as("i"))
        .join(broadcast(counters),
          col("i") === col("sk_i") &&
            bucket(col("user_id"), col("i")) === col("bucket"))
        .groupBy(col("user_id"), col("exact_cnt"))
        .agg(min(col("c")).as("cms_est"))
        .crossJoin(broadcast(total))
        .select(col("user_id"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).as("overcount"),
          (col("cms_est") <= col("exact_cnt") + expr("2 * n div 64"))
            .as("within_bound"))
        .orderBy(col("exact_cnt").desc, col("user_id").asc)
    },
    Some("""WITH ev AS (SELECT user_id FROM events),
            hh AS (SELECT unnest(generate_series(0, 3)) AS i),
            sk AS (SELECT i,
                     (user_id * (i * 1000003 + 1) + (i * 999983 + 12345))
                       % 2147483647 % 64 AS bucket,
                     count(*) AS c
                   FROM ev CROSS JOIN hh GROUP BY 1, 2),
            tot AS (SELECT count(*) AS n FROM ev),
            top AS (SELECT user_id, count(*) AS exact_cnt FROM ev
                    GROUP BY 1 ORDER BY exact_cnt DESC, user_id LIMIT 10),
            est AS (SELECT t.user_id, t.exact_cnt, min(sk.c) AS cms_est
                    FROM top t CROSS JOIN hh
                    JOIN sk ON sk.i = hh.i AND sk.bucket =
                      (t.user_id * (hh.i * 1000003 + 1)
                        + (hh.i * 999983 + 12345)) % 2147483647 % 64
                    GROUP BY 1, 2)
            SELECT user_id, exact_cnt, cms_est,
              cms_est - exact_cnt AS overcount,
              cms_est <= exact_cnt + 2 * tot.n // 64 AS within_bound
            FROM est CROSS JOIN tot
            ORDER BY exact_cnt DESC, user_id"""))

  /** First-order Markov transition matrix over per-user event sequences:
    * `lead()` pairs each event with the user's next event (ties broken
    * by event_id so the sequence is a total order), transition counts
    * are a plain group-by, and row-normalized probabilities come from a
    * window sum over the source state. The per-user ordering shuffles
    * once on user_id; the (src, dst) aggregate operates on the
    * |types|^2-sized key space with map-side partial agg, and the
    * normalizing window runs over that tiny aggregated frame, not the
    * event stream. `prob` is a single IEEE division of two exact longs
    * (Catalog determinism contract — no rounding applied).
    */
  val q122MarkovTransitions: Q = Q(
    "q122_markov_transitions",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
          col("event_id"))
      val seqW = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val trans = ev
        .withColumn("dst", lead(col("event_type"), 1).over(seqW))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      trans
        .withColumn("src_total",
          sum(col("cnt")).over(Window.partitionBy("src")))
        .select(col("src"), col("dst"), col("cnt"),
          (col("cnt").cast("double") / col("src_total").cast("double"))
            .as("prob"))
        .orderBy("src", "dst")
    },
    Some(s"""WITH e AS (SELECT user_id, event_type, event_id,
                          ${duckUs("ts")} AS ts_us FROM events),
             p AS (SELECT event_type AS src,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS dst
                   FROM e),
             c AS (SELECT src, dst, count(*) AS cnt FROM p
                   WHERE dst IS NOT NULL GROUP BY 1, 2)
             SELECT src, dst, cnt,
               CAST(cnt AS DOUBLE)
                 / CAST(sum(cnt) OVER (PARTITION BY src) AS DOUBLE) AS prob
             FROM c ORDER BY src, dst"""))

  /** Rolling 7-day distinct users per day — the retention/reach metric
    * that CANNOT be a window function (distinct-count is not
    * decomposable over sliding frames). The scalable shape: dedup to
    * (day, user) FIRST (the only event-sized shuffle), then explode each
    * distinct pair into the <= 7 report days it contributes to and
    * count-distinct per report day — the explosion multiplies the
    * already-deduplicated frame, not the raw stream, and the final agg
    * keys on ~|days| groups. Day index is pure integer division of
    * epoch-µs (never a date function — fixture ts is ns-BIGINT).
    */
  val q123RollingDistinct: Q = Q(
    "q123_rolling_distinct",
    (s, dir) => {
      val du = Tables.load(s, dir, "events")
        // exact integer day index — `div`, never `/` (double division
        // rounds before the truncating cast and can bump a boundary)
        .select(expr("(ts div 1000) div 86400000000").as("day_idx"),
          col("user_id"))
        .distinct()
      val daily = du.groupBy("day_idx")
        .agg(count(lit(1)).as("users_today"))
      val rolling = du
        .select(explode(sequence(col("day_idx"), col("day_idx") + 6))
          .as("report_day"), col("user_id"))
        .groupBy("report_day")
        .agg(count_distinct(col("user_id")).as("users_7d"))
      daily
        .join(rolling, daily("day_idx") === rolling("report_day"))
        .select(col("day_idx"), col("users_today"), col("users_7d"))
        .orderBy("day_idx")
    },
    Some(s"""WITH du AS (SELECT DISTINCT
                    ${duckUs("ts")} // 86400000000 AS day_idx, user_id
                  FROM events),
             d AS (SELECT day_idx, count(*) AS users_today FROM du
                   GROUP BY 1),
             w AS (SELECT day_idx + g AS report_day, user_id
                   FROM du CROSS JOIN
                     (SELECT unnest(generate_series(0, 6)) AS g)),
             r AS (SELECT report_day, count(DISTINCT user_id) AS users_7d
                   FROM w GROUP BY 1)
             SELECT d.day_idx, d.users_today, r.users_7d
             FROM d JOIN r ON r.report_day = d.day_idx
             ORDER BY day_idx"""))

  /** Per-user behavioral diversity as GINI IMPURITY
    * `1 - Σ (c_i/n)² = (n² - Σ c_i²) / n²` — the diversity score that,
    * unlike Shannon entropy, needs no transcendental function: the
    * numerator and denominator are exact int64 arithmetic on both
    * engines and only the final division is floating point (`ln` differs
    * across libm implementations at the ulp level; Gini is the
    * determinism-contract-safe diversity measure). Two hash aggregates —
    * (user, type) then user — both map-side combined; no window, no
    * explode.
    */
  val q127GiniDiversity: Q = Q(
    "q127_gini_diversity",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).as("n_events"),
          sum(col("c") * col("c")).as("ss"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          ((col("n_events") * col("n_events") - col("ss")).cast("double")
            / (col("n_events") * col("n_events")).cast("double"))
            .as("gini"))
        .orderBy("user_id")
    },
    Some("""WITH pc AS (SELECT user_id, event_type, count(*) AS c
                        FROM events GROUP BY 1, 2),
            u AS (SELECT user_id, count(*) AS n_types,
                    CAST(sum(c) AS BIGINT) AS n_events,
                    CAST(sum(c * c) AS BIGINT) AS ss
                  FROM pc GROUP BY 1)
            SELECT user_id, n_events, n_types,
              CAST(n_events * n_events - ss AS DOUBLE)
                / CAST(n_events * n_events AS DOUBLE) AS gini
            FROM u ORDER BY user_id"""))

  /** Chi-square contingency cells: event_type x user-cohort observed
    * counts with expected counts and per-cell χ² contributions — the
    * independence diagnostic behind drift detection and stratification
    * checks. The contingency table is |types| x |cohorts| rows, so the
    * marginal windows run over the AGGREGATED frame; the only
    * event-sized work is the first hash aggregate. The global χ² is
    * deliberately NOT emitted: it is a sum of doubles whose accumulation
    * order Spark does not fix — per-cell contributions (an identical
    * 4-op IEEE chain on exact-int inputs on both engines) are the
    * deterministic surface, and any consumer can fold them.
    */
  val q128Chi2Cells: Q = Q(
    "q128_chi2_cells",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(4)).as("cohort"))
      val cells = ev.groupBy(col("event_type"), col("cohort"))
        .agg(count(lit(1)).as("obs"))
      val total = ev.agg(count(lit(1)).as("n")) // 1 row
      cells
        .withColumn("row_tot",
          sum(col("obs")).over(Window.partitionBy("event_type")))
        .withColumn("col_tot",
          sum(col("obs")).over(Window.partitionBy("cohort")))
        .crossJoin(broadcast(total))
        // exp/contrib: exact int64 inputs, fixed IEEE op chain
        .withColumn("expected",
          (col("row_tot") * col("col_tot")).cast("double")
            / col("n").cast("double"))
        .select(col("event_type"), col("cohort"), col("obs"),
          col("expected"),
          ((col("obs").cast("double") - col("expected"))
            * (col("obs").cast("double") - col("expected"))
            / col("expected")).as("contrib"))
        .orderBy("event_type", "cohort")
    },
    Some("""WITH ev AS (SELECT event_type, user_id % 4 AS cohort
                        FROM events),
            cells AS (SELECT event_type, cohort, count(*) AS obs
                      FROM ev GROUP BY 1, 2),
            tot AS (SELECT count(*) AS n FROM ev),
            m AS (SELECT event_type, cohort, obs,
                    CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT)
                      AS row_tot,
                    CAST(sum(obs) OVER (PARTITION BY cohort) AS BIGINT)
                      AS col_tot
                  FROM cells),
            e AS (SELECT event_type, cohort, obs,
                    CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE)
                      AS expected
                  FROM m CROSS JOIN tot)
            SELECT event_type, cohort, obs, expected,
              (CAST(obs AS DOUBLE) - expected)
                * (CAST(obs AS DOUBLE) - expected) / expected AS contrib
            FROM e ORDER BY event_type, cohort"""))

  /** First-touch attribution: each purchase is credited to the user's
    * EARLIEST click inside the preceding 24-hour lookback — the third
    * point of the as-of family (q37 takes the latest-before, q50 the
    * next-after; attribution wants the first-in-window, which a plain
    * as-of cannot express). One equi-join on user_id with the time-range
    * residual, then `row_number` per purchase ordered (click_ts,
    * click_id) so ties are total-ordered. Unattributed purchases are
    * kept with nulls (LEFT join semantics via the rn=1-or-no-match
    * filter).
    *
    * ## 100 TB notes
    * The join shuffles both sides once on user_id; the 24 h bound caps
    * the per-purchase candidate set, and the window reuses the join's
    * partitioning (user_id is a prefix of the purchase key). Same
    * single-exchange shape as q37's union-trick as-of.
    */
  val q131FirstTouch: Q = Q(
    "q131_first_touch",
    (s, dir) => {
      val lookbackUs = 24L * 3600 * 1000000
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          tsUs.as("ts_us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pur_id"), col("user_id"),
          col("ts_us").as("pur_ts_us"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("clk_id"),
          col("user_id").as("clk_user"), col("ts_us").as("clk_ts_us"))
      val joined = pur.join(clk,
        col("user_id") === col("clk_user") &&
          col("clk_ts_us") >= col("pur_ts_us") - lookbackUs &&
          col("clk_ts_us") <= col("pur_ts_us"),
        "left")
      val firstW = Window.partitionBy("pur_id")
        .orderBy(col("clk_ts_us").asc_nulls_last, col("clk_id").asc_nulls_last)
      joined
        .withColumn("rn", row_number().over(firstW))
        .filter(col("rn") === 1)
        .select(col("pur_id"), col("user_id"), col("pur_ts_us"),
          col("clk_id"), col("clk_ts_us"),
          (col("pur_ts_us") - col("clk_ts_us")).as("latency_us"))
        .orderBy("pur_id")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
                           ${duckUs("ts")} AS ts_us FROM events),
             p AS (SELECT event_id AS pur_id, user_id, ts_us AS pur_ts_us
                   FROM ev WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS clk_id, user_id AS clk_user,
                     ts_us AS clk_ts_us
                   FROM ev WHERE event_type = 'click'),
             j AS (SELECT p.*, c.clk_id, c.clk_ts_us,
                     row_number() OVER (PARTITION BY pur_id
                       ORDER BY clk_ts_us ASC NULLS LAST,
                                clk_id ASC NULLS LAST) AS rn
                   FROM p LEFT JOIN c
                     ON p.user_id = c.clk_user
                     AND c.clk_ts_us >= p.pur_ts_us - 86400000000
                     AND c.clk_ts_us <= p.pur_ts_us)
             SELECT pur_id, user_id, pur_ts_us, clk_id, clk_ts_us,
               pur_ts_us - clk_ts_us AS latency_us
             FROM j WHERE rn = 1 ORDER BY pur_id"""))

  /** Dwell time by state: how long users sit in each event type before
    * their next event — `lead` inter-arrival deltas grouped by the state
    * being LEFT. Mean dwell is one IEEE division of the exact-µs bigint
    * sum by the transition count (never an avg() of doubles, whose
    * accumulation order floats). Same single-shuffle window shape as
    * q122's transitions; the final aggregate keys on |types| groups.
    */
  val q132DwellTime: Q = Q(
    "q132_dwell_time",
    (s, dir) => {
      val seqW = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
          col("event_id"))
        .withColumn("next_ts_us", lead(col("ts_us"), 1).over(seqW))
        .filter(col("next_ts_us").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(col("next_ts_us") - col("ts_us")).as("total_dwell_us"),
          max(col("next_ts_us") - col("ts_us")).as("max_dwell_us"))
        .select(col("event_type"), col("n_transitions"),
          col("total_dwell_us"), col("max_dwell_us"),
          (col("total_dwell_us").cast("double")
            / col("n_transitions").cast("double")).as("mean_dwell_us"))
        .orderBy("event_type")
    },
    Some(s"""WITH e AS (SELECT user_id, event_type, event_id,
                          ${duckUs("ts")} AS ts_us FROM events),
             d AS (SELECT event_type,
                     lead(ts_us) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) - ts_us AS dwell_us
                   FROM e)
             SELECT event_type, count(*) AS n_transitions,
               CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
               max(dwell_us) AS max_dwell_us,
               CAST(sum(dwell_us) AS DOUBLE) / count(*) AS mean_dwell_us
             FROM d WHERE dwell_us IS NOT NULL
             GROUP BY event_type ORDER BY event_type"""))

  /** Distribution drift between the month's two halves as TOTAL
    * VARIATION distance — the drift metric that needs no logarithm
    * (PSI/KL/JS all do, and libm ln() is not pinned across engines):
    * TV = ½ Σ_i |p_i − q_i|, computed per event type by exact integer
    * cross-multiplication `|c1·n2 − c2·n1|` and ONE closing division by
    * `2·n1·n2`. Emits the per-type absolute-difference terms plus the
    * one-row drift summary a monitoring pipeline thresholds on. Two hash
    * aggregates over |types| x 2 cells; the halves split on the exact
    * µs midpoint of the observed range (broadcast 1-row bounds).
    */
  val q140TvDrift: Q = Q(
    "q140_tv_drift",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), tsUs.as("ts_us"))
      val bounds = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
      val cells = ev.crossJoin(broadcast(bounds))
        .select(col("event_type"),
          (col("ts_us") <= expr("lo + (hi - lo) div 2")).as("first_half"))
        .groupBy(col("event_type"))
        .agg(count(when(col("first_half"), 1)).as("c1"),
          count(when(!col("first_half"), 1)).as("c2"))
      val totals = cells.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      cells.crossJoin(broadcast(totals))
        .select(col("event_type"), col("c1"), col("c2"),
          abs(col("c1") * col("n2") - col("c2") * col("n1")).as("cross_abs"),
          (abs(col("c1") * col("n2") - col("c2") * col("n1")).cast("double")
            / (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
            .as("tv_term"))
        .orderBy("event_type")
    },
    Some(s"""WITH ev AS (SELECT event_type, ${duckUs("ts")} AS ts_us
                         FROM events),
             b AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM ev),
             cells AS (SELECT event_type,
                         count(CASE WHEN ts_us <= lo + (hi - lo) // 2
                                    THEN 1 END) AS c1,
                         count(CASE WHEN ts_us > lo + (hi - lo) // 2
                                    THEN 1 END) AS c2
                       FROM ev CROSS JOIN b GROUP BY event_type),
             t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                          CAST(sum(c2) AS BIGINT) AS n2 FROM cells)
             SELECT event_type, c1, c2,
               abs(c1 * n2 - c2 * n1) AS cross_abs,
               CAST(abs(c1 * n2 - c2 * n1) AS DOUBLE)
                 / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS tv_term
             FROM cells CROSS JOIN t ORDER BY event_type"""))

  /** Mergeable HLL sketches across rolling windows — WHY sketches earn
    * their keep at 100 TB: per-day HLL sketches of the user set are
    * built once (`hll_sketch_agg`) and the 7-day rolling distinct is a
    * UNION OF SKETCHES (`hll_union_agg`), never a re-scan of the raw
    * events — q123 computes the same rolling metric exactly by
    * re-aggregating every window. DuckDB cannot rebuild Apache
    * DataSketches, so the oracle is the q54 pattern: the exact rolling
    * count (q123's dedup-then-explode shape) plus a hash-stable
    * `within_bounds` check of the estimate against the sketch's
    * documented error at lgK=12 (3 x 1.04/√2^12 ≈ 4.9 %).
    */
  val q141HllUnion: Q = Q(
    "q141_hll_union",
    (s, dir) => {
      val du = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 86400000000").as("day_idx"),
          col("user_id"))
      // one sketch per day (the reusable partial state)
      val daily = du.groupBy("day_idx")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      // roll each day's sketch into the <= 7 windows it serves, then
      // merge per window — sketch union, not data re-aggregation
      val rolled = daily
        .select(explode(sequence(col("day_idx"), col("day_idx") + 6))
          .as("report_day"), col("sk"))
        .groupBy("report_day")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("approx_7d"))
      val exact = du
        .select(explode(sequence(col("day_idx"), col("day_idx") + 6))
          .as("report_day"), col("user_id"))
        .groupBy("report_day")
        .agg(count_distinct(col("user_id")).as("exact_7d"))
      exact.join(rolled, Seq("report_day"))
        .join(daily.select(col("day_idx").as("report_day")), Seq("report_day"),
          "left_semi") // only days that exist in the data
        .select(col("report_day"), col("exact_7d"),
          (abs(col("approx_7d") - col("exact_7d").cast("double"))
            <= col("exact_7d").cast("double") * 0.049 + 1.0)
            .as("within_bounds"))
        .orderBy("report_day")
    },
    Some(s"""WITH du AS (SELECT DISTINCT
                    ${duckUs("ts")} // 86400000000 AS day_idx, user_id
                  FROM events),
             w AS (SELECT day_idx + g AS report_day, user_id
                   FROM du CROSS JOIN
                     (SELECT unnest(generate_series(0, 6)) AS g)),
             r AS (SELECT report_day, count(DISTINCT user_id) AS exact_7d
                   FROM w GROUP BY 1)
             SELECT report_day, exact_7d, true AS within_bounds
             FROM r WHERE report_day IN (SELECT day_idx FROM du)
             ORDER BY report_day"""))

  /** Market-basket association rules over (user, day) baskets:
    * support, confidence and lift for ordered event-type pairs that
    * co-occur in a basket — q93's bigram lift is SEQUENTIAL (adjacent
    * tokens); this is the set-co-occurrence form recommendation and
    * affinity pipelines use. Baskets dedup first (the only event-sized
    * shuffle); the pair join runs inside each basket key over <= |types|
    * rows; confidence is one exact-int division, lift one fixed IEEE
    * chain of exact ints (n·c_ab / (c_a·c_b) — cross-multiplied before
    * any division so both engines divide identical integers).
    */
  val q142AssocRules: Q = Q(
    "q142_assoc_rules",
    (s, dir) => {
      val basket = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("(ts div 1000) div 86400000000")
          .as("day_idx"), col("event_type"))
        .distinct()
      val items = basket.groupBy(col("event_type"))
        .agg(count(lit(1)).as("c_item"))
      val pairs = basket.as("a")
        .join(basket.as("b"), Seq("user_id", "day_idx"))
        .filter(col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("lhs"),
          col("b.event_type").as("rhs"))
        .agg(count(lit(1)).as("c_pair"))
      val n = basket.select(col("user_id"), col("day_idx")).distinct()
        .agg(count(lit(1)).as("n_baskets")) // 1 row
      pairs
        .join(broadcast(items.select(col("event_type").as("lhs"),
          col("c_item").as("c_lhs"))), Seq("lhs"))
        .join(broadcast(items.select(col("event_type").as("rhs"),
          col("c_item").as("c_rhs"))), Seq("rhs"))
        .crossJoin(broadcast(n))
        .filter(col("c_pair") >= 20)
        .select(col("lhs"), col("rhs"), col("c_pair"),
          (col("c_pair").cast("double") / col("c_lhs").cast("double"))
            .as("confidence"),
          ((col("n_baskets") * col("c_pair")).cast("double")
            / (col("c_lhs") * col("c_rhs")).cast("double")).as("lift"))
        .orderBy("lhs", "rhs")
    },
    Some(s"""WITH b AS (SELECT DISTINCT user_id,
                    ${duckUs("ts")} // 86400000000 AS day_idx, event_type
                  FROM events),
             it AS (SELECT event_type, count(*) AS c_item FROM b
                    GROUP BY 1),
             p AS (SELECT a.event_type AS lhs, x.event_type AS rhs,
                     count(*) AS c_pair
                   FROM b a JOIN b x
                     ON a.user_id = x.user_id AND a.day_idx = x.day_idx
                     AND a.event_type != x.event_type
                   GROUP BY 1, 2),
             n AS (SELECT count(*) AS n_baskets
                   FROM (SELECT DISTINCT user_id, day_idx FROM b))
             SELECT lhs, rhs, c_pair,
               CAST(c_pair AS DOUBLE) / CAST(l.c_item AS DOUBLE)
                 AS confidence,
               CAST(n_baskets * c_pair AS DOUBLE)
                 / CAST(l.c_item * r.c_item AS DOUBLE) AS lift
             FROM p
             JOIN it l ON l.event_type = lhs
             JOIN it r ON r.event_type = rhs
             CROSS JOIN n
             WHERE c_pair >= 20
             ORDER BY lhs, rhs"""))

  /** CUSUM change-point detection over the daily revenue-cents series,
    * per event type: the candidate change point maximizes
    * `|n·S_k − k·S_n|` (the cross-multiplied form of |cusum deviation|,
    * EXACT int64 — no mean, no division until the final reported
    * statistic). The series is the |days|-row aggregate, so the running
    * sums and the argmax rank are windows over a dim-sized frame; the
    * only event-sized work is the daily cents aggregate.
    */
  val q143CusumChangepoint: Q = Q(
    "q143_cusum_changepoint",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .select(col("event_type"), expr("(ts div 1000) div 86400000000")
          .as("day_idx"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg(sum(col("cents")).as("day_cents"))
      val byType = Window.partitionBy("event_type")
      val series = daily
        .withColumn("k", row_number().over(byType.orderBy("day_idx")))
        .withColumn("s_k", sum(col("day_cents")).over(
          byType.orderBy("day_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(byType))
        .withColumn("s_n", sum(col("day_cents")).over(byType))
        .withColumn("stat",
          abs(col("n") * col("s_k") - col("k") * col("s_n")))
      series
        .withColumn("rk", row_number().over(
          byType.orderBy(col("stat").desc, col("day_idx").asc)))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("day_idx").as("change_day"),
          col("stat").as("cusum_stat"),
          (col("stat").cast("double")
            / (col("n") * col("n")).cast("double")).as("mean_shift_cents"))
        .orderBy("event_type")
    },
    Some(s"""WITH d AS (SELECT event_type,
                    ${duckUs("ts")} // 86400000000 AS day_idx,
                    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                      AS day_cents
                  FROM events GROUP BY 1, 2),
             ser AS (SELECT event_type, day_idx,
                       row_number() OVER w AS k,
                       CAST(sum(day_cents) OVER (PARTITION BY event_type
                         ORDER BY day_idx ROWS UNBOUNDED PRECEDING)
                         AS BIGINT) AS s_k,
                       CAST(count(*) OVER (PARTITION BY event_type)
                         AS BIGINT) AS n,
                       CAST(sum(day_cents) OVER (PARTITION BY event_type)
                         AS BIGINT) AS s_n
                     FROM d
                     WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)),
             st AS (SELECT *, abs(n * s_k - k * s_n) AS stat,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY abs(n * s_k - k * s_n) DESC, day_idx ASC)
                        AS rk
                    FROM ser)
             SELECT event_type, day_idx AS change_day, stat AS cusum_stat,
               CAST(stat AS DOUBLE) / CAST(n * n AS DOUBLE)
                 AS mean_shift_cents
             FROM st WHERE rk = 1 ORDER BY event_type"""))

  /** Kaplan–Meier survival over signup→purchase conversion latency,
    * with right-censoring at the user's last observed event — the
    * time-to-event analysis behind activation funnels. The survival
    * curve is a CUMULATIVE PRODUCT, which neither engine offers as a
    * deterministic window: both sides fold the per-death-time factors
    * `(n_i − d_i)/n_i` over an explicitly ORDERED list (Spark
    * `aggregate(slice(sorted, 1, k), 1.0, *)`, DuckDB
    * `list_reduce(fl[1:k], *)`) — the leading 1.0·f₁ is exact in IEEE,
    * so the two fold chains are identical multiply-for-multiply.
    *
    * ## 100 TB notes
    * All per-user reductions shuffle once on user_id; the death-time
    * table is at most |users| rows, so the at-risk reverse-cumulative
    * window and the fold list are dim-sized (the q129 single-partition
    * exemption). Nothing event-sized survives past the first aggregate.
    */
  val q144SurvivalKm: Q = Q(
    "q144_survival_km",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts_us")).as("t0"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .join(signup, "user_id").filter(col("ts_us") >= col("t0"))
        .groupBy("user_id").agg(min(col("ts_us")).as("tp"))
      val last = ev.groupBy("user_id").agg(max(col("ts_us")).as("t_last"))
      val dur = signup.join(last, "user_id")
        .join(purchase, Seq("user_id"), "left")
        .select(
          (coalesce(col("tp"), col("t_last")) - col("t0")).as("dur_us"),
          col("tp").isNotNull.as("event"))
      val hist = dur.groupBy(col("dur_us"))
        .agg(count(when(col("event"), 1)).as("d"), count(lit(1)).as("m"))
      val byT = Window.orderBy("dur_us") // dim-sized series
      val deaths = hist
        .withColumn("n_i", sum(col("m")).over(
          byT.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .filter(col("d") > 0)
        .withColumn("factor",
          (col("n_i") - col("d")).cast("double") / col("n_i").cast("double"))
      val factors = deaths.agg(
        array_sort(collect_list(struct(col("dur_us"), col("factor"))))
          .as("fs")) // 1 row, ordered by dur_us
      deaths.crossJoin(broadcast(factors))
        .withColumn("k", row_number().over(byT))
        .select(col("dur_us").as("t_us"), col("d").as("d_i"), col("n_i"),
          aggregate(
            slice(transform(col("fs"), x => x.getField("factor")),
              lit(1), col("k")),
            lit(1.0), (acc, f) => acc * f).as("survival"))
        .orderBy("t_us")
    },
    Some(s"""WITH e AS (SELECT user_id, event_type,
                          ${duckUs("ts")} AS ts_us FROM events),
             su AS (SELECT user_id, min(ts_us) AS t0 FROM e
                    WHERE event_type = 'signup' GROUP BY 1),
             pu AS (SELECT e.user_id, min(ts_us) AS tp
                    FROM e JOIN su USING (user_id)
                    WHERE event_type = 'purchase' AND ts_us >= t0
                    GROUP BY e.user_id),
             la AS (SELECT user_id, max(ts_us) AS t_last FROM e
                    GROUP BY 1),
             dur AS (SELECT coalesce(tp, t_last) - t0 AS dur_us,
                       tp IS NOT NULL AS event
                     FROM su JOIN la USING (user_id)
                     LEFT JOIN pu USING (user_id)),
             h AS (SELECT dur_us, count(CASE WHEN event THEN 1 END) AS d,
                     count(*) AS m
                   FROM dur GROUP BY 1),
             ar AS (SELECT *, CAST(sum(m) OVER (ORDER BY dur_us
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                      AS BIGINT) AS n_i
                    FROM h),
             de AS (SELECT dur_us, d, n_i,
                      CAST(n_i - d AS DOUBLE) / CAST(n_i AS DOUBLE)
                        AS factor
                    FROM ar WHERE d > 0),
             wk AS (SELECT *, row_number() OVER (ORDER BY dur_us) AS k
                    FROM de),
             fs AS (SELECT list(factor ORDER BY dur_us) AS fl FROM de)
             SELECT dur_us AS t_us, d AS d_i, n_i,
               list_reduce(fl[1:k], (a, b) -> a * b) AS survival
             FROM wk CROSS JOIN fs ORDER BY t_us"""))

  /** JSON scalar-function surface (§2.6 breadth): parse the REAL
    * `props` payload, plant a missing-key minority (event_id % 7 — the
    * planted-fixture idiom), rebuild a NESTED document in the plan, and
    * round-trip it through path extraction (`get_json_object`),
    * array-length inspection and 0-based array indexing — mirrored in
    * DuckDB's JSONPath functions. All extracted numbers flow into exact
    * integer aggregates; the nested build is `concat`, so the document
    * bytes are identical on both engines. Map-only until the 5-row
    * rollup.
    */
  val q145JsonSurface: Q = Q(
    "q145_json_surface",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          when(pmod(col("event_id"), lit(7)) === 0, lit("{}"))
            .otherwise(col("props")).as("pj"))
        .withColumn("k_str", get_json_object(col("pj"), "$.k"))
        .withColumn("doc", concat(
          lit("{\"meta\":{\"t\":\""), col("event_type"), lit("\",\"k\":"),
          coalesce(col("k_str"), lit("null")), lit("},\"vals\":[1,"),
          coalesce(col("k_str"), lit("0")), lit(",3]}")))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("k_str").isNull, 1)).as("n_missing_k"),
          sum(expr("try_cast(k_str AS BIGINT)")).as("sum_k"),
          count(when(
            expr("json_array_length(get_json_object(doc, '$.vals'))") === 3,
            1)).as("n_vals3"),
          sum(expr(
            "try_cast(get_json_object(doc, '$.vals[1]') AS BIGINT)"))
            .as("sum_second_val"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type,
                 CASE WHEN event_id % 7 = 0 THEN '{}' ELSE props END AS pj
               FROM events),
            x AS (SELECT event_type,
                    json_extract_string(pj, '$.k') AS k_str,
                    '{"meta":{"t":"' || event_type || '","k":'
                      || coalesce(json_extract_string(pj, '$.k'), 'null')
                      || '},"vals":[1,'
                      || coalesce(json_extract_string(pj, '$.k'), '0')
                      || ',3]}' AS doc
                  FROM ev)
            SELECT event_type, count(*) AS n,
              count(CASE WHEN k_str IS NULL THEN 1 END) AS n_missing_k,
              CAST(sum(TRY_CAST(k_str AS BIGINT)) AS BIGINT) AS sum_k,
              count(CASE WHEN json_array_length(doc, '$.vals') = 3
                         THEN 1 END) AS n_vals3,
              CAST(sum(TRY_CAST(json_extract_string(doc, '$.vals[1]')
                AS BIGINT)) AS BIGINT) AS sum_second_val
            FROM x GROUP BY event_type ORDER BY event_type"""))

  /** Multi-touch LINEAR attribution — each purchase's value is split
    * equally across ALL clicks in its 24 h lookback (q131 is the
    * first-touch point; linear is the fractional-credit form). The
    * fractional credits are `cents · 10⁶ div n_touches` — INTEGER
    * micro-cent division, identically truncated on both engines — so
    * per-channel credit sums stay exact int64 however they are
    * partitioned (a double `cents/n` sum would be accumulation-order-
    * dependent). Channels are the click's hour-of-day. Same
    * single-shuffle user-key join shape as q131; the credit rollup keys
    * on 24 channels.
    */
  val q146LinearAttribution: Q = Q(
    "q146_linear_attribution",
    (s, dir) => {
      val lookbackUs = 24L * 3600 * 1000000
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          tsUs.as("ts_us"), col("value"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pur_id"), col("user_id"),
          col("ts_us").as("pur_ts_us"),
          floor(col("value") * 100).cast("long").as("cents"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("clk_user"),
          col("ts_us").as("clk_ts_us"))
      val touched = pur.join(clk,
        col("user_id") === col("clk_user") &&
          col("clk_ts_us") >= col("pur_ts_us") - lookbackUs &&
          col("clk_ts_us") <= col("pur_ts_us"))
      val withN = touched
        .withColumn("n_touches",
          count(lit(1)).over(Window.partitionBy("pur_id")))
      withN
        .select(expr("(clk_ts_us div 3600000000) % 24").as("hour_of_day"),
          expr("cents * 1000000 div n_touches").as("credit_micro"))
        .groupBy(col("hour_of_day"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_micro")).as("credited_micro"),
          (sum(col("credit_micro")).cast("double") / 1e8)
            .as("credited_dollars"))
        .orderBy("hour_of_day")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
                    ${duckUs("ts")} AS ts_us,
                    CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM events),
             p AS (SELECT event_id AS pur_id, user_id,
                     ts_us AS pur_ts_us, cents
                   FROM ev WHERE event_type = 'purchase'),
             c AS (SELECT user_id AS clk_user, ts_us AS clk_ts_us
                   FROM ev WHERE event_type = 'click'),
             t AS (SELECT p.*, clk_ts_us,
                     count(*) OVER (PARTITION BY pur_id) AS n_touches
                   FROM p JOIN c
                     ON p.user_id = c.clk_user
                     AND c.clk_ts_us >= p.pur_ts_us - 86400000000
                     AND c.clk_ts_us <= p.pur_ts_us)
             SELECT (clk_ts_us // 3600000000) % 24 AS hour_of_day,
               count(*) AS n_touches,
               CAST(sum(cents * 1000000 // n_touches) AS BIGINT)
                 AS credited_micro,
               CAST(sum(cents * 1000000 // n_touches) AS DOUBLE) / 1e8
                 AS credited_dollars
             FROM t GROUP BY 1 ORDER BY hour_of_day"""))

  /** Two-feature grouped OLS via exact normal equations — the
    * multivariate extension of q108's single-feature trend: per event
    * type, fit `cents ≈ b0 + b1·day + b2·hour_of_day` by Cramer's rule
    * over the 3x3 normal matrix, every entry of which is an EXACT int64
    * moment sum (counts, Σday, Σhour, Σday², Σday·hour, Σhour²,
    * Σcents·…). The determinant expansion stays in int128-free range by
    * construction (days < 31, hours < 24, cents < 10⁷ at sf0.1 — the
    * deepest product is n·Σd²·Σh² ≈ 10⁵·10⁴·10⁴·… bounded via the
    * decimal(38,0) accumulators used for the 3-term products), and only
    * the final three divisions are floating point — one fixed IEEE op
    * each, so the coefficients hash-match.
    */
  val q147Ols2: Q = Q(
    "q147_ols2",
    (s, dir) => {
      val base = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("d"),
          expr("((ts div 1000) div 3600000000) % 24").as("h"),
          floor(col("value") * 100).cast("long").as("y"))
      val m = base.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("d")).as("sd"), sum(col("h")).as("sh"),
        sum(col("d") * col("d")).as("sdd"),
        sum(col("d") * col("h")).as("sdh"),
        sum(col("h") * col("h")).as("shh"),
        sum(col("y")).as("sy"),
        sum(col("d") * col("y")).as("sdy"),
        sum(col("h") * col("y")).as("shy"))
      // 3x3 determinants in decimal(38,0): the triple products of int64
      // moment sums overflow long (n·Σd²·Σh² ~ 1e5·1e8·1e8), decimal
      // keeps them exact; DuckDB mirrors in HUGEINT
      def D(c: Column) = c.cast("decimal(38,0)")
      def det3(a1: Column, a2: Column, a3: Column,
               b1: Column, b2: Column, b3: Column,
               c1: Column, c2: Column, c3: Column): Column =
        D(a1) * (D(b2) * D(c3) - D(b3) * D(c2)) -
        D(a2) * (D(b1) * D(c3) - D(b3) * D(c1)) +
        D(a3) * (D(b1) * D(c2) - D(b2) * D(c1))
      val (n, sd, sh) = (col("n"), col("sd"), col("sh"))
      val (sdd, sdh, shh) = (col("sdd"), col("sdh"), col("shh"))
      val (sy, sdy, shy) = (col("sy"), col("sdy"), col("shy"))
      val det  = det3(n,  sd,  sh,  sd, sdd, sdh, sh, sdh, shh)
      val det0 = det3(sy, sd,  sh, sdy, sdd, sdh, shy, sdh, shh)
      val det1 = det3(n,  sy,  sh,  sd, sdy, sdh, sh, shy, shh)
      val det2 = det3(n,  sd,  sy,  sd, sdd, sdy, sh, sdh, shy)
      m.select(col("event_type"), col("n"),
          (det0.cast("double") / det.cast("double")).as("b0_cents"),
          (det1.cast("double") / det.cast("double")).as("b1_per_day"),
          (det2.cast("double") / det.cast("double")).as("b2_per_hour"))
        .orderBy("event_type")
    },
    Some(s"""WITH b AS (SELECT event_type,
                    ${duckUs("ts")} // 86400000000 AS d,
                    (${duckUs("ts")} // 3600000000) % 24 AS h,
                    CAST(floor(value * 100) AS BIGINT) AS y
                  FROM events),
             m AS (SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(d) AS HUGEINT) AS sd,
                     CAST(sum(h) AS HUGEINT) AS sh,
                     CAST(sum(d * d) AS HUGEINT) AS sdd,
                     CAST(sum(d * h) AS HUGEINT) AS sdh,
                     CAST(sum(h * h) AS HUGEINT) AS shh,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(d * y) AS HUGEINT) AS sdy,
                     CAST(sum(h * y) AS HUGEINT) AS shy
                   FROM b GROUP BY 1)
             SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(sy * (sdd * shh - sdh * sdh)
                    - sd * (sdy * shh - sdh * shy)
                    + sh * (sdy * sdh - sdd * shy) AS DOUBLE)
                 / CAST(n * (sdd * shh - sdh * sdh)
                    - sd * (sd * shh - sdh * sh)
                    + sh * (sd * sdh - sdd * sh) AS DOUBLE) AS b0_cents,
               CAST(n * (sdy * shh - sdh * shy)
                    - sy * (sd * shh - sdh * sh)
                    + sh * (sd * shy - sdy * sh) AS DOUBLE)
                 / CAST(n * (sdd * shh - sdh * sdh)
                    - sd * (sd * shh - sdh * sh)
                    + sh * (sd * sdh - sdd * sh) AS DOUBLE) AS b1_per_day,
               CAST(n * (sdd * shy - sdy * sdh)
                    - sd * (sd * shy - sdy * sh)
                    + sy * (sd * sdh - sdd * sh) AS DOUBLE)
                 / CAST(n * (sdd * shh - sdh * sdh)
                    - sd * (sd * shh - sdh * sh)
                    + sh * (sd * sdh - sdd * sh) AS DOUBLE) AS b2_per_hour
             FROM m ORDER BY event_type"""))

  /** Two-sample proportion z-test between user cohorts (A/B readout):
    * conversion = "user has a purchase", cohort = user_id parity. The
    * z statistic's op tree — two rate divisions, pooled rate, the
    * standard-error sqrt, one closing division — is FIXED and built
    * from exact int64 counts, and IEEE-754 requires sqrt to be
    * correctly rounded, so the statistic is bit-identical across
    * engines (the rare transcendental-adjacent op that IS safe; ln/exp
    * are not). Emits the decision at |z| > 1.96 as a boolean.
    */
  val q148AbZtest: Q = Q(
    "q148_ab_ztest",
    (s, dir) => {
      // conversion = first purchase within 24 h of first signup ("did
      // the user activate fast") — "ever purchased" saturates at 100 %
      // on this fixture, making pp = 1, se = 0 and z undefined
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts_us")))
            .as("t_signup"),
          min(when(col("event_type") === "purchase", col("ts_us")))
            .as("t_purchase"))
        .filter(col("t_signup").isNotNull)
        .select(pmod(col("user_id"), lit(2)).as("cohort"),
          when(col("t_purchase").isNotNull &&
            col("t_purchase") >= col("t_signup") &&
            col("t_purchase") - col("t_signup") <= 24L * 3600 * 1000000, 1L)
            .otherwise(0L).as("converted"))
      val cells = users.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
      // one-row conditional fold, NOT filter+crossJoin: with a cohort
      // absent from the data, an empty side would make the cross join
      // emit 0 rows while the oracle's scalar subqueries emit 1 row of
      // NULLs — a structural divergence on degenerate data. A global
      // aggregate yields exactly one row in both engines (all-NULL when
      // the input is empty), and NULL then propagates identically down
      // the z-statistic arithmetic.
      val ab = cells.agg(
        max(when(col("cohort") === 0, col("n"))).as("n1"),
        max(when(col("cohort") === 0, col("c"))).as("c1"),
        max(when(col("cohort") === 1, col("n"))).as("n2"),
        max(when(col("cohort") === 1, col("c"))).as("c2"))
      ab
        .select(col("n1"), col("c1"), col("n2"), col("c2"),
          (col("c1").cast("double") / col("n1").cast("double")).as("p1"),
          (col("c2").cast("double") / col("n2").cast("double")).as("p2"),
          ((col("c1") + col("c2")).cast("double")
            / (col("n1") + col("n2")).cast("double")).as("pp"))
        .select(col("n1"), col("c1"), col("n2"), col("c2"), col("p1"),
          col("p2"),
          ((col("p1") - col("p2")) /
            nullif(sqrt(col("pp") * (lit(1.0) - col("pp"))
              * (lit(1.0) / col("n1").cast("double")
                + lit(1.0) / col("n2").cast("double"))), lit(0.0)))
            .as("z"))
        .select(col("n1"), col("c1"), col("n2"), col("c2"), col("p1"),
          col("p2"), col("z"), (abs(col("z")) > 1.96).as("significant"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_type,
                 ${duckUs("ts")} AS ts_us FROM events),
            u0 AS (SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN ts_us END)
                   AS t_signup,
                 min(CASE WHEN event_type = 'purchase' THEN ts_us END)
                   AS t_purchase
               FROM e GROUP BY 1),
            u AS (SELECT user_id,
                 CASE WHEN t_purchase IS NOT NULL
                       AND t_purchase >= t_signup
                       AND t_purchase - t_signup <= 86400000000
                      THEN 1 ELSE 0 END AS converted
               FROM u0 WHERE t_signup IS NOT NULL),
            cells AS (SELECT user_id % 2 AS cohort, count(*) AS n,
                        CAST(sum(converted) AS BIGINT) AS c
                      FROM u GROUP BY 1),
            ab AS (SELECT
                     (SELECT n FROM cells WHERE cohort = 0) AS n1,
                     (SELECT c FROM cells WHERE cohort = 0) AS c1,
                     (SELECT n FROM cells WHERE cohort = 1) AS n2,
                     (SELECT c FROM cells WHERE cohort = 1) AS c2),
            r AS (SELECT *,
                    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                    CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
                    CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                      AS pp
                  FROM ab),
            z AS (SELECT n1, c1, n2, c2, p1, p2,
                    (p1 - p2) / nullif(sqrt(pp * (1.0 - pp)
                      * (1.0 / CAST(n1 AS DOUBLE)
                        + 1.0 / CAST(n2 AS DOUBLE))), 0.0) AS z
                  FROM r)
            SELECT n1, c1, n2, c2, p1, p2, z, abs(z) > 1.96 AS significant
            FROM z"""))

  /** Bitmap-index set intersection — the roaring-bitmap idea as
    * relational dataflow: each event type's user set is packed into
    * 64-bit WORDS (`bit_or` of `1 << (user_id % 64)` grouped by
    * `user_id div 64`), and |A ∩ B| is `bit_count(wordA & wordB)`
    * summed over the word index — a |users|/64-row equi-join instead of
    * a row-level distinct-join. The query emits both the bitmap count
    * and the direct distinct-join count with an equality flag, so the
    * compressed representation is PROVEN against the row-level answer
    * inside the hash-checked result.
    */
  val q149BitmapIntersect: Q = Q(
    "q149_bitmap_intersect",
    (s, dir) => {
      val du = Tables.load(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
      // 32-bit payload in a 64-bit word: bit 63 would overflow DuckDB's
      // checked left shift, and 32 keeps both engines comfortably signed
      val words = du
        .groupBy(col("event_type"),
          expr("user_id div 32").as("word_idx"))
        .agg(expr("bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT))")
          .as("word"))
      val pairs = Seq(("view", "purchase"), ("click", "error"),
        ("signup", "purchase"))
      val pairDf = { import s.implicits._; pairs.toDF("ta", "tb") }
      // the word table is |users|/32 x |types| rows — broadcast; the
      // row-level `direct` join below keeps its user-key shuffle
      // deliberately: it is the baseline the bitmap path is PROVEN
      // against, and its cost is the point of comparison
      val bm = broadcast(pairDf)
        .join(words.as("a"), col("a.event_type") === col("ta"))
        .join(broadcast(words.as("b")),
          col("b.event_type") === col("tb") &&
            col("a.word_idx") === col("b.word_idx"))
        .groupBy(col("ta"), col("tb"))
        .agg(sum(bit_count(col("a.word").bitwiseAND(col("b.word"))))
          .as("bitmap_n"))
      val direct = du.as("x")
        .join(du.as("y"), col("x.user_id") === col("y.user_id"))
        .join(broadcast(pairDf),
          col("x.event_type") === col("ta") &&
            col("y.event_type") === col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("direct_n"))
      // the pair table is the spine: an EMPTY intersection must report
      // 0/0/true, not vanish from the inner joins
      pairDf.join(broadcast(bm), Seq("ta", "tb"), "left")
        .join(broadcast(direct), Seq("ta", "tb"), "left")
        .select(col("ta"), col("tb"),
          coalesce(col("bitmap_n"), lit(0L)).as("bitmap_n"),
          coalesce(col("direct_n"), lit(0L)).as("direct_n"),
          (coalesce(col("bitmap_n"), lit(0L))
            === coalesce(col("direct_n"), lit(0L))).as("agree"))
        .orderBy("ta", "tb")
    },
    Some("""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
            w AS (SELECT event_type, user_id // 32 AS word_idx,
                    bit_or(CAST(1 AS BIGINT)
                      << CAST(user_id % 32 AS INT)) AS word
                  FROM du GROUP BY 1, 2),
            pr AS (SELECT * FROM (VALUES ('view', 'purchase'),
                     ('click', 'error'), ('signup', 'purchase'))
                   t(ta, tb)),
            bm AS (SELECT ta, tb,
                     CAST(sum(bit_count(a.word & b.word)) AS BIGINT)
                       AS bitmap_n
                   FROM pr
                   JOIN w a ON a.event_type = ta
                   JOIN w b ON b.event_type = tb
                     AND a.word_idx = b.word_idx
                   GROUP BY 1, 2),
            dr AS (SELECT ta, tb, count(*) AS direct_n
                   FROM du x JOIN du y ON x.user_id = y.user_id
                   JOIN pr ON x.event_type = ta AND y.event_type = tb
                   GROUP BY 1, 2)
            SELECT ta, tb,
              coalesce(bitmap_n, 0) AS bitmap_n,
              coalesce(direct_n, 0) AS direct_n,
              coalesce(bitmap_n, 0) = coalesce(direct_n, 0) AS agree
            FROM pr LEFT JOIN bm USING (ta, tb)
            LEFT JOIN dr USING (ta, tb)
            ORDER BY ta, tb"""))

  /** Ratio-to-parent reporting: each event type's share of its HOUR's
    * total and each hour's share of the GRAND total, from one
    * aggregated frame — the percent-of-total window family (share =
    * exact-int division; the window marginals run over the |hours| x
    * |types|-sized aggregate, never the event stream). The grand total
    * rides along via a broadcast 1-row frame, so no global window
    * touches event-sized data.
    */
  val q150RatioToParent: Q = Q(
    "q150_ratio_to_parent",
    (s, dir) => {
      val cells = Tables.load(s, dir, "events")
        .select(expr("((ts div 1000) div 3600000000) % 24").as("hour"),
          col("event_type"))
        .groupBy(col("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val total = cells.agg(sum(col("n")).as("grand")) // 1 row
      cells
        .withColumn("hour_total",
          sum(col("n")).over(Window.partitionBy("hour")))
        .crossJoin(broadcast(total))
        .select(col("hour"), col("event_type"), col("n"),
          (col("n").cast("double") / col("hour_total").cast("double"))
            .as("share_of_hour"),
          (col("hour_total").cast("double") / col("grand").cast("double"))
            .as("hour_share_of_total"))
        .orderBy("hour", "event_type")
    },
    Some(s"""WITH c AS (SELECT (${duckUs("ts")} // 3600000000) % 24
                          AS hour, event_type, count(*) AS n
                        FROM events GROUP BY 1, 2),
             t AS (SELECT CAST(sum(n) AS BIGINT) AS grand FROM c)
             SELECT hour, event_type, n,
               CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY hour) AS DOUBLE)
                 AS share_of_hour,
               CAST(sum(n) OVER (PARTITION BY hour) AS DOUBLE)
                 / CAST(grand AS DOUBLE) AS hour_share_of_total
             FROM c CROSS JOIN t ORDER BY hour, event_type"""))

  /** Time-weighted average value (TWAP) per user: each observation is
    * weighted by how long it was the user's CURRENT value (the `lead`
    * inter-arrival span — q132's dwell applied as a weight). The
    * weighted sum Σ cents·Δt_µs is accumulated in decimal(38,0)
    * (cents·span products reach ~10⁷·10¹¹ and their SUM would overflow
    * int64), the denominator Σ Δt stays int64, and the TWAP is one
    * closing division — so the result is exact-arithmetic-then-divide
    * like every mean in this suite.
    */
  val q151Twap: Q = Q(
    "q151_twap",
    (s, dir) => {
      val seqW = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val spans = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), tsUs.as("ts_us"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("span_us",
          lead(col("ts_us"), 1).over(seqW) - col("ts_us"))
        .filter(col("span_us").isNotNull)
      spans.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("span_us")).as("total_span_us"),
          sum((col("cents") * col("span_us")).cast("decimal(38,0)"))
            .as("wsum"))
        .select(col("user_id"), col("n_spans"), col("total_span_us"),
          (col("wsum").cast("double") / col("total_span_us").cast("double"))
            .as("twap_cents"))
        .orderBy("user_id")
    },
    Some(s"""WITH e AS (SELECT user_id, event_id,
                          ${duckUs("ts")} AS ts_us,
                          CAST(floor(value * 100) AS BIGINT) AS cents
                        FROM events),
             sp AS (SELECT user_id, cents,
                      lead(ts_us) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) - ts_us AS span_us
                    FROM e)
             SELECT user_id, count(*) AS n_spans,
               CAST(sum(span_us) AS BIGINT) AS total_span_us,
               CAST(sum(CAST(cents * span_us AS HUGEINT)) AS DOUBLE)
                 / CAST(sum(span_us) AS DOUBLE) AS twap_cents
             FROM sp WHERE span_us IS NOT NULL
             GROUP BY user_id ORDER BY user_id"""))

  /** Sweep-line interval concurrency: how many users are simultaneously
    * active per day, from (user, day) activity intervals [first event,
    * last event]. Each interval emits +1/−1 boundary deltas, deltas are
    * NETTED PER TIMESTAMP before the running sum (a cumulative window
    * over duplicate sort keys has ambiguous per-row values — netting
    * makes the sort key unique, hence deterministic), and the per-day
    * maximum and its earliest peak time fall out of one ordered window
    * per day. The q101 interval-merge partner: merge asks "how much is
    * covered", this asks "how deeply".
    *
    * ## 100 TB notes
    * Interval extraction is one user-day aggregate; everything after
    * operates on <= 2 boundary rows per interval, partitioned by day —
    * the sweep never sees raw events, and each day's sweep is an
    * independent partition.
    */
  val q152MaxConcurrency: Q = Q(
    "q152_max_concurrency",
    (s, dir) => {
      val iv = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("day_idx"),
          tsUs.as("ts_us"))
        .groupBy(col("user_id"), col("day_idx"))
        .agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
      val deltas = iv
        .select(col("day_idx"), col("t0").as("t"), lit(1L).as("d"))
        .unionByName(iv.select(col("day_idx"),
          (col("t1") + 1).as("t"), lit(-1L).as("d")))
        .groupBy(col("day_idx"), col("t"))
        .agg(sum(col("d")).as("net")) // unique (day, t) sort keys
      val byDay = Window.partitionBy("day_idx").orderBy("t")
      val run = deltas.withColumn("running",
        sum(col("net")).over(
          byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      run
        .withColumn("rk", row_number().over(
          Window.partitionBy("day_idx")
            .orderBy(col("running").desc, col("t").asc)))
        .filter(col("rk") === 1)
        .select(col("day_idx"), col("running").as("max_concurrent"),
          col("t").as("peak_t_us"))
        .orderBy("day_idx")
    },
    Some(s"""WITH e AS (SELECT user_id,
                    ${duckUs("ts")} // 86400000000 AS day_idx,
                    ${duckUs("ts")} AS ts_us
                  FROM events),
             iv AS (SELECT user_id, day_idx, min(ts_us) AS t0,
                      max(ts_us) AS t1
                    FROM e GROUP BY 1, 2),
             d AS (SELECT day_idx, t, CAST(sum(dd) AS BIGINT) AS net
                   FROM (SELECT day_idx, t0 AS t, 1 AS dd FROM iv
                         UNION ALL
                         SELECT day_idx, t1 + 1, -1 FROM iv)
                   GROUP BY 1, 2),
             r AS (SELECT day_idx, t,
                     CAST(sum(net) OVER (PARTITION BY day_idx ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
                   FROM d),
             k AS (SELECT *, row_number() OVER (PARTITION BY day_idx
                     ORDER BY running DESC, t ASC) AS rk
                   FROM r)
             SELECT day_idx, running AS max_concurrent, t AS peak_t_us
             FROM k WHERE rk = 1 ORDER BY day_idx"""))

  /** Growth accounting: per week, every active user is exactly one of
    * NEW (first week ever), RETAINED (also active the week before) or
    * RESURRECTED (inactive last week, active some earlier week), and
    * churn is last week's actives missing this week — the
    * new/retained/resurrected/churned ledger every growth team reports.
    * One (week, user) dedup (the only event-sized shuffle), a broadcast
    * first-week table, and one self-join offset by a week; identities
    * `new + retained + resurrected = active` hold row-for-row because
    * the three cases partition by construction.
    */
  val q154GrowthAccounting: Q = Q(
    "q154_growth_accounting",
    (s, dir) => {
      val wu = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 604800000000").as("week"),
          col("user_id"))
        .distinct()
      val firstWeek = wu.groupBy("user_id")
        .agg(min(col("week")).as("first_week"))
      // self-joins of the derived wu frame need explicit aliases
      // (AMBIGUOUS_SELF_JOIN otherwise)
      val perWeek = wu.as("c")
        .join(broadcast(firstWeek).as("f"),
          col("c.user_id") === col("f.user_id"))
        .join(wu.as("p"),
          col("p.user_id") === col("c.user_id") &&
            col("p.week") === col("c.week") - 1, "left")
        .groupBy(col("c.week").as("week"))
        .agg(count(lit(1)).as("n_active"),
          count(when(col("c.week") === col("f.first_week"), 1)).as("n_new"),
          count(col("p.user_id")).as("n_retained"),
          count(when(col("p.user_id").isNull &&
            col("c.week") > col("f.first_week"), 1)).as("n_resurrected"))
      // churned(w) = active in w-1, absent in w
      val churned = wu
        .select((col("week") + 1).as("week"), col("user_id").as("u"))
        .join(wu.select(col("week"), col("user_id").as("u")),
          Seq("week", "u"), "left_anti")
        .groupBy("week").agg(count(lit(1)).as("n_churned"))
      perWeek.join(churned, Seq("week"), "left")
        .select(col("week"), col("n_active"), col("n_new"),
          col("n_retained"), col("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy("week")
    },
    Some(s"""WITH wu AS (SELECT DISTINCT
                    ${duckUs("ts")} // 604800000000 AS week, user_id
                  FROM events),
             fw AS (SELECT user_id, min(week) AS first_week FROM wu
                    GROUP BY 1),
             cur AS (SELECT w.week,
                       count(*) AS n_active,
                       count(CASE WHEN w.week = f.first_week THEN 1 END)
                         AS n_new,
                       count(p.user_id) AS n_retained,
                       count(CASE WHEN p.user_id IS NULL
                                   AND w.week > f.first_week THEN 1 END)
                         AS n_resurrected
                     FROM wu w
                     JOIN fw f ON f.user_id = w.user_id
                     LEFT JOIN wu p ON p.user_id = w.user_id
                       AND p.week = w.week - 1
                     GROUP BY w.week),
             ch AS (SELECT p.week + 1 AS week, count(*) AS n_churned
                    FROM wu p LEFT JOIN wu c
                      ON c.user_id = p.user_id AND c.week = p.week + 1
                    WHERE c.user_id IS NULL
                    GROUP BY p.week + 1)
             SELECT week, n_active, n_new, n_retained, n_resurrected,
               coalesce(n_churned, 0) AS n_churned
             FROM cur LEFT JOIN ch USING (week)
             ORDER BY week"""))

  /** Pareto coverage of revenue: the smallest top-K user set whose
    * purchases cover >= 80 % of total revenue, decided by EXACT integer
    * cross-multiplication (`cum_cents · 100 >= 80 · total_cents` — no
    * percentage double ever compared). The per-user rollup is the only
    * event-sized work; the ranked cumulative walk runs over the
    * |users|-sized aggregate via
    * [[graft.engine.Cumulative.rankedCumSum]] — a range-partitioned
    * two-phase prefix sum, NOT a single-partition global window, so
    * even a billion-user dimension walks in parallel. Ties in revenue
    * rank break by user_id, so K is well-defined on both engines.
    */
  val q155ParetoCoverage: Q = Q(
    "q155_pareto_coverage",
    (s, dir) => {
      val perUser = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      val ranked = graft.engine.Cumulative.rankedCumSum(perUser,
        Seq(col("cents").desc, col("user_id").asc), col("cents"))
      val total = perUser.agg(sum(col("cents")).as("tot"),
        count(lit(1)).as("n_users")) // 1 row
      ranked.crossJoin(broadcast(total))
        .filter(col("cum") * 100 >= col("tot") * 80)
        .orderBy("rk")
        .limit(1)
        .select(col("rk").cast("long").as("k_users"), col("n_users"),
          col("cum").as("covered_cents"), col("tot").as("total_cents"),
          (col("rk").cast("double") / col("n_users").cast("double"))
            .as("user_fraction"))
    },
    Some(s"""WITH pu AS (SELECT user_id,
                    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                      AS cents
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1),
             t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot,
                     count(*) AS n_users FROM pu),
             r AS (SELECT cents,
                     row_number() OVER w AS rk,
                     CAST(sum(cents) OVER (ORDER BY cents DESC, user_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                   FROM pu
                   WINDOW w AS (ORDER BY cents DESC, user_id))
             SELECT CAST(rk AS BIGINT) AS k_users, n_users,
               cum AS covered_cents, tot AS total_cents,
               CAST(rk AS DOUBLE) / CAST(n_users AS DOUBLE)
                 AS user_fraction
             FROM r CROSS JOIN t
             WHERE cum * 100 >= tot * 80
             ORDER BY rk LIMIT 1"""))

  /** Per-user modal event type with a DETERMINISTIC tie-break — the
    * mode aggregate done safely: Spark's `mode()` and DuckDB's `mode()`
    * both leave ties implementation-defined, so neither appears here;
    * the mode is the count-desc/type-asc rank-1 row of the (user, type)
    * aggregate, a total order both engines share. Two map-side-combined
    * hash aggregates plus a window over the |users| x |types| frame.
    */
  val q158ModalType: Q = Q(
    "q158_modal_type",
    (s, dir) => {
      val counts = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("rk", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("cnt").desc, col("event_type").asc)))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("modal_type"),
          col("cnt").as("modal_cnt"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_type AS modal_type, cnt AS modal_cnt
            FROM (SELECT user_id, event_type, count(*) AS cnt,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY count(*) DESC, event_type ASC) AS rk
                  FROM events GROUP BY user_id, event_type)
            WHERE rk = 1 ORDER BY user_id"""))

  /** Deterministic ARGMAX: each user's single largest purchase and the
    * event that produced it, via `max(struct(cents, event_id))` — the
    * lexicographic struct max IS the tie-break (`max_by` leaves ties
    * implementation-defined on both engines and never appears in this
    * suite). One map-side-combined aggregate; no window, no join. The
    * oracle mirrors the lexicographic max STRUCTURALLY (rank-1 row by
    * cents DESC, event_id DESC) — an earlier arithmetic-packed form
    * (cents*1e10+event_id) would mis-order once event_id >= 1e10 and
    * wrap int64 once cents >= ~9.2e8, so it was replaced.
    */
  val q159ArgmaxPurchase: Q = Q(
    "q159_argmax_purchase",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("cents"), col("event_id"))).as("m"),
          count(lit(1)).as("n_purchases"))
        .select(col("user_id"), col("n_purchases"),
          col("m.cents").as("max_cents"),
          col("m.event_id").as("max_event_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, n_purchases, cents AS max_cents,
              event_id AS max_event_id
            FROM (SELECT user_id, event_id,
                    CAST(floor(value * 100) AS BIGINT) AS cents,
                    count(*) OVER (PARTITION BY user_id) AS n_purchases,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(value * 100) AS BIGINT) DESC,
                               event_id DESC) AS rk
                  FROM events WHERE event_type = 'purchase')
            WHERE rk = 1 ORDER BY user_id"""))

  /** Lag-1 autocorrelation of the per-type daily revenue series — the
    * time-series diagnostic behind seasonality and anomaly tuning. The
    * (x_t, x_{t+1}) pairs come from one `lead` over the dim-sized daily
    * aggregate; the linear sums are exact int64 and the square/cross
    * sums are exact decimal(38,0) FROM THE MULTIPLY UP (a 100x revenue
    * series puts x*x at 10¹⁶-10¹⁸ — a season of days would wrap an
    * int64 sum silently; DuckDB mirrors with HUGEINT squares); the
    * Pearson numerator/denominator cross-products stay decimal(38,0)
    * (they reach ~10³⁴) and only the closing sqrt-and-divide chain is
    * floating point, fixed-order on both engines (q114's moment
    * discipline applied to a lagged series).
    */
  val q161Autocorr: Q = Q(
    "q161_autocorr",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .select(col("event_type"), expr("(ts div 1000) div 86400000000")
          .as("day_idx"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg(sum(col("cents")).as("x"))
      val pairs = daily
        .withColumn("y", lead(col("x"), 1).over(
          Window.partitionBy("event_type").orderBy("day_idx")))
        .filter(col("y").isNotNull)
      // the squares are lifted to decimal(38,0) BEFORE multiplying: daily
      // cents at a 100x revenue scale sit near 1e8-1e9, so x*x reaches
      // 1e16-1e18 and a season of days would wrap int64 silently under
      // non-ANSI sum; the aggregate runs over the dim-sized daily frame,
      // so the decimal cost is nil (oracle mirrors via HUGEINT squares)
      val xd = col("x").cast("decimal(38,0)")
      val yd = col("y").cast("decimal(38,0)")
      val m = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(xd * xd).as("sxx"),
          sum(yd * yd).as("syy"),
          sum(xd * yd).as("sxy"))
      def D(c: Column) = c.cast("decimal(38,0)")
      val num = D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))
      val vx = D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))
      val vy = D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy"))
      m.select(col("event_type"), col("n").as("n_pairs"),
          (num.cast("double")
            / sqrt(vx.cast("double") * vy.cast("double"))).as("r_lag1"))
        .orderBy("event_type")
    },
    Some(s"""WITH d AS (SELECT event_type,
                    ${duckUs("ts")} // 86400000000 AS day_idx,
                    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                      AS x
                  FROM events GROUP BY 1, 2),
             p AS (SELECT event_type, x,
                     lead(x) OVER (PARTITION BY event_type
                       ORDER BY day_idx) AS y
                   FROM d),
             m AS (SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                     sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
                     sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
                   FROM p WHERE y IS NOT NULL GROUP BY 1)
             SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE)) AS r_lag1
             FROM m ORDER BY event_type"""))

  /** The queries whose execution is a real Structured Streaming run —
    * each pays per-run state-store provisioning (the r06 driver tail
    * showed a 3.45 s state-store load for ONE of them), which is why
    * [[graft.Bench]] times them cold-only. Any new `readStream` query
    * must be added here; `BenchPolicySpec` cross-checks this set against
    * the `all` registry.
    */
  /** Conversion-lag histogram — time from each user's FIRST view to the
    * first purchase at-or-after it, bucketed into exponential latency
    * bins (<1m, <10m, <1h, <6h, <1d, >=1d). The binning is pure integer
    * CASE on exact µs differences (no log, no float), so the histogram
    * is bit-stable; the complementary operators are q132 (dwell
    * between consecutive events) and q74 (inter-arrival gaps) — this
    * one measures a cross-event-type causal span, the funnel-latency
    * readout product analytics put beside q86's conversion counts.
    *
    * ## 100 TB notes
    * Two aggregates both keyed on user_id — one partitioning, reused
    * (AQE coalesces); the view-to-purchase join is co-partitioned on
    * the same key, so the whole query is one exchange of per-user
    * rows plus a 6-group rollup.
    */
  val q170ConversionLag: Q = Q(
    "q170_conversion_lag",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("us"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("view_us"))
      val lags = ev.filter(col("event_type") === "purchase")
        .join(firstView, Seq("user_id"))
        .filter(col("us") >= col("view_us"))
        .groupBy(col("user_id"), col("view_us"))
        .agg(min(col("us")).as("purch_us"))
        .select((col("purch_us") - col("view_us")).as("lag_us"))
      val m = 60L * 1000000L
      val bucket = when(col("lag_us") < m, 0)
        .when(col("lag_us") < 10 * m, 1)
        .when(col("lag_us") < 60 * m, 2)
        .when(col("lag_us") < 360 * m, 3)
        .when(col("lag_us") < 1440 * m, 4)
        .otherwise(5)
      lags.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("lag_us")).as("min_lag_us"),
          max(col("lag_us")).as("max_lag_us"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH t AS (SELECT user_id, event_type,
                    ${duckUs("ts")} AS us FROM events),
            fv AS (SELECT user_id, min(us) AS view_us FROM t
                   WHERE event_type = 'view' GROUP BY user_id),
            lags AS (SELECT t.user_id,
                    min(t.us) - fv.view_us AS lag_us
                  FROM t JOIN fv ON t.user_id = fv.user_id
                  WHERE t.event_type = 'purchase' AND t.us >= fv.view_us
                  GROUP BY t.user_id, fv.view_us)
            SELECT CASE WHEN lag_us < 60000000 THEN 0
                        WHEN lag_us < 600000000 THEN 1
                        WHEN lag_us < 3600000000 THEN 2
                        WHEN lag_us < 21600000000 THEN 3
                        WHEN lag_us < 86400000000 THEN 4
                        ELSE 5 END AS bucket,
              count(*) AS n_users,
              CAST(min(lag_us) AS BIGINT) AS min_lag_us,
              CAST(max(lag_us) AS BIGINT) AS max_lag_us
            FROM lags GROUP BY 1 ORDER BY 1"""))

  /** RFM segmentation — the classic lifecycle partition of a user base:
    * per purchasing user, Recency (last purchase time), Frequency
    * (purchase count) and Monetary (exact decimal revenue) are each
    * tercile-binned against rank-picked cutoffs (q40's
    * histogram-cumulative order statistic — the value at cum >=
    * ceil(n/3) and ceil(2n/3)), then users are counted per (r,f,m)
    * cell. Bin 3 = top third (most recent / most frequent / highest
    * spend); assignment is `v <= cut` CASE against broadcast 1-row
    * cutoffs, so ties land identically on both engines — never ntile,
    * whose remainder distribution would make cell populations depend
    * on the tie order of equal metric values.
    *
    * ## 100 TB notes
    * One shuffle to the per-user rollup; ALL SIX tercile cutoffs come
    * from ONE unpivoted histogram pass — the three metrics stack into a
    * common exact DECIMAL(38,10) carrier (µs recency, counts and the
    * decimal revenue sum all embed exactly), one (metric, value)
    * group-count, one rankedCumSum over the (metric, value) total
    * order, and per-metric cums recovered by subtracting a 3-row
    * broadcast earlier-metric offset — then pivot to ONE 1-row
    * broadcast attached once to the user rollup. The previous plan
    * paid three separate histogram+cum+attach passes (audited at 11
    * shuffles / 38 aggregates / 9 broadcast attaches); this shape
    * audits at 8 shuffles / 22 aggregates / 3 broadcast attaches (the
    * cutoff row, the 3-row offset, and rankedCumSum's internal prefix
    * offset — all <=3-row sides). Cutoff
    * values are bit-identical to the per-metric walk (exact-int cums,
    * exact decimal order), so the oracle is unchanged. The final agg
    * has <= 27 groups. No global per-user sort anywhere.
    */
  val q174RfmSegments: Q = Q(
    "q174_rfm_segments",
    (s, dir) => {
      // eager'd: the rollup feeds the cutoff histogram AND the binning
      // pass — materialize once, or each re-scans the events table
      val u = Tables.eager(Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), tsUs.as("us"),
          col("value").cast("decimal(30,10)").as("v"))
        .groupBy(col("user_id"))
        .agg(max(col("us")).as("r"), count(lit(1)).as("f"),
          sum(col("v")).as("m")))
      // one histogram over distinct values of ALL THREE metrics
      val hist = u.selectExpr(
          "stack(3, 'r', CAST(r AS DECIMAL(38,10)), " +
            "'f', CAST(f AS DECIMAL(38,10)), " +
            "'m', CAST(m AS DECIMAL(38,10))) AS (metric, v)")
        .groupBy(col("metric"), col("v")).agg(count(lit(1)).as("c"))
      // per-metric totals + exclusive earlier-metric count offsets
      // (3-row broadcast triangular join, the Cumulative offset trick)
      val tot = hist.groupBy(col("metric")).agg(sum(col("c")).as("n"))
      val withOff = tot
        .join(broadcast(tot.select(col("metric").as("m2"),
          col("n").as("n2"))), col("m2") < col("metric"), "left")
        .groupBy(col("metric"), col("n"))
        .agg(coalesce(sum(col("n2")), lit(0L)).as("off"))
      // one global ranked walk; within-metric cum = global cum - off
      val cum = graft.engine.Cumulative
        .rankedCumSum(hist, Seq(col("metric").asc, col("v").asc),
          col("c"), rkName = "__rk")
        .join(broadcast(withOff), Seq("metric"))
        .withColumn("mcum", col("cum") - col("off"))
      def pick(num: Int) =
        min(when(col("mcum") * 3 >= col("n") * num, col("v")))
      val perMetric = cum.groupBy(col("metric"))
        .agg(pick(1).as("c1"), pick(2).as("c2"))
      def side(m: String, c: String) =
        max(when(col("metric") === m, col(c)))
      val cuts = perMetric.agg(
        side("r", "c1").as("r1"), side("r", "c2").as("r2"),
        side("f", "c1").as("f1"), side("f", "c2").as("f2"),
        side("m", "c1").as("m1"), side("m", "c2").as("m2"))
      def bin(metric: String) =
        when(col(metric) <= col(s"${metric}1"), 1)
          .when(col(metric) <= col(s"${metric}2"), 2)
          .otherwise(3)
      u.crossJoin(broadcast(cuts))
        .select(bin("r").as("r_bin"), bin("f").as("f_bin"),
          bin("m").as("m_bin"))
        .groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r_bin", "f_bin", "m_bin")
    },
    Some(s"""WITH u AS (SELECT user_id, max(${duckUs("ts")}) AS r,
                count(*) AS f,
                sum(CAST(value AS DECIMAL(30,10))) AS m
              FROM events WHERE event_type = 'purchase' GROUP BY user_id),
            rh AS (SELECT r AS v, count(*) AS c FROM u GROUP BY r),
            rc AS (SELECT min(CASE WHEN cum * 3 >= n * 1 THEN v END) AS r1,
                min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS r2
              FROM (SELECT v, sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                    sum(c) OVER () AS n FROM rh)),
            fh AS (SELECT f AS v, count(*) AS c FROM u GROUP BY f),
            fc AS (SELECT min(CASE WHEN cum * 3 >= n * 1 THEN v END) AS f1,
                min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS f2
              FROM (SELECT v, sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                    sum(c) OVER () AS n FROM fh)),
            mh AS (SELECT m AS v, count(*) AS c FROM u GROUP BY m),
            mc AS (SELECT min(CASE WHEN cum * 3 >= n * 1 THEN v END) AS m1,
                min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS m2
              FROM (SELECT v, sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                    sum(c) OVER () AS n FROM mh))
            SELECT CASE WHEN r <= r1 THEN 1 WHEN r <= r2 THEN 2 ELSE 3 END
                AS r_bin,
              CASE WHEN f <= f1 THEN 1 WHEN f <= f2 THEN 2 ELSE 3 END
                AS f_bin,
              CASE WHEN m <= m1 THEN 1 WHEN m <= m2 THEN 2 ELSE 3 END
                AS m_bin,
              count(*) AS n_users
            FROM u, rc, fc, mc
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** Linear-interpolation gap fill — q90's spine densification with
    * INTERPOLATED values instead of zeros: per event_type, hours with
    * no observed revenue get the straight line between the previous and
    * next observed hours (`vp + (vn - vp) * (h - hp)/(hn - hp)`, one
    * fixed IEEE op tree over exact decimal endpoint sums and exact
    * integer hour distances); hours outside a type's observed range pad
    * with the nearest observed value. Every row is tagged
    * obs / interp / pad so downstream consumers can weight or exclude
    * synthesized points. Zeros (q90) answer "how many events"; a
    * metric like revenue needs a line, not a cliff.
    *
    * ## 100 TB notes
    * Fact-sized work is one (hour, type) group-by with decimal partial
    * aggregation; the spine is a 1-row bounds aggregate exploded (never
    * a driver loop); the four IGNORE NULLS window passes all share the
    * per-type partitioning of a spine x types frame whose size is
    * hours x |types| — independent of fact cardinality.
    */
  val q179InterpolateGaps: Q = Q(
    "q179_interpolate_gaps",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 3600000000").as("h"),
          col("event_type"), col("value").cast("decimal(30,10)").as("v"))
      val obs = ev.groupBy(col("h"), col("event_type"))
        .agg(sum(col("v")).as("v"))
      val bounds = ev.agg(min("h").as("lo"), max("h").as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"), lit(1L))).as("h"))
      val types = ev.select(col("event_type")).distinct()
      val sv = spine.crossJoin(broadcast(types))
        .join(obs, Seq("h", "event_type"), "left")
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val back = w.rowsBetween(Window.unboundedPreceding, -1)
      val fwd = w.rowsBetween(1, Window.unboundedFollowing)
      val withEnds = sv
        .withColumn("hp", last(when(col("v").isNotNull, col("h")), true).over(back))
        .withColumn("vp", last(col("v"), true).over(back))
        .withColumn("hn", first(when(col("v").isNotNull, col("h")), true).over(fwd))
        .withColumn("vn", first(col("v"), true).over(fwd))
      val interp = col("vp").cast("double") +
        (col("vn").cast("double") - col("vp").cast("double")) *
          ((col("h") - col("hp")) / (col("hn") - col("hp")))
      withEnds.select((col("h") * 3600000000L).as("hour_us"),
          col("event_type"),
          when(col("v").isNotNull, col("v").cast("double"))
            .when(col("vp").isNull, col("vn").cast("double"))
            .when(col("vn").isNull, col("vp").cast("double"))
            .otherwise(interp).as("revenue"),
          when(col("v").isNotNull, "obs")
            .when(col("vp").isNull || col("vn").isNull, "pad")
            .otherwise("interp").as("src"))
        .orderBy("hour_us", "event_type")
    },
    Some("""WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                AS h, event_type, CAST(value AS DECIMAL(30,10)) AS v
              FROM events),
            obs AS (SELECT h, event_type, sum(v) AS v
                    FROM ev GROUP BY h, event_type),
            b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
            spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
            t AS (SELECT DISTINCT event_type FROM ev),
            sv AS (SELECT spine.h, t.event_type, obs.v
                   FROM spine CROSS JOIN t
                   LEFT JOIN obs ON obs.h = spine.h
                     AND obs.event_type = t.event_type),
            ends AS (SELECT h, event_type, v,
                last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hp,
                last_value(v IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
                first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS hn,
                first_value(v IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn
              FROM sv)
            SELECT h * 3600000000 AS hour_us, event_type,
              CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                   WHEN vp IS NULL THEN CAST(vn AS DOUBLE)
                   WHEN vn IS NULL THEN CAST(vp AS DOUBLE)
                   ELSE CAST(vp AS DOUBLE)
                     + (CAST(vn AS DOUBLE) - CAST(vp AS DOUBLE))
                       * ((h - hp) / (hn - hp)) END AS revenue,
              CASE WHEN v IS NOT NULL THEN 'obs'
                   WHEN vp IS NULL OR vn IS NULL THEN 'pad'
                   ELSE 'interp' END AS src
            FROM ends ORDER BY hour_us, event_type"""))

  /** Exact ROC AUC by rank-sum — does `value` separate purchases from
    * non-purchases? AUC is the Mann-Whitney statistic
    * U / (n_pos * n_neg) with midrank tie handling; computed exactly in
    * integers via the distinct-value histogram: per value v count
    * positives np(v) and negatives nn(v), accumulate negatives strictly
    * below, and sum 2U = SUM_v np(v) * (2*neg_below(v) + nn(v)) — the
    * `+ nn(v)` term IS the midrank half-credit for ties, doubled so the
    * whole sum stays integral. AUC = 2U / (2 * n_pos * n_neg) is the
    * single IEEE division at the very end; everything before it is
    * exact BIGINT arithmetic, so the statistic is bit-identical across
    * engines, partition counts, and reruns.
    *
    * ## 100 TB notes
    * One shuffle to the distinct-value histogram (map-side partial
    * counts); the cumulative walk runs over value GROUPS, not events,
    * via [[graft.engine.Cumulative.rankedCumSum]] — range-repartition
    * by value + per-range offsets, so even a huge score domain never
    * lands on one partition. No self-join, no per-pair expansion of
    * the n_pos x n_neg comparisons the statistic logically encodes.
    */
  val q181AucRanksum: Q = Q(
    "q181_auc_ranksum",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("value").as("v"),
          (col("event_type") === "purchase").cast("long").as("pos"))
      val hist = ev.groupBy(col("v"))
        .agg(sum(col("pos")).as("np"),
          (count(lit(1)) - sum(col("pos"))).as("nn"))
      // inclusive running sum minus the row's own nn = strictly-below
      val cum = graft.engine.Cumulative
        .rankedCumSum(hist, Seq(col("v").asc), col("nn"),
          rkName = "__rk", cumName = "__cumnn")
        .withColumn("neg_below", col("__cumnn") - col("nn"))
      cum.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
          sum(col("np") * (col("neg_below") * 2 + col("nn"))).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          (col("u2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double")).as("auc"))
    },
    Some("""WITH ev AS (SELECT value AS v,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
              FROM events),
            h AS (SELECT v, CAST(sum(pos) AS BIGINT) AS np,
                count(*) - CAST(sum(pos) AS BIGINT) AS nn
              FROM ev GROUP BY v),
            c AS (SELECT np, nn,
                coalesce(sum(nn) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS neg_below
              FROM h),
            agg AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                CAST(sum(nn) AS BIGINT) AS n_neg,
                CAST(sum(np * (neg_below * 2 + nn)) AS BIGINT) AS u2
              FROM c)
            SELECT n_pos, n_neg, u2,
              CAST(u2 AS DOUBLE) / CAST(n_pos * n_neg * 2 AS DOUBLE) AS auc
            FROM agg"""))

  /** Distinct-user support of sequential patterns a -> b: for every
    * ordered pair of event types, how many users have SOME occurrence
    * of `a` strictly before SOME occurrence of `b` — the containment
    * semantics of sequential pattern mining (PrefixSpan / SPAM), which
    * q122's Markov matrix does NOT answer (that counts ADJACENT
    * transitions; a -> b here may have any gap). The per-user test
    * `exists i<j: t_i=a, t_j=b` reduces exactly to
    * `min_ts(a) < max_ts(b)`, so each user contributes one bounded row
    * per type — never a per-event self-join. Also emits support as
    * exact ppm of the user base (integer floor division).
    *
    * ## 100 TB notes
    * One shuffle to the (user, type) rollup; the pair expansion joins
    * that rollup with itself PER USER on the shared user_id
    * partitioning — each side is at most |types| rows per user, so the
    * join output is bounded by |users| * |types|^2, independent of
    * event count. The final agg has <= |types|^2 groups.
    */
  val q185SeqPatterns: Q = Q(
    "q185_seq_patterns",
    (s, dir) => {
      val ut = Tables.eager(Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("us"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us")))
      val total = ut.agg(count_distinct(col("user_id")).as("n_total"))
      val a = ut.select(col("user_id"), col("event_type").as("a"),
        col("first_us"))
      val b = ut.select(col("user_id"), col("event_type").as("b"),
        col("last_us"))
      a.join(b, Seq("user_id"))
        .filter(col("a") =!= col("b") && col("first_us") < col("last_us"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(total))
        .select(col("a"), col("b"), col("n_users"),
          expr("n_users * 1000000 div n_total").as("support_ppm"))
        .orderBy(col("a"), col("b"))
    },
    Some(s"""WITH ut AS (SELECT user_id, event_type,
                min(${duckUs("ts")}) AS first_us,
                max(${duckUs("ts")}) AS last_us
              FROM events GROUP BY user_id, event_type),
            n AS (SELECT count(DISTINCT user_id) AS n_total FROM ut)
            SELECT a.event_type AS a, b.event_type AS b,
              count(*) AS n_users,
              count(*) * 1000000 // (SELECT n_total FROM n) AS support_ppm
            FROM ut a JOIN ut b ON a.user_id = b.user_id
              AND a.event_type <> b.event_type
              AND a.first_us < b.last_us
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Decile lift (gains table) — the model-eval companion to q181's
    * AUC: users ranked by an engagement score (view count) are cut into
    * ten value-bins against rank-picked cutoffs (q174's
    * histogram-cumulative order statistic, `v <= cut` assignment so
    * ties land in one bin on both engines — never ntile, whose
    * remainder spreading is tie-order-dependent), then each bin reports
    * its purchase-conversion numerator/denominator exactly and
    * `lift = (conv_d * n_total) / (purch_total * n_d)` as ONE IEEE
    * division over a pre-multiplied exact integer numerator and
    * denominator — not rate/rate, which would be three divergence-prone
    * divisions.
    *
    * ## 100 TB notes
    * One shuffle to the per-user rollup; the ten cutoffs come from a
    * histogram over DISTINCT score values reduced to one broadcast row;
    * the final agg has <= 10 groups. Same shape as q174 at any scale.
    */
  val q186DecileLift: Q = Q(
    "q186_decile_lift",
    (s, dir) => {
      val u = Tables.eager(Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(when(col("event_type") === "view", 1)).as("score"),
          max((col("event_type") === "purchase").cast("long")).as("buyer")))
      val hist = u.groupBy(col("score").as("v"))
        .agg(count(lit(1)).as("c"))
      // cutoff walk over distinct scores without a single-partition
      // window: rankedCumSum for cum, 1-row broadcast for n
      val nTot = hist.agg(sum(col("c")).as("n")) // 1 row
      val cum = graft.engine.Cumulative
        .rankedCumSum(hist, Seq(col("v").asc), col("c"), rkName = "__rk")
        .crossJoin(broadcast(nTot))
      val picks = (1 to 9).map(i =>
        min(when(col("cum") * 10 >= col("n") * i, col("v"))).as(s"c$i"))
      val cuts = cum.agg(picks.head, picks.tail: _*)
      val decile = (1 to 9).foldLeft(when(lit(false), 0)) {
        case (acc, i) => acc.when(col("score") <= col(s"c$i"), i)
      }.otherwise(10)
      val binned = u.crossJoin(broadcast(cuts))
        .select(decile.as("decile"), col("buyer"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("buyer")).as("n_buyers"))
      val tot = binned.agg(sum(col("n_users")).as("t_users"),
        sum(col("n_buyers")).as("t_buyers"))
      binned.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_users"), col("n_buyers"),
          ((col("n_buyers") * col("t_users")).cast("double") /
            (col("t_buyers") * col("n_users")).cast("double")).as("lift"))
        .orderBy(col("decile"))
    },
    Some("""WITH u AS (SELECT user_id,
                count(CASE WHEN event_type = 'view' THEN 1 END) AS score,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS buyer
              FROM events GROUP BY user_id),
            h AS (SELECT score AS v, count(*) AS c FROM u GROUP BY score),
            cm AS (SELECT v, sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(c) OVER () AS n FROM h),
            cuts AS (SELECT
                min(CASE WHEN cum * 10 >= n * 1 THEN v END) AS c1,
                min(CASE WHEN cum * 10 >= n * 2 THEN v END) AS c2,
                min(CASE WHEN cum * 10 >= n * 3 THEN v END) AS c3,
                min(CASE WHEN cum * 10 >= n * 4 THEN v END) AS c4,
                min(CASE WHEN cum * 10 >= n * 5 THEN v END) AS c5,
                min(CASE WHEN cum * 10 >= n * 6 THEN v END) AS c6,
                min(CASE WHEN cum * 10 >= n * 7 THEN v END) AS c7,
                min(CASE WHEN cum * 10 >= n * 8 THEN v END) AS c8,
                min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS c9
              FROM cm),
            binned AS (SELECT CASE
                  WHEN score <= c1 THEN 1 WHEN score <= c2 THEN 2
                  WHEN score <= c3 THEN 3 WHEN score <= c4 THEN 4
                  WHEN score <= c5 THEN 5 WHEN score <= c6 THEN 6
                  WHEN score <= c7 THEN 7 WHEN score <= c8 THEN 8
                  WHEN score <= c9 THEN 9 ELSE 10 END AS decile,
                buyer
              FROM u, cuts),
            g AS (SELECT decile, count(*) AS n_users,
                CAST(sum(buyer) AS BIGINT) AS n_buyers
              FROM binned GROUP BY decile),
            t AS (SELECT CAST(sum(n_users) AS BIGINT) AS t_users,
                CAST(sum(n_buyers) AS BIGINT) AS t_buyers FROM g)
            SELECT decile, n_users, n_buyers,
              CAST(n_buyers * t_users AS DOUBLE)
                / CAST(t_buyers * n_users AS DOUBLE) AS lift
            FROM g, t ORDER BY decile"""))

  /** Sample-ratio mismatch (SRM) check — the first gate of any A/B
    * readout, complementing q148's effect z-test: users are assigned to
    * two arms by the same seeded content hash q166's sharding uses
    * (reproducible on any engine or rerun — no RNG state), and the
    * OBSERVED split is tested against the designed 50/50. For a two-cell
    * equal split the chi-square statistic collapses algebraically to
    * `(n0 - n1)^2 / (n0 + n1)` — one IEEE division over exact integer
    * counts, so the statistic and the flag (chi2 > 3.841, alpha=0.05,
    * 1 df) are bit-identical across engines. An SRM flag means the
    * assignment or logging pipeline is biased and the experiment's
    * effect estimates are untrustworthy — the check runs BEFORE any
    * metric query.
    *
    * Scale shape: one distinct-user pass (map-side partial distinct on
    * user_id), then a 2-group count — nothing downstream of the
    * per-user rollup exceeds two rows.
    */
  val q188SrmCheck: Q = Q(
    "q188_srm_check",
    (s, dir) => {
      val arm = pmod(graft.engine.ext.Text.hash32(
        concat(col("user_id").cast("string"), lit(":ab1"))), lit(2L))
      val users = Tables.load(s, dir, "events")
        .select(col("user_id")).distinct()
      users.select(arm.as("arm"))
        .agg(count(when(col("arm") === 0, 1)).as("n0"),
          count(when(col("arm") === 1, 1)).as("n1"))
        .select(col("n0"), col("n1"),
          ((col("n0") - col("n1")) * (col("n0") - col("n1"))).cast("double")
            ./((col("n0") + col("n1")).cast("double")).as("chi2"))
        .withColumn("srm", col("chi2") > 3.841)
    },
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
            armed AS (SELECT
                ('0x' || substring(md5(user_id::VARCHAR || ':ab1'), 1, 8))
                  ::BIGINT % 2 AS arm
              FROM u),
            g AS (SELECT
                count(CASE WHEN arm = 0 THEN 1 END) AS n0,
                count(CASE WHEN arm = 1 THEN 1 END) AS n1
              FROM armed)
            SELECT n0, n1,
              CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                / CAST(n0 + n1 AS DOUBLE) AS chi2,
              CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                / CAST(n0 + n1 AS DOUBLE) > 3.841 AS srm
            FROM g"""))

  /** Exact two-sample Kolmogorov-Smirnov test — does `value` follow the
    * same distribution for views and purchases? The KS statistic
    * D = max_v |F1(v) - F2(v)| is computed WITHOUT floats: over the
    * distinct-value histogram, the supremum of
    * |cum1(v) * n2 - cum2(v) * n1| is an exact BIGINT (the common
    * denominator n1*n2 factored out), and D, the asymptotic alpha=0.05
    * critical value 1.358 * sqrt((n1+n2)/(n1*n2)), and the reject flag
    * are each one short IEEE op tree over those integers — sqrt is
    * correctly rounded under IEEE 754 on every platform, so all three
    * are bit-identical across engines. Complements the family's
    * parametric tests (q148 z-test, q128 chi-square): KS is
    * distribution-free and sees shape differences a mean test misses.
    *
    * ## 100 TB notes
    * One shuffle to the distinct-value histogram with map-side partial
    * counts; the cumulative walk is over value GROUPS (q181's
    * histogram-cumulative discipline); everything after it is a 1-row
    * aggregate. No sort of raw events, no per-pair work.
    */
  val q192KsTest: Q = Q(
    "q192_ks_test",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("value").as("v"),
          (col("event_type") === "view").cast("long").as("is1"))
      val hist = ev.groupBy(col("v"))
        .agg(sum(col("is1")).as("c1"),
          (count(lit(1)) - sum(col("is1"))).as("c2"))
      // both CDF walks share one range shuffle (rankedCumSums); the
      // sample sizes are a 1-row broadcast, not a full-frame window
      val totals = hist.agg(sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2")) // 1 row
      val cum = graft.engine.Cumulative
        .rankedCumSums(hist, Seq(col("v").asc),
          Seq(col("c1") -> "cum1", col("c2") -> "cum2"), rkName = "__rk")
        .crossJoin(broadcast(totals))
      cum.agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
            .as("d_numer"))
        .select(col("n1"), col("n2"), col("d_numer"),
          (col("d_numer").cast("double") /
            (col("n1") * col("n2")).cast("double")).as("d"))
        .withColumn("crit", lit(1.358) *
          sqrt((col("n1") + col("n2")).cast("double") /
            (col("n1") * col("n2")).cast("double")))
        .withColumn("reject", col("d") > col("crit"))
    },
    Some("""WITH ev AS (SELECT value AS v,
                CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1
              FROM events WHERE event_type IN ('view', 'purchase')),
            h AS (SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
                count(*) - CAST(sum(is1) AS BIGINT) AS c2
              FROM ev GROUP BY v),
            c AS (SELECT c1, c2,
                sum(c1) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
                sum(c2) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
                sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
              FROM h),
            agg AS (SELECT CAST(max(n1) AS BIGINT) AS n1,
                CAST(max(n2) AS BIGINT) AS n2,
                CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_numer
              FROM c)
            SELECT n1, n2, d_numer,
              CAST(d_numer AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS d,
              1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
                / CAST(n1 * n2 AS DOUBLE)) AS crit,
              CAST(d_numer AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)
                > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
                  / CAST(n1 * n2 AS DOUBLE)) AS reject
            FROM agg"""))

  /** Purged temporal cross-validation folds (Lopez de Prado's purged
    * K-fold) — the time-series counterpart of q48's hash split and q70's
    * group-leakage gate: the event range is cut into 5 contiguous
    * time blocks; when block k is the TEST fold, training events inside
    * the EMBARGO band (6 hours on each side of the test block) are
    * PURGED, because serially-correlated labels straddling the boundary
    * leak test information into training. Emits, per fold: the test
    * bounds, test/train/purged counts — train + purged + test = total
    * for every fold by construction (the spec asserts the partition).
    * All block and band arithmetic is exact integer hours from a 1-row
    * bounds broadcast.
    *
    * ## 100 TB notes
    * The fold expansion is a bounded x5 literal explode per event
    * (q177's pattern) feeding a map-side-combined 5-group aggregate —
    * one shuffle of 15 counter rows, however large the fact table. No
    * sort, no window, no join beyond the broadcast bounds.
    */
  val q199PurgedCvFolds: Q = Q(
    "q199_purged_cv_folds",
    (s, dir) => {
      val embargoH = 6L
      val ev = Tables.load(s, dir, "events")
        .select(expr("(ts div 1000) div 3600000000").as("h"))
      val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      val withB = ev.crossJoin(broadcast(bounds))
        .select(col("h"), col("lo"),
          (col("hi") - col("lo") + 1).as("span"))
      val folds = withB
        .select(col("h"), col("lo"), col("span"),
          explode(sequence(lit(0L), lit(4L))).as("fold"))
        .withColumn("t_lo", col("lo") + expr("(span * fold) div 5"))
        .withColumn("t_hi", col("lo") + expr("(span * (fold + 1)) div 5") - 1)
      val cls = when(col("h").between(col("t_lo"), col("t_hi")), "test")
        .when(col("h").between(col("t_lo") - embargoH, col("t_hi") + embargoH),
          "purged")
        .otherwise("train")
      folds.groupBy(col("fold"), col("t_lo"), col("t_hi"))
        .agg(count(when(cls === "test", 1)).as("n_test"),
          count(when(cls === "train", 1)).as("n_train"),
          count(when(cls === "purged", 1)).as("n_purged"))
        .orderBy(col("fold"))
    },
    Some(s"""WITH ev AS (SELECT ${duckUs("ts")} // 3600000000 AS h
              FROM events),
            b AS (SELECT min(h) AS lo, max(h) - min(h) + 1 AS span FROM ev),
            f AS (SELECT h, lo, span, fold,
                lo + (span * fold) // 5 AS t_lo,
                lo + (span * (fold + 1)) // 5 - 1 AS t_hi
              FROM ev, b, (SELECT unnest(generate_series(0, 4)) AS fold)),
            cls AS (SELECT fold, t_lo, t_hi,
                CASE WHEN h BETWEEN t_lo AND t_hi THEN 'test'
                     WHEN h BETWEEN t_lo - 6 AND t_hi + 6 THEN 'purged'
                     ELSE 'train' END AS c
              FROM f)
            SELECT fold, t_lo, t_hi,
              count(CASE WHEN c = 'test' THEN 1 END) AS n_test,
              count(CASE WHEN c = 'train' THEN 1 END) AS n_train,
              count(CASE WHEN c = 'purged' THEN 1 END) AS n_purged
            FROM cls GROUP BY fold, t_lo, t_hi ORDER BY fold"""))

  /** CUPED variance-reduction audit (controlled experiments using
    * pre-experiment data) — before an A/B readout, how much outcome
    * variance does the pre-period covariate remove? Per user: x = view
    * count in the FIRST half of the time range (pre-period), y =
    * purchase count in the SECOND half (outcome). Both are integer
    * counts, so every moment (n, Sx, Sy, Sxx, Sxy, Syy) is an exact
    * BIGINT; theta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is one IEEE
    * division, and the variance-reduction fraction is squared-
    * correlation r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))
    * — numerator and denominator each exact integers, one division.
    * The practical payoff: the same experiment needs (1 - r2) of the
    * traffic for equal power when CUPED-adjusted.
    *
    * ## 100 TB notes
    * One shuffle to the per-user rollup (conditional counts computed
    * in the same pass from a 1-row bounds broadcast), then a 1-row
    * moment aggregate with map-side partials — q41/q114's exact-moment
    * discipline applied to experimentation.
    */
  val q201CupedAudit: Q = Q(
    "q201_cuped_audit",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), tsUs.as("us"))
      val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        .select(expr("(lo + hi) div 2").as("mid"))
      val u = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(count(when(col("event_type") === "view" &&
            col("us") < col("mid"), 1)).as("x"),
          count(when(col("event_type") === "purchase" &&
            col("us") >= col("mid"), 1)).as("y"))
      u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n"), col("sx"), col("sy"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("theta"),
          (((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))).cast("double") /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy")))
              .cast("double")).as("var_reduction"))
    },
    Some(s"""WITH ev AS (SELECT user_id, event_type, ${duckUs("ts")} AS us
              FROM events),
            b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
            u AS (SELECT user_id,
                count(CASE WHEN event_type = 'view' AND us < mid
                      THEN 1 END) AS x,
                count(CASE WHEN event_type = 'purchase' AND us >= mid
                      THEN 1 END) AS y
              FROM ev, b GROUP BY user_id),
            m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(y * y) AS BIGINT) AS syy
              FROM u)
            SELECT n, sx, sy,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
              CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
                / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)
                AS var_reduction
            FROM m"""))

  private val streamingNames: Set[String] = Set(
    "q64_stream_hourly", "q66_stream_dedup", "q75_stream_sessions",
    "q76_stream_late_drop", "q78_stream_interval_join",
    "q83_stream_static_enrich", "q84_foreachbatch_upsert",
    "q107_stream_outer_join", "q119_stream_running_totals",
    "q265_stream_tws_totals", "q266_stream_tws_sessions",
    "q275_stream_tws_topk", "q276_stream_tws_typecounts",
    "q284_stream_incremental_gold", "q293_manifest_changefeed")

  /** Session entry/exit/bounce profile — the landing-page report: for
    * each event type, how many sessions START there, END there, and
    * BOUNCE there (single-event sessions — entry and exit at once)?
    * Product analytics reads acquisition quality straight off this
    * table (high entry + high bounce = a broken front door), and none
    * of the existing session queries (q33 sessionize, q86 funnel, q132
    * dwell) expose position-in-session roles. Sessions are q33's exact
    * gaps-and-islands relation; entry/exit election is the total order
    * (ts, event_id) ascending/descending, so ties cannot flip roles;
    * entry_share is one double division against the global session
    * count (window-summed over the per-type aggregate, which is
    * event-type-cardinality rows — not data-scale).
    *
    * ## 100 TB notes
    * One shuffle on user_id drives sessionization AND both role
    * windows (same partition key, same exchange); the per-type rollup
    * is a map-side-combined conditional sum; the global-total window
    * runs over ~|event types| rows. Nothing here scales worse than
    * q33 itself.
    */
  val q210EntryExitBounce: Q = Q(
    "q210_entry_exit_bounce",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val newSession = when(
        col("prev_us").isNull || (col("ts_us") - col("prev_us")) > GapUs, 1L)
        .otherwise(0L)
      val sessed = ev.select(col("user_id"), col("event_id"),
          col("event_type"), tsUs.as("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("is_new", newSession)
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy(col("user_id"), col("session_seq"))
      val roles = sessed
        .withColumn("rn_a", row_number().over(
          bySess.orderBy(col("ts_us").asc, col("event_id").asc)))
        .withColumn("rn_d", row_number().over(
          bySess.orderBy(col("ts_us").desc, col("event_id").desc)))
      val perType = roles.groupBy(col("event_type"))
        .agg(sum(when(col("rn_a") === 1, 1L).otherwise(0L)).as("n_entry"),
          sum(when(col("rn_d") === 1, 1L).otherwise(0L)).as("n_exit"),
          sum(when(col("rn_a") === 1 && col("rn_d") === 1, 1L)
            .otherwise(0L)).as("n_bounce"))
      perType
        .withColumn("total_sessions",
          sum(col("n_entry")).over(Window.partitionBy(lit(1))))
        .select(col("event_type"), col("n_entry"), col("n_exit"),
          col("n_bounce"),
          (col("n_entry").cast("double") /
            col("total_sessions").cast("double")).as("entry_share"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH $duckSessionCtes,
             roles AS (SELECT event_type,
                 row_number() OVER (PARTITION BY user_id, session_seq
                   ORDER BY ts_us ASC, event_id ASC) AS rn_a,
                 row_number() OVER (PARTITION BY user_id, session_seq
                   ORDER BY ts_us DESC, event_id DESC) AS rn_d
               FROM sess),
             pt AS (SELECT event_type,
                 CAST(sum(CASE WHEN rn_a = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_entry,
                 CAST(sum(CASE WHEN rn_d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exit,
                 CAST(sum(CASE WHEN rn_a = 1 AND rn_d = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_bounce
               FROM roles GROUP BY event_type)
             SELECT event_type, n_entry, n_exit, n_bounce,
               CAST(n_entry AS DOUBLE) / CAST(sum(n_entry) OVER () AS DOUBLE)
                 AS entry_share
             FROM pt ORDER BY event_type"""))

  /** Top session trigram paths — the three-step navigation sequences
    * users actually walk, the "top paths" report product analytics
    * tools ship front-and-center: q122's Markov matrix only sees
    * MEMORYLESS transitions (a->b), which cannot distinguish
    * view->click->purchase from error->click->purchase; the trigram
    * restores two steps of context, exactly the depth funnel
    * diagnostics need. Paths are formed WITHIN q33's sessions (lead
    * over the session's total event order, so a path can never span a
    * session boundary), counted, and top-10'd with a path-string
    * tiebreak.
    *
    * ## 100 TB notes
    * The same single user_id shuffle as q33 feeds the session windows
    * AND both leads; the path rollup is map-side combined on a bounded
    * key domain (|event types|^3); top-10 is TakeOrderedAndProject.
    */
  val q215TrigramPaths: Q = Q(
    "q215_trigram_paths",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val newSession = when(
        col("prev_us").isNull || (col("ts_us") - col("prev_us")) > GapUs, 1L)
        .otherwise(0L)
      val sessed = ev.select(col("user_id"), col("event_id"),
          col("event_type"), tsUs.as("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("is_new", newSession)
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      val inSess = Window.partitionBy(col("user_id"), col("session_seq"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      sessed
        .withColumn("t2", lead(col("event_type"), 1).over(inSess))
        .withColumn("t3", lead(col("event_type"), 2).over(inSess))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_walks"))
        .orderBy(col("n_walks").desc, col("path").asc)
        .limit(10)
    },
    Some(s"""WITH $duckSessionCtes,
             tri AS (SELECT event_type || '>' ||
                 lead(event_type, 1) OVER w || '>' ||
                 lead(event_type, 2) OVER w AS path
               FROM sess
               WINDOW w AS (PARTITION BY user_id, session_seq
                 ORDER BY ts_us ASC, event_id ASC))
             SELECT path, count(*) AS n_walks FROM tri
             WHERE path IS NOT NULL
             GROUP BY path ORDER BY n_walks DESC, path ASC LIMIT 10"""))

  /** Time-decay attribution — the third member of the attribution
    * family (q131 first-touch gives everything to the opener, q146
    * linear splits equally): credit halves for every hour between
    * touch and purchase, the standard recency model. And it needs NO
    * floats: with a 24 h lookback the weight is the exact integer
    * 2^(24 - age_hours), so each touch's credit is
    * cents * 10^6 * w div sum(w). The numerator accumulates in
    * decimal(38,0) / HUGEINT (cents x 10^6 x 2^24 passes int64 at
    * ~$5,497 per purchase — int64 would wrap silently on Spark while
    * DuckDB raises, a divergent failure mode); the quotient is back
    * inside int64 (<= cents * 10^6, since w <= sum_w) so the credit
    * lands as exact BIGINT micro-cents on both engines — the same
    * exact micro-credit discipline as q146, just recency-shaped.
    * The usual pow(0.5, age/halflife) formulation would hang the
    * result on libm pow's last-ulp behavior across engines; powers of
    * two make the model exact instead.
    *
    * ## 100 TB notes
    * Identical plan shape to q146: the purchase-click interval join on
    * user_id, one per-purchase window for sum(w) on the same
    * partitioning, then a map-side-combined rollup on hour-of-day.
    */
  val q232TimeDecayAttribution: Q = Q(
    "q232_time_decay_attribution",
    (s, dir) => {
      val lookbackUs = 24L * 3600 * 1000000
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          tsUs.as("ts_us"), col("value"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pur_id"), col("user_id"),
          col("ts_us").as("pur_ts_us"),
          floor(col("value") * 100).cast("long").as("cents"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("clk_user"),
          col("ts_us").as("clk_ts_us"))
      val touched = pur.join(clk,
        col("user_id") === col("clk_user") &&
          col("clk_ts_us") >= col("pur_ts_us") - lookbackUs &&
          col("clk_ts_us") <= col("pur_ts_us"))
        .withColumn("w", expr(
          "shiftleft(cast(1 as bigint), " +
            "cast(24 - (pur_ts_us - clk_ts_us) div 3600000000 as int))"))
      val withW = touched
        .withColumn("sum_w",
          sum(col("w")).over(Window.partitionBy("pur_id")))
      withW
        .select(expr("(clk_ts_us div 3600000000) % 24").as("hour_of_day"),
          expr("cast(cents as decimal(38,0)) * 1000000 * w div sum_w")
            .as("credit_micro"))
        .groupBy(col("hour_of_day"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_micro")).as("credited_micro"),
          (sum(col("credit_micro")).cast("double") / 1e8)
            .as("credited_dollars"))
        .orderBy("hour_of_day")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
                    ${duckUs("ts")} AS ts_us,
                    CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM events),
             p AS (SELECT event_id AS pur_id, user_id,
                     ts_us AS pur_ts_us, cents
                   FROM ev WHERE event_type = 'purchase'),
             c AS (SELECT user_id AS clk_user, ts_us AS clk_ts_us
                   FROM ev WHERE event_type = 'click'),
             t AS (SELECT p.*, clk_ts_us,
                     (CAST(1 AS BIGINT) << CAST(24 -
                       (pur_ts_us - clk_ts_us) // 3600000000 AS INT)) AS w
                   FROM p JOIN c
                     ON user_id = clk_user
                       AND clk_ts_us >= pur_ts_us - ${24L * 3600 * 1000000}
                       AND clk_ts_us <= pur_ts_us),
             tw AS (SELECT *, CAST(sum(w) OVER (PARTITION BY pur_id)
                      AS BIGINT) AS sum_w FROM t)
             SELECT (clk_ts_us // 3600000000) % 24 AS hour_of_day,
               count(*) AS n_touches,
               CAST(sum(CAST(CAST(cents AS HUGEINT) * 1000000 * w // sum_w
                   AS BIGINT)) AS BIGINT) AS credited_micro,
               CAST(sum(CAST(CAST(cents AS HUGEINT) * 1000000 * w // sum_w
                   AS BIGINT)) AS DOUBLE) / 1e8
                 AS credited_dollars
             FROM tw GROUP BY 1 ORDER BY 1"""))

  /** Per-transition dwell time — the semi-Markov companion to q122:
    * the transition MATRIX says users go view -> purchase, but not how
    * long that edge takes; this reports, for every adjacent in-session
    * transition (same 30-min gap rule as q33, single-sourced GapUs),
    * the count and mean seconds spent on the edge. The report that
    * separates a fast checkout funnel from a stalled one. Gap sums are
    * exact epoch-µs BIGINTs; the mean is one fixed double tree.
    *
    * ## 100 TB notes
    * One user_id shuffle feeds the lead window; the transition rollup
    * is map-side combined on a |types|^2-bounded key. Same cost as
    * q122 itself.
    */
  val q233TransitionDwell: Q = Q(
    "q233_transition_dwell",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      ev.select(col("user_id"), col("event_id"), col("event_type"),
          tsUs.as("ts_us"))
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .withColumn("next_ts", lead(col("ts_us"), 1).over(byUser))
        .filter(col("next_type").isNotNull &&
          (col("next_ts") - col("ts_us")) <= GapUs)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("next_ts") - col("ts_us")).as("sum_gap_us"))
        .select(col("from_type"), col("to_type"), col("n"),
          col("sum_gap_us"),
          (col("sum_gap_us").cast("double") / col("n").cast("double") /
            1000000.0).as("mean_gap_s"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, event_type,
                    ${duckUs("ts")} AS ts_us FROM events),
             p AS (SELECT event_type AS from_type,
                     lead(event_type) OVER w AS to_type,
                     lead(ts_us) OVER w - ts_us AS gap_us
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts_us ASC, event_id ASC))
             SELECT from_type, to_type, count(*) AS n,
               CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
               CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 / 1000000.0 AS mean_gap_s
             FROM p WHERE to_type IS NOT NULL AND gap_us <= $GapUs
             GROUP BY from_type, to_type
             ORDER BY from_type, to_type"""))

  /** Process-conformance audit — process mining's conformance check
    * against a declared happy-path model: signup starts a journey;
    * view/click browse; purchase must follow a click; error may follow
    * anything but nothing may follow an error (within a session). Each
    * adjacent in-session transition is classified against the declared
    * whitelist, and the report gives every observed (from, to) edge
    * with its count, its allowed/violating flag, and its share of ALL
    * transitions — the fitness table auditors read to see WHERE the
    * real process deviates from the designed one, not just that it
    * does. The model is explicit in the query (a literal whitelist),
    * so the audit is self-documenting.
    *
    * ## 100 TB notes
    * Same single user_id shuffle as q233 (adjacency via one lead
    * window); classification is a map; the rollup is |types|^2-bounded
    * with the global share window over that tiny aggregate.
    */
  val q238ProcessConformance: Q = Q(
    "q238_process_conformance",
    (s, dir) => {
      val allowed = Seq(
        "signup" -> "view", "signup" -> "click",
        "view" -> "view", "view" -> "click",
        "click" -> "view", "click" -> "click", "click" -> "purchase",
        "purchase" -> "view", "purchase" -> "click",
        "signup" -> "error", "view" -> "error", "click" -> "error",
        "purchase" -> "error")
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val trans = ev.select(col("user_id"), col("event_id"),
          col("event_type"), tsUs.as("ts_us"))
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .withColumn("next_ts", lead(col("ts_us"), 1).over(byUser))
        .filter(col("next_type").isNotNull &&
          (col("next_ts") - col("ts_us")) <= GapUs)
        .select(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
      val isAllowed = allowed.map { case (f, t) =>
        col("from_type") === f && col("to_type") === t
      }.reduce(_ || _)
      trans.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("allowed", isAllowed)
        .withColumn("total",
          sum(col("n")).over(Window.partitionBy(lit(1))))
        .select(col("from_type"), col("to_type"), col("n"), col("allowed"),
          (col("n").cast("double") / col("total").cast("double"))
            .as("share"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, event_type,
                    ${duckUs("ts")} AS ts_us FROM events),
             p AS (SELECT event_type AS from_type,
                     lead(event_type) OVER w AS to_type,
                     lead(ts_us) OVER w - ts_us AS gap_us
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts_us ASC, event_id ASC)),
             t AS (SELECT from_type, to_type, count(*) AS n
                   FROM p WHERE to_type IS NOT NULL AND gap_us <= $GapUs
                   GROUP BY from_type, to_type)
             SELECT from_type, to_type, n,
               (from_type, to_type) IN (
                 ('signup', 'view'), ('signup', 'click'),
                 ('view', 'view'), ('view', 'click'),
                 ('click', 'view'), ('click', 'click'),
                 ('click', 'purchase'),
                 ('purchase', 'view'), ('purchase', 'click'),
                 ('signup', 'error'), ('view', 'error'),
                 ('click', 'error'), ('purchase', 'error')) AS allowed,
               CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
             FROM t ORDER BY from_type, to_type"""))

  /** Difference-in-differences — the quasi-experimental workhorse when
    * randomization alone isn't trusted: users are split into q188's
    * deterministic hash arms, event time into pre/post halves at the
    * integer midpoint of the observed range (computed from the data,
    * identically on both engines), and the estimate is
    * (T_post - T_pre) - (C_post - C_pre) on mean event value per
    * cell — differencing out both the arm's level and the period's
    * trend, which a naive post-only comparison conflates with the
    * effect. Cell sums are exact integer cents; the four means and the
    * DiD are one fixed double op tree; with hash arms and no real
    * intervention the estimate should hover near zero — the A/A
    * reading of this audit.
    *
    * ## 100 TB notes
    * One pass: the midpoint comes from a 1-row min/max aggregate
    * broadcast back (cross join of a single row), then a single
    * map-side-combined 4-cell conditional aggregate. No shuffle wider
    * than one row after the scan.
    */
  val q239DiffInDiff: Q = Q(
    "q239_diff_in_diff",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), tsUs.as("ts_us"),
          floor(col("value") * 100).cast("long").as("cents"))
      val bounds = ev.agg(min(col("ts_us")).as("lo"),
        max(col("ts_us")).as("hi"))
      val arm = pmod(graft.engine.ext.Text.hash32(
        concat(col("user_id").cast("string"), lit(":ab1"))), lit(2L))
      val cells = ev.crossJoin(broadcast(bounds))
        .select(arm.as("arm"),
          (col("ts_us") >= expr("(lo + hi) div 2")).as("post"),
          col("cents"))
      def cell(a: Int, p: Boolean, c: String) = Seq(
        sum(when(col("arm") === a && col("post") === p, col("cents"))
          .otherwise(0L)).as(s"s_$c"),
        sum(when(col("arm") === a && col("post") === p, 1L)
          .otherwise(0L)).as(s"n_$c"))
      val aggs = cell(1, false, "t_pre") ++ cell(1, true, "t_post") ++
        cell(0, false, "c_pre") ++ cell(0, true, "c_post")
      val m = cells.agg(aggs.head, aggs.tail: _*)
      def mean(c: String) =
        col(s"s_$c").cast("double") / col(s"n_$c").cast("double")
      m.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
          col("n_c_post"),
          mean("t_pre").as("mean_t_pre"), mean("t_post").as("mean_t_post"),
          mean("c_pre").as("mean_c_pre"), mean("c_post").as("mean_c_post"))
        .withColumn("did",
          (col("mean_t_post") - col("mean_t_pre")) -
            (col("mean_c_post") - col("mean_c_pre")))
    },
    Some(s"""WITH ev AS (SELECT user_id, ${duckUs("ts")} AS ts_us,
                  CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
             b AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM ev),
             c AS (SELECT
                 ('0x' || substring(md5(user_id::VARCHAR || ':ab1'), 1, 8))
                   ::BIGINT % 2 AS arm,
                 ts_us >= (lo + hi) // 2 AS post, cents
               FROM ev, b),
             m AS (SELECT
                 CAST(sum(CASE WHEN arm = 1 AND NOT post THEN cents
                          ELSE 0 END) AS BIGINT) AS s_t_pre,
                 CAST(sum(CASE WHEN arm = 1 AND NOT post THEN 1
                          ELSE 0 END) AS BIGINT) AS n_t_pre,
                 CAST(sum(CASE WHEN arm = 1 AND post THEN cents
                          ELSE 0 END) AS BIGINT) AS s_t_post,
                 CAST(sum(CASE WHEN arm = 1 AND post THEN 1
                          ELSE 0 END) AS BIGINT) AS n_t_post,
                 CAST(sum(CASE WHEN arm = 0 AND NOT post THEN cents
                          ELSE 0 END) AS BIGINT) AS s_c_pre,
                 CAST(sum(CASE WHEN arm = 0 AND NOT post THEN 1
                          ELSE 0 END) AS BIGINT) AS n_c_pre,
                 CAST(sum(CASE WHEN arm = 0 AND post THEN cents
                          ELSE 0 END) AS BIGINT) AS s_c_post,
                 CAST(sum(CASE WHEN arm = 0 AND post THEN 1
                          ELSE 0 END) AS BIGINT) AS n_c_post
               FROM c)
             SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
               CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE)
                 AS mean_t_pre,
               CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
                 AS mean_t_post,
               CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)
                 AS mean_c_pre,
               CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
                 AS mean_c_post,
               (CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
                - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
               - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
                  - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))
                 AS did
             FROM m"""))

  /** Double-fire detection — the idempotency audit every event
    * pipeline runs: the same user emitting the SAME event type again
    * within 10 minutes is the signature of duplicate webhooks, retry
    * storms, and double-submitted forms (a plain event_id dedup — q66
    * — cannot catch these, because re-fires arrive with FRESH ids).
    * One row per event type: repeat count, affected-user reach, and
    * the tightest observed gap (a near-zero minimum screams
    * at-least-once delivery; minutes-scale repeats are humans).
    * Exact integer microseconds throughout.
    *
    * ## 100 TB notes
    * One lag window on a SINGLE (user_id, event_type) shuffle — note
    * the type in the key: repeats are per-type, so the partitioning is
    * finer than q233's — then a map-side-combined rollup on type.
    */
  val q244DoubleFire: Q = Q(
    "q244_double_fire",
    (s, dir) => {
      val windowUs = 600L * 1000000
      val ev = Tables.load(s, dir, "events")
      val byRun = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      ev.select(col("user_id"), col("event_id"), col("event_type"),
          tsUs.as("ts_us"))
        .withColumn("prev", lag(col("ts_us"), 1).over(byRun))
        .filter(col("prev").isNotNull &&
          (col("ts_us") - col("prev")) <= windowUs)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_refires"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts_us") - col("prev")).as("tightest_gap_us"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, event_type,
                    ${duckUs("ts")} AS ts_us FROM events),
             r AS (SELECT user_id, event_type,
                     ts_us - lag(ts_us, 1) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts_us ASC, event_id ASC) AS gap
                   FROM e)
             SELECT event_type, count(*) AS n_refires,
               count(DISTINCT user_id) AS n_users,
               min(gap) AS tightest_gap_us
             FROM r WHERE gap IS NOT NULL AND gap <= ${600L * 1000000}
             GROUP BY event_type ORDER BY event_type"""))

  /** Lead-lag cross-correlation — does the error rate LEAD revenue, or
    * follow it? For every lag in [-3, +3] days, the Pearson
    * correlation between daily purchase revenue on day d and the
    * error-event count on day d+lag: a peak at a negative lag means
    * errors foreshadow revenue moves (an alerting signal); at zero,
    * they co-move; at positive lags, revenue shifts precede error
    * shifts. q161 autocorrelates ONE series with itself; this is the
    * cross-series generalization, and the lag table is what
    * root-cause dashboards actually plot. Moments are exact
    * (decimal(38,0) from the multiply up, q161's discipline); each
    * correlation is one fixed double tree with a single sqrt.
    *
    * ## 100 TB notes
    * One map-side-combined daily rollup; the 7-row lag table
    * broadcasts into the day-aligned self-join of that |days|-sized
    * aggregate; the moment rollup groups on the 7-value lag key.
    * Nothing data-scale past the first aggregation.
    */
  val q248LeadLagXcorr: Q = Q(
    "q248_lead_lag_xcorr",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.eager(Tables.load(s, dir, "events")
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("rev"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("err")))
      val lags = Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L).toDF("lag")
      val a = daily.select(col("day"), col("rev"))
      val b = daily.select(col("day").as("bday"), col("err"))
      def D(c: Column) = c.cast("decimal(38,0)")
      val paired = a.crossJoin(broadcast(lags))
        .join(b, col("bday") === col("day") + col("lag"))
      val m = paired.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("rev")).as("sx"),
          sum(col("err")).as("sy"),
          sum(D(col("rev")) * D(col("rev"))).as("sxx"),
          sum(D(col("err")) * D(col("err"))).as("syy"),
          sum(D(col("rev")) * D(col("err"))).as("sxy"))
      val num = D(col("n")) * col("sxy") - D(col("sx")) * D(col("sy"))
      val vx = D(col("n")) * col("sxx") - D(col("sx")) * D(col("sx"))
      val vy = D(col("n")) * col("syy") - D(col("sy")) * D(col("sy"))
      // zero variance (or a single pair) has no defined correlation:
      // emit NULL rather than tripping ANSI's divide-by-zero
      m.select(col("lag"), col("n").as("n_days"),
          when(vx > 0 && vy > 0,
            num.cast("double") /
              sqrt(vx.cast("double") * vy.cast("double")))
            .otherwise(lit(null).cast("double")).as("r"))
        .orderBy(col("lag"))
    },
    Some(s"""WITH daily AS (SELECT ${duckUs("ts")} // 86400000000 AS day,
                CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS rev,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS err
              FROM events GROUP BY 1),
            lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
            p AS (SELECT lag, a.rev, b.err
                  FROM daily a CROSS JOIN lags
                  JOIN daily b ON b.day = a.day + lag),
            m AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
                CAST(sum(rev) AS HUGEINT) AS sx,
                CAST(sum(err) AS HUGEINT) AS sy,
                sum(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS sxx,
                sum(CAST(err AS HUGEINT) * CAST(err AS HUGEINT)) AS syy,
                sum(CAST(rev AS HUGEINT) * CAST(err AS HUGEINT)) AS sxy
              FROM p GROUP BY lag)
            SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
              CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                   THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE))
                   ELSE NULL END AS r
            FROM m ORDER BY lag"""))

  /** Time-weighted concurrency profile — q152 reports the single peak;
    * capacity planning needs the DISTRIBUTION: how many microseconds
    * did the system spend at each simultaneous-session level, and what
    * are the time-weighted p50/p99? (A peak of 80 that lasted two
    * seconds sizes very differently from a p99 of 60.) Sessions are
    * q33's exact relation; the sweep is the classic event-boundary
    * walk: +1/-1 deltas ordered by (time, delta) — ends before starts
    * at the same instant, so touching sessions never double-count —
    * running sum = level, each segment weighted by its exact µs
    * duration, zero-duration tie segments weightless by construction.
    * Quantiles are the discrete cumulative walk over the (level,
    * duration) histogram: all exact integers.
    *
    * ## 100 TB notes
    * Sessionization shuffles once on user_id; the boundary sweep is a
    * GLOBAL ordered window over 2x|sessions| rows — the one genuinely
    * serial step, same as q152, bounded by session count not events;
    * at cluster scale this walk runs per time-shard with boundary
    * levels carried between shards (prefix-sum decomposition).
    */
  val q251ConcurrencyProfile: Q = Q(
    "q251_concurrency_profile",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val newSession = when(
        col("prev_us").isNull || (col("ts_us") - col("prev_us")) > GapUs, 1L)
        .otherwise(0L)
      val sess = ev.select(col("user_id"), col("event_id"),
          tsUs.as("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("is_new", newSession)
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      val deltas = sess.select(col("start_us").as("t"), lit(1L).as("d"))
        .unionAll(sess.select(col("end_us").as("t"), lit(-1L).as("d")))
      val ord = Window.orderBy(col("t").asc, col("d").asc)
      val segs = deltas
        .withColumn("level", sum(col("d")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("next_t", lead(col("t"), 1).over(ord))
        .filter(col("next_t").isNotNull)
        .select(col("level"), (col("next_t") - col("t")).as("dur"))
      val hist = segs.groupBy(col("level"))
        .agg(sum(col("dur")).as("dur_us"))
      val wAll = Window.partitionBy(lit(1))
      val cum = hist
        .withColumn("cum", sum(col("dur_us")).over(
          Window.orderBy(col("level"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("dur_us")).over(wAll))
      def pick(p: Double) =
        min(when(col("cum") >= ceil(col("n") * p), col("level")))
      cum.agg(max(col("n")).as("observed_us"),
        max(col("level")).as("max_conc"),
        pick(0.5).as("p50_conc"), pick(0.99).as("p99_conc"))
    },
    Some(s"""WITH $duckSessionCtes,
             sb AS (SELECT user_id, session_seq, min(ts_us) AS start_us,
                      max(ts_us) AS end_us
                    FROM sess GROUP BY user_id, session_seq),
             dl AS (SELECT start_us AS t, 1 AS d FROM sb
                    UNION ALL SELECT end_us AS t, -1 AS d FROM sb),
             sg AS (SELECT level, next_t - t AS dur FROM (
                 SELECT t, CAST(sum(d) OVER (ORDER BY t ASC, d ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS level,
                   lead(t) OVER (ORDER BY t ASC, d ASC) AS next_t
                 FROM dl)
               WHERE next_t IS NOT NULL),
             h AS (SELECT level, CAST(sum(dur) AS BIGINT) AS dur_us
                   FROM sg GROUP BY level),
             cu AS (SELECT *,
                 CAST(sum(dur_us) OVER (ORDER BY level
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
                 CAST(sum(dur_us) OVER () AS BIGINT) AS n
               FROM h)
             SELECT CAST(max(n) AS BIGINT) AS observed_us,
               max(level) AS max_conc,
               min(CASE WHEN cum >= ceil(n * 0.5) THEN level END)
                 AS p50_conc,
               min(CASE WHEN cum >= ceil(n * 0.99) THEN level END)
                 AS p99_conc
             FROM cu"""))

  /** Activity heatmap — the dow x hour event matrix every ops dashboard
    * leads with: per (weekday, hour-of-day) cell, event count, share of
    * all events, and a peak flag on the single busiest cell (total-
    * order election: count desc, then dow, then hour — so exactly one
    * row carries true on both engines). Weekday from pure epoch-day
    * arithmetic (Sunday=0, as q229); hour from exact integer division.
    * The heatmap is how staffing and maintenance windows get chosen;
    * the peak flag is the one cell you never deploy during.
    *
    * ## 100 TB notes
    * One map-side-combined aggregate on a 168-cell key; the share and
    * peak windows run over those 168 rows. Scan-bound.
    */
  val q254ActivityHeatmap: Q = Q(
    "q254_activity_heatmap",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cells = ev.select(
          pmod(expr("(ts div 1000) div 86400000000") + 4, lit(7)).as("dow"),
          expr("((ts div 1000) div 3600000000) % 24").as("hour"))
        .groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n_events"))
      val wAll = Window.partitionBy(lit(1))
      cells
        .withColumn("total", sum(col("n_events")).over(wAll))
        .withColumn("rn", row_number().over(Window.orderBy(
          col("n_events").desc, col("dow").asc, col("hour").asc)))
        .select(col("dow"), col("hour"), col("n_events"),
          (col("n_events").cast("double") / col("total").cast("double"))
            .as("share"),
          (col("rn") === 1).as("is_peak"))
        .orderBy(col("dow"), col("hour"))
    },
    Some(s"""WITH c AS (SELECT
                (${duckUs("ts")} // 86400000000 + 4) % 7 AS dow,
                (${duckUs("ts")} // 3600000000) % 24 AS hour,
                count(*) AS n_events
              FROM events GROUP BY 1, 2)
             SELECT dow, hour, n_events,
               CAST(n_events AS DOUBLE)
                 / CAST(sum(n_events) OVER () AS DOUBLE) AS share,
               row_number() OVER (ORDER BY n_events DESC, dow ASC,
                 hour ASC) = 1 AS is_peak
             FROM c ORDER BY dow, hour"""))

  /** All-time record purchases — the "biggest order ever" tracker every
    * revenue dashboard alerts on: purchases whose cent value STRICTLY
    * exceeds every earlier purchase in event-time order (ties are not
    * records), each with the record it broke. Expected output is tiny
    * (~ln n records under exchangeable values) but the comparison frame
    * is the WHOLE history — the classic global-order running max.
    *
    * ## 100 TB notes
    * The prior-record line is [[graft.engine.Cumulative.runningMax]]
    * with the EXCLUSIVE frame — the two-phase range-partitioned
    * regrouping of `max() OVER (ORDER BY ... AND 1 PRECEDING)` (max is
    * associative; the first range's offset is NULL and `greatest`
    * skips it) — so no single-partition window exists even though the
    * semantics are a global scan. One corpus pass + the record filter;
    * cents are exact int64.
    */
  val q264RecordHighs: Q = Q(
    "q264_record_highs",
    (s, dir) => {
      val pur = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), tsUs.as("ts_us"),
          floor(col("value") * 100).cast("long").as("cents"))
      graft.engine.Cumulative
        .runningMax(pur, Seq(col("ts_us").asc, col("event_id").asc),
          col("cents"), cumName = "prev_record", inclusive = false)
        .filter(col("prev_record").isNull ||
          col("cents") > col("prev_record"))
        .select(col("ts_us"), col("event_id"), col("cents"),
          col("prev_record"))
        .orderBy("ts_us", "event_id")
    },
    Some(s"""WITH p AS (SELECT event_id, ${duckUs("ts")} AS ts_us,
                    CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM events WHERE event_type = 'purchase'),
             r AS (SELECT ts_us, event_id, cents,
                     max(cents) OVER (ORDER BY ts_us ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_record
                   FROM p)
             SELECT ts_us, event_id, cents, prev_record
             FROM r WHERE prev_record IS NULL OR cents > prev_record
             ORDER BY ts_us, event_id"""))

  /** Head-to-head layout PRUNING comparison — the cell the layout
    * family's other two audits leave open. q167 reports the per-bucket
    * (min,max) envelopes a Morton clustering produces but counts
    * nothing; q187 counts skipped files but compares arrival order vs
    * a SINGLE-dimension (date) layout, where the answer is all-or-
    * nothing. This query runs the actual two-dimensional decision: for
    * the SAME rows clustered lexicographically vs by Morton code, how
    * many files does a point predicate on EACH dimension force a scan
    * to read?
    *
    * The two candidate layouts cluster rows into files by a single
    * integer sort key over the 2-D key (x = `user_id % 32`,
    * y = epoch-day `% 32`, 5 bits each — the fixture's 30-day window
    * and user id space populate both dimensions at every SF):
    *   - `linear`: lexicographic `x * 32 + y` (partition-by-user
    *     then day — the layout a naive writer produces);
    *   - `zorder`: the Morton code interleaving the 5 bits of x and y
    *     (bit i of x at position 2i, bit i of y at 2i+1), the
    *     space-filling curve Delta/Iceberg `OPTIMIZE ZORDER BY` uses.
    * Files are fixed key-ranges of the sort key (32 codes/file → 32
    * files), so file assignment is MAP-ONLY here; a real writer gets
    * the same file population from `repartitionByRange(zv)` +
    * `sortWithinPartitions` (the q260 manifest path). Per layout the
    * audit computes each file's min/max per dimension — exactly the
    * parquet/Iceberg zone-map stats — and counts how many files a
    * point predicate on EACH dimension must read (`x = 7`, `y = 7`:
    * a file is read iff its [min,max] straddles the constant).
    * Linear prunes x perfectly (each file is one x value) and y not
    * at all; each z-order file is an 8-wide × 4-tall tile, so z-order
    * pays 8× on x to win 8× on y — `skip_ppm_x`/`skip_ppm_y` (exact
    * integer ppm of files skipped) quantify the trade on this data.
    *
    * ## 100 TB notes
    * The Morton code is the native codegen'd
    * [[graft.functions.MortonCode]] bit spread (11 long ops per row,
    * branch-free, fused into the scan projection — the write-path hot
    * loop of a real z-order rewrite); the DuckDB oracle keeps the
    * per-bit `div`/`%` arithmetic form, so the hash comparison
    * doubles as the expression's cross-engine equality proof. The
    * zone-map table is |files|-sized (dim-bounded): at real scale the
    * file count grows with data but the per-file stats are exactly
    * what the table format's manifest already stores — the audit is a
    * metadata-only query there.
    */
  val q267LayoutPruning: Q = Q(
    "q267_layout_pruning",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(expr("user_id % 32").as("x"),
          expr("(ts div 86400000000000) % 32").as("y"))
      // the native codegen'd bit spread; the DuckDB oracle keeps the
      // per-bit arithmetic form, so the comparator proves them equal
      val keyed = ev.select(col("x"), col("y"),
        graft.functions.GraftFunctions.mortonCode(col("x"), col("y"))
          .as("zv"))
      val tagged = keyed
        .select(lit("linear").as("layout"),
          expr("(x * 32 + y) div 32").as("file_id"), col("x"), col("y"))
        .unionAll(keyed.select(lit("zorder").as("layout"),
          expr("zv div 32").as("file_id"), col("x"), col("y")))
      val zoneMaps = tagged.groupBy(col("layout"), col("file_id"))
        .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          count(lit(1)).as("n"))
      zoneMaps.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"),
          sum(when(col("min_x") <= 7 && col("max_x") >= 7, 1L)
            .otherwise(0L)).as("files_hit_x"),
          sum(when(col("min_y") <= 7 && col("max_y") >= 7, 1L)
            .otherwise(0L)).as("files_hit_y"))
        .select(col("layout"), col("n_files"), col("n_rows"),
          col("files_hit_x"), col("files_hit_y"),
          expr("(n_files - files_hit_x) * 1000000 div n_files")
            .as("skip_ppm_x"),
          expr("(n_files - files_hit_y) * 1000000 div n_files")
            .as("skip_ppm_y"))
        .orderBy("layout")
    },
    Some {
      val morton = (0 until 5).map { i =>
        val p = 1L << i; val zx = 1L << (2 * i); val zy = 1L << (2 * i + 1)
        s"((x // $p) % 2) * $zx + ((y // $p) % 2) * $zy"
      }.mkString(" + ")
      s"""WITH ev AS (SELECT user_id % 32 AS x,
                (${duckUs("ts")} // 86400000000) % 32 AS y
              FROM events),
            keyed AS (SELECT x, y, $morton AS zv FROM ev),
            tagged AS (
              SELECT 'linear' AS layout, (x * 32 + y) // 32 AS file_id,
                     x, y FROM keyed
              UNION ALL
              SELECT 'zorder' AS layout, zv // 32 AS file_id, x, y
              FROM keyed),
            zm AS (SELECT layout, file_id,
                     min(x) AS min_x, max(x) AS max_x,
                     min(y) AS min_y, max(y) AS max_y,
                     count(*) AS n
                   FROM tagged GROUP BY 1, 2),
            agg AS (SELECT layout, count(*) AS n_files,
                     CAST(sum(n) AS BIGINT) AS n_rows,
                     CAST(sum(CASE WHEN min_x <= 7 AND max_x >= 7
                       THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_x,
                     CAST(sum(CASE WHEN min_y <= 7 AND max_y >= 7
                       THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_y
                   FROM zm GROUP BY 1)
            SELECT layout, n_files, n_rows, files_hit_x, files_hit_y,
              (n_files - files_hit_x) * 1000000 // n_files AS skip_ppm_x,
              (n_files - files_hit_y) * 1000000 // n_files AS skip_ppm_y
            FROM agg ORDER BY layout"""
    })

  val all: Seq[Q] =
    Seq(q31HourlyFromJson, q32SlidingWindow, q33Sessionize, q34SessionWindow,
      q35EventFirst, q37AsofJoin, q38RangeJoin, q50AsofForward,
      q64StreamHourly, q66StreamDedup, q73SaltedAgg, q74EventGaps,
      q75StreamSessions, q76StreamLateDrop, q78StreamIntervalJoin,
      q80CohortRetention, q83StreamStaticEnrich, q84ForeachBatchUpsert,
      q85MovingAverage, q86SessionFunnel, q90GapFill, q95HourlyAnomaly,
      q103DecayedEngagement, q105SkewProfile, q106RollupReuse,
      q107StreamOuterJoin, q108TrendOls, q109CompactionPlan,
      q115SaltedJoin, q119StreamRunningTotals, q120CmsHeavyHitters,
      q122MarkovTransitions, q123RollingDistinct, q127GiniDiversity,
      q128Chi2Cells, q131FirstTouch, q132DwellTime, q140TvDrift,
      q141HllUnion, q142AssocRules, q143CusumChangepoint, q144SurvivalKm,
      q145JsonSurface, q146LinearAttribution, q147Ols2, q148AbZtest,
      q149BitmapIntersect, q150RatioToParent, q151Twap,
      q152MaxConcurrency, q154GrowthAccounting, q155ParetoCoverage,
      q158ModalType, q159ArgmaxPurchase, q161Autocorr, q170ConversionLag,
      q174RfmSegments, q179InterpolateGaps, q181AucRanksum,
      q185SeqPatterns, q186DecileLift, q188SrmCheck, q192KsTest,
      q199PurgedCvFolds, q201CupedAudit, q210EntryExitBounce,
      q215TrigramPaths, q232TimeDecayAttribution, q233TransitionDwell,
      q238ProcessConformance, q239DiffInDiff, q244DoubleFire, q248LeadLagXcorr, q251ConcurrencyProfile, q254ActivityHeatmap,
      q264RecordHighs, q265StreamTwsTotals, q266StreamTwsSessions,
      q267LayoutPruning, q275StreamTwsTopk, q276StreamTwsTypeCounts,
      q277IncrementalGold, q278RetractableAgg, q279RestatementScope,
      q280WatermarkCurve, q282RleProfile, q283ManifestTimeTravel,
      q284StreamIncrementalGold, q293ManifestChangeFeed,
      q286MetronomeRank, q287PartitionBalance, q288QteDeciles,
      q289SaltingBalance)
      .map(q => q.copy(streaming = streamingNames(q.name)))
}
