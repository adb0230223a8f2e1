package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured-Streaming transforms over the event schema
  * (SURVEY.md §2.7: the reference is strictly daily batch with incremental
  * processing deferred as future work — this module is that future work,
  * Spark-first). The batch queries in EventQueries use the same
  * expressions; here they run incrementally with watermarks bounding
  * state.
  *
  * ## 100 TB/day notes
  *  - Watermarks make every stateful op's footprint proportional to the
  *    in-flight window, not history: a 1-hour watermark on hourly windows
  *    keeps ~2 windows of partial aggregates per key in the state store.
  *  - `dropDuplicates` after a watermark holds only in-watermark keys.
  *  - Sessionization uses `flatMapGroupsWithState` with event-time
  *    timeouts: state per ACTIVE user only, closed sessions are emitted
  *    and dropped as the watermark passes (gap + timeout), so state never
  *    accumulates beyond live sessions.
  */
object EventStreams {

  final case class Ev(user_id: Long, ts_us: Long, value: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, total_value: Double)
  /** open-session accumulator carried between micro-batches */
  final case class OpenSession(start_us: Long, end_us: Long, n: Long, total: Double)

  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Sessionization's watermark delay, DERIVED from the gap so the two
    * stay equal by construction — q75's oracle cutoff
    * (`end + gap < max − delay`, in ms) assumes it. Derived in
    * MILLISECONDS under a whole-ms guard: a division to coarser units
    * (the previous `/ 60000000` minutes form) silently SHRINKS the delay
    * for any non-whole-unit gap while the oracle keeps the exact gap.
    */
  val SessionWatermark: String = {
    require(SessionGapUs % 1000 == 0,
      s"session gap must be whole milliseconds for an exact watermark " +
        s"delay, got ${SessionGapUs}us")
    s"${SessionGapUs / 1000} milliseconds"
  }

  /** Tumbling event-time window counts with a watermark (append-ready). */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("tss", timestamp_micros(col("ts_us")))
      .withWatermark("tss", watermark)
      .groupBy(window(col("tss"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"))

  /** Stream-static enrichment: join the stream to a static dimension.
    * The dim is broadcast to every micro-batch (re-resolved per batch, so
    * a reloaded static table is picked up) — no streaming state at all.
    * At 100 TB/day this is the right shape for fixed-size dims; a dim
    * that scales with the data becomes a stream-stream join with
    * watermarks instead.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: for each left event, right events by
    * the same key within (0, windowUs] AFTER it — the streaming form of
    * the batch range join (Temporal.rangeJoin / q38). Both sides carry
    * watermarks and the join condition bounds the time range in BOTH
    * directions, so each side's buffered state is limited to
    * watermark + window and rows are dropped as the watermark passes —
    * the only shape under which Spark allows an append-mode
    * stream-stream inner join to be run at all.
    */
  /** As [[intervalJoin]], with the join type exposed. `"leftOuter"` adds
    * the null-completion semantics: a left event that never found a
    * right match is EMITTED WITH NULLS — but only once the watermark
    * passes `l_ts + window`, i.e. once no future right row can complete
    * it; Spark emits these at state eviction, which for a bounded
    * AvailableNow drain happens in the final watermark-advancing batch.
    * Left rows inside the final watermark horizon stay in state forever
    * and are NOT emitted — the q107 oracle mirrors exactly that cutoff.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   windowUs: Long, watermark: String = "1 hour",
                   tsCol: String = "ts_us",
                   typeCol: String = "event_type",
                   joinType: String = "inner"): DataFrame = {
    // r21 (guide §2.3, shuffle/state fewer bytes): the µs BIGINT is NOT
    // carried through the join — `timestamp_micros`/`unix_micros` is an
    // exact round-trip, so each side buffers (key, tss, type) instead of
    // duplicating the event time in two encodings. Both symmetric-join
    // state stores and the join shuffle shrink by one long per row; the
    // output µs columns are reconstructed after the join (null-safe for
    // the outer form's unmatched side).
    val l = left
      .withColumn("l_tss", timestamp_micros(col(tsCol)))
      .withWatermark("l_tss", watermark)
      .select(col(key), col("l_tss"), col(typeCol).as("l_type"))
    val r = right
      .withColumn("r_tss", timestamp_micros(col(tsCol)))
      .withWatermark("r_tss", watermark)
      .select(col(key).as("r_key"), col("r_tss"), col(typeCol).as("r_type"))
    // MICROSECOND interval: dividing down to whole seconds would silently
    // turn a sub-second window into an always-empty join
    l.join(r,
      col(key) === col("r_key")
        && col("r_tss") > col("l_tss")
        && col("r_tss") <= col("l_tss") + expr(s"INTERVAL $windowUs MICROSECOND"),
      joinType)
      .select(col(key), unix_micros(col("l_tss")).as("l_ts_us"),
        col("l_type"), unix_micros(col("r_tss")).as("r_ts_us"),
        col("r_type"))
  }

  /** Exactly-once-per-key within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("tss", timestamp_micros(col("ts_us")))
      .withWatermark("tss", watermark)
      .dropDuplicates("user_id", "event_type", "tss")

  /** input row for [[runningTotals]]: cents pre-computed IN THE PLAN
    * (Spark's `floor(value*100)`, identical to the oracle's) so the
    * Scala state fold only adds exact longs — no double ever enters
    * cross-batch state.
    */
  final case class Counted(user_id: Long, cents: Long, us: Long)
  /** per-user accumulator carried between micro-batches */
  final case class RunningTotal(n: Long, cents: Long, max_us: Long)
  final case class TotalsRow(user_id: Long, n_events: Long,
                             total_cents: Long, max_us: Long)

  /** Update-mode running per-user totals via `mapGroupsWithState` — the
    * one-emission-per-touched-key-per-batch stateful API
    * (flatMapGroupsWithState's sessionization in [[sessionize]] is the
    * zero-or-many form). Each micro-batch folds its rows into the key's
    * state and emits the key's NEW cumulative row; an untouched key
    * emits nothing. `NoTimeout`: totals never expire — the operator
    * models a serving-table counter, and the bounded drain ends the
    * run; an unbounded deployment would add a TTL timeout to cap state.
    *
    * ## 100 TB/day notes
    * State is one fixed-width row per user ever seen — the smallest
    * possible stateful footprint (no history, no buffers), and exactly
    * what update-mode counters cost at scale. Emissions per batch are
    * bounded by touched keys, not state size.
    */
  def runningTotals(events: Dataset[Counted]): Dataset[TotalsRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[RunningTotal, TotalsRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Counted], state: GroupState[RunningTotal]) =>
          val s0 = state.getOption.getOrElse(RunningTotal(0L, 0L, Long.MinValue))
          var n = s0.n; var c = s0.cents; var m = s0.max_us
          batch.foreach { e =>
            n += 1; c += e.cents; if (e.us > m) m = e.us
          }
          val s1 = RunningTotal(n, c, m)
          state.update(s1)
          TotalsRow(uid, s1.n, s1.cents, s1.max_us)
      }
  }

  /** [[runningTotals]] through Spark 4's `transformWithState` — the
    * successor API to mapGroupsWithState (typed named-state handles,
    * per-state TTL, timers decoupled from output mode). Same fold, same
    * emissions: one `ValueState[RunningTotal]` per user, each batch
    * folds its rows and emits the key's new cumulative row. The oracle
    * hash-match against q119's mapGroupsWithState run is the proof the
    * two state APIs implement identical semantics — the q24/q153
    * relational-vs-native pattern applied to streaming state.
    *
    * Requires the RocksDB state store provider (transformWithState is
    * not implemented on the default HDFS-backed provider); the q265
    * runner pins it for the query and restores the session conf after.
    */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, Counted, TotalsRow] {
    @transient private var state: ValueState[RunningTotal] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningTotal]("totals",
        Encoders.product[RunningTotal], TTLConfig.NONE)
    override def handleInputRows(uid: Long, batch: Iterator[Counted],
        timers: TimerValues): Iterator[TotalsRow] = {
      val s0 = if (state.exists()) state.get()
               else RunningTotal(0L, 0L, Long.MinValue)
      var n = s0.n; var c = s0.cents; var m = s0.max_us
      batch.foreach { e => n += 1; c += e.cents; if (e.us > m) m = e.us }
      val s1 = RunningTotal(n, c, m)
      state.update(s1)
      Iterator.single(TotalsRow(uid, s1.n, s1.cents, s1.max_us))
    }
  }

  def runningTotalsTws(events: Dataset[Counted]): Dataset[TotalsRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[sessionize]] through `transformWithState` with EVENT-TIME TIMERS
    * — the hard half of the successor API (q265's counter only needed
    * value state): the open session lives in a named `ValueState`, and
    * its gap horizon is an explicit registered timer at
    * `(end_us + gap) / 1000` ms. Each batch deletes the stale timer,
    * folds its rows (closing superseded sessions inline), and registers
    * the new horizon; `handleExpiredTimer` fires when the WATERMARK
    * passes a horizon and finalizes the open session — exactly
    * flatMapGroupsWithState's `EventTimeTimeout` + `setTimeoutTimestamp`
    * contract, made explicit. Same staging, same emissions, same q75
    * oracle: the hash match of both sessionizers against one oracle
    * proves the timer semantics line up boundary-for-boundary.
    */
  class SessionProcessor extends StatefulProcessor[Long, Ev, Session] {
    @transient private var state: ValueState[OpenSession] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)
    private def horizonMs(s: OpenSession): Long =
      (s.end_us + SessionGapUs) / 1000
    override def handleInputRows(uid: Long, batch: Iterator[Ev],
        timers: TimerValues): Iterator[Session] = {
      val evs = batch.toSeq.sortBy(_.ts_us)
      var open = if (state.exists()) Some(state.get()) else None
      // the fold below moves the horizon; drop the stale timer first
      open.foreach(s => getHandle.deleteTimer(horizonMs(s)))
      val closed = List.newBuilder[Session]
      evs.foreach { e =>
        open match {
          case Some(s) if e.ts_us - s.end_us <= SessionGapUs =>
            open = Some(OpenSession(s.start_us, e.ts_us, s.n + 1,
              s.total + e.value))
          case Some(s) =>
            closed += Session(uid, s.start_us, s.end_us, s.n, s.total)
            open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
          case None =>
            open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        getHandle.registerTimer(horizonMs(s))
      }
      closed.result().iterator
    }
    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(Session(uid, s.start_us, s.end_us, s.n, s.total))
      } else Iterator.empty
  }

  def sessionizeTws(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("tss", timestamp_micros(col("ts_us")))
      .withWatermark("tss", SessionWatermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stateful sessionization: 30-min-gap sessions per user, emitted when
    * the gap elapses in event time (or the session is superseded within a
    * batch). State = at most one open session per active user.
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("tss", timestamp_micros(col("ts_us")))
      .withWatermark("tss", SessionWatermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed start-of-gap: the open session is final
            val out = state.getOption.map(s =>
              Session(uid, s.start_us, s.end_us, s.n, s.total)).toList
            state.remove()
            out.iterator
          } else {
            val evs = batch.toSeq.sortBy(e => (e.ts_us))
            var open = state.getOption
            val closed = List.newBuilder[Session]
            evs.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.end_us <= SessionGapUs =>
                  open = Some(OpenSession(s.start_us, e.ts_us, s.n + 1,
                    s.total + e.value))
                case Some(s) =>
                  closed += Session(uid, s.start_us, s.end_us, s.n, s.total)
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
                case None =>
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp((s.end_us + SessionGapUs) / 1000)
            }
            closed.result().iterator
          }
      }
  }

  final case class TopkRow(user_id: Long, n_events: Long,
                           top1: Long, top2: Option[Long],
                           top3: Option[Long])

  /** Streaming per-user top-3 purchase amounts via `transformWithState`
    * LIST state — the third state shape of the successor API (q265:
    * ValueState; q266: ValueState + timers; here: a bounded
    * `ListState[Long]` holding the k largest cents ever seen, plus a
    * `ValueState[Long]` event counter — TWO named state handles in one
    * processor). Each batch merges its values into the list, keeps the
    * 3 largest, and emits the key's new (count, top-3) row.
    *
    * Top-k is a COMMUTATIVE fold — the multiset of the 3 largest
    * values is independent of arrival order within and across batches
    * — so the emission log is deterministic under any partitioning
    * (the §7.11 sweep discipline; a "last-N by arrival" list would NOT
    * be, which is why the audit keeps top-k semantics).
    *
    * ## 100 TB/day notes
    * State per user is exactly k longs + one counter — fixed-width, the
    * ListState contract a bounded leaderboard needs; emissions per
    * batch are bounded by touched keys.
    */
  class TopkProcessor extends StatefulProcessor[Long, Counted, TopkRow] {
    @transient private var topk: org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var nSeen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      topk = getHandle.getListState[Long]("topk", Encoders.scalaLong,
        TTLConfig.NONE)
      nSeen = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, batch: Iterator[Counted],
        timers: TimerValues): Iterator[TopkRow] = {
      val prior = if (topk.exists()) topk.get().toList else Nil
      var n = if (nSeen.exists()) nSeen.get() else 0L
      val incoming = batch.map { e => n += 1; e.cents }.toList
      val best = (prior ++ incoming).sorted(Ordering[Long].reverse).take(3)
      topk.put(best.toArray)
      nSeen.update(n)
      Iterator.single(TopkRow(uid, n, best.head,
        best.lift(1), best.lift(2)))
    }
  }

  def topkTws(events: Dataset[Counted]): Dataset[TopkRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TopkProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Streaming per-(user, event-type) counters via `transformWithState`
    * MAP state — the fourth state shape: one `MapState[String, Long]`
    * per user keyed by event type. Each batch folds its rows into the
    * per-type counters and emits one row per type TOUCHED IN THIS
    * BATCH with its new cumulative count (untouched types stay silent,
    * so the emission log never repeats a row and `(user, type, n)` is
    * a total order). Counting is commutative, so the log is
    * partitioning-invariant.
    *
    * ## 100 TB/day notes
    * MapState puts the per-type sub-key IN THE STATE STORE KEY (prefix
    * scan per user), so a user with few active types costs a few small
    * entries — unlike a ValueState holding a serialized map, which
    * rewrites the whole map every batch. That is the API's point, and
    * why the per-type counter is its canonical use.
    */
  class TypeCountProcessor
      extends StatefulProcessor[Long, TypeCount, TypeCount] {
    @transient private var byType: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      byType = getHandle.getMapState[String, Long]("bytype",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, batch: Iterator[TypeCount],
        timers: TimerValues): Iterator[TypeCount] = {
      val delta = scala.collection.mutable.Map.empty[String, Long]
      batch.foreach { e =>
        delta.update(e.event_type, delta.getOrElse(e.event_type, 0L) + e.n)
      }
      // deterministic emission order within the key (sorted types)
      delta.toSeq.sortBy(_._1).map { case (tpe, d) =>
        val cur = if (byType.containsKey(tpe)) byType.getValue(tpe) else 0L
        val next = cur + d
        byType.updateValue(tpe, next)
        TypeCount(uid, tpe, next)
      }.iterator
    }
  }

  def typeCountsTws(events: Dataset[TypeCount]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
