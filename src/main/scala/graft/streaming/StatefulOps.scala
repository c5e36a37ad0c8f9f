package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}


/** Custom-state streaming operators (SURVEY.md §2.10's generalized
  * extension): KeyValueGroupedDataset.mapGroupsWithState for arbitrary
  * per-key state, and dropDuplicatesWithinWatermark for bounded-state
  * streaming dedup. Both are exercised against the events fixture with
  * deterministic single-batch semantics in StatefulOpsSpec.
  */
object StatefulOps {

  final case class EventRow(event_id: Long, user_id: Long, event_type: String, value: Double, ts_us: Long)
  final case class UserAgg(user_id: Long, n_events: Long, sum_value: Double, last_ts_us: Long)

  private def eventStream(spark: SparkSession, parquetDir: String, glob: String): DataFrame =
    graft.model.Tables.eventStream(spark, parquetDir, glob)

  /** Per-user running aggregate via explicit GroupState — the
    * mapGroupsWithState shape for state Spark's built-in aggs can't
    * express (here kept summable on purpose so the batch groupBy is an
    * exact oracle for the test).
    *
    * State is BOUNDED: with an event-time watermark and
    * GroupStateTimeout.EventTimeTimeout, a key idle for `idle` of event
    * time has its final aggregate re-emitted once and its state dropped —
    * without this, per-key state grows forever on a long-running stream.
    */
  def streamUserAggregates(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      watermark: String = "30 minutes",
      idleMs: Long = 60L * 60 * 1000,
      glob: String = "events.parquet"): StreamingQuery = {
    import spark.implicits._
    val typed: Dataset[EventRow] = eventStream(spark, parquetDir, glob)
      .withWatermark("ts", watermark)
      // keep the watermarked `ts` attribute visible to the stateful
      // operator (event-time timeout requires it); the EventRow encoder
      // binds by name and ignores the extra column
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[EventRow]

    def update(userId: Long, events: Iterator[EventRow], state: GroupState[UserAgg]): UserAgg = {
      if (state.hasTimedOut) {
        // Idle-key expiry: flush the final value and free the state slot.
        val last = state.get
        state.remove()
        last
      } else {
        val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0, Long.MinValue))
        val next = events.foldLeft(prev) { (acc, e) =>
          UserAgg(userId, acc.n_events + 1, acc.sum_value + e.value, math.max(acc.last_ts_us, e.ts_us))
        }
        state.update(next)
        // Timeout timestamps must sit above the current watermark.
        state.setTimeoutTimestamp(
          math.max(next.last_ts_us / 1000L + idleMs, state.getCurrentWatermarkMs() + 1))
        next
      }
    }

    typed
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(update)
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class OpenSession(start_us: Long, last_us: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start_sec: Long, session_end_sec: Long, n_events: Long)

  /** Incremental sessionization via flatMapGroupsWithState: completed
    * sessions are EMITTED as soon as a gap closes them; the (single)
    * still-open session per user lives on in GroupState across batches.
    * Gap semantics identical to session_window: a new session starts
    * when the inter-event gap is >= the timeout; session end = last
    * event + gap.
    *
    * State is BOUNDED: each open session carries an event-time timeout at
    * last_event + gap. Once the watermark passes it, no future event can
    * extend the session, so it is flushed and its state dropped — a key
    * whose user goes quiet forever still emits its final session and
    * costs nothing afterwards.
    */
  def streamSessionsFlatMap(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      gapMinutes: Int = 30,
      watermark: String = "30 minutes",
      glob: String = "events.parquet"): StreamingQuery = {
    import spark.implicits._
    val typed: Dataset[EventRow] = eventStream(spark, parquetDir, glob)
      .withWatermark("ts", watermark)
      // keep the watermarked `ts` attribute visible to the stateful
      // operator (event-time timeout requires it); the EventRow encoder
      // binds by name and ignores the extra column
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[EventRow]
    val gapUs = gapMinutes * 60L * 1000000L
    val gapSec = gapMinutes * 60L
    val gapMs = gapMinutes * 60L * 1000L

    def close(userId: Long, s: OpenSession): SessionOut =
      SessionOut(userId, s.start_us / 1000000L, s.last_us / 1000000L + gapSec, s.n)

    def emit(userId: Long, events: Iterator[EventRow],
        state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // Watermark passed last_event + gap: the session can never be
        // extended again — flush it and drop the state.
        val s = state.get
        state.remove()
        Iterator.single(close(userId, s))
      } else {
        // per-user per-batch volume is bounded; sort locally for event-time order
        val sorted = events.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
        var open = state.getOption
        val out = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          open = open match {
            case Some(s) if e.ts_us - s.last_us < gapUs =>
              Some(s.copy(last_us = e.ts_us, n = s.n + 1))
            case Some(s) =>
              out += close(userId, s)
              Some(OpenSession(e.ts_us, e.ts_us, 1))
            case None =>
              Some(OpenSession(e.ts_us, e.ts_us, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // Timeout timestamps must sit above the current watermark.
          state.setTimeoutTimestamp(
            math.max(s.last_us / 1000L + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
      }
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(emit)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class ViewState(view_ts_us: Long, view_event_id: Long, view_value: Double)
  final case class AsofOut(event_id: Long, user_id: Long, ts_us: Long, purchase_value: Double,
      view_event_id: Option[Long], view_value: Option[Double], view_ts_us: Option[Long])

  /** Streaming as-of enrichment — the stream twin of
    * [[graft.operators.AsofJoin.strictPrior]] / the `events_asof` batch
    * query: each purchase is stamped with the same user's latest
    * strictly-prior view. Per-key state is O(1) (just the latest view),
    * which is what makes as-of tractable on an unbounded stream — a
    * stream-stream interval join would buffer every view in the watermark
    * window instead.
    *
    * Tie contract is identical to the batch operator: purchases at a
    * timestamp are answered BEFORE views at the same timestamp update
    * state, and among equal-ts views the max event_id wins.
    *
    * State is BOUNDED and honest about it: a user idle past the timeout
    * has their latest-view state dropped, so a purchase arriving after
    * that horizon reports no prior view. Append mode also cannot retract:
    * a view arriving out-of-order after a purchase was already emitted
    * (within the watermark slack) does not rewrite that purchase — the
    * usual streaming as-of reordering limit.
    */
  def streamAsofViews(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      watermark: String = "30 minutes",
      idleMs: Long = 60L * 60 * 1000,
      glob: String = "events.parquet"): StreamingQuery = {
    import spark.implicits._
    val typed: Dataset[EventRow] = eventStream(spark, parquetDir, glob)
      .filter(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", watermark)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[EventRow]

    def emit(userId: Long, events: Iterator[EventRow],
        state: GroupState[ViewState]): Iterator[AsofOut] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val sorted = events.toIndexedSeq
          .sortBy(e => (e.ts_us, if (e.event_type == "view") 1 else 0, e.event_id))
        var st = state.getOption
        val out = Seq.newBuilder[AsofOut]
        sorted.foreach { e =>
          if (e.event_type == "purchase")
            out += AsofOut(e.event_id, userId, e.ts_us, e.value,
              st.map(_.view_event_id), st.map(_.view_value), st.map(_.view_ts_us))
          else
            st = Some(ViewState(e.ts_us, e.event_id, e.value))
        }
        st.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + math.max(idleMs, 1L))
        }
        out.result().iterator
      }
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(emit)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-stream inner join with event-time bounds: each click joined
    * to the same user's errors within the preceding 10 minutes. Both
    * sides are watermarked so Spark can expire join state — the
    * bounded-buffer requirement that makes stream-stream joins viable.
    */
  def streamClickErrorJoin(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      glob: String = "events.parquet"): StreamingQuery = {
    val clicks = eventStream(spark, parquetDir, glob)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    val errors = eventStream(spark, parquetDir, glob)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "30 minutes")
    clicks.join(errors,
        col("c_user") === col("e_user") &&
          col("e_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("c_ts"))
      .select(col("c_user").as("user_id"), col("click_id"), col("error_id"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-static enrichment join: the event stream joined to a static
    * dimension table — no watermark and no join state needed (the static
    * side is re-read/broadcast per micro-batch), which is why facts-in-
    * motion × dimensions-at-rest is the everyday production join shape.
    */
  def streamEnrichWithDim(
      spark: SparkSession,
      parquetDir: String,
      dim: org.apache.spark.sql.DataFrame,
      joinKey: String,
      queryName: String,
      glob: String = "events.parquet"): StreamingQuery =
    eventStream(spark, parquetDir, glob)
      .join(broadcast(dim), Seq(joinKey), "left")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Bounded-state streaming dedup on (user_id, event_type): keeps each
    * key's first occurrence, expiring state once the watermark passes —
    * the streaming twin of the events_first batch query.
    */
  def streamDedupWithinWatermark(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      watermark: String = "1 hour",
      glob: String = "events.parquet"): StreamingQuery =
    eventStream(spark, parquetDir, glob)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  final case class CdcChange(k: Long, s: String, v: Double, op: String, seq: Long)
  final case class CdcOut(k: Long, op: String, seq: Long, s: String, v: Double)

  /** Continuous CDC merge — the streaming twin of
    * [[graft.operators.CdcMerge]]: per-key last-write-wins state
    * (highest `(_seq, _op)`, the same total order as the batch
    * operator), emitting the key's current merged row (or tombstone)
    * whenever a change batch improves it. A last-write-wins sink —
    * foreachBatch MERGE, a KV store upsert — then materializes exactly
    * the batch snapshot: emissions per key are monotone in (seq, op),
    * so "latest emitted" and "max emitted" coincide (asserted against
    * CdcMerge.merge in CdcMergeSpec).
    *
    * State is one small row per live key — this state IS the
    * materialized view, so it does not expire (NoTimeout); at scale
    * that means the RocksDB state store, not the in-memory default.
    * O(changes) work per trigger, no shuffle beyond the groupByKey
    * exchange of the (small) change batch.
    */
  def streamCdcLatest(changes: Dataset[CdcChange]): Dataset[CdcOut] = {
    import changes.sparkSession.implicits._
    def emit(k: Long, rows: Iterator[CdcChange], state: GroupState[CdcOut]): Iterator[CdcOut] = {
      val prev = state.getOption
      val best = (rows.map(c => CdcOut(k, c.op, c.seq, c.s, c.v)) ++ prev.iterator)
        .maxBy(o => (o.seq, o.op))
      if (prev.contains(best)) Iterator.empty
      else {
        state.update(best)
        Iterator.single(best)
      }
    }
    changes.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(emit)
  }

  final case class FunnelTimes(times: List[Long])
  final case class FunnelOut(user_id: Long, reached: Long, times: Seq[Long])

  /** Continuous ordered-funnel tracking — the streaming twin of
    * [[graft.operators.Funnel]]: per-user state is the prefix of stage
    * completion times reached so far (≤ k longs). Each batch's events
    * are processed in (ts, event_id) order; a stage-i event extends the
    * prefix when stages 1..i-1 are complete and its ts is strictly
    * later than t_{i-1}. Greedy first-valid in ascending ts order IS
    * the batch min-valid recurrence, so with in-order arrival (per
    * user, across batches) the final emission per user equals the
    * batch funnel exactly — StatefulOpsSpec asserts it on the events
    * fixture. Out-of-order arrival across batches shares the usual
    * streaming reordering caveat with streamAsofViews: an earlier
    * event arriving after a later stage was locked in cannot rewrite
    * it (append-style monotone state, O(k) per user).
    */
  def streamFunnel(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      stages: Seq[String],
      glob: String = "events.parquet"): StreamingQuery = {
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val typed = eventStream(spark, parquetDir, glob)
      .filter(col("event_type").isin(stages: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventRow]

    def emit(userId: Long, events: Iterator[EventRow],
        state: GroupState[FunnelTimes]): Iterator[FunnelOut] = {
      val sorted = events.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      var times = state.getOption.map(_.times).getOrElse(Nil)
      sorted.foreach { e =>
        val i = stageIdx(e.event_type)
        if (i == times.length && (times.isEmpty || e.ts_us > times.last))
          times = times :+ e.ts_us
      }
      if (state.getOption.map(_.times).contains(times) || times.isEmpty) Iterator.empty
      else {
        state.update(FunnelTimes(times))
        Iterator.single(FunnelOut(userId, times.length.toLong, times))
      }
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(emit)
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class TwsUserStats(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user running stats on Spark 4's transformWithState — the
    * successor API to mapGroupsWithState (SPARK-46815, "arbitrary
    * stateful processing v2"): typed composite state (ValueState /
    * ListState / MapState) with per-state TTL, timers decoupled from
    * output mode, and schema-evolvable state. Requires the RocksDB
    * state-store provider (the at-scale store anyway — the spec sets
    * it); semantics here mirror streamUserAggregates so the batch
    * groupBy stays the oracle.
    */
  private class UserStatsProcessor
      extends StatefulProcessor[Long, EventRow, TwsUserStats] {
    @transient private var stats: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Double)]("stats",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[TwsUserStats] = {
      var (n, s) = if (stats.exists()) stats.get() else (0L, 0.0)
      rows.foreach { e => n += 1; s += e.value }
      stats.update((n, s))
      Iterator.single(TwsUserStats(key, n, s))
    }
  }

  /** transformWithState twin of streamUserAggregates (counts + sums per
    * user, Update mode, emissions monotone in n_events).
    */
  def streamUserStatsTws(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      glob: String = "events.parquet"): StreamingQuery = {
    import spark.implicits._
    eventStream(spark, parquetDir, glob)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class TwsActivity(user_id: Long, n_events: Long, n_types: Long,
      n_purchases: Long, sum_purchases: Double)

  /** transformWithState with COMPOSITE state — the part of the v2 API
    * ValueState alone doesn't exercise: a ListState accumulating the
    * user's purchase values (append-only, iterated in append order)
    * and a MapState of per-event-type counts (point lookups + updates,
    * no read-modify-write of a whole blob — the reason MapState exists:
    * in RocksDB each map key is its own store row, so a 1M-key map
    * costs one row write per touched key, not a 1M-entry deserialize).
    */
  private class UserActivityProcessor
      extends StatefulProcessor[Long, EventRow, TwsActivity] {
    @transient private var purchases: ListState[Double] = _
    @transient private var typeCounts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      purchases = getHandle.getListState[Double]("purchases",
        Encoders.scalaDouble, TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[TwsActivity] = {
      rows.foreach { e =>
        val prev = if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, prev + 1)
        if (e.event_type == "purchase") purchases.appendValue(e.value)
      }
      val counts = typeCounts.values().toSeq
      val bought = purchases.get().toSeq
      Iterator.single(TwsActivity(key, counts.sum, counts.size.toLong,
        bought.size.toLong, bought.sum))
    }
  }

  /** Per-user activity profile on ListState + MapState (Update mode,
    * emissions monotone in n_events — the batch groupBy is the oracle
    * in StatefulOpsSpec).
    */
  def streamUserActivityTws(
      spark: SparkSession,
      parquetDir: String,
      queryName: String,
      glob: String = "events.parquet"): StreamingQuery = {
    import spark.implicits._
    eventStream(spark, parquetDir, glob)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .transformWithState(new UserActivityProcessor, TimeMode.None(), OutputMode.Update())
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class KeyTs(user_id: Long, ts_us: Long)
  final case class IdleFlush(user_id: Long, n_events: Long, expired_at_ms: Long)

  /** transformWithState with EVENT-TIME TIMERS — the v2 API's
    * replacement for GroupStateTimeout: one live timer per key at
    * last-seen + idle, re-registered on every batch (explicit
    * listTimers/deleteTimer bookkeeping — timers are per-key
    * multi-valued, unlike the single mapGroupsWithState timeout).
    * When the watermark passes a timer, handleExpiredTimer emits the
    * key's final count and CLEARS its state — the bounded-state
    * contract: an idle key costs nothing after its flush.
    */
  private class IdleFlushProcessor(idleMs: Long)
      extends StatefulProcessor[Long, KeyTs, IdleFlush] {
    @transient private var stats: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Long)]("stats",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyTs],
        timerValues: TimerValues): Iterator[IdleFlush] = {
      var (n, last) = if (stats.exists()) stats.get() else (0L, Long.MinValue)
      rows.foreach { e => n += 1; last = math.max(last, e.ts_us) }
      stats.update((n, last))
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last / 1000L + idleMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[IdleFlush] = {
      val n = if (stats.exists()) stats.get()._1 else 0L
      stats.clear()
      Iterator.single(IdleFlush(key, n, expiredTimerInfo.getExpiryTimeInMs))
    }
  }

  /** Idle-key flush on transformWithState event-time timers: `events`
    * is any STREAMING frame with (user_id, ts) columns (the spec drives
    * it from a MemoryStream so the watermark advance — and therefore
    * timer expiry — is deterministic). Emits one (user_id, n_events)
    * row per key once the watermark passes last-seen + idleMs, then
    * drops the key's state.
    */
  def streamIdleFlushTws(
      events: DataFrame,
      queryName: String,
      watermark: String = "10 minutes",
      idleMs: Long = 60L * 60 * 1000): StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[KeyTs]
      .groupByKey(_.user_id)
      .transformWithState(new IdleFlushProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append())
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
