package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state operator.
  *
  * Two implementations with identical semantics:
  *  - `batch`: window-function formulation (lag + cumulative sum),
  *    one shuffle on user_id, fully codegen'd — use when the input
  *    is bounded.
  *  - `streaming`: `flatMapGroupsWithState` over a keyed stream,
  *    state = (last ts, open session count); use on unbounded input.
  *    Exercised by ScalaTest (StreamingSpec).
  */
object Sessionize {

  final case class Event(event_id: Long, user_id: Long, tsMicros: Long)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessState(lastTs: Long, nSessions: Long, nEvents: Long)

  /** Shared session assignment: per-user gap flags plus a running
    * session ordinal — one shuffle on user_id, all window functions.
    */
  private[graft] def withSessionIds(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Batch formulation: a session starts where the gap from the
    * previous event of the same user exceeds `gapMinutes`.
    */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))

  /** Ordered per-session event SEQUENCES — the behavioral-training
    * example builder: each session becomes the deterministic event
    * order a sequence model trains on. The array is built with
    * `sort_array(collect_list(struct(ts, event_id)))` (total order,
    * partition-independent) and exploded back to scalar
    * (user_id, session_start, seq_pos, event_id) rows, both because
    * that is the long-form a trainer's tokenizer consumes and because
    * array cells can't be canonicalized by the row-sorting oracle
    * gate (see q43).
    */
  def sequences(events: DataFrame, gapMinutes: Int): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id")))).as("evs"))
      .select(col("user_id"),
        date_format(element_at(col("evs"), 1).getField("ts"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        posexplode(transform(col("evs"), e => e.getField("event_id")))
          .as(Seq("seq_pos", "event_id")))
      .select(col("user_id"), col("session_start"),
        col("seq_pos").cast("long").as("seq_pos"), col("event_id"))

  /** The Spark-4 `transformWithState` twin of [[streaming]]: same
    * state machine expressed as a [[org.apache.spark.sql.streaming.StatefulProcessor]]
    * with a named `ValueState` — the arbitrary-state API that
    * supersedes flatMapGroupsWithState (typed state variables, TTL,
    * timers, RocksDB-backed). Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * on the session running the query. A/B-pinned against both other
    * formulations in StreamingSpec.
    */
  final class SessionProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionSummary] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("sess",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.event_id))
      var st = if (state.exists()) state.get() else SessState(Long.MinValue, 0L, 0L)
      sorted.foreach { e =>
        val isNew = st.lastTs == Long.MinValue || e.tsMicros - st.lastTs > gapMicros
        st = SessState(e.tsMicros, st.nSessions + (if (isNew) 1 else 0), st.nEvents + 1)
      }
      state.update(st)
      Iterator.single(SessionSummary(key, st.nSessions, st.nEvents))
    }
  }

  final case class RecentEvent(tsMicros: Long, event_id: Long)
  final case class RecentSlot(user_id: Long, slot: Long, event_id: Long)

  /** `transformWithState` with a named LIST state: per user, the k
    * most recent events — the bounded per-key history every
    * "last N actions" feature store keeps. Each batch merges the
    * arrivals into the stored list, TRIMS back to k (state size is
    * bounded by k per key forever, the property ValueState folds
    * can't express and unbounded collect_list would violate), and
    * re-emits the user's current slots. Recency order is
    * (tsMicros, event_id) descending — a total order, so the final
    * state is batch-reproducible no matter how arrivals split
    * across micro-batches.
    */
  final class RecentEventsProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, RecentSlot] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ListState}
    @transient private var state: ListState[RecentEvent] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getListState[RecentEvent]("recent",
        org.apache.spark.sql.Encoders.product[RecentEvent], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[RecentSlot] = {
      val prior = if (state.exists()) state.get().toSeq else Seq.empty
      val merged = (prior ++ rows.map(e => RecentEvent(e.tsMicros, e.event_id)))
        .sortBy(r => (-r.tsMicros, -r.event_id))
        .take(k)
      state.put(merged.toArray)
      merged.iterator.zipWithIndex.map { case (r, i) =>
        RecentSlot(key, i + 1L, r.event_id)
      }
    }
  }

  /** Per-user k most recent events over a keyed stream. */
  def streamingRecentTws(events: Dataset[Event], k: Int): Dataset[RecentSlot] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RecentEventsProcessor(k), TimeMode.None(), OutputMode.Update())
  }

  final case class TypedEvent(event_id: Long, user_id: Long, event_type: String)
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** `transformWithState` with a named MAP state: per-user
    * (event_type → running count) — the keyed sub-map every
    * profile/feature store maintains. MapState stores each entry as
    * its own state-store row, so updating one type's counter never
    * rewrites the user's other counters (the ValueState-of-a-Map
    * alternative rewrites the whole map per event — quadratic churn
    * for wide maps). Only the types seen in the batch are updated
    * and re-emitted.
    */
  final class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TypedEvent, TypeCount] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, MapState, TimeMode, TimerValues, TTLConfig}
    @transient private var state: MapState[String, Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getMapState[String, Long]("type_counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TypedEvent],
        timers: TimerValues): Iterator[TypeCount] = {
      val arrivals = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
      }
      arrivals.toSeq.sortBy(_._1).iterator.map { case (tpe, n) =>
        val total = (if (state.containsKey(tpe)) state.getValue(tpe) else 0L) + n
        state.updateValue(tpe, total)
        TypeCount(key, tpe, total)
      }
    }
  }

  final case class TimedEvent(event_id: Long, user_id: Long,
    ts: java.sql.Timestamp)
  final case class SessionClose(user_id: Long, n_events: Long, closed_at_ms: Long)

  /** Event-time TIMERS in `transformWithState`: a session-timeout
    * emitter. Each arrival extends the open session and (re)arms a
    * timer at lastTs + gap; when the WATERMARK passes that instant
    * the timer fires in `handleExpiredTimer` and the closed session
    * is emitted and cleared. Stale timers (superseded by a newer
    * arrival that re-armed later) are detected by comparing the
    * expiry against the state's current deadline and ignored — the
    * register-without-delete pattern that avoids a per-event
    * deleteTimer round-trip to the state store.
    */
  final class SessionTimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TimedEvent, SessionClose] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("open_sess",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TimedEvent],
        timers: TimerValues): Iterator[SessionClose] = {
      val arrivals = rows.toSeq
      val lastMs = arrivals.map(_.ts.getTime).max
      val prior = if (state.exists()) state.get() else SessState(Long.MinValue, 0L, 0L)
      val st = SessState(math.max(prior.lastTs, lastMs), 0L,
        prior.nEvents + arrivals.size)
      state.update(st)
      getHandle.registerTimer(st.lastTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionClose] = {
      if (!state.exists()) return Iterator.empty
      val st = state.get()
      // a stale timer from a superseded deadline — the session was
      // extended after this timer was armed
      if (expired.getExpiryTimeInMs < st.lastTs + gapMs) Iterator.empty
      else {
        state.clear()
        Iterator.single(
          SessionClose(key, st.nEvents, expired.getExpiryTimeInMs))
      }
    }
  }

  /** Session-timeout close events over a WATERMARKED keyed stream. */
  def streamingSessionCloses(
      events: Dataset[TimedEvent], gapMs: Long): Dataset[SessionClose] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Per-(user, type) running counts over a keyed stream. */
  def streamingTypeCountsTws(events: Dataset[TypedEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeCountsProcessor(), TimeMode.None(), OutputMode.Update())
  }

  /** [[streaming]] expressed through `transformWithState`. */
  def streamingTws(events: Dataset[Event], gapMinutes: Int): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60L * 1000000L),
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming formulation over a keyed event stream. Emits one
    * summary per user per micro-batch (update semantics).
    */
  def streaming(events: Dataset[Event], gapMinutes: Int): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val isNew = st.lastTs == Long.MinValue || e.tsMicros - st.lastTs > gapMicros
            st = SessState(e.tsMicros, st.nSessions + (if (isNew) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          Iterator.single(SessionSummary(userId, st.nSessions, st.nEvents))
      }
  }
}
