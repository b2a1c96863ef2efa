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

  /** Batch formulation: a session starts where the gap from the
    * previous event of the same user exceeds `gapMinutes`.
    */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L,
          1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
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
