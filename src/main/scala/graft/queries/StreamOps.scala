package graft.queries

import graft.streaming.{Sessionize, StreamingKpi}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query bindings for the streaming / stateful operators, drained
  * synchronously so the driver's batch-oriented verify harness can
  * compare them against SQL oracles.
  */
object StreamOps {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Structured Streaming file source + watermark + windowed agg,
    // AvailableNow (SURVEY §2.9: sense → process-once → advance).
    "q50_stream_hourly" -> ((s, d) =>
      StreamingKpi.hourlyCounts(s, s"$d/events.parquet",
        queryName = s"graft_stream_hourly_${counter.incrementAndGet()}")),

    // Gap-based sessionization (batch formulation; the streaming
    // flatMapGroupsWithState twin is covered by StreamingSpec).
    "q51_sessionize" -> ((s, d) =>
      Sessionize.batch(Tables(s, d).events, gapMinutes = 30))
  )

  def oracleSql: Map[String, String] = Map(
    "q50_stream_hourly" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n,
                round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2""",
    "q51_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events)
         SELECT user_id,
                sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
                count(*) AS n_events
         FROM x GROUP BY 1"""
  )
}
