package graft.queries

import graft.streaming.{Sessionize, StreamingKpi}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query bindings for the streaming / stateful operators, drained
  * synchronously so the driver's batch-oriented verify harness can
  * compare them against SQL oracles.
  */
object StreamOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Structured Streaming file source + watermark + windowed agg,
    // AvailableNow (SURVEY §2.9: sense → process-once → advance).
    // Drained through update-mode foreachBatch + the keyed upsert
    // sink: watermark-bounded state, no driver-side aggregate (the
    // complete-mode memory sink remains as the A/B twin in
    // StreamingSpec).
    "q50_stream_hourly" -> ((s, d) =>
      StreamingKpi.hourlyCountsUpsert(s, s"$d/events.parquet")),

    // Gap-based sessionization (batch formulation; the streaming
    // flatMapGroupsWithState twin is covered by StreamingSpec).
    "q51_sessionize" -> ((s, d) =>
      Sessionize.batch(Tables(s, d).events, gapMinutes = 30)),

    // Ordered per-session event sequences (training examples for a
    // behavioral sequence model): session assignment shared with q51,
    // sequence built via sort_array(collect_list(struct)) and
    // exploded to long form. Oracle: the same order as window
    // row_numbers over the session CTE.
    "q81_session_sequences" -> ((s, d) =>
      Sessionize.sequences(Tables(s, d).events, gapMinutes = 30)),

    // Streaming dedup within the watermark under duplicate delivery:
    // every event staged twice (at-least-once redelivery),
    // dropDuplicatesWithinWatermark removes the copies with
    // watermark-bounded id state, counts drain through the upsert
    // sink. Oracle: batch count(DISTINCT event_id) per type.
    "q79_stream_dedup" -> ((s, d) =>
      StreamingKpi.dedupedTypeCountsUpsert(s, s"$d/events.parquet")),

    // Stream-STATIC enrichment: the event stream joined to the batch
    // customer dim (broadcast per micro-batch, stateless) before the
    // watermarked hourly aggregate — the reference-data lookup half
    // of the join surface next to the stream-stream matrix. Oracle:
    // the same mapping + join + hour bucket in batch SQL.
    "q321_stream_static_enrich" -> ((s, d) =>
      StreamingKpi.enrichedSegmentCountsUpsert(s, s"$d/events.parquet",
        s"$d/customer.parquet")),

    // SLIDING windows (1h length, 15m slide — tumbling is the
    // degenerate slide = length case, q50): every event contributes
    // to exactly 4 overlapping windows. Oracle: explicit window
    // enumeration per event.
    "q111_sliding_window" -> ((s, d) =>
      StreamingKpi.slidingCountsUpsert(s, s"$d/events.parquet")),

    // Arbitrary stateful processing via Spark-4 transformWithState
    // (StatefulProcessor + named RocksDB ValueState — the
    // flatMapGroupsWithState successor): per-user session summaries
    // over the event stream, drained through the upsert sink. Same
    // output contract as q51 → same oracle, proving the three
    // sessionize formulations (batch window, FMGWS, TWS) agree on
    // the real corpus.
    "q104_sessionize_tws" -> ((s, d) =>
      StreamingKpi.sessionSummariesTws(s, s"$d/events.parquet")),

    // Stream–stream inner join with watermark-bounded state on both
    // sides: each click matched to the same user's purchases in the
    // following hour, drained append-mode through a parquet sink.
    // Oracle: the equivalent batch range join.
    "q94_stream_join" -> ((s, d) =>
      StreamingKpi.clickPurchaseJoin(s, s"$d/events.parquet")),

    // Stream–STATIC dimension-enrichment join (stateless; the static
    // side re-broadcast per micro-batch), per-segment counts drained
    // through the upsert sink. Oracle: the batch join.
    "q128_stream_static_join" -> ((s, d) =>
      StreamingKpi.segmentCountsStreamStatic(
        s, s"$d/events.parquet", s"$d/customer.parquet")),

    // APPEND-mode windowed aggregate: only FINALIZED windows reach
    // the sink (emitted when the watermark passes their end) — q50's
    // update-mode twin with the opposite output contract. The oracle
    // encodes the eviction boundary: windows ending at most
    // max(ts) − 1h tolerance.
    "q143_stream_append_windows" -> ((s, d) =>
      StreamingKpi.hourlyCountsAppend(s, s"$d/events.parquet")),

    // Multi-source streaming union: two disjoint slices of the
    // stream merged before one watermarked aggregate. Oracle: plain
    // per-type counts (the union must be loss- and dup-free).
    "q144_stream_union" -> ((s, d) =>
      StreamingKpi.unionTypeCounts(s, s"$d/events.parquet")),

    // Stream–stream LEFT OUTER join: matches emit immediately,
    // unmatched clicks emit with null purchase at state eviction —
    // the join matrix's third member (inner q94, stream-static
    // q128). Oracle encodes the null-emission horizon.
    "q146_stream_left_join" -> ((s, d) =>
      StreamingKpi.clickPurchaseLeftJoin(s, s"$d/events.parquet")),

    // Stream–stream FULL OUTER join: unmatched rows from BOTH sides
    // emit null-joined at state eviction — each side with its own
    // horizon (clicks: cts + interval behind the watermark;
    // purchases: pts itself behind it).
    "q154_stream_full_join" -> ((s, d) =>
      StreamingKpi.clickPurchaseFullJoin(s, s"$d/events.parquet")),

    // Stream–stream RIGHT OUTER join: the left join's mirror,
    // preserving purchases — unmatched purchases emit null-clicked
    // once the watermark passes their own event time. Completes the
    // inner/left/right/full streaming join matrix.
    "q195_stream_right_join" -> ((s, d) =>
      StreamingKpi.clickPurchaseRightJoin(s, s"$d/events.parquet")),

    // transformWithState LIST state: per-user last-3 events with the
    // state trimmed to k entries every batch — the bounded-history
    // feature-store pattern (ValueState q104 folds scalars; this
    // keeps an ordered COLLECTION bounded). Oracle: the batch
    // row_number window over the same recency order.
    "q207_tws_recent_list" -> ((s, d) =>
      StreamingKpi.recentEventsTws(s, s"$d/events.parquet")),

    // DYNAMIC-gap session windows: each event contributes its own
    // inactivity horizon (clicks 10 min, purchases 60 min, else
    // 30 min) and session_window merges the overlapping [ts, ts+gap)
    // intervals — engagement-dependent sessionization that a fixed
    // gap (q52) can't express. The oracle replays the merge as a
    // running-max interval walk: new session ⟺ ts >= max so far of
    // (ts_i + gap_i), end = max(ts_i + gap_i) — the end-exclusive
    // boundary matching Spark's split-at->=-gap semantics.
    "q220_dynamic_session" -> ((s, d) => {
      // session_window's dynamic gap must be CalendarIntervalType;
      // ANSI `INTERVAL n MINUTES` literals are DayTimeIntervalType,
      // so build the gaps with make_interval
      val gap = when(col("event_type") === "click",
          expr("make_interval(0,0,0,0,0,10,0)"))
        .when(col("event_type") === "purchase",
          expr("make_interval(0,0,0,0,1,0,0)"))
        .otherwise(expr("make_interval(0,0,0,0,0,30,0)"))
      Tables(s, d).events
        .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
          col("n"))
    }),

    // transformWithState MAP state: per-user (event_type → count),
    // each entry an independent state-store row (no whole-map
    // rewrite per event). Completes the TWS state-variable matrix:
    // ValueState (q104), ListState (q207), MapState (here). Oracle:
    // the batch GROUP BY.
    "q214_tws_map_counts" -> ((s, d) =>
      StreamingKpi.typeCountsTws(s, s"$d/events.parquet")),

    // Typed cogroup (KeyValueGroupedDataset.cogroup): reduce-side
    // per-key imperative logic over two inputs — the "genuine
    // per-partition imperative" escape hatch, used here to merge
    // event and order activity per key. Oracle: full-outer of the
    // two keyed counts.
    "q145_cogroup" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val ev = Tables(s, d).events.select(col("user_id")).as[Long]
      val or = Tables(s, d).orders.select(col("o_custkey")).as[Long]
      ev.groupByKey(identity).cogroup(or.groupByKey(identity)) {
        (k, evs, ors) =>
          var ne = 0L; var no = 0L
          evs.foreach(_ => ne += 1)
          ors.foreach(_ => no += 1)
          Iterator((k, ne, no))
      }.toDF("key", "n_events", "n_orders")
    }),

    // Spark's built-in session_window operator: per-(user, session)
    // grain with the session start = first event, same 30-min gap.
    "q52_session_window" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables(s, d).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q50_stream_hourly" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n,
                round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2""",
    "q79_stream_dedup" ->
      """SELECT event_type, count(DISTINCT event_id) AS n_events
         FROM events GROUP BY 1""",
    "q321_stream_static_enrich" ->
      """WITH n AS (SELECT count(*) AS nc FROM customer),
         e AS (SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
                      user_id % nc + 1 AS ck
               FROM events, n)
         SELECT e.window_start, c.c_mktsegment AS segment,
                count(*)::BIGINT AS n
         FROM e JOIN customer c ON c.c_custkey = e.ck
         GROUP BY 1, 2""",
    "q111_sliding_window" ->
      """WITH w AS (
           SELECT event_type, value,
                  time_bucket(INTERVAL '15 minutes', ts)
                    - (j * INTERVAL '15 minutes') AS ws
           FROM events, UNNEST(range(4)) t(j))
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
                count(*) AS n, round(sum(value), 2) AS total_value
         FROM w GROUP BY 1, 2""",
    "q94_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour'""",
    "q81_session_sequences" ->
      """WITH x AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, event_id,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id,
                strftime(min(ts) OVER (PARTITION BY user_id, sid),
                         '%Y-%m-%d %H:%M:%S') AS session_start,
                (row_number() OVER (PARTITION BY user_id, sid
                                    ORDER BY ts, event_id) - 1)::BIGINT AS seq_pos,
                event_id
         FROM s""",
    "q52_session_window" ->
      """WITH x AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
           FROM x)
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                count(*) AS n_events
         FROM s GROUP BY user_id, session_id""",
    "q51_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events)
         SELECT user_id,
                sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
                count(*) AS n_events
         FROM x GROUP BY 1""",
    "q128_stream_static_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2""",
    "q143_stream_append_windows" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
         SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                  AS window_start,
                event_type, count(*) AS n
         FROM events, mx
         WHERE date_trunc('hour', ts) <= date_trunc('hour', m - INTERVAL 2 HOUR)
         GROUP BY 1, 2""",
    "q144_stream_union" ->
      """SELECT event_type, count(*) AS n FROM events GROUP BY 1""",
    "q154_stream_full_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS cts
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS pts
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT epoch_us(max(cts)) // 1000 FROM c),
                             (SELECT epoch_us(max(pts)) // 1000 FROM p))
                       - 3600000 AS wm_ms),
         m AS (SELECT c.user_id, c.click_id, p.purchase_id
               FROM c JOIN p ON c.user_id = p.p_user
                 AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 1 HOUR),
         uc AS (SELECT c.user_id, c.click_id, NULL::BIGINT AS purchase_id
                FROM c, wm
                WHERE c.click_id NOT IN (SELECT click_id FROM m)
                  AND epoch_us(c.cts) + 3600000000 < wm_ms * 1000),
         up AS (SELECT p.p_user AS user_id, NULL::BIGINT AS click_id,
                       p.purchase_id
                FROM p, wm
                WHERE p.purchase_id NOT IN (SELECT purchase_id FROM m)
                  AND epoch_us(p.pts) < wm_ms * 1000)
         SELECT user_id, click_id, purchase_id FROM m
         UNION ALL SELECT * FROM uc
         UNION ALL SELECT * FROM up""",
    "q214_tws_map_counts" ->
      """SELECT user_id, event_type, count(*) AS n
         FROM events GROUP BY 1, 2""",
    "q220_dynamic_session" ->
      """WITH g AS (
           SELECT user_id, event_id, ts,
                  CASE event_type WHEN 'click' THEN INTERVAL 10 MINUTE
                                  WHEN 'purchase' THEN INTERVAL 60 MINUTE
                                  ELSE INTERVAL 30 MINUTE END AS gap
           FROM events),
         x AS (
           SELECT *, max(ts + gap) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_end
           FROM g),
         s AS (
           SELECT *, CASE WHEN prev_end IS NULL OR ts >= prev_end
                          THEN 1 ELSE 0 END AS new_s
           FROM x),
         t AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM s)
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
                strftime(max(ts + gap), '%Y-%m-%d %H:%M:%S') AS s_end,
                count(*) AS n
         FROM t GROUP BY user_id, sid""",
    "q207_tws_recent_list" ->
      """WITH r AS (
           SELECT user_id, event_id,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS slot
           FROM events)
         SELECT user_id, slot::BIGINT AS slot, event_id
         FROM r WHERE slot <= 3""",
    "q195_stream_right_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS cts
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS pts
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT epoch_us(max(cts)) // 1000 FROM c),
                             (SELECT epoch_us(max(pts)) // 1000 FROM p))
                       - 3600000 AS wm_ms),
         m AS (SELECT c.user_id, c.click_id, p.purchase_id
               FROM c JOIN p ON c.user_id = p.p_user
                 AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 1 HOUR),
         up AS (SELECT p.p_user AS user_id, NULL::BIGINT AS click_id,
                       p.purchase_id
                FROM p, wm
                WHERE p.purchase_id NOT IN (SELECT purchase_id FROM m)
                  AND epoch_us(p.pts) < wm_ms * 1000)
         SELECT user_id, click_id, purchase_id FROM m
         UNION ALL SELECT * FROM up""",
    "q146_stream_left_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS cts
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS pts
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT epoch_us(max(cts)) // 1000 FROM c),
                             (SELECT epoch_us(max(pts)) // 1000 FROM p))
                       - 3600000 AS wm_ms),
         m AS (SELECT c.user_id, c.click_id, p.purchase_id, c.cts
               FROM c JOIN p ON c.user_id = p.p_user
                 AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 1 HOUR),
         um AS (SELECT c.user_id, c.click_id, NULL::BIGINT AS purchase_id
                FROM c, wm
                WHERE c.click_id NOT IN (SELECT click_id FROM m)
                  AND epoch_us(c.cts) + 3600000000 < wm_ms * 1000)
         SELECT user_id, click_id, purchase_id FROM m
         UNION ALL
         SELECT user_id, click_id, purchase_id FROM um""",
    "q145_cogroup" ->
      """WITH e AS (SELECT user_id AS key, count(*) AS n_events
                    FROM events GROUP BY 1),
         o AS (SELECT o_custkey AS key, count(*) AS n_orders
               FROM orders GROUP BY 1)
         SELECT key, coalesce(n_events, 0)::BIGINT AS n_events,
                coalesce(n_orders, 0)::BIGINT AS n_orders
         FROM e FULL OUTER JOIN o USING (key)""",
    // same contract as q51 by design (see the query comment)
    "q104_sessionize_tws" ->
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
