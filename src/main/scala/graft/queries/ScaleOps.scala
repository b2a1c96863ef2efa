package graft.queries

import graft.Tables
import graft.operators.{BloomFilterOp, DistributedQuantile, HeavyHitters}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators whose POINT is the scale shape: sketch-accelerated
  * joins and frequency mining, distributed exact quantiles,
  * sliding-range distinct counts, compliance purges, and
  * interval-overlap joins. Each query is the small-data-correct,
  * 100 TB-shaped formulation (bounded candidate sets, map-side
  * pre-filters, broadcast-sized summaries — never a single-reducer
  * aggregate or a driver-side loop over data).
  */
object ScaleOps {

  /** Sessions as half-open intervals [s_start, s_end] per user at a
    * 30-minute inactivity gap — the interval form of q51's
    * sessionization (same flag + running-sum windows).
    */
  private def sessionIntervals(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"), col("ts"),
      unix_micros(col("ts")).as("tsu"))
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("tsu")).as("s_start"), max(col("tsu")).as("s_end"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-filter pre-filtered join (the runtime-filter pattern):
    // build a 128 KiB bloom over the selective dimension subset
    // (high-value orders, ~4 %), probe the fact MAP-SIDE before any
    // exchange, then run the exact join — false positives from the
    // bloom are dropped by the join, so the result is exactly the
    // plain join's (and is oracled as such). At 100 TB the fact
    // rows that reach the join shuffle drop ~25×.
    "q116_bloom_join" -> ((s, d) => {
      val t = Tables(s, d)
      val dims = t.orders.filter(col("o_totalprice") >= 480000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val filtered = BloomFilterOp.prefilter(
        t.lineitem, col("l_orderkey"), dims, col("o_orderkey"))
      filtered.join(dims, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
    }),

    // Misra-Gries heavy hitters with exact verify: per-partition
    // bounded summaries generate <= (k-1)*P candidate keys (vs a
    // full groupBy shuffling every distinct key), an exact keyed
    // recount decides membership with integer compares. Output is
    // EXACT (sketch-then-verify), so it hash-oracles against plain
    // GROUP BY ... HAVING.
    "q117_heavy_hitters" -> ((s, d) =>
      HeavyHitters.frequentKeys(
        Tables(s, d).events, col("user_id"), k = 200)
        .withColumnRenamed("key", "user_id")),

    // Trailing-7-day distinct users per day. Scale shape: collapse
    // to (user, day) DISTINCT first (the only big shuffle), then
    // each row fans out to the <= 7 window-end days it serves —
    // linear expansion, no self-join of the fact against itself.
    "q118_trailing_distinct" -> ((s, d) => {
      val ud = Tables(s, d).events
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = ud.select(col("day")).distinct()
        .withColumnRenamed("day", "day_w")
      ud.select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("day_w"), col("user_id"))
        .join(broadcast(days), Seq("day_w"), "left_semi")
        .groupBy(col("day_w"))
        .agg(countDistinct(col("user_id")).as("u7"))
        .select(date_format(col("day_w"), "yyyy-MM-dd").as("day"), col("u7"))
    }),

    // Right-to-be-forgotten purge with audit: an erasure-request
    // list (modeled as a deterministic subset of users) is
    // broadcast-anti-joined out of every table that carries the
    // key; the gate row is the audit (per-table before/purged/
    // after counts) a compliance pipeline must emit. The purged
    // frames themselves are pinned in ScaleOpsSpec (zero tombstone
    // rows survive).
    "q120_rtbf_purge" -> ((s, d) => {
      val t = Tables(s, d)
      val tomb = rtbfTombstones(t.events)
      rtbfAudit("events", t.events, col("user_id"), tomb)
        .unionByName(rtbfAudit("orders", t.orders, col("o_custkey"), tomb))
    }),

    // IQR outlier detection on inter-event gaps, with the quantiles
    // computed by DISTRIBUTED exact selection (DistributedQuantile:
    // range exchange + two-phase prefix-sum indexing) instead of
    // Spark's one-reducer `percentile` buffer. Bounds land on exact
    // binary fractions, so the verdict hash-matches quantile_cont.
    "q121_gap_outliers" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = Tables(s, d).events
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("tsu"))
        .withColumn("gap_us", col("tsu") - lag(col("tsu"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .select(col("event_id"), col("user_id"), col("gap_us"))
      val q = DistributedQuantile.exactQuantiles(
        gaps, col("gap_us"), col("event_id"),
        Seq("q1" -> 0.25, "q3" -> 0.75))
      gaps.crossJoin(broadcast(q)) // 1-row bounds frame
        .filter(col("gap_us") < col("q1") - (col("q3") - col("q1")) * 1.5 ||
          col("gap_us") > col("q3") + (col("q3") - col("q1")) * 1.5)
        .select(col("event_id"), col("user_id"), col("gap_us"))
    }),

    // Interval-overlap join: user sessions (intervals from the q51
    // sessionization) x a small maintenance-window calendar.
    // Overlap predicate is strict half-open (zero-length touches
    // excluded); the calendar side is broadcast, so the plan is a
    // BroadcastNestedLoopJoin over intervals — the right plan when
    // one side is calendar-sized. Overlap is emitted in exact
    // integer microseconds.
    "q123_interval_overlap" -> ((s, d) => {
      val sess = sessionIntervals(Tables(s, d).events)
      val win = maintenanceWindows(s)
      sess.join(broadcast(win),
          col("s_start") < col("w_end") && col("w_start") < col("s_end"))
        .select(col("user_id"), col("sid"), col("window_id"),
          (least(col("s_end"), col("w_end")) -
            greatest(col("s_start"), col("w_start"))).as("overlap_us"))
    })
  )

  /** Erasure-request list: the distinct users whose id ≡ 3 (mod 7)
    * — a deterministic stand-in for an arbitrary GDPR request
    * batch. Broadcast-sized by nature (requests, not rows).
    */
  def rtbfTombstones(events: DataFrame): DataFrame =
    events.select(col("user_id").as("k")).distinct()
      .filter(pmod(col("k"), lit(7L)) === 3L)

  /** Purged copy of `df`: broadcast anti-join against the request
    * list on `key` — one map-side-filterable pass per table.
    */
  def rtbfPurge(df: DataFrame, key: Column, tomb: DataFrame): DataFrame =
    df.join(broadcast(tomb), key === col("k"), "left_anti")

  private def rtbfAudit(name: String, df: DataFrame, key: Column,
                        tomb: DataFrame): DataFrame =
    df.join(broadcast(tomb), key === col("k"), "left")
      .agg(count(lit(1)).as("rows_before"),
        sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("rows_purged"))
      .select(lit(name).as("table_name"), col("rows_before"),
        col("rows_purged"),
        (col("rows_before") - col("rows_purged")).as("rows_after"))

  /** Maintenance-window calendar (w4 lies past the data's range on
    * purpose — it must produce zero overlap rows). Bounds in epoch
    * microseconds, UTC.
    */
  private def maintenanceWindows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("w1", "2024-01-04 00:00:00", "2024-01-06 12:00:00"),
      ("w2", "2024-01-12 00:00:00", "2024-01-13 00:00:00"),
      ("w3", "2024-01-20 06:00:00", "2024-01-24 00:00:00"),
      ("w4", "2024-02-10 00:00:00", "2024-02-12 00:00:00"))
      .toDF("window_id", "ws", "we")
      .select(col("window_id"),
        unix_micros(to_timestamp(col("ws"))).as("w_start"),
        unix_micros(to_timestamp(col("we"))).as("w_end"))
  }

  def oracleSql: Map[String, String] = Map(
    "q116_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice >= 480000
         GROUP BY 1""",
    "q117_heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
         t AS (SELECT count(*) AS total FROM events)
         SELECT user_id, n, n::DOUBLE / total::DOUBLE AS share
         FROM c, t WHERE n * 200 > total""",
    "q118_trailing_distinct" ->
      """WITH ud AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
         days AS (SELECT DISTINCT day FROM ud)
         SELECT strftime(d.day, '%Y-%m-%d') AS day,
                count(DISTINCT u.user_id)::BIGINT AS u7
         FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
         GROUP BY 1""",
    "q120_rtbf_purge" ->
      """WITH tomb AS (
           SELECT DISTINCT user_id AS k FROM events WHERE user_id % 7 = 3),
         ev AS (
           SELECT 'events' AS table_name, count(*) AS rows_before,
                  sum(CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS rows_purged
           FROM events e LEFT JOIN tomb t ON e.user_id = t.k),
         od AS (
           SELECT 'orders' AS table_name, count(*) AS rows_before,
                  sum(CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS rows_purged
           FROM orders o LEFT JOIN tomb t ON o.o_custkey = t.k)
         SELECT table_name, rows_before, rows_purged,
                (rows_before - rows_purged)::BIGINT AS rows_after
         FROM (SELECT * FROM ev UNION ALL SELECT * FROM od)""",
    "q121_gap_outliers" ->
      """WITH g AS (
           SELECT event_id, user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events),
         gg AS (SELECT * FROM g WHERE gap_us IS NOT NULL),
         s AS (SELECT quantile_cont(gap_us, 0.25) AS q1,
                      quantile_cont(gap_us, 0.75) AS q3 FROM gg)
         SELECT event_id, user_id, gap_us FROM gg, s
         WHERE gap_us < q1 - 1.5 * (q3 - q1)
            OR gap_us > q3 + 1.5 * (q3 - q1)""",
    "q123_interval_overlap" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT user_id, event_id, tsu,
                  CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM x),
         sess0 AS (
           SELECT user_id, tsu,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
           FROM f),
         sess AS (
           SELECT user_id, sid, min(tsu) AS s_start, max(tsu) AS s_end
           FROM sess0 GROUP BY 1, 2),
         win AS (
           SELECT * FROM (VALUES
             ('w1', epoch_us(TIMESTAMP '2024-01-04 00:00:00'),
                    epoch_us(TIMESTAMP '2024-01-06 12:00:00')),
             ('w2', epoch_us(TIMESTAMP '2024-01-12 00:00:00'),
                    epoch_us(TIMESTAMP '2024-01-13 00:00:00')),
             ('w3', epoch_us(TIMESTAMP '2024-01-20 06:00:00'),
                    epoch_us(TIMESTAMP '2024-01-24 00:00:00')),
             ('w4', epoch_us(TIMESTAMP '2024-02-10 00:00:00'),
                    epoch_us(TIMESTAMP '2024-02-12 00:00:00')))
             AS t(window_id, w_start, w_end))
         SELECT s.user_id, s.sid, w.window_id,
                (least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start))::BIGINT
                  AS overlap_us
         FROM sess s JOIN win w
           ON s.s_start < w.w_end AND w.w_start < s.s_end"""
  )
}
