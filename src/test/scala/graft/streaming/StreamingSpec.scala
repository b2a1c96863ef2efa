package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

// top-level: Encoders can't derive for method-local case classes
final case class Tick(ts: java.sql.Timestamp, k: String)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming sessionize (flatMapGroupsWithState) matches the batch formulation") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val minute = 60L * 1000000L
    val events = Seq(
      Sessionize.Event(1, 100L, 0 * minute),
      Sessionize.Event(2, 100L, 5 * minute),     // same session (gap 5m)
      Sessionize.Event(3, 100L, 50 * minute),    // new session (gap 45m)
      Sessionize.Event(4, 200L, 0 * minute))
    mem.addData(events: _*)
    val q = Sessionize.streaming(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((100L, 2L, 3L), (200L, 1L, 1L)))

    // batch twin over the same data
    val batchDf = events.toDF()
      .select(col("event_id"), col("user_id"), timestamp_micros(col("tsMicros")).as("ts"))
    val batch = Sessionize.batch(batchDf, 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got)
  }

  test("transformWithState sessionize matches flatMapGroupsWithState and batch") {
    implicit val sq = spark.sqlContext
    // transformWithState requires the RocksDB state store provider;
    // scope it to this query and restore after
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Sessionize.Event]
      val minute = 60L * 1000000L
      val events = Seq(
        Sessionize.Event(1, 100L, 0 * minute),
        Sessionize.Event(2, 100L, 5 * minute),     // same session (gap 5m)
        Sessionize.Event(3, 100L, 50 * minute),    // new session (gap 45m)
        Sessionize.Event(4, 200L, 0 * minute))
      mem.addData(events: _*)
      val q = Sessionize.streamingTws(mem.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sess_tws")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("sess_tws")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((100L, 2L, 3L), (200L, 1L, 1L)))
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("transformWithState state carries across micro-batches") {
    implicit val sq = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Sessionize.Event]
      val minute = 60L * 1000000L
      val q = Sessionize.streamingTws(mem.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sess_tws_inc")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      mem.addData(Sessionize.Event(1, 7L, 0 * minute))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(2, 7L, 10 * minute))  // same session
      q.processAllAvailable()
      mem.addData(Sessionize.Event(3, 7L, 120 * minute)) // new session
      q.processAllAvailable()
      q.stop()
      val updates = spark.table("sess_tws_inc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(updates.contains((7L, 2L, 3L)), s"got $updates")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("streaming state carries across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val minute = 60L * 1000000L
    val q = Sessionize.streaming(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_inc")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(Sessionize.Event(1, 7L, 0 * minute))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(2, 7L, 10 * minute))  // same session
    q.processAllAvailable()
    mem.addData(Sessionize.Event(3, 7L, 120 * minute)) // new session
    q.processAllAvailable()
    q.stop()
    // the final update for user 7 reflects state accumulated across
    // all three micro-batches
    val updates = spark.table("sess_inc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(updates.contains((7L, 2L, 3L)), s"got $updates")
  }

  test("watermark drops events later than the threshold (append mode)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.streaming.Trigger
    val mem = MemoryStream[Tick]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val agg = mem.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("k"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: events in the 10:00 window, then advance the clock
    mem.addData(Tick(t("2024-01-01 10:01:00"), "a"), Tick(t("2024-01-01 10:02:00"), "a"))
    q.processAllAvailable()
    mem.addData(Tick(t("2024-01-01 10:25:00"), "a")) // watermark -> 10:15
    q.processAllAvailable()
    // batch 3: a LATE event for the (closed) 10:00 window — dropped
    mem.addData(Tick(t("2024-01-01 10:03:00"), "a"))
    q.processAllAvailable()
    mem.addData(Tick(t("2024-01-01 10:45:00"), "a")) // closes 10:20 window
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_out").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    // 10:00 window emitted with the ON-TIME count only; the late
    // event never re-opened it
    assert(rows.get("10:00").contains(2L), s"got $rows")
  }

  test("streaming dedup: redelivered keys across micro-batches emit once (watermarked state)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tick]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // dropDuplicatesWithinWatermark: exact streaming dedup whose
    // state is bounded by the watermark — the streaming twin of the
    // q32 digest dedup (keys instead of digests here)
    val deduped = mem.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(Tick(t("2024-01-01 10:00:00"), "a"), Tick(t("2024-01-01 10:00:30"), "a"))
    q.processAllAvailable()
    // redelivery of "a" in a later micro-batch, within the watermark
    mem.addData(Tick(t("2024-01-01 10:01:00"), "a"), Tick(t("2024-01-01 10:01:00"), "b"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_out").collect().map(_.getString(1)).toSeq.sorted
    assert(rows == Seq("a", "b"), s"got $rows")
  }

  test("hourly streaming KPIs match a batch groupBy over the same file") {
    val got = StreamingKpi.hourlyCounts(spark,
      "/root/testdata/sf0.001/events.parquet", "hourly_test")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001").events
    val exp = ev.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    assert(got.count() == exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("upsert-sink drain (update mode) ≡ memory-sink drain (complete mode)") {
    // the scale path (watermark-bounded state, foreachBatch → keyed
    // LWW sink, distributed read-back) must produce exactly the
    // complete-mode aggregate
    val upsert = StreamingKpi.hourlyCountsUpsert(spark,
      "/root/testdata/sf0.001/events.parquet")
    val memory = StreamingKpi.hourlyCounts(spark,
      "/root/testdata/sf0.001/events.parquet", "hourly_ab")
    assert(upsert.count() == memory.count())
    assert(upsert.exceptAll(memory).isEmpty && memory.exceptAll(upsert).isEmpty)
  }

  test("restart from checkpoint: second drain resumes exactly-once (no reprocess, no loss)") {
    // The recovery contract a production stream lives by: a query
    // that dies and restarts against the SAME checkpoint must (a)
    // not re-count files it already processed, (b) pick up files
    // that arrived while it was down, (c) restore its aggregation
    // state. We prove all three by draining twice over a growing
    // directory and checking the running per-type counts after each.
    import graft.music.ParquetKeyedUpsertSink
    val work = java.nio.file.Files.createTempDirectory("graft-restart-")
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    val sink = ParquetKeyedUpsertSink(s"$work/out")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_id"), col("event_type"))

    def drain(): Unit = {
      val q = spark.readStream
        .schema("event_id LONG, event_type STRING").parquet(srcDir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val c = b.persist()
          try { if (!c.isEmpty) sink.upsert(c, Seq("event_type")) }
          finally c.unpersist()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sinkCounts(): Map[String, Long] = sink.read(spark)
      .select(col("event_type"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expect(cond: org.apache.spark.sql.Column): Map[String, Long] =
      ev.filter(cond).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    ev.filter(col("event_id") % 2 === 0)
      .repartition(1).write.mode("append").parquet(srcDir)
    drain()
    assert(sinkCounts() == expect(col("event_id") % 2 === 0),
      "first drain must equal the first half's counts")

    // files land while the query is down; the restarted query must
    // resume from the checkpoint's file log + state store
    ev.filter(col("event_id") % 2 === 1)
      .repartition(1).write.mode("append").parquet(srcDir)
    drain()
    assert(sinkCounts() == expect(lit(true)),
      "after restart the running counts must cover BOTH halves exactly once")
  }

  test("maxFilesPerTrigger bounds each micro-batch to one file; result unchanged") {
    // Backfill ingestion control: a directory of N files drained
    // with maxFilesPerTrigger=1 must process in N bounded batches
    // (the knob that keeps a 100k-file backlog from becoming one
    // monster batch), and the final aggregate must equal the batch
    // answer regardless of the batching.
    val work = java.nio.file.Files.createTempDirectory("graft-mfpt-")
    val srcDir = s"$work/src"
    val ev = graft.Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_id"), col("event_type"))
    (0 until 4).foreach(i =>
      ev.filter(col("event_id") % 4 === i)
        .repartition(1).write.mode("append").parquet(srcDir))
    val nFiles = new java.io.File(srcDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles == 4)
    var batches = 0
    val q = spark.readStream
      .schema("event_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = b.persist()
        try {
          if (!c.isEmpty) {
            batches += 1
            c.write.mode("overwrite").parquet(s"$work/out")
          }
        } finally c.unpersist()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches == 4, s"expected 4 one-file micro-batches, saw $batches")
    val got = spark.read.parquet(s"$work/out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp, "complete-mode final state must equal the batch aggregate")
  }

  test("transformWithState event-time timers close sessions at watermark + gap") {
    implicit val sq = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Sessionize.TimedEvent]
      def ev(id: Long, uid: Long, ms: Long) =
        Sessionize.TimedEvent(id, uid, new java.sql.Timestamp(ms))
      val q = Sessionize.streamingSessionCloses(mem.toDS(), gapMs = 60000L)
        .writeStream.format("memory").queryName("sess_close")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      // batch 1: user 5 active at t=10s and t=30s (one session, 2
      // events; t=0 would tie the initial watermark and be dropped
      // as late)
      mem.addData(ev(1, 5L, 10000L), ev(2, 5L, 30000L))
      q.processAllAvailable()
      assert(spark.table("sess_close").isEmpty,
        "session must stay open while the watermark is behind the deadline")
      // batch 2: user 6 at t=200s pushes the watermark past 30s+60s →
      // user 5's timer fires; user 6's own session stays open
      mem.addData(ev(3, 6L, 200000L))
      q.processAllAvailable()
      // the timer fires during the batch AFTER the watermark advances
      mem.addData(ev(4, 6L, 201000L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("sess_close")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((5L, 2L)),
        s"exactly user 5's 2-event session must close, got $got")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("transformWithState ListState trims to k across micro-batches") {
    implicit val sq = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Sessionize.Event]
      val q = Sessionize.streamingRecentTws(mem.toDS(), k = 3)
        .writeStream.format("memory").queryName("recent_tws")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      // batch 1: events 1..4 at ts 10..40 → last-3 = (4,3,2)
      mem.addData((1L to 4L).map(i => Sessionize.Event(i, 9L, i * 10L)): _*)
      q.processAllAvailable()
      // batch 2: a NEWER event 5 plus an OLDER-than-everything event
      // 6 (ts 5) — 6 must not displace anything; state trimmed to 3
      mem.addData(Sessionize.Event(5L, 9L, 50L), Sessionize.Event(6L, 9L, 5L))
      q.processAllAvailable()
      q.stop()
      // update-mode memory sink: the LAST row per (user, slot) wins
      val got = spark.table("recent_tws")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .zipWithIndex
        .groupBy { case ((u, s, _), _) => (u, s) }
        .map { case (k2, rows) => k2 -> rows.maxBy(_._2)._1._3 }
      assert(got == Map((9L, 1L) -> 5L, (9L, 2L) -> 4L, (9L, 3L) -> 3L),
        s"got $got")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
