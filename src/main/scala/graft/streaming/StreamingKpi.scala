package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.9): the reference's
  * sense→process-once→advance loop maps to a file source with
  * `Trigger.AvailableNow` — each run drains exactly the files
  * present, checkpointing replaces archive-as-progress-marker.
  *
  * Windowed aggregation with a watermark is the streaming analog of
  * the per-date KPI grouping; state is bounded by the watermark at
  * any scale.
  */
object StreamingKpi {

  /** The event stream source, normalized. The fixture generator has
    * shipped `ts` as THREE parquet types across rounds (TIMESTAMP
    * (NANOS) → Long under `spark.sql.legacy.parquet.nanosAsLong`;
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ; plain
    * TIMESTAMP), and a file stream source needs an explicit schema —
    * so probe the footer with a one-off batch read (metadata only, no
    * scan) and normalize to µs TimestampType exactly as Tables.events
    * does for batch (the NTZ cast is micros-exact under the UTC
    * session time zone GraftSession pins).
    */
  private def eventsStreamFromDir(s: SparkSession, dir: String): DataFrame = {
    val fileSchema = s.read.parquet(dir).schema
    val src = s.readStream.schema(fileSchema).parquet(dir)
    fileSchema("ts").dataType match {
      case LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        src.withColumn("ts", col("ts").cast("timestamp"))
      case _ => src
    }
  }

  private def eventsStream(s: SparkSession, eventsPath: String): DataFrame =
    eventsStreamFromDir(s, stageAsDir(eventsPath))

  /** The file stream source wants a directory; when handed a single
    * file, stage a copy under a content-addressed temp dir (the
    * "sensed input prefix" of the reference's S3 layout,
    * `dag.py:12-13`).
    */
  private def stageAsDir(path: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val p = Paths.get(path)
    if (Files.isDirectory(p)) path
    else {
      val dir = Paths.get(sys.props("java.io.tmpdir"),
        "graft-stream-" + Integer.toHexString(path.hashCode))
      Files.createDirectories(dir)
      Files.copy(p, dir.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
  }

  /** The windowed hourly aggregate (shared by both drain paths). */
  private def hourlyAgg(
      spark: SparkSession, eventsPath: String, latenessTolerance: String): DataFrame =
    eventsStream(spark, eventsPath)
      .withWatermark("ts", latenessTolerance)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"),
        round(col("total_value"), 2).as("total_value"))

  /** Hourly event counts per type — the SCALE path: update-mode
    * `foreachBatch` into the keyed upsert sink (the same
    * last-writer-wins contract the streaming pipeline uses), then a
    * distributed read-back of the sink table.
    *
    * Why not complete mode + memory sink (the A/B twin below): that
    * holds every window ever seen on the driver and re-emits all of
    * them each batch — state and output grow with the date range.
    * Here the watermark bounds in-flight state to ~1 hour of
    * windows, each micro-batch upserts only the windows it touched,
    * and the result never funnels through the driver. Replay or
    * redelivery is idempotent per (window_start, event_type) key.
    *
    * Determinism: a single-batch AvailableNow drain (the default
    * here: one staged file, no maxFilesPerTrigger) sees every row
    * before any watermark advances, so the result equals the batch
    * aggregate exactly. When a drain DOES split into multiple
    * micro-batches, standard watermark semantics apply ACROSS the
    * batches: a row arriving more than `latenessTolerance` behind the
    * max event time of an earlier batch is late and is dropped, just
    * as in a live stream. For backfills over event-time-unordered
    * file sets, size `latenessTolerance` to the disorder bound (or
    * use the batch path) — that is the knob this parameter exists
    * for.
    */
  def hourlyCountsUpsert(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame =
    upsertDrain(spark, "graft-q50-",
      s => hourlyAgg(s, eventsPath, latenessTolerance),
      Seq("window_start", "event_type"))

  /** Stream-STATIC enrichment (q321): the event stream joined to the
    * batch customer dimension before a watermarked hourly aggregate —
    * the reference-data lookup shape (enrich each record with a
    * slowly-changing dim snapshot) that complements the
    * stream-stream matrix (q94/q163/q195). The static side plans as
    * a broadcast per micro-batch: no state, no watermark on the dim,
    * and a dim refresh is just the next batch's re-resolution. The
    * synthetic user→customer mapping (pmod into the key space) is
    * derived from the dim's own count, so the query scales with the
    * data; the oracle replays it in batch SQL.
    */
  def enrichedSegmentCountsUpsert(
      spark: SparkSession,
      eventsPath: String,
      customerPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val nCust = spark.read.parquet(customerPath).count()
    upsertDrain(spark, "graft-q321-", { s =>
      val dim = s.read.parquet(customerPath)
        .select(col("c_custkey"), col("c_mktsegment"))
      eventsStream(s, eventsPath)
        .withWatermark("ts", latenessTolerance)
        .withColumn("ck", pmod(col("user_id"), lit(nCust)) + 1L)
        .join(broadcast(dim), col("ck") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("c_mktsegment").as("segment"), col("n"))
    }, Seq("window_start", "segment"))
  }

  /** Drain an update-mode streaming aggregate through the keyed
    * upsert sink and read the result back — the shared plumbing of
    * q50 (windowed hourly KPIs) and q79 (deduplicated type counts).
    *
    * Conf scoping: the drain wants `noDataMicroBatches` off (an
    * AvailableNow update-mode drain doesn't need the trailing
    * watermark-advance batch — it would only re-load and re-commit
    * every state store for zero output rows) and 8 shuffle/state
    * partitions (the aggregate is windows × event-types tiny; 8 state
    * stores bound per-batch load/commit I/O — a real deployment sizes
    * this to the aggregate's cardinality, not the input's). Both are
    * set on a CHILD session (`newSession`: same SparkContext,
    * isolated runtime SQLConf), so the aggregate must be built
    * against that session — hence the builder parameter. Queries
    * running concurrently on the caller's session never observe the
    * overrides.
    */
  private def upsertDrain(
      spark: SparkSession,
      dirPrefix: String,
      buildAgg: SparkSession => DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val workDir = tempWorkDir(dirPrefix)
    val sink = graft.music.ParquetKeyedUpsertSink(s"$workDir/out")
    val scoped = spark.newSession()
    // newSession starts from the SparkContext defaults, not the
    // caller's runtime conf — re-pin the nanos-parquet setting the
    // events source needs (harmless for non-events inputs)
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val q = buildAgg(scoped).writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$workDir/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch frames are recomputed per action — without the
        // persist, the isEmpty probe AND the upsert's write would each
        // re-run the stateful aggregation (and its state-store pass)
        val cached = batch.persist()
        try {
          if (!cached.isEmpty) sink.upsert(cached, keyCols)
        } finally cached.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sink.read(spark)
  }

  /** Streaming deduplication within the watermark, proven end-to-end:
    * the input file is staged TWICE (every event is delivered twice —
    * the redelivery/at-least-once shape a real ingest pipeline sees),
    * `dropDuplicatesWithinWatermark` on the event id removes the
    * duplicates while holding only a watermark-bounded id state, and
    * the deduplicated per-type counts drain through the same
    * update-mode upsert path as q50. The result must equal the batch
    * `count(DISTINCT event_id)` per type — which is the SQL oracle.
    */
  def dedupedTypeCountsUpsert(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val dupDir = stageDuplicated(eventsPath)
    upsertDrain(spark, "graft-q79-",
      s => eventsStreamFromDir(s, dupDir)
        .withWatermark("ts", latenessTolerance)
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events")),
      Seq("event_type"))
  }

  /** SLIDING-window counts (1-hour windows starting every 15
    * minutes — each event lands in exactly 4 overlapping windows),
    * drained update-mode through the upsert sink like q50's tumbling
    * twin. Sliding windows multiply state by window/slide; the
    * watermark still bounds it to ~1 hour of open windows.
    */
  def slidingCountsUpsert(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame =
    upsertDrain(spark, "graft-q111-", s =>
      eventsStream(s, eventsPath)
        .withWatermark("ts", latenessTolerance)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      Seq("window_start", "event_type"))

  /** Per-user session summaries computed by the Spark-4
    * `transformWithState` processor (Sessionize.SessionProcessor,
    * RocksDB-backed named ValueState) over a stream of the real
    * events file, drained update-mode through the keyed upsert sink.
    * A single-batch AvailableNow drain leaves each user's LAST
    * update in the sink = the final totals, which equal the batch
    * sessionize aggregate — q51's oracle, reused verbatim.
    */
  def sessionSummariesTws(
      spark: SparkSession,
      eventsPath: String,
      gapMinutes: Int = 30): DataFrame =
    upsertDrain(spark, "graft-q104-", { s =>
      import s.implicits._
      // transformWithState only runs on the RocksDB state store;
      // scoped to the drain's child session
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val evs = eventsStream(s, eventsPath)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tsMicros"))
        .as[Sessionize.Event]
      Sessionize.streamingTws(evs, gapMinutes).toDF()
    }, Seq("user_id"))

  /** Per-user LAST-3 events via the `transformWithState` LIST state
    * (Sessionize.RecentEventsProcessor): bounded per-key history,
    * drained update-mode through the keyed upsert sink on
    * (user_id, slot). The single AvailableNow drain leaves each
    * slot's LAST update = the user's final top-3-by-recency, which
    * is exactly the batch row_number window — the oracle.
    */
  def recentEventsTws(
      spark: SparkSession,
      eventsPath: String,
      k: Int = 3): DataFrame =
    upsertDrain(spark, "graft-q207-", { s =>
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val evs = eventsStream(s, eventsPath)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tsMicros"))
        .as[Sessionize.Event]
      Sessionize.streamingRecentTws(evs, k).toDF()
    }, Seq("user_id", "slot"))

  /** Per-(user, type) running counts via the `transformWithState`
    * MAP state (Sessionize.TypeCountsProcessor) — each type's
    * counter is its own state-store entry, updated independently.
    * Update-mode upsert drain on (user_id, event_type); the final
    * sink row per key is the total count = the batch GROUP BY.
    */
  def typeCountsTws(
      spark: SparkSession,
      eventsPath: String): DataFrame =
    upsertDrain(spark, "graft-q214-", { s =>
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val evs = eventsStream(s, eventsPath)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .as[Sessionize.TypedEvent]
      Sessionize.streamingTypeCountsTws(evs).toDF()
    }, Seq("user_id", "event_type"))

  /** Stream–STATIC join (the third join class after stream-stream
    * q94 and batch joins): the event stream enriched against a
    * static dimension snapshot, then aggregated per segment and
    * drained update-mode through the upsert sink. Stream-static
    * inner joins are STATELESS — the static side is (re)read and
    * broadcast per micro-batch, no join state accumulates — which
    * is exactly why it's the right shape for dimension enrichment
    * at any stream rate. Oracle: the equivalent batch join.
    */
  def segmentCountsStreamStatic(
      spark: SparkSession,
      eventsPath: String,
      customerPath: String,
      latenessTolerance: String = "1 hour"): DataFrame =
    upsertDrain(spark, "graft-q128-", { s =>
      val dim = broadcast(s.read.parquet(customerPath)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
      eventsStream(s, eventsPath)
        .withWatermark("ts", latenessTolerance)
        .join(dim, Seq("user_id"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }, Seq("c_mktsegment", "event_type"))

  /** APPEND-mode windowed aggregate — the other output contract
    * (q50 is update mode): a window row is emitted exactly once,
    * when the watermark passes its end, so the sink receives only
    * FINALIZED windows. The trailing no-data micro-batch is
    * required here (enabled by default; q50's drain disables it):
    * the data batch advances the watermark, the no-data batch
    * flushes the windows that fell behind it. Windows newer than
    * max(event_time) − tolerance stay open and are correctly
    * absent — the oracle encodes that eviction boundary.
    */
  def hourlyCountsAppend(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val workDir = tempWorkDir("graft-q143-")
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val q = eventsStream(scoped, eventsPath)
      .withWatermark("ts", latenessTolerance)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
  }

  /** Streaming multi-source topology: two streams (here: disjoint
    * type slices of the event stream) unioned before one stateful
    * aggregate — the union is a stateless merge of sources, the
    * watermark is computed across BOTH inputs.
    */
  def unionTypeCounts(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame =
    upsertDrain(spark, "graft-q144-", { s =>
      def src = eventsStream(s, eventsPath)
      val interactive = src.filter(col("event_type").isin("click", "view"))
      val rest = src.filter(!col("event_type").isin("click", "view"))
      interactive.unionByName(rest)
        .withWatermark("ts", latenessTolerance)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
    }, Seq("event_type"))

  /** Stream–stream inner join: clicks joined to the same user's
    * purchases within the following hour, both sides watermarked so
    * the join state is bounded (a click older than the watermark +
    * interval can never match a future purchase and is evicted; same
    * for unmatched purchases). Inner joins emit matches in the
    * micro-batch they occur — the watermark exists for STATE CLEANUP,
    * not output gating — so an AvailableNow drain emits every match.
    * Output is drained through an append-mode parquet sink (the only
    * mode a stream-stream inner join supports) and read back; no
    * driver funnel.
    */
  def clickPurchaseJoin(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val workDir = tempWorkDir("graft-q94-")
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    def src = eventsStream(scoped, eventsPath)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", latenessTolerance)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", latenessTolerance)
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
  }

  /** Stream–stream LEFT OUTER join — completes the streaming join
    * matrix (inner q94, stream–static q128): matches emit in their
    * micro-batch; an UNMATCHED click emits with null purchase only
    * once the joint watermark proves no future purchase can match
    * (click_ts + interval behind the watermark), i.e. at state
    * eviction during the trailing no-data batch. Clicks still inside
    * the matchable horizon are correctly absent; the oracle encodes
    * that boundary (joint watermark = min of both streams' max event
    * time, ms-floored, minus the tolerance).
    */
  def clickPurchaseLeftJoin(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val workDir = tempWorkDir("graft-q146-")
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    def src = eventsStream(scoped, eventsPath)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", latenessTolerance)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", latenessTolerance)
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
  }

  /** Stream–stream FULL OUTER join — the last member of the
    * streaming join matrix: unmatched rows from BOTH sides emit
    * null-joined at their state eviction. The click side's horizon
    * is the same as the left join's (cts + interval behind the
    * watermark); a purchase's matchable clicks satisfy
    * cts ≤ pts < cts + 1h, so its state is evictable once the
    * watermark passes pts itself.
    */
  def clickPurchaseFullJoin(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val workDir = tempWorkDir("graft-q154-")
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    def src = eventsStream(scoped, eventsPath)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", latenessTolerance)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", latenessTolerance)
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"),
      "full_outer")
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
  }

  /** Stream–stream RIGHT OUTER join — the mirror of
    * [[clickPurchaseLeftJoin]], preserving the purchase side:
    * matches emit in their micro-batch; an UNMATCHED purchase emits
    * with null click once the watermark passes its own event time
    * (a purchase's matchable clicks satisfy cts ≤ pts < cts + 1h,
    * so pts itself is the eviction horizon — the same purchase-side
    * boundary the full outer join uses).
    */
  def clickPurchaseRightJoin(
      spark: SparkSession,
      eventsPath: String,
      latenessTolerance: String = "1 hour"): DataFrame = {
    val workDir = tempWorkDir("graft-q195-")
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    def src = eventsStream(scoped, eventsPath)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", latenessTolerance)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", latenessTolerance)
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"),
      "right_outer")
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
  }

  /** Stage a file as a directory holding TWO copies (deterministic
    * duplicate delivery). Content-addressed like [[stageAsDir]] —
    * bounded across re-runs.
    */
  private def stageDuplicated(path: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val p = Paths.get(path)
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      "graft-stream-dup-" + Integer.toHexString(path.hashCode))
    Files.createDirectories(dir)
    Files.copy(p, dir.resolve("copy_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(p, dir.resolve("copy_b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  /** Per-invocation scratch dir (checkpoint + sink parquet). The
    * returned DataFrame reads the sink path lazily, so the dir can't
    * be deleted at return — a single static JVM shutdown hook drains
    * a queue of registered dirs instead (one hook total, not one per
    * drain — bench resampling runs many drains), so repeated
    * bench/verify/spec runs don't accumulate directories under
    * java.io.tmpdir beyond the process lifetime.
    */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val cleanupHookRegistered: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var dir = scratchDirs.poll()
      while (dir != null) {
        try graft.util.Fs.deleteRecursively(dir)
        catch { case _: java.io.IOException => () }
        dir = scratchDirs.poll()
      }
    }))

  private def tempWorkDir(prefix: String): java.nio.file.Path = {
    cleanupHookRegistered
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(dir)
    dir
  }

  /** Memory-sink drain of the same aggregate (complete mode) — kept
    * as the A/B reference implementation for the spec suite; use
    * `hourlyCountsUpsert` for anything larger than a test fixture.
    */
  def hourlyCounts(spark: SparkSession, eventsPath: String, queryName: String): DataFrame = {
    val q = hourlyAgg(spark, eventsPath, "1 hour").writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Materialize before the next streaming run replaces the table.
    val out = spark.table(queryName)
    val rows = out.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
  }
}
