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

  /** The events parquet schema as the file source requires an
    * explicit schema. `ts` is TIMESTAMP(NANOS) in the files → Long
    * under `spark.sql.legacy.parquet.nanosAsLong` (see Tables).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

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

  /** Hourly event counts per type, computed by a streaming query
    * drained synchronously with AvailableNow into a memory sink,
    * returned as a batch DataFrame. Deterministic: the batch is the
    * whole input, complete mode emits final aggregates.
    */
  def hourlyCounts(spark: SparkSession, eventsPath: String, queryName: String): DataFrame = {
    val src = spark.readStream
      .schema(eventsSchema)
      .parquet(stageAsDir(eventsPath))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
    val agg = src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"),
        round(col("total_value"), 2).as("total_value"))
    val q = agg.writeStream
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
