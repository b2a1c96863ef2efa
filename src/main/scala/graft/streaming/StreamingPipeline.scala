package graft.streaming

import graft.music.{KeyedUpsertSink, MusicKpi, ParquetKeyedUpsertSink, Schemas}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming twin of the music pipeline (SURVEY §2.9): the
  * reference's sense → process-once → archive loop becomes a file
  * stream source with `Trigger.AvailableNow` + checkpointing — each
  * run drains exactly the files present; the checkpoint replaces
  * archive-as-progress-marker, so files stay in place and are still
  * processed exactly once.
  *
  * Each micro-batch recomputes KPIs for the dates present in the
  * batch and upserts them through the keyed sink (`foreachBatch`) —
  * the same last-writer-wins contract as the batch pipeline, which
  * makes replay/redelivery idempotent per (date, key).
  */
object StreamingPipeline {

  /** Start (and synchronously drain) one AvailableNow pass over the
    * stream directory. `songsPath` is a static dimension read per
    * batch — broadcast in the join, exactly as in batch mode.
    */
  def runOnce(
      spark: SparkSession,
      streamsDir: String,
      songsPath: String,
      sinkPrefix: String,
      checkpointDir: String,
      deterministic: Boolean = true): Unit = {
    val songs = MusicKpi.readCsv(spark, songsPath, Schemas.songs)
    val streamSrc = spark.readStream
      .option("header", "true")
      .schema(Schemas.streams)
      .csv(streamsDir)

    val q = streamSrc.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val kpi = MusicKpi(deterministic)
          val r = kpi.all(batch, songs)
          try {
            ParquetKeyedUpsertSink(s"$sinkPrefix/genre_kpis")
              .upsert(r.genreKpis, Seq("date", "track_genre"))
            ParquetKeyedUpsertSink(s"$sinkPrefix/top_songs")
              .upsert(r.topSongs, Seq("date", "track_genre", "track_id"))
            ParquetKeyedUpsertSink(s"$sinkPrefix/top_genres")
              .upsert(r.topGenres, Seq("date", "track_id"))
          } finally r.release()
        }
      }
      .start()
    q.awaitTermination()
  }
}
