package graft.tools

import graft.GraftSession
import graft.music.{PipelineConfig, PipelineRunner}

/** CLI entry for the music-KPI pipeline: run the full
  * sense → validate → compute → archive chain against a local/remote
  * prefix layout (raw-data/users.csv, raw-data/songs.csv,
  * raw-data/streams/).
  *
  * Usage: runMain graft.tools.RunMusicPipeline <dataRoot> [sinkDir]
  */
object RunMusicPipeline {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: RunMusicPipeline <dataRoot> [sinkDir]  (dataRoot must contain raw-data/)")
    val root = args(0)
    val sink = if (args.length > 1) args(1) else s"$root/sink"
    val spark = GraftSession.local(8, "music-pipeline")
    val conf = PipelineConfig(
      rawPrefix = s"$root/raw-data",
      archivePrefix = s"$root/archive/raw-data",
      sinkPrefix = sink,
      pollIntervalMs = 1000, sensorTimeoutMs = 30000, retryDelayMs = 1000)
    val runner = new PipelineRunner(spark, conf)
    runner.run()
    Seq("genre_kpis", "top_songs", "top_genres").foreach { t =>
      println(s"== $t ==")
      spark.read.parquet(s"$sink/$t").orderBy("date").show(20, truncate = false)
    }
    spark.stop()
  }
}
