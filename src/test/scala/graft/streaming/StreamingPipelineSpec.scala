package graft.streaming

import graft.TestSpark
import graft.music.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AvailableNow drains present files once; late files process on the next run") {
    val root = TestSpark.tmpDir("spipe")
    val raw = Fixtures.writeRawData(root)
    val sink = root.resolve("sink").toString
    val ckpt = root.resolve("ckpt").toString

    StreamingPipeline.runOnce(spark, s"$raw/streams", s"$raw/songs.csv", sink, ckpt)
    val kpis1 = spark.read.parquet(s"$sink/genre_kpis")
    assert(kpis1.count() == 2) // same result as the batch pipeline

    // re-run with no new files: checkpoint marks everything seen →
    // sink unchanged (exactly-once per file)
    StreamingPipeline.runOnce(spark, s"$raw/streams", s"$raw/songs.csv", sink, ckpt)
    assert(spark.read.parquet(s"$sink/genre_kpis").count() == 2)

    // a late-arriving file for a new date is picked up incrementally
    Files.writeString(raw.resolve("streams/late.csv"),
      """user_id,track_id,listen_time
        |u1,t2,2024-06-27 08:00:00
        |""".stripMargin)
    StreamingPipeline.runOnce(spark, s"$raw/streams", s"$raw/songs.csv", sink, ckpt)
    val kpis3 = spark.read.parquet(s"$sink/genre_kpis")
    assert(kpis3.count() == 3)
    val d27 = kpis3.filter("date = '2024-06-27'").collect().head
    assert(d27.getAs[String]("track_genre") == "rock")
    assert(d27.getAs[Long]("listen_count") == 1L)
    // earlier dates untouched by the incremental batch
    assert(kpis3.filter("date = '2024-06-25'").collect().head
      .getAs[Long]("listen_count") == 3L)
  }
}
