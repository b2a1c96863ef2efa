package graft.music

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity run on the REFERENCE'S OWN sample data
  * (`/root/reference/data`): streams{1,2,3}.csv (34,038 rows, all
  * 2024-06-25) and users.csv (50,000 rows). songs.csv is a missing
  * blob (`.MISSING_LARGE_BLOBS:1`), so a deterministic synthetic
  * dimension is derived from the stream track_ids per FIXTURES.md §1.
  *
  * Asserts the observable invariants from the reference's golden
  * screenshots (SURVEY §5): single-date grain, the
  * unique_listeners == listen_count quirk, stream-count
  * conservation, and top-k bounds.
  */
class ReferenceDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val refData = "/root/reference/data"

  private def available = new java.io.File(s"$refData/streams").isDirectory

  test("full KPI job over the reference's real stream/user files") {
    assume(available, s"$refData not present")
    val streams = MusicKpi.readCsv(spark, s"$refData/streams", Schemas.streams)
    val users = MusicKpi.readCsv(spark, s"$refData/users/users.csv", Schemas.users)
    assert(streams.count() == 34038, "reference stream row count (SURVEY §5)")
    assert(users.count() == 50000, "reference user row count (SURVEY §5)")

    // synthetic songs: one row per observed track_id, genre from a
    // deterministic hash pick over ~20 names, some numeric genres to
    // exercise P7, ~5% of tracks left unmatched (left-join null path)
    val genres = array((Seq("acoustic", "blues", "deep-house", "j-dance", "rock",
      "jazz", "pop", "metal", "classical", "country", "disco", "edm",
      "folk", "funk", "gospel", "grunge", "hip-hop", "house", "123", "45.6")
      .map(lit)): _*)
    val songs = streams.select("track_id").distinct()
      .filter(pmod(xxhash64(col("track_id")), lit(20)) =!= 0) // ~5% unmatched
      .select(col("track_id"),
        concat(lit("Track_"), col("track_id")).as("track_name"),
        element_at(genres, (pmod(xxhash64(col("track_id"), lit(7)), lit(20)) + 1).cast("int"))
          .as("track_genre"))

    val kpi = MusicKpi(deterministic = true)
    val r = kpi.all(streams, songs)
    try {
      val kpis = r.genreKpis.collect()
      // single-date sample: every row is 2024-06-25
      assert(kpis.map(_.getAs[String]("date")).toSet == Set("2024-06-25"))
      // the reference's headline quirk, visible in its DynamoDB scans
      assert(kpis.forall(row =>
        row.getAs[Long]("unique_listeners") == row.getAs[Long]("listen_count")))
      // conservation against an INDEPENDENT computation: cleaned
      // streams semi-joined to the valid (non-numeric-genre) track
      // set — different operators than the KPI pipeline's
      // join+filter+groupBy path
      val validTracks = songs
        .filter(!col("track_genre").rlike("^[0-9]+(\\.[0-9]+)?$"))
        .select("track_id")
      val expected = streams
        .na.drop("any", Seq("track_id", "user_id", "listen_time"))
        .join(validTracks, Seq("track_id"), "left_semi")
        .count()
      assert(kpis.map(_.getAs[Long]("listen_count")).sum == expected)
      // numeric genres are filtered even though songs carry them
      assert(!kpis.exists(_.getAs[String]("track_genre").matches("^[0-9]+(\\.[0-9]+)?$")))
      // top-k bounds per the reference's result-set shapes
      val ts = r.topSongs.groupBy("date", "track_genre").count().collect()
      assert(ts.forall(_.getAs[Long]("count") <= 3))
      val tg = r.topGenres.groupBy("date").count().collect()
      assert(tg.forall(_.getAs[Long]("count") <= 5))
      // avg_listening_time is seconds-since-midnight scale (the
      // ~40,000 s ≈ 11 h signature from the reference's scans)
      val avgAll = kpis.map(_.getAs[Double]("avg_listening_time"))
      assert(avgAll.forall(a => a >= 0 && a < 86400))
    } finally r.release()
  }
}
