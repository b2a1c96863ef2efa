package graft.music

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the KPI dataflow, hand-computed from the
  * fixtures. Pins every parity quirk from SURVEY §7's risk register:
  * null-join degradation (risk 3), deterministic dedup/tie-breaks
  * (risk 2), non-distinct unique_listeners, W2 song grain.
  */
class MusicKpiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val results: MusicKpi.Results = {
    val root = TestSpark.tmpDir("kpi")
    val raw = Fixtures.writeRawData(root)
    val streams = MusicKpi.readCsv(spark, s"$raw/streams", Schemas.streams)
    val songs = MusicKpi.readCsv(spark, s"$raw/songs.csv", Schemas.songs)
    MusicKpi(deterministic = true).all(streams, songs)
  }

  test("genre KPIs match hand-computed goldens") {
    val rows = results.genreKpis
      .orderBy("date", "track_genre").collect().toSeq
    assert(rows == Seq(
      Row("2024-06-25", "rock", 3L, 3L, 75631L, 75631.0 / 3),
      Row("2024-06-26", "jazz", 2L, 2L, 91815L, 45907.5)))
  }

  test("unique_listeners is the non-distinct count (glue_job.py:97 parity)") {
    // u1 listened twice on 2024-06-25 → distinct would give 2, the
    // reference gives 3
    val rock = results.genreKpis
      .filter("date = '2024-06-25' and track_genre = 'rock'")
      .collect().head
    assert(rock.getAs[Long]("listen_count") == 3L)
    assert(rock.getAs[Long]("unique_listeners") == 3L)
  }

  test("left join degrades to inner via the null-rejecting genre filter (risk 3)") {
    // u3/t9 has no song match; u1/t4 hits the numeric genre — both
    // must vanish, so 2024-06-25 keeps exactly 3 streams
    val dates = results.genreKpis.select("date").collect().map(_.getString(0)).toSet
    assert(dates == Set("2024-06-25", "2024-06-26"))
    assert(!results.genreKpis.columns.contains("t9"))
  }

  test("dup track_id resolves deterministically (SongA, not SongA2)") {
    val names = results.topSongs.filter("track_id = 't1'")
      .select("track_name").collect().map(_.getString(0)).toSet
    assert(names == Set("SongA"))
  }

  test("top songs: rank within (date, genre), count-desc, id tiebreak") {
    val rows = results.topSongs
      .orderBy("date", "track_genre", "rank")
      .select("date", "track_genre", "track_id", "listen_count", "rank")
      .collect().toSeq
    assert(rows == Seq(
      Row("2024-06-25", "rock", "t1", 2L, 1),
      Row("2024-06-25", "rock", "t2", 1L, 2),
      Row("2024-06-26", "jazz", "t3", 2L, 1)))
  }

  test("top genres is SONG-grain top-5 per date (W2 parity, SURVEY §2.6)") {
    val cols = results.topGenres.columns.toSet
    assert(cols.contains("track_id") && cols.contains("track_name"))
    val perDate = results.topGenres.groupBy("date").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDate == Map("2024-06-25" -> 2L, "2024-06-26" -> 1L))
  }

  test("unique_listeners modes: Parity counts repeats, Distinct doesn't") {
    val root = TestSpark.tmpDir("kpi-mode")
    val raw = Fixtures.writeRawData(root)
    val streams = MusicKpi.readCsv(spark, s"$raw/streams", Schemas.streams)
    val songs = MusicKpi.readCsv(spark, s"$raw/songs.csv", Schemas.songs)
    def rock(kpi: MusicKpi): Long =
      kpi.genreKpis(kpi.enriched(streams, songs))
        .filter("date = '2024-06-25' and track_genre = 'rock'")
        .collect().head.getAs[Long]("unique_listeners")
    // u1 listened twice on 06-25: parity counts 3, distinct counts 2
    assert(rock(MusicKpi(uniqueListeners = MusicKpi.UniqueMode.Parity)) == 3L)
    assert(rock(MusicKpi(uniqueListeners = MusicKpi.UniqueMode.Distinct)) == 2L)
    // HLL is exact at tiny cardinalities
    assert(rock(MusicKpi(uniqueListeners = MusicKpi.UniqueMode.Approx)) == 2L)
  }

  test("malformed listen_time yields a null date row, not an ANSI crash (glue_job.py:59 parity)") {
    import spark.implicits._
    val streams = Seq(
      ("u1", "t1", "2024-06-25 10:00:00"),
      ("u2", "t1", "not-a-timestamp"))
      .toDF("user_id", "track_id", "listen_time")
    val songs = Seq(("t1", "SongA", "rock")).toDF("track_id", "track_name", "track_genre")
    val kpi = MusicKpi(deterministic = true)
    val rows = kpi.enriched(streams, songs)
      .select("date", "user_id", "listen_time_seconds")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the malformed row survives cleaning (listen_time string is
    // non-null) with a null derived date — the reference's non-ANSI
    // cast semantics
    assert(rows == Set(("2024-06-25", "u1"), (null, "u2")))
  }

  test("listen_time_seconds is seconds-since-midnight, not a duration (P4 parity)") {
    val kpi = MusicKpi(deterministic = true)
    val root = TestSpark.tmpDir("kpi2")
    val raw = Fixtures.writeRawData(root)
    val streams = MusicKpi.readCsv(spark, s"$raw/streams", Schemas.streams)
    val songs = MusicKpi.readCsv(spark, s"$raw/songs.csv", Schemas.songs)
    val secs = kpi.enriched(streams, songs)
      .filter("user_id = 'u2' and date = '2024-06-25'")
      .select("listen_time_seconds").collect().head.getLong(0)
    assert(secs == 30L) // 00:00:30 → 30 s after midnight
  }
}
