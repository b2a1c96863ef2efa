package graft.music

import java.nio.file.{Files, Path}

/** Deterministic CSV fixtures exercising every cleaning/parity path
  * (FIXTURES.md §1): duplicate track_ids, numeric genres, nulls,
  * unmatched stream track_ids, repeat listeners, multi-date,
  * multi-file streams.
  */
object Fixtures {

  val usersCsv: String =
    """user_id,user_name,user_age,user_country,created_at
      |u1,Alice,30,US,2024-01-01
      |u2,Bob,40,US,2024-01-02
      |u3,Cara,25,DE,2024-01-03
      |""".stripMargin

  val songsCsv: String =
    """track_id,track_name,track_genre
      |t1,SongA,rock
      |t2,SongB,rock
      |t3,SongC,jazz
      |t4,SongD,123
      |t5,,pop
      |t1,SongA2,metal
      |""".stripMargin

  val streams1Csv: String =
    """user_id,track_id,listen_time
      |u1,t1,2024-06-25 10:00:00
      |u1,t1,2024-06-25 11:00:01
      |u2,t2,2024-06-25 00:00:30
      |u3,t9,2024-06-25 05:00:00
      |u1,t4,2024-06-25 06:00:00
      |""".stripMargin

  val streams2Csv: String =
    """user_id,track_id,listen_time
      |u2,t3,2024-06-26 12:30:15
      |u2,t3,2024-06-26 13:00:00
      |,t1,2024-06-26 09:00:00
      |u3,,2024-06-26 09:00:00
      |""".stripMargin

  /** Lay out the reference's input prefix structure
    * (`dag.py:12-13`): raw-data/users.csv, raw-data/songs.csv, and
    * the stream csvs under raw-data/streams/.
    */
  def writeRawData(root: Path): Path = {
    val raw = root.resolve("raw-data")
    Files.createDirectories(raw.resolve("streams"))
    Files.writeString(raw.resolve("users.csv"), usersCsv)
    Files.writeString(raw.resolve("songs.csv"), songsCsv)
    Files.writeString(raw.resolve("streams/streams1.csv"), streams1Csv)
    Files.writeString(raw.resolve("streams/streams2.csv"), streams2Csv)
    raw
  }
}
