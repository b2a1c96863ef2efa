package graft.music

import org.apache.spark.sql.types._

/** Input-table schemas and validation contracts for the music-KPI
  * pipeline (SURVEY §1.2, §1.5).
  *
  * The reference reads everything as strings and casts later
  * (`glue_job.py:51-58`); we type at the source — strictly better,
  * same derived-column semantics. Required-column sets mirror
  * `dag.py:52-56`; extra columns are permitted (subset check,
  * `dag.py:133`).
  */
object Schemas {

  val users: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("user_name", StringType),
    StructField("user_age", StringType),
    StructField("user_country", StringType),
    StructField("created_at", StringType)))

  val songs: StructType = StructType(Seq(
    StructField("track_id", StringType),
    StructField("track_name", StringType),
    StructField("track_genre", StringType)))

  val streams: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("track_id", StringType),
    StructField("listen_time", StringType)))

  /** Hard-validated required columns per table (`dag.py:52-56`). */
  val requiredColumns: Map[String, Set[String]] = Map(
    "users"   -> Set("user_id", "user_name"),
    "songs"   -> Set("track_id", "track_name", "track_genre"),
    "streams" -> Set("track_id", "user_id", "listen_time"))
}
