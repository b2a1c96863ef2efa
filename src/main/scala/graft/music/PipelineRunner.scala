package graft.music

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The reference's control plane (`dag.py`) collapsed into one
  * process (SURVEY §2.11, §3): sense → validateFiles →
  * validateColumns → compute+sink → archive, with a retry wrapper
  * (1 retry, configurable delay — `dag.py:22-23`).
  *
  * Deliberately NOT replicated: the Glue job's swallow-all
  * try/except (`glue_job.py:136-139`). Stages throw; the runner
  * retries once, then fails the run (SURVEY §2.11 C6).
  *
  * All file operations go through the Hadoop FileSystem API, so the
  * same code runs on file://, s3a://, hdfs:// — the local test just
  * points at a temp dir.
  */
final case class PipelineConfig(
    rawPrefix: String,                 // .../raw-data
    archivePrefix: String,             // .../archive/raw-data
    sinkPrefix: String,                // keyed-upsert table root
    pollIntervalMs: Long = 30000,      // dag.py:45 (30 s poke)
    sensorTimeoutMs: Long = 600000,    // dag.py:46 (10 min)
    retries: Int = 1,                  // dag.py:22
    retryDelayMs: Long = 300000,       // dag.py:23 (5 min)
    deterministic: Boolean = true,
    // sink per KPI table name; None = parquet LWW tables under
    // sinkPrefix. A KV deployment passes
    // `t => new BatchedKvSink(InMemoryKvClient(t))` (or an SDK-backed
    // client) to route the same three writes through the batched
    // key-value path the reference's DynamoDB connector takes.
    sinkFactory: Option[String => KeyedUpsertSink] = None)

final class PipelineRunner(spark: SparkSession, conf: PipelineConfig) {

  private val fs: FileSystem =
    new Path(conf.rawPrefix).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def retrying[T](stage: String)(body: => T): T = {
    var attempt = 0
    var last: Throwable = null
    var result: Option[T] = None
    while (result.isEmpty && attempt <= conf.retries) {
      try result = Some(body)
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt <= conf.retries) Thread.sleep(conf.retryDelayMs)
      }
    }
    result.getOrElse(
      throw new RuntimeException(
        s"stage '$stage' failed after ${conf.retries + 1} attempts", last))
  }

  /** S6 (`dag.py:35-49`): poll for csv files directly under
    * raw-data and under raw-data/streams until both exist or the
    * sensor times out.
    */
  def sense(): Unit = retrying("sense") {
    val deadline = System.currentTimeMillis() + conf.sensorTimeoutMs
    var found = false
    while (!found) {
      val top = glob(s"${conf.rawPrefix}/*.csv")
      val streams = glob(s"${conf.rawPrefix}/streams/*.csv")
      if (top.nonEmpty && streams.nonEmpty) found = true
      else if (System.currentTimeMillis() >= deadline)
        throw new RuntimeException(
          s"sensor timeout: no csv files under ${conf.rawPrefix} within ${conf.sensorTimeoutMs} ms")
      else Thread.sleep(conf.pollIntervalMs)
    }
  }

  /** S6 deferrable twin (`dag.py:48`, `deferrable=True`): `sense()`
    * parks a thread for the whole wait; this variant schedules each
    * poll as a tick on the caller's scheduler and holds NO thread
    * between polls — the Airflow triggerer model, which is what lets
    * thousands of sensors wait on one small executor. The future
    * completes when both prefixes have csv files, fails with the
    * sensor-timeout error, or stops polling as soon as it is
    * cancelled.
    */
  def senseDeferred(
      scheduler: java.util.concurrent.ScheduledExecutorService
  ): java.util.concurrent.CompletableFuture[Unit] = {
    val done = new java.util.concurrent.CompletableFuture[Unit]()
    val deadline = System.currentTimeMillis() + conf.sensorTimeoutMs
    def tick(): Unit = {
      if (done.isDone) return // cancelled or completed: stop polling
      try {
        val top = glob(s"${conf.rawPrefix}/*.csv")
        val streams = glob(s"${conf.rawPrefix}/streams/*.csv")
        if (top.nonEmpty && streams.nonEmpty) done.complete(())
        else if (System.currentTimeMillis() >= deadline)
          done.completeExceptionally(new RuntimeException(
            s"sensor timeout: no csv files under ${conf.rawPrefix} within ${conf.sensorTimeoutMs} ms"))
        else
          scheduler.schedule((() => tick()): Runnable,
            conf.pollIntervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      } catch {
        case scala.util.control.NonFatal(e) => done.completeExceptionally(e)
      }
    }
    scheduler.execute(() => tick())
    done
  }

  private def glob(pattern: String): Seq[Path] = {
    val st = fs.globStatus(new Path(pattern))
    if (st == null) Seq.empty
    else st.toIndexedSeq.filter(_.isFile).map(_.getPath)
  }

  /** C2 (`dag.py:59-95`): list both prefixes, fail if either is
    * empty; returns the stream-file list (the XCom payload becomes a
    * return value).
    */
  def validateFiles(): Seq[String] = retrying("validateFiles") {
    val top = glob(s"${conf.rawPrefix}/*.csv")
    val streams = glob(s"${conf.rawPrefix}/streams/*.csv")
    if (top.isEmpty)
      throw new IllegalStateException(s"No files found under ${conf.rawPrefix}")
    if (streams.isEmpty)
      throw new IllegalStateException(s"No stream files found under ${conf.rawPrefix}/streams")
    streams.map(_.toString)
  }

  /** C3 (`dag.py:98-155`): required ⊆ actual column check per file,
    * from a header-only read — fail fast naming the missing columns
    * (`dag.py:135-137`). Unlike the reference (full GET + pandas
    * read on the driver), only headers are read.
    */
  def validateColumns(streamFiles: Seq[String]): Unit = retrying("validateColumns") {
    def check(table: String, path: String): Unit = {
      val actual = spark.read.option("header", "true").csv(path).columns.toSet
      val required = Schemas.requiredColumns(table)
      val missing = required -- actual
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"$path is missing required columns: ${missing.toSeq.sorted.mkString(", ")}")
    }
    check("users", s"${conf.rawPrefix}/users.csv")
    check("songs", s"${conf.rawPrefix}/songs.csv")
    streamFiles.foreach(f => check("streams", f))
  }

  /** C4 (`dag.py:158-165` → `glue_job.py`): the KPI computation +
    * keyed upsert of the three result sets. Sink keys follow the
    * observed DynamoDB composite keys (SURVEY §7 risk 1).
    */
  private def sinkFor(table: String): KeyedUpsertSink =
    conf.sinkFactory.fold[KeyedUpsertSink](
      ParquetKeyedUpsertSink(s"${conf.sinkPrefix}/$table"))(_.apply(table))

  def compute(): Unit = retrying("compute") {
    val streams = MusicKpi.readCsv(spark, s"${conf.rawPrefix}/streams", Schemas.streams)
    val songs = MusicKpi.readCsv(spark, s"${conf.rawPrefix}/songs.csv", Schemas.songs)
    val kpi = MusicKpi(conf.deterministic)
    val r = kpi.all(streams, songs)
    try {
      sinkFor("genre_kpis").upsert(r.genreKpis, Seq("date", "track_genre"))
      sinkFor("top_songs").upsert(r.topSongs, Seq("date", "track_genre", "track_id"))
      sinkFor("top_genres").upsert(r.topGenres, Seq("date", "track_id"))
    } finally r.release()
  }

  /** S7 (`dag.py:168-236`): move everything under raw-data to
    * archive/raw-data/{yyyy-MM-dd}/…, preserving subpaths; re-create
    * the empty streams/ marker (`dag.py:222-226`).
    */
  def archive(runDate: java.time.LocalDate): Unit = retrying("archive") {
    val root = new Path(conf.rawPrefix)
    val destRoot = new Path(s"${conf.archivePrefix}/$runDate")
    val it = fs.listFiles(root, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) files += f.getPath
    }
    val qualifiedRoot = fs.makeQualified(root).toString
    files.foreach { src =>
      val rel = fs.makeQualified(src).toString
        .stripPrefix(qualifiedRoot).stripPrefix("/")
      val dest = new Path(destRoot, rel)
      fs.mkdirs(dest.getParent)
      // same-FS fast path; object stores without rename fall back to
      // copy+delete (the reference's copy_object + delete_objects,
      // dag.py:201-210)
      if (!fs.rename(src, dest)) {
        org.apache.hadoop.fs.FileUtil.copy(
          fs, src, fs, dest, false, true, spark.sparkContext.hadoopConfiguration)
        if (!fs.delete(src, false))
          throw new RuntimeException(s"failed to archive $src -> $dest")
      }
    }
    // keep the input layout alive for the next run
    fs.mkdirs(new Path(root, "streams"))
    fs.create(new Path(root, "streams/.keep"), true).close()
  }

  /** C1 (`dag.py:239-240` + deployed topology): the full chain. */
  def run(runDate: java.time.LocalDate = java.time.LocalDate.now()): Unit = {
    sense()
    val streamFiles = validateFiles()
    validateColumns(streamFiles)
    compute()
    archive(runDate)
  }
}
