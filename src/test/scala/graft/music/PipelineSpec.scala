package graft.music

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def conf(root: java.nio.file.Path) = PipelineConfig(
    rawPrefix = root.resolve("raw-data").toString,
    archivePrefix = root.resolve("archive/raw-data").toString,
    sinkPrefix = root.resolve("sink").toString,
    pollIntervalMs = 10, sensorTimeoutMs = 200, retryDelayMs = 10)

  test("full chain: sense → validate → compute → archive") {
    val root = TestSpark.tmpDir("pipe")
    Fixtures.writeRawData(root)
    val c = conf(root)
    val runDate = java.time.LocalDate.of(2026, 8, 12)
    new PipelineRunner(spark, c).run(runDate)

    // sinks populated
    val kpis = spark.read.parquet(s"${c.sinkPrefix}/genre_kpis")
    assert(kpis.count() == 2)
    assert(spark.read.parquet(s"${c.sinkPrefix}/top_songs").count() == 3)
    assert(spark.read.parquet(s"${c.sinkPrefix}/top_genres").count() == 3)

    // archive preserves subpaths under the dated prefix (dag.py:186-191)
    val archived = Seq("users.csv", "songs.csv",
      "streams/streams1.csv", "streams/streams2.csv")
    archived.foreach { rel =>
      assert(Files.exists(root.resolve(s"archive/raw-data/$runDate/$rel")),
        s"missing archived $rel")
    }
    // input emptied, streams/.keep marker recreated (dag.py:222-226)
    assert(!Files.exists(root.resolve("raw-data/users.csv")))
    assert(Files.exists(root.resolve("raw-data/streams/.keep")))
  }

  test("archival is a permutation: nothing lost, nothing duplicated") {
    val root = TestSpark.tmpDir("pipe-perm")
    val raw = Fixtures.writeRawData(root)
    val before = Files.walk(raw).filter(Files.isRegularFile(_))
      .map[String](_.getFileName.toString).sorted().toArray.toSeq
    val c = conf(root)
    val runDate = java.time.LocalDate.of(2026, 8, 12)
    new PipelineRunner(spark, c).run(runDate)
    val arch = root.resolve(s"archive/raw-data/$runDate")
    val after = Files.walk(arch).filter(Files.isRegularFile(_))
      .map[String](_.getFileName.toString).sorted().toArray.toSeq
    assert(after == before)
  }

  test("missing required column fails fast naming the column (dag.py:135-137)") {
    val root = TestSpark.tmpDir("pipe-badcol")
    val raw = Fixtures.writeRawData(root)
    Files.writeString(raw.resolve("songs.csv"),
      "track_id,track_name\nt1,SongA\n") // no track_genre
    val r = new PipelineRunner(spark, conf(root))
    val e = intercept[RuntimeException] {
      r.validateColumns(r.validateFiles())
    }
    assert(e.getCause.getMessage.contains("track_genre"))
  }

  test("empty input prefix: sensor times out with a clear error (dag.py:84)") {
    val root = TestSpark.tmpDir("pipe-empty")
    Files.createDirectories(root.resolve("raw-data/streams"))
    val e = intercept[RuntimeException] {
      new PipelineRunner(spark, conf(root)).sense()
    }
    assert(e.getMessage.contains("sense"))
  }

  test("deferred sensor completes when files arrive mid-wait (dag.py:48 deferrable)") {
    val root = TestSpark.tmpDir("pipe-defer")
    Files.createDirectories(root.resolve("raw-data/streams"))
    val c = conf(root).copy(sensorTimeoutMs = 5000)
    val sched = new java.util.concurrent.ScheduledThreadPoolExecutor(1)
    try {
      val fut = new PipelineRunner(spark, c).senseDeferred(sched)
      assert(!fut.isDone, "must be waiting while the prefix is empty")
      Thread.sleep(40) // a few empty polls
      Fixtures.writeRawData(root)
      fut.get(5, java.util.concurrent.TimeUnit.SECONDS) // completes
    } finally sched.shutdownNow()
  }

  test("deferred sensor times out with the sensor-timeout error") {
    val root = TestSpark.tmpDir("pipe-defer-to")
    Files.createDirectories(root.resolve("raw-data/streams"))
    val sched = new java.util.concurrent.ScheduledThreadPoolExecutor(1)
    try {
      val fut = new PipelineRunner(spark, conf(root)).senseDeferred(sched)
      val e = intercept[java.util.concurrent.ExecutionException] {
        fut.get(5, java.util.concurrent.TimeUnit.SECONDS)
      }
      assert(e.getCause.getMessage.contains("sensor timeout"))
    } finally sched.shutdownNow()
  }

  test("cancelled deferred sensor stops scheduling polls") {
    val root = TestSpark.tmpDir("pipe-defer-cancel")
    Files.createDirectories(root.resolve("raw-data/streams"))
    val c = conf(root).copy(sensorTimeoutMs = 60000)
    val sched = new java.util.concurrent.ScheduledThreadPoolExecutor(1)
    try {
      val fut = new PipelineRunner(spark, c).senseDeferred(sched)
      Thread.sleep(30)
      fut.cancel(true)
      // the in-flight tick observes the cancel and schedules nothing
      Thread.sleep(100)
      assert(sched.getQueue.isEmpty, "no further polls after cancel")
      assert(fut.isCancelled)
    } finally sched.shutdownNow()
  }

  test("C4 through the batched KV path: all three KPI tables land in the store (glue_job.py:110-132 shape)") {
    val root = TestSpark.tmpDir("pipe-kv")
    Fixtures.writeRawData(root)
    val tables = Seq("genre_kpis", "top_songs", "top_genres")
    tables.foreach(t => InMemoryKvServer.reset(s"pipekv_$t"))
    val c = conf(root).copy(sinkFactory =
      Some(t => new BatchedKvSink(InMemoryKvClient(s"pipekv_$t"))))
    new PipelineRunner(spark, c).run(java.time.LocalDate.of(2026, 8, 12))
    // the KV factory replaced the parquet sinks entirely
    assert(!Files.exists(root.resolve("sink")))

    // reference run: same inputs through the default parquet sinks —
    // the KV scan read-back must hold exactly the same rows
    val root2 = TestSpark.tmpDir("pipe-kv-ref")
    Fixtures.writeRawData(root2)
    val c2 = conf(root2)
    new PipelineRunner(spark, c2).run(java.time.LocalDate.of(2026, 8, 12))

    def kvRows(t: String): Set[Map[String, String]] =
      InMemoryKvClient(s"pipekv_$t").scan().map(_.attrs).toSet
    def pqRows(t: String): Set[Map[String, String]] = {
      val df = spark.read.parquet(s"${c2.sinkPrefix}/$t")
      val cols = df.columns
      df.collect().map(r => cols.zipWithIndex.collect {
        case (name, i) if !r.isNullAt(i) => name -> String.valueOf(r.get(i))
      }.toMap).toSet
    }
    tables.foreach(t => assert(kvRows(t) == pqRows(t), s"table $t"))

    // composite keys follow the observed DynamoDB key shapes
    val kpiKeys = InMemoryKvClient("pipekv_genre_kpis").scan().map(_.key)
    assert(kpiKeys.size == 2 && kpiKeys.forall(_.split("\\|").length == 2))
    val songKeys = InMemoryKvClient("pipekv_top_songs").scan().map(_.key)
    assert(songKeys.size == 3 && songKeys.forall(_.split("\\|").length == 3))
  }

  test("second run upserts over the first (last-writer-wins by key)") {
    val root = TestSpark.tmpDir("pipe-upsert")
    Fixtures.writeRawData(root)
    val c = conf(root)
    val runner = new PipelineRunner(spark, c)
    runner.run(java.time.LocalDate.of(2026, 8, 12))

    // re-deliver the same inputs (same keys, same values) → row
    // count must NOT grow
    Fixtures.writeRawData(root)
    runner.run(java.time.LocalDate.of(2026, 8, 13))
    assert(spark.read.parquet(s"${c.sinkPrefix}/genre_kpis").count() == 2)
    // both dated archives exist
    assert(Files.exists(root.resolve("archive/raw-data/2026-08-12/users.csv")))
    assert(Files.exists(root.resolve("archive/raw-data/2026-08-13/users.csv")))
  }
}
