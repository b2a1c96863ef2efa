package graft.music

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert is keyed last-writer-wins, not truncate-and-load") {
    val dir = TestSpark.tmpDir("sink").resolve("t1").toString
    val sink = ParquetKeyedUpsertSink(dir)

    sink.upsert(Seq(("d1", "rock", 10L), ("d1", "jazz", 5L)).toDF("date", "genre", "n"),
      Seq("date", "genre"))
    sink.upsert(Seq(("d1", "rock", 99L), ("d2", "pop", 7L)).toDF("date", "genre", "n"),
      Seq("date", "genre"))

    val rows = sink.read(spark).orderBy("date", "genre")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("d1", "jazz", 5L), ("d1", "rock", 99L), ("d2", "pop", 7L)))
  }

  test("DSv2 writer surface: format(graft-upsert) upserts by key") {
    val dir = TestSpark.tmpDir("sink").resolve("dsv2").toString
    Seq(("d1", "rock", 10L), ("d1", "jazz", 5L)).toDF("date", "genre", "n")
      .write.format("graft-upsert")
      .option("path", dir).option("keys", "date,genre")
      .mode("append").save()
    Seq(("d1", "rock", 99L)).toDF("date", "genre", "n")
      .write.format("graft-upsert")
      .option("path", dir).option("keys", "date,genre")
      .mode("append").save()
    val rows = spark.read.parquet(dir).orderBy("date", "genre")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("d1", "jazz", 5L), ("d1", "rock", 99L)))
  }

  test("interrupted swap (table at .old, nothing at path) is rolled back, no data lost") {
    val dir = TestSpark.tmpDir("sink").resolve("crash").toString
    val sink = ParquetKeyedUpsertSink(dir)
    sink.upsert(Seq(("k1", 1L), ("k2", 2L)).toDF("k", "v"), Seq("k"))
    // simulate a crash between the two renames: live table stranded at .old
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir), new org.apache.hadoop.fs.Path(dir + ".old"))
    // read path recovers
    assert(sink.read(spark).count() == 2)
    // and a subsequent upsert merges with the recovered data instead
    // of silently starting an empty table
    sink.upsert(Seq(("k2", 99L)).toDF("k", "v"), Seq("k"))
    val rows = sink.read(spark).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("k1", 1L), ("k2", 99L)))
  }

  test("batched KV sink: splits partitions into ≤ maxBatchSize putBatch calls") {
    InMemoryKvServer.reset("t_split")
    val sink = new BatchedKvSink(InMemoryKvClient("t_split", maxBatchSize = 25))
    val df = (1 to 60).map(i => (s"k$i", i.toLong)).toDF("k", "v").repartition(1)
    sink.upsert(df, Seq("k"))
    assert(InMemoryKvServer.putCalls("t_split") == 3, // 25 + 25 + 10
      s"calls=${InMemoryKvServer.putCalls("t_split")}")
    assert(sink.read(spark).count() == 60)
  }

  test("batched KV sink: retries unprocessed items until they land") {
    InMemoryKvServer.reset("t_retry")
    // first 2 calls are throttled (accept half, return the rest)
    val sink = new BatchedKvSink(
      InMemoryKvClient("t_retry", maxBatchSize = 25, throttleFirstCalls = 2))
    val df = (1 to 20).map(i => (s"k$i", i.toLong)).toDF("k", "v").repartition(1)
    sink.upsert(df, Seq("k"))
    val rows = sink.read(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 20 && rows("k7") == "7")
    assert(InMemoryKvServer.putCalls("t_retry") > 1, "expected retry calls")
  }

  test("batched KV sink: exhausted retries fail the job, not silently drop items") {
    InMemoryKvServer.reset("t_fail")
    // every call throttled beyond the retry budget
    val sink = new BatchedKvSink(
      InMemoryKvClient("t_fail", maxBatchSize = 25, throttleFirstCalls = 1000),
      maxRetries = 2)
    val df = Seq(("k1", 1L)).toDF("k", "v").repartition(1)
    val e = intercept[Exception] { sink.upsert(df, Seq("k")) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unprocessed after")), e.getMessage)
  }

  test("batched KV sink: upsert is keyed LWW across upserts (store-side per-key put)") {
    InMemoryKvServer.reset("t_lww")
    val sink = new BatchedKvSink(InMemoryKvClient("t_lww"))
    sink.upsert(Seq(("d1", "rock", 10L), ("d1", "jazz", 5L)).toDF("date", "genre", "n"),
      Seq("date", "genre"))
    sink.upsert(Seq(("d1", "rock", 99L)).toDF("date", "genre", "n"),
      Seq("date", "genre"))
    val rows = sink.read(spark).orderBy("date", "genre").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("d1", "jazz", "5"), ("d1", "rock", "99")))
  }

  test("in-batch duplicate keys collapse deterministically") {
    val dir = TestSpark.tmpDir("sink").resolve("t2").toString
    val sink = ParquetKeyedUpsertSink(dir)
    sink.upsert(Seq(("k1", 1L), ("k1", 9L), ("k1", 4L)).toDF("k", "v"), Seq("k"))
    val rows = sink.read(spark).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("k1", 9L))) // max over the value struct
  }

  test("graft-kv DSv2 scan: one partition per segment, exactly the upserted rows") {
    InMemoryKvServer.reset("t_scan")
    val sink = new BatchedKvSink(InMemoryKvClient("t_scan"))
    val data = (1 to 100).map(i => (s"k$i", i.toLong))
    sink.upsert(data.toDF("k", "v"), Seq("k"))
    val df = spark.read.format("graft-kv")
      .option("table", "t_scan").option("segments", "7").load()
    // parallel-scan plan: exactly `segments` input partitions
    assert(df.rdd.getNumPartitions == 7)
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == data.map { case (k, v) => k -> v.toString }.toMap)
    // segments partition the key space (no row read twice, none lost)
    assert(df.count() == 100)
  }

  test("graft-kv pushdown: equality evaluates in the scan (no Filter node), columns prune") {
    InMemoryKvServer.reset("t_push")
    val sink = new BatchedKvSink(InMemoryKvClient("t_push"))
    sink.upsert((1 to 40).map(i => (s"k$i", (i % 4).toString, i.toLong))
      .toDF("k", "grp", "v"), Seq("k"))
    val df = spark.read.format("graft-kv")
      .option("table", "t_push").option("segments", "4").load()
      .filter(org.apache.spark.sql.functions.col("grp") === "2")
      .select("k", "v")
    // fully-pushed predicate → Spark plans NO post-scan FilterExec
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"expected no Filter node:\n$plan")
    // pruned read schema: only the required columns
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("grp") || scan.contains("pushed"),
      s"scan must prune or report pushdown:\n$scan")
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val exp = (1 to 40).filter(_ % 4 == 2).map(i => s"k$i" -> i.toString).toMap
    assert(got == exp, "pushed scan must return exactly the matching rows")

    // a predicate the store can't push (inequality) still answers
    // correctly through the residual path
    val lt = spark.read.format("graft-kv")
      .option("table", "t_push").option("segments", "4").load()
      .filter(org.apache.spark.sql.functions.col("v") > "35")
    // all columns are strings, so ">" is STRING comparison on both sides
    val expLt = (1 to 40).map(_.toString).count(_ > "35")
    assert(lt.count() == expLt.toLong)
  }

  test("graft-kv scanSegment segments are disjoint and cover the table") {
    InMemoryKvServer.reset("t_seg")
    val client = InMemoryKvClient("t_seg")
    new BatchedKvSink(client).upsert(
      (1 to 50).map(i => (s"k$i", i.toLong)).toDF("k", "v"), Seq("k"))
    val total = 5
    val perSegment = (0 until total).map(s => client.scanSegment(s, total).map(_.key))
    assert(perSegment.flatten.sorted == client.scan().map(_.key).sorted)
    assert(perSegment.map(_.toSet).reduce(_ intersect _).isEmpty)
    intercept[IllegalArgumentException] { client.scanSegment(5, 5) }
  }
}
