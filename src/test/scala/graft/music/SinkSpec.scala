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

  test("in-batch duplicate keys collapse deterministically") {
    val dir = TestSpark.tmpDir("sink").resolve("t2").toString
    val sink = ParquetKeyedUpsertSink(dir)
    sink.upsert(Seq(("k1", 1L), ("k1", 9L), ("k1", 4L)).toDF("k", "v"), Seq("k"))
    val rows = sink.read(spark).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("k1", 9L))) // max over the value struct
  }
}
