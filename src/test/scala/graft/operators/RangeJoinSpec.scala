package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed range join equals the naive inequality join") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001").events
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iid"), col("user_id").as("iv_user"),
        col("ts").as("err_ts"))

    val bucketed = RangeJoin.pointInInterval(points, intervals,
        pointKey = col("user_id"), pointTs = col("ts"),
        intervalKey = col("iv_user"), startTs = col("err_ts"),
        endTs = col("err_ts") + expr("INTERVAL 1 HOUR"),
        bucketSeconds = 3600L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = points.join(intervals,
        col("user_id") === col("iv_user") &&
          col("ts") >= col("err_ts") &&
          col("ts") < col("err_ts") + expr("INTERVAL 1 HOUR"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed == naive)
    assert(naive.nonEmpty) // the fixture actually exercises matches
  }

  test("boundary: start inclusive, end exclusive; bucket-spanning intervals found") {
    val points = Seq(
      (1L, 10L, "2024-01-01 00:59:59"), // inside
      (2L, 10L, "2024-01-01 01:00:00"), // == end -> excluded
      (3L, 10L, "2024-01-01 00:00:00"), // == start -> included
      (4L, 10L, "2024-01-01 01:30:00")) // after
      .toDF("pid", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val intervals = Seq((7L, 10L, "2024-01-01 00:00:00"))
      .toDF("iid", "iv_user", "err_ts")
      .withColumn("err_ts", col("err_ts").cast("timestamp"))
    val got = RangeJoin.pointInInterval(points, intervals,
        pointKey = col("user_id"), pointTs = col("ts"),
        intervalKey = col("iv_user"), startTs = col("err_ts"),
        endTs = col("err_ts") + expr("INTERVAL 1 HOUR"),
        bucketSeconds = 3600L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
