package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latest-earlier semantics: inclusive boundary, ties to max payload, no match → null") {
    val left = Seq(
      (100L, 1L, "2024-01-05 00:00:00"),
      (101L, 1L, "2024-01-10 00:00:00"),
      (102L, 2L, "2024-01-02 00:00:00"),
      (103L, 1L, "2024-01-06 00:00:00")) // equal to a right ts → inclusive
      .toDF("event_id", "uid", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, "2024-01-01 00:00:00", 7L),
      (1L, "2024-01-06 00:00:00", 8L),
      (1L, "2024-01-06 00:00:00", 9L), // duplicate ts → max oid wins
      (2L, "2024-02-01 00:00:00", 10L)) // after every uid-2 event
      .toDF("uid", "od", "oid")
      .withColumn("od", col("od").cast("timestamp"))

    val got = AsOfJoin.latestEarlier(left, right,
        leftKey = col("uid"), leftTs = col("ts"),
        rightKey = col("uid"), rightTs = col("od"),
        rightValueCols = Seq("oid"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("oid")).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(
      100L -> Some(7L),   // only 01-01 is earlier
      101L -> Some(9L),   // latest is the 01-06 pair → max oid
      102L -> None,       // uid 2's only order is later
      103L -> Some(9L)))  // boundary: ts == od matches (inclusive)
  }

  test("every left row survives exactly once (left-join cardinality)") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val events = t.events.select("event_id", "user_id", "ts")
    val out = AsOfJoin.latestEarlier(events, t.orders,
      leftKey = col("user_id"), leftTs = col("ts"),
      rightKey = col("o_custkey"), rightTs = col("o_orderdate"),
      rightValueCols = Seq("o_orderkey"))
    assert(out.count() == events.count())
    assert(out.select("event_id").distinct().count() == events.count())
  }

  test("earliest-later semantics: inclusive boundary, ties to min payload, no match → null") {
    val left = Seq(
      (100L, 1L, "2024-01-05 00:00:00"),
      (101L, 1L, "2024-01-10 00:00:00"), // after every uid-1 order
      (102L, 2L, "2024-01-02 00:00:00"),
      (103L, 1L, "2024-01-06 00:00:00")) // equal to a right ts → inclusive
      .toDF("event_id", "uid", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, "2024-01-01 00:00:00", 7L),
      (1L, "2024-01-06 00:00:00", 8L),
      (1L, "2024-01-06 00:00:00", 9L), // duplicate ts → min oid wins
      (2L, "2024-02-01 00:00:00", 10L))
      .toDF("uid", "od", "oid")
      .withColumn("od", col("od").cast("timestamp"))

    val got = AsOfJoin.earliestLater(left, right,
        leftKey = col("uid"), leftTs = col("ts"),
        rightKey = col("uid"), rightTs = col("od"),
        rightValueCols = Seq("oid"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("oid")).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(
      100L -> Some(8L),   // next order is the 01-06 pair → min oid
      101L -> None,       // nothing later for uid 1
      102L -> Some(10L),  // uid 2's order is later → matches forward
      103L -> Some(8L)))  // boundary: ts == od matches (inclusive)
  }

  test("null left key/ts rows surface unmatched in both directions, never dropped or mismatched") {
    val left = Seq(
      (100L, Some(1L), Some("2024-01-05 00:00:00")),
      (101L, Some(1L), None),          // null ts → unmatched
      (102L, None, Some("2024-01-05 00:00:00")), // null key → unmatched
      (103L, None, None))
      .toDF("event_id", "uid", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (Some(1L), Some("2024-01-01 00:00:00"), 7L),
      (Some(1L), Some("2024-01-06 00:00:00"), 8L),
      (None: Option[Long], Some("2024-01-02 00:00:00"), 66L), // null right key: never a match
      (Some(1L), None: Option[String], 67L))                  // null right ts: never a match
      .toDF("uid", "od", "oid")
      .withColumn("od", col("od").cast("timestamp"))

    for (dir <- Seq("back", "fwd")) {
      val out = (if (dir == "back")
        AsOfJoin.latestEarlier(left, right, col("uid"), col("ts"),
          col("uid"), col("od"), Seq("oid"))
      else
        AsOfJoin.earliestLater(left, right, col("uid"), col("ts"),
          col("uid"), col("od"), Seq("oid")))
        .collect().map(r => r.getLong(0) ->
          Option(r.getAs[Any]("oid")).map(_.asInstanceOf[Long])).toMap
      assert(out.keySet == Set(100L, 101L, 102L, 103L), s"$dir: cardinality")
      assert(out(100L) == (if (dir == "back") Some(7L) else Some(8L)), s"$dir")
      assert(out(101L).isEmpty && out(102L).isEmpty && out(103L).isEmpty, s"$dir: $out")
    }
  }
}
