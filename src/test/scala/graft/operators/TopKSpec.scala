package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted two-phase top-k equals direct window top-k (skew path correctness)") {
    // all rows on ONE key — the reference's single-date skew shape
    val df = graft.Tables(spark, "/root/testdata/sf0.01").events
      .select(lit("2024-06-25").as("date"), col("event_id"), col("value"))
    val order = Seq(col("value").desc, col("event_id").asc)
    val direct = TopK.direct(df, Seq("date"), order, k = 10)
      .select("event_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    for (salts <- Seq(2, 16, 64)) {
      val salted = TopK.salted(df, Seq("date"), order, k = 10,
        saltFrom = Seq(col("event_id")), salts = salts)
        .select("event_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(salted == direct, s"salts=$salts")
    }
  }

  test("salted top-k with k larger than group size returns whole groups") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_type"), col("event_id"), col("value"))
    val order = Seq(col("value").desc, col("event_id").asc)
    val direct = TopK.direct(df, Seq("event_type"), order, k = 100000)
    val salted = TopK.salted(df, Seq("event_type"), order, k = 100000,
      saltFrom = Seq(col("event_id")), salts = 8)
    assert(salted.count() == direct.count())
  }
}
