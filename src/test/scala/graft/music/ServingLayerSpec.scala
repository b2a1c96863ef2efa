package graft.music

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ServingLayerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def publishFixture(path: String): Unit = {
    val df = Seq(
      ("2024-06-25", "t1", 5L), ("2024-06-25", "t2", 9L), ("2024-06-25", "t3", 9L),
      ("2024-06-26", "t1", 2L))
      .toDF("date", "track_id", "listen_count")
    ServingLayer.publish(df, path)
  }

  test("date filter prunes to a single partition, top-k is TakeOrdered") {
    val path = TestSpark.tmpDir("serve").resolve("kpis").toString
    publishFixture(path)
    val q = ServingLayer.topForDate(spark, path, "2024-06-25", 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    val rows = q.collect().map(r => (r.getAs[String]("track_id"), r.getAs[Long]("listen_count"))).toSeq
    assert(rows == Seq(("t2", 9L), ("t3", 9L))) // deterministic tie-break
  }

  test("dynamic partition overwrite republishes one day without touching history") {
    val path = TestSpark.tmpDir("serve").resolve("kpis2").toString
    publishFixture(path)
    ServingLayer.publish(
      Seq(("2024-06-26", "t9", 42L)).toDF("date", "track_id", "listen_count"), path)
    val all = spark.read.parquet(path)
    assert(all.filter($"date" === "2024-06-25").count() == 3) // untouched
    val d26 = all.filter($"date" === "2024-06-26")
      .collect().map(r => (r.getAs[String]("track_id"), r.getAs[Long]("listen_count"))).toSeq
    assert(d26 == Seq(("t9", 42L))) // replaced
  }
}
