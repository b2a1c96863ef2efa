package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on a single-hot-key shape") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    // manufacture skew: every event keys to one value
    val skewed = t.events.select(lit(42L).as("k"), col("event_id"), col("value"))
    val build = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("payload"))

    val plain = skewed.join(build, "k")
      .select("event_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (salts <- Seq(2, 8)) {
      val salted = SkewJoin.saltedInnerJoin(skewed, build, "k",
          saltFrom = Seq(col("event_id")), salts = salts)
        .select("event_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(salted == plain, s"salts=$salts")
    }
    assert(plain.nonEmpty)
  }

  test("invalid inputs fail fast: non-positive salts, pre-existing __salt column") {
    val df = spark.range(3).select(col("id").as("k"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(df, df, "k", Seq(col("k")), salts = 0)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(df.withColumn("__salt", lit(1)), df, "k", Seq(col("k")), salts = 2)
    }
  }

  test("salted join preserves duplicate-row cardinality") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val skewed = t.events.select(pmod(col("user_id"), lit(3)).as("k"), col("event_id"))
    val build = spark.range(3).select(col("id").as("k"))
      .unionAll(spark.range(1).select(lit(0L).as("k"))) // key 0 twice on build side
    val plain = skewed.join(build, "k").count()
    val salted = SkewJoin.saltedInnerJoin(skewed, build, "k",
      saltFrom = Seq(col("event_id")), salts = 4).count()
    assert(salted == plain)
  }
}
