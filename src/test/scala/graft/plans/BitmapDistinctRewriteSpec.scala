package graft.plans

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-extension contract: the bitmap rewrite engages only
  * when enabled + eligible, and never changes results.
  */
class BitmapDistinctRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rewritingSession(): SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(BitmapDistinctRewrite)
    s.conf.set(BitmapDistinctRewrite.FLAG, "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  test("rewritten plan uses bitmaps and matches the plain count(DISTINCT)") {
    val s = rewritingSession()
    val df = graft.Tables(s, "/root/testdata/sf0.001").events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("du"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("bitmap_construct_agg"), plan)
    assert(!plan.contains("count(distinct"), plan)

    val plain = graft.Tables(spark, "/root/testdata/sf0.001").events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("du"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain)
  }

  test("flag off → untouched; nulls and all-null groups match count(DISTINCT) semantics") {
    val s = rewritingSession()
    import s.implicits._
    val data = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", Some(1L)), ("a", None), ("a", Some(-5L)),
      ("b", None), ("b", None), // all-null group → distinct = 0
      ("c", Some(40000L)), ("c", Some(40000L)), ("c", Some(0L)))
      .toDF("g", "v")
    val agg = data.groupBy($"g").agg(countDistinct($"v").as("du"))
    assert(agg.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
    assert(agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 0L, "c" -> 2L))

    s.conf.set(BitmapDistinctRewrite.FLAG, "false")
    val off = data.groupBy($"g").agg(countDistinct($"v").as("du"))
    assert(!off.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
    s.conf.set(BitmapDistinctRewrite.FLAG, "true")
  }

  test("global aggregate over empty (fully-filtered) input returns 0, not NULL") {
    val s = rewritingSession()
    // parquet-backed so the optimizer cannot statically fold the
    // empty input away before the rewrite fires
    val agg = graft.Tables(s, "/root/testdata/sf0.001").events
      .filter(col("user_id") < 0) // matches nothing at runtime
      .agg(countDistinct(col("user_id")).as("du"))
    assert(agg.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
    val row = agg.collect().head
    assert(!row.isNullAt(0) && row.getLong(0) == 0L)
  }

  test("ineligible shapes pass through: non-integral column, multiple distincts, filter") {
    val s = rewritingSession()
    import s.implicits._
    val data = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L))
      .toDF("g", "sv", "v")
    // string column → not rewritten, still correct
    val strAgg = data.groupBy($"g").agg(countDistinct($"sv").as("du"))
    assert(!strAgg.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
    assert(strAgg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 1L))
    // two distinct aggs → not rewritten, still correct
    val two = data.groupBy($"g")
      .agg(countDistinct($"v").as("dv"), countDistinct($"sv").as("ds"))
    assert(!two.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
    assert(two.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("a", 2L, 2L), ("b", 1L, 1L)))
  }
}
