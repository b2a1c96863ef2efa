package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A/B: the distributed selection must reproduce Spark's exact
  * one-reducer `percentile` bit for bit (both implement linear
  * interpolation at position (n-1)p).
  */
class DistributedQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(values: Seq[Long]): Unit = {
    val df = spark.sparkContext.parallelize(values.zipWithIndex, 6)
      .toDF("v", "id")
    val got = DistributedQuantile.exactQuantiles(df, col("v"), col("id"),
      Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75)).collect()(0)
    val exp = df.agg(
      expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
      expr("percentile(v, 0.75)")).collect()(0)
    assert(got.getDouble(0) == exp.getDouble(0), s"q1 on n=${values.size}")
    assert(got.getDouble(1) == exp.getDouble(1), s"q2 on n=${values.size}")
    assert(got.getDouble(2) == exp.getDouble(2), s"q3 on n=${values.size}")
  }

  test("matches percentile() on random data, duplicates included, odd and even n") {
    val next = TestSpark.splitmix(17L)
    check(Seq.fill(10001)(math.floorMod(next(), 500L)))
    check(Seq.fill(8192)(math.floorMod(next(), 1000000L)))
    check(Seq.fill(4096)(math.floorMod(next(), 7L))) // massive duplication
  }

  test("degenerate sizes") {
    check(Seq(5L))
    check(Seq(5L, 9L))
    check(Seq(1L, 2L, 3L, 4L))
  }
}
