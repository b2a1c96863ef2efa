package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def morton(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.morton16(col("x"), col("y"))).collect()(0).getLong(0)

  test("known Morton codes") {
    assert(morton(0, 0) == 0L)
    assert(morton(1, 0) == 1L)
    assert(morton(0, 1) == 2L)
    assert(morton(3, 3) == 15L)
    assert(morton(0xFFFF, 0) == 0x55555555L)
    assert(morton(0, 0xFFFF) == 0xAAAAAAAAL)
    assert(morton(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
  }

  test("reference implementation A/B on random 16-bit pairs") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val next = TestSpark.splitmix(23L)
    val pairs = Seq.fill(200)((math.floorMod(next(), 65536L),
      math.floorMod(next(), 65536L)))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton16(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case p @ (x, y) => assert(got(p) == ref(x, y), s"($x,$y)") }
  }

  test("z-order zones bound both dimensions tighter than scan-order zones") {
    // a 64×64 grid visited row-major (scan order) vs z-order, cut
    // into 64 zones of 64 rows each: scan-order zones span the full
    // x range (width 63) while every z-zone is a 8×8 block.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val z = grid.select(col("x"), col("y"),
      ZOrder.morton16(col("x"), col("y")).as("z"))
    def avgSpan(df: org.apache.spark.sql.DataFrame, zoneOf: org.apache.spark.sql.Column) = {
      val m = df.withColumn("zone", zoneOf).groupBy("zone")
        .agg((max("x") - min("x") + max("y") - min("y")).as("span"))
        .agg(avg("span")).collect()(0).getDouble(0)
      m
    }
    val zSpan = avgSpan(z, expr("z div 64"))
    val scanSpan = avgSpan(z, expr("(y * 64 + x) div 64"))
    assert(zSpan < scanSpan / 3,
      s"z-order zones span $zSpan vs scan-order $scanSpan")
  }
}
