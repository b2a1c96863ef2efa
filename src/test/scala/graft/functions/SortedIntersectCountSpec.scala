package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A/B: the native merge-walk count must equal
  * `size(array_intersect(...))` on sorted duplicate-free arrays —
  * the contract the Jaccard verify stages rely on.
  */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  test("merge-walk count ≡ size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    // deterministic sweep: splitmix-derived sets of varying size/overlap
    val next = TestSpark.splitmix(11L)
    val cases = (0 until 200).map { i =>
      val universe = Seq.fill(40)(math.floorMod(next(), 50L)).distinct
      val a = universe.filter(_ => next() > 0).sorted
      val b = universe.filter(_ => next() > 0).sorted
      (i, a, b)
    } ++ Seq((1000, Seq.empty[Long], Seq(1L, 2L)), (1001, Seq.empty[Long], Seq.empty[Long]))
    val df = cases.toDF("i", "a", "b")
      .withColumn("got", native(col("a"), col("b")))
      .withColumn("want", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("null array → null count") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(native(col("a"), col("b")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }
}
