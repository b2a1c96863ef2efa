package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("misraGries emits at most k-1 candidates and never misses a >n/k item") {
    val next = TestSpark.splitmix(11L)
    // planted skew inside one partition: 3000×[1], 1500×[2], 5500 noise
    val data = Seq.fill(3000)(1L) ++ Seq.fill(1500)(2L) ++
      Seq.fill(5500)(math.floorMod(next(), 1000L) + 10L)
    val k = 10
    val out = HeavyHitters.misraGries(data.iterator, k).toSet
    assert(out.size <= k - 1)
    assert(out.contains(1L)) // freq 3000 > 10000/10
    assert(out.contains(2L)) // freq 1500 > 1000
  }

  test("frequentKeys ≡ brute-force GROUP BY HAVING on planted-skew data") {
    val next = TestSpark.splitmix(13L)
    val rows = Seq.fill(4000)(42L) ++ Seq.fill(2500)(7L) ++
      Seq.fill(9500)(math.floorMod(next(), 2000L) + 100L)
    val df = spark.sparkContext.parallelize(rows, 8).toDF("key")
    val k = 10
    val got = HeavyHitters.frequentKeys(df, col("key"), k)
      .select("key", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = rows.size
    val brute = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }
      .map { case (key, c) => (key, c) }.toSet
    assert(got == brute)
    assert(got.map(_._1) == Set(42L, 7L))
  }

  test("uniform input yields no heavy hitters at small k") {
    val df = (0L until 10000L).map(i => i % 100L).toDF("key")
    assert(HeavyHitters.frequentKeys(df, col("key"), 50).count() == 0)
  }
}
