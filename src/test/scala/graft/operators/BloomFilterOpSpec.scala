package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFilterOpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every build key passes the probe") {
    val keys = (0L until 2000L by 2).toDF("k")
    val words = BloomFilterOp.build(keys, col("k"))
    val misses = keys.filter(!BloomFilterOp.mightContain(words, col("k"))).count()
    assert(misses == 0)
  }

  test("false-positive rate on disjoint probes is far below 1%") {
    val build = (0L until 1000L).toDF("k")
    val words = BloomFilterOp.build(build, col("k"))
    // probe keys guaranteed absent from the build domain
    val probes = (1000000L until 1100000L).toDF("k")
    val fp = probes.filter(BloomFilterOp.mightContain(words, col("k"))).count()
    assert(fp < 1000, s"fp=$fp of 100000") // sized for ~1e-10; 1% is the loud bound
  }

  test("prefilter + exact join ≡ plain join") {
    val next = TestSpark.splitmix(7L)
    val fact = Seq.fill(5000)(math.floorMod(next(), 400L)).toDF("fk")
    val dims = (0L until 400L by 13).toDF("dk")
    val plain = fact.join(dims, col("fk") === col("dk")).groupBy("fk")
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = BloomFilterOp.prefilter(fact, col("fk"), dims, col("dk"))
    val withBloom = pre.join(dims, col("fk") === col("dk")).groupBy("fk")
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withBloom == plain)
    // and the prefilter really prunes: survivors ⊆ fact, strictly fewer
    assert(pre.count() < fact.count())
  }

  test("empty build side filters everything") {
    val words = BloomFilterOp.build(Seq.empty[Long].toDF("k"), col("k"))
    val probes = (0L until 100L).toDF("k")
    assert(probes.filter(BloomFilterOp.mightContain(words, col("k"))).count() == 0)
  }
}
