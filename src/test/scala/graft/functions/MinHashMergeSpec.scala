package graft.functions

import graft.operators.Dedup
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("group-merged signature equals element-wise min of member signatures") {
    val docs = Seq(
      ("srcA", "the quick brown fox jumps over the lazy dog"),
      ("srcA", "a completely different second document body here"),
      ("srcB", "the quick brown fox jumps over the lazy dog"))
      .toDF("source", "text")
    val numPerm = 16
    val perDoc = docs.select(col("source"),
      Dedup.minHashSignature(Dedup.shingleHashes(col("text"), 2), numPerm).as("sig"))

    val merged = perDoc.as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new MinHashMerge(numPerm).toColumn.name("gsig"))
      .collect().toMap

    // oracle: element-wise min across per-doc sigs on the driver
    val perDocLocal = perDoc.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.map(_._2).reduce((x, y) => x.zip(y).map(t => math.min(t._1, t._2)))
      }
    assert(merged("srcA") == perDocLocal("srcA"))
    assert(merged("srcB") == perDocLocal("srcB"))

    val est = MinHashMerge.estimate(merged("srcA"), merged("srcB"))
    assert(est >= 0.0 && est <= 1.0)
  }
}
