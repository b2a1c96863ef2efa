package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal batching contract the oracle can't express: the
  * model is invoked once per ≤batchSize GROUP (not per item), and
  * the emitted features are a pure function of (payload, dim) —
  * identical under any partitioning or batch size.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("batchedInfer: one model call per group, partitioning-independent results") {
    implicit val sp: SparkSession = spark
    val docs = Tables(spark, sf).documents
    val n = docs.count()

    val acc = spark.sparkContext.longAccumulator("graft-batches")
    val a = Multimodal.batchedInfer(
      Multimodal.asMedia(docs).repartition(3), batchSize = 8, dims = 2, Some(acc))
      .collect().map(f => (f.doc_id, f.dim, f.feat)).toSet
    assert(a.size == n * 2, "two feature rows per item")

    // call count: each partition contributes ceil(rows/8) calls —
    // bounded by [ceil(n/8), partitions + floor(n/8)]
    val lo = (n + 7) / 8
    val hi = 3 + n / 8
    assert(acc.value >= lo && acc.value <= hi,
      s"model calls ${acc.value} outside batch envelope [$lo, $hi]")

    // different partitioning AND batch size → identical feature rows
    val b = Multimodal.batchedInfer(
      Multimodal.asMedia(docs).repartition(7), batchSize = 5, dims = 2)
      .collect().map(f => (f.doc_id, f.dim, f.feat)).toSet
    assert(a == b, "batch structure must never leak into results")

    // stub model contract: md5 prefix of payload:dim
    val one = a.find(t => t._1 == 0L && t._2 == 0L).get
    assert(one._3.length == 8 && one._3.matches("[0-9a-f]{8}"))
  }
}
