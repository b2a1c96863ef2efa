package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val body =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "near the warm fire and the mouse runs through the old house"

  test("each stage tags its rejects; survivors are kept") {
    val docs = Seq(
      (1L, body),                             // kept
      (2L, body),                             // exact dup of 1
      (3L, body.replace("quick", "swift")),   // near dup of 1
      (4L, "tiny doc"),                       // too_short
      (5L, "unique " + body.replace("the ", "some ")) // kept (no stopword filter)
    ).toDF("doc_id", "text")

    val verdicts = CorpusPipeline.clean(docs, "doc_id", "text",
        CorpusPipeline.Config(minTokens = 5, shingleN = 3, nearDupThreshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(verdicts == Map(
      1L -> "kept",
      2L -> "exact_dup",
      3L -> "near_dup",
      4L -> "too_short",
      5L -> "kept"))
  }

  test("audit table covers every input exactly once") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
    val out = CorpusPipeline.clean(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    val kept = out.filter("verdict = 'kept'").count()
    assert(kept > 0 && kept <= docs.count())
  }
}
