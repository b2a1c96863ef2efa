package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ContaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cross-source overlap counts shared 3-grams exactly; same-source repeats don't count") {
    val docs = Seq(
      // train split
      (1L, "train", "alpha beta gamma delta epsilon"),
      (2L, "train", "zeta eta theta iota kappa"),
      // test split: doc 10 lifts a 4-token passage from doc 1
      // ("beta gamma delta epsilon" → 3-grams "beta gamma delta",
      // "gamma delta epsilon"), rest is unique vocab
      (10L, "test", "nu xi beta gamma delta epsilon omicron"),
      // test doc with no overlap at all
      (11L, "test", "pi rho sigma tau upsilon"),
      // a doc sharing grams only WITHIN its own source: not contamination
      (12L, "test", "pi rho sigma phi chi"),
      // shorter than 3 tokens: whole text is the gram
      (13L, "test", "alpha beta")
    ).toDF("doc_id", "source", "text")

    val got = Contamination.crossSourceOverlap(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

    // doc 10: 5 distinct 3-grams, 2 foreign ("beta gamma delta",
    // "gamma delta epsilon")
    assert(got(10L) == ((5L, 2L, true)))
    // doc 11: shares "pi rho sigma" with doc 12 — SAME source → clean
    assert(got(11L) == ((3L, 0L, false)))
    assert(got(12L) == ((3L, 0L, false)))
    // doc 13: whole-text gram "alpha beta" matches no train 3-gram
    assert(got(13L) == ((1L, 0L, false)))
    // train doc 1 is symmetric: its lifted grams are foreign too
    assert(got(1L) == ((3L, 2L, true)))
    assert(got(2L) == ((3L, 0L, false)))
  }
}
