package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The distributed merge trainer must equal a single-node reference
  * BPE implementation exactly — same pair counts (overlaps counted,
  * as in the published algorithm), same tie-breaks, same greedy
  * left-to-right re-segmentation.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference single-node trainer over tokenized sequences. */
  private def reference(corpus: Seq[Array[String]], k: Int): Seq[(Int, String, String, Long)] = {
    var seqs = corpus.filter(_.length >= 2)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach(s => s.sliding(2).foreach {
        case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
        case _ =>
      })
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, l, r, c))
        seqs = seqs.map { s =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          s.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r) {
              acc.remove(acc.length - 1); acc += s"$l${BpeTrain.Sep}$r"
            } else acc += x
          }
          acc.toArray
        }
      }
    }
    out.result()
  }

  test("distributed merges ≡ reference on the real sf0.001 corpus") {
    import spark.implicits._
    val texts = Tables(spark, "/root/testdata/sf0.001").documents
      .select("text").collect().map(_.getString(0))
    val expect = reference(texts.map(_.split(" ")), k = 4)
    val got = BpeTrain.train(
      texts.toSeq.toDF("text"), "text", k = 4)
      .collect().map(r => (r.getLong(0).toInt, r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("greedy overlap semantics: 'a a a a' merges to two pairs, count includes overlaps") {
    import spark.implicits._
    val got = BpeTrain.train(Seq("a a a a").toDF("text"), "text", k = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "a", 3L))) // 3 adjacent pairs counted
    // and round 2 merges the two merged symbols
    val got2 = BpeTrain.train(Seq("a a a a").toDF("text"), "text", k = 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got2(1) == ("a+a", "a+a"))
  }

  /** Reference single-node ENCODER: apply a frozen merge table in
    * rank order with the same greedy left-to-right fold.
    */
  private def referenceEncode(toks: Array[String],
                              merges: Seq[(String, String)]): Array[String] =
    merges.foldLeft(toks) { case (s, (l, r)) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      s.foreach { x =>
        if (acc.nonEmpty && acc.last == l && x == r) {
          acc.remove(acc.length - 1); acc += s"$l${BpeTrain.Sep}$r"
        } else acc += x
      }
      acc.toArray
    }

  test("encode ≡ reference encoder on the real sf0.001 corpus; compresses; round-trips") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text"))
    val merges = BpeTrain.train(docs, "text", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeTrain.encode(docs, "text", merges)
      .select(col("doc_id"), col("text"), col("syms"),
        col("n_syms_before"), col("n_syms_after"))
      .collect()
    assert(got.nonEmpty)
    var anyCompressed = false
    got.foreach { r =>
      val toks = r.getString(1).split(" ")
      val syms = r.getSeq[String](2).toArray
      assert(syms.sameElements(referenceEncode(toks, merges)),
        s"doc ${r.getLong(0)}: encode != reference")
      assert(r.getLong(4) <= r.getLong(3), "encode must never add symbols")
      if (r.getLong(4) < r.getLong(3)) anyCompressed = true
      // round-trip: splitting merged symbols restores the original
      assert(syms.flatMap(_.split(java.util.regex.Pattern.quote(BpeTrain.Sep)))
        .sameElements(toks), s"doc ${r.getLong(0)}: round-trip broken")
    }
    assert(anyCompressed, "a 4-merge table must compress SOME doc")
  }

  test("native BpeApplyMerges ≡ composed SQL folds on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text"))
    val merges = BpeTrain.train(docs, "text", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val native = BpeTrain.encode(docs, "text", merges)
      .select(col("doc_id"), col("syms"))
    val composed = BpeTrain.encodeComposed(docs, "text", merges)
      .select(col("doc_id"), col("syms"))
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty,
      "native expression must equal the SQL-fold composition row-for-row")
  }

  test("merge learning is hierarchical: later merges build on earlier symbols") {
    import spark.implicits._
    val corpus = Seq.fill(10)("x y z").toDF("text")
    val merges = BpeTrain.train(corpus, "text", k = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // (x,y) wins round 1 by tie-break; round 2 merges (x+y, z)
    assert(merges(0) == ("x", "y", 10L))
    assert(merges(1) == ("x+y", "z", 10L))
  }
}
