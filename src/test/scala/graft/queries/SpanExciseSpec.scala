package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the repeated-span EXCISION transform (q479, r12 verdict
  * item 5) on a planted fixture: untouched documents reconstruct
  * BYTE-EXACT (the original string, not a split/re-join round trip),
  * a seeded cross-doc span is removed from every non-owner copy
  * (overlapping windows union to one contiguous cut), the min-id
  * owner keeps its copy verbatim, and the removal accounting agrees
  * with q157's.
  */
class SpanExciseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a 25-token block shared by docs 1 and 2: six 20-token sliding
  // windows fit inside it, and their union covers all 25 positions
  private val common = (1 to 25).map(i => s"c$i").mkString(" ")
  private val doc1 =
    (1 to 8).map(i => s"a$i").mkString(" ") + " " + common + " " +
      (1 to 7).map(i => s"z$i").mkString(" ")
  private val doc2Head = (1 to 5).map(i => s"b$i").mkString(" ")
  private val doc2Tail = (1 to 6).map(i => s"y$i").mkString(" ")
  private val doc2 = s"$doc2Head $common $doc2Tail"
  private val doc3 = "tiny doc under the span width"
  private val doc4 = (1 to 30).map(i => s"q$i").mkString(" ")

  private def fixtureDir: String = {
    val dir = TestSpark.tmpDir("span-excise").toString
    Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("owner + untouched docs are byte-exact; every non-owner copy of the planted span is excised") {
    val dir = fixtureDir
    val got = graft.SparkEntry.queries("q479_span_excise")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 is the min-id owner of every shared span — verbatim
    assert(got(1L) == ((doc1, 40L, 0L)),
      s"owner must keep its copy byte-exact: ${got(1L)}")
    // docs 3 and 4 share nothing — byte-exact originals
    assert(got(3L) == ((doc3, 6L, 0L)))
    assert(got(4L) == ((doc4, 30L, 0L)))
    // doc 2: the six shared 20-token windows union to the full
    // 25-token common block; its unique head/tail survive re-joined
    assert(got(2L) == ((s"$doc2Head $doc2Tail", 36L, 25L)),
      s"non-owner must lose exactly the planted block: ${got(2L)}")
  }

  test("accounting agrees with q157's span-removal report") {
    val dir = fixtureDir
    val excise = graft.SparkEntry.queries("q479_span_excise")(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val report = graft.SparkEntry.queries("q157_span_removal")(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(excise == report,
      "q479's removal accounting must equal q157's detection report")
  }
}
