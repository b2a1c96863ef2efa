package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual media near-dup (q471): dHash fingerprints + the shared
  * Hamming blocking. Pins, against the real sf0.001 corpus wrapped
  * as media payloads:
  *  - the expression against an independent Scala reference (eval
  *    and codegen paths both covered by the query path);
  *  - planted single-byte twins land at Hamming ≤ 2 and are ALL
  *    recalled (recall floor = 1.0 on plants);
  *  - blocking losslessness: the banded join equals the brute-force
  *    Hamming join over the fingerprints, bit for bit;
  *  - layout invariance: the pair set is identical across input
  *    partitionings;
  *  - the chunk-coverage precondition fails loudly.
  */
class PerceptualDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Independent reference dHash (same stub decode contract as
    * DHash64, written separately: stripe byte-sums on a 8×9 grid,
    * bit (r,c) = right cell brighter).
    */
  private def refDHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val cells = Array.tabulate(72) { i =>
      val from = (i.toLong * n / 72).toInt
      val to = ((i + 1).toLong * n / 72).toInt
      bytes.slice(from, to).map(b => (b & 0xff).toLong).sum
    }
    (for {
      r <- 0 until 8
      c <- 0 until 8
      if cells(r * 9 + c + 1) > cells(r * 9 + c)
    } yield 1L << (r * 8 + c)).foldLeft(0L)(_ | _)
  }

  private def media = {
    val docs = graft.Tables(spark, sf).documents
    val base = docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val twins = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("~"), expr("substring(text, 2)"))
          .cast("binary").as("payload"))
    base.unionByName(twins)
  }

  test("DHash64 matches the independent reference on corpus payloads") {
    val rows = media.limit(64)
      .select(col("payload"), Multimodal.dHash(col("payload")).as("fp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]](0)
      assert(r.getLong(1) == refDHash(bytes),
        s"dHash mismatch on a ${bytes.length}-byte payload")
    }
    // boundary payloads: empty → 0; shorter than the 72-cell grid
    import spark.implicits._
    val tiny = Seq(Array.emptyByteArray, "a".getBytes, "abc".getBytes)
      .toDF("payload")
      .select(col("payload"), Multimodal.dHash(col("payload")).as("fp"))
      .collect()
    tiny.foreach { r =>
      assert(r.getLong(1) == refDHash(r.getAs[Array[Byte]](0)))
    }
  }

  test("planted single-byte twins sit within Hamming 2 of their base") {
    val fps = media.select(col("doc_id"),
        Multimodal.dHash(col("payload")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plantedIds = fps.keySet.filter(_ >= 10000000L)
    assert(plantedIds.size == 100)
    plantedIds.foreach { tid =>
      val d = java.lang.Long.bitCount(fps(tid) ^ fps(tid - 10000000L))
      assert(d <= 2, s"twin of ${tid - 10000000L} at Hamming $d")
    }
  }

  test("banded pairs EQUAL the brute-force Hamming join (losslessness) and recall every plant") {
    val fps = media.select(col("doc_id"),
        Multimodal.dHash(col("payload")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSet
    val got = Multimodal.perceptualNearDupPairs(media, "doc_id", "payload",
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"blocked != brute force: missing=${(brute -- got).take(5)} " +
        s"extra=${(got -- brute).take(5)}")
    val plants = fps.collect { case (id, _) if id >= 10000000L =>
      (id - 10000000L, id) }.toSet
    assert(plants.subsetOf(got),
      s"missed plants: ${(plants -- got).take(5)}")
  }

  test("pair set is invariant to the input partitioning") {
    def run(parts: Int) =
      Multimodal.perceptualNearDupPairs(media.repartition(parts),
          "doc_id", "payload", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(3) == run(17))
  }

  test("a chunk count that does not divide 64 fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.perceptualNearDupPairs(media, "doc_id", "payload",
        maxHamming = 4)
    }
    assert(e.getMessage.contains("divide 64"))
  }
}
