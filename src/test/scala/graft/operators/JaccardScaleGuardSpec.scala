package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tail-growth guard for the exact-Jaccard AllPairs joins (the
  * by-design bench tail, q35/q38): on a duplicate-skewed corpus the
  * identical-set collapse must keep the candidate join O(distinct²)
  * — NOT O(corpus²) — and wall-time must grow sub-linearly in corpus
  * size. This is the one place a candidate-explosion regression
  * would be catastrophic at 100 TB (web corpora are 30–60% exact
  * dups), so the prose pin ("a >600 s bench run means regression")
  * gets an executable twin: union the documents fixture 10× with
  * remapped ids and assert the collapse invariants exactly.
  */
class JaccardScaleGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"
  private val threshold = 0.9

  // q35's set shape: distinct tokens, xxhash64'd, ascending
  private def sets(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("id"),
    array_sort(transform(array_distinct(split(col("text"), " ")),
      t => xxhash64(t))).as("ts"))

  test("10x duplicate-skewed corpus: candidates stay O(distinct²), output exact, time sub-linear") {
    val docs = Tables(spark, dir).documents.select("doc_id", "text")
    val nDocs = docs.count()
    val copies = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text")))
    val tenX = copies.reduce(_ unionByName _)

    // 1) identical-set collapse: 10 exact copies of every doc must
    //    collapse to the SAME distinct-set count as the 1× corpus
    def distinctSets(s: DataFrame): DataFrame =
      Dedup.repLabeled(s).filter(col("id") === col("rep"))
        .select(col("id"), col("ts"), col("n"))
    val d1 = distinctSets(sets(docs)).count()
    val d10 = distinctSets(sets(tenX)).count()
    assert(d10 == d1,
      s"identical-set collapse broke: $d10 distinct sets on 10× vs $d1 on 1×")

    // 2) candidate count is a function of DISTINCT sets only: the
    //    AllPairs prefix/length/position filters see the collapsed
    //    reps, so the 10× corpus must produce the same candidates
    val c1 = Dedup.allPairsCandidates(distinctSets(sets(docs)), threshold).count()
    val c10 = Dedup.allPairsCandidates(distinctSets(sets(tenX)), threshold).count()
    assert(c10 == c1,
      s"candidate join grew with corpus size: $c10 on 10× vs $c1 on 1× " +
        "— the collapse or the prefix filters regressed")

    // 3) verdict expansion is EXACT: every 1× matching pair (a,b)
    //    expands to the 10×10 cross pairs, and every duplicate group
    //    of 10 adds C(10,2)=45 internal jaccard-1.0 pairs
    def timeAndCount(s: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Dedup.jaccardPairs(s, threshold).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    var (t1, p1) = timeAndCount(sets(docs))
    var (t10, p10) = timeAndCount(sets(tenX))
    assert(p10 == 45L * nDocs + 100L * p1,
      s"expansion wrong: $p10 pairs on 10× (expected ${45L * nDocs + 100L * p1} " +
        s"= 45·$nDocs intra + 100·$p1 cross)")

    // 4) wall-time sub-linear in corpus size: the 10× run does the
    //    SAME candidate+verify work plus the (output-sized) member
    //    expansion — well under 10× the 1× time. 6× slack + a
    //    divergence resample absorb sandbox contention; the 0.2 s
    //    floor keeps sub-second noise from dominating the ratio.
    if (t10 > 6.0 * math.max(t1, 0.2)) {
      val r1 = timeAndCount(sets(docs)); t1 = math.min(t1, r1._1)
      val r10 = timeAndCount(sets(tenX)); t10 = math.min(t10, r10._1)
    }
    info(f"1×: $p1 pairs in $t1%.2f s; 10×: $p10 pairs in $t10%.2f s")
    assert(t10 <= 6.0 * math.max(t1, 0.2),
      f"10× corpus took $t10%.2f s vs $t1%.2f s on 1× — super-linear growth " +
        "means the AllPairs prefix filtering or the identical-set collapse broke")
  }

  test("containment: 10× duplication keeps candidates O(distinct²), ordered expansion exact") {
    // the containment join shares the collapse discipline: its B-side
    // FULL postings make candidate growth the bigger risk, so the
    // same executable guard applies — candidates are a function of
    // DISTINCT sets only, and verdicts expand ordered (each base doc
    // → 10·9 intra pairs, each 1× ordered pair → 100 copies)
    val docs = Tables(spark, dir).documents.select("doc_id", "text")
    val nDocs = docs.count()
    val tenX = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"))).reduce(_ unionByName _)
    def dsets(s: DataFrame): DataFrame =
      Dedup.repLabeled(s).filter(col("id") === col("rep"))
        .select(col("id"), col("ts"), col("n")).filter(col("n") > 0)
        .withColumn("req", expr("(49 * n + 49) div 50"))
    val c1 = Dedup.containmentCandidates(dsets(sets(docs))).count()
    val c10 = Dedup.containmentCandidates(dsets(sets(tenX))).count()
    assert(c10 == c1,
      s"containment candidates grew with corpus size: $c10 on 10× vs $c1 on 1×")
    val p1 = Dedup.containmentPairs(sets(docs), 49, 50).count()
    val p10 = Dedup.containmentPairs(sets(tenX), 49, 50).count()
    assert(p10 == 90L * nDocs + 100L * p1,
      s"ordered expansion wrong: $p10 pairs on 10× (expected " +
        s"${90L * nDocs + 100L * p1} = 90·$nDocs intra + 100·$p1 cross)")
  }

  test("the maxCandidateFactor tripwire trips on a corpus the filters cannot bound") {
    // near-identical low-entropy sets (every doc shares one long
    // common token run) defeat prefix filtering by construction —
    // the operational tripwire must fail loudly instead of silently
    // running the near-all-pairs join
    import spark.implicits._
    val base = (0L until 64L)
    val lowEntropy = (0L until 200L).map(i => (i, (base :+ (1000L + i)).toArray))
      .toDF("id", "ts")
    val e = intercept[IllegalStateException] {
      Dedup.jaccardPairs(lowEntropy, threshold = 0.5,
        maxCandidateFactor = Some(4.0)).count()
    }
    assert(e.getMessage.contains("tripwire"), e.getMessage)
  }
}
