package graft.operators

import graft.TestSpark
import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for multi-probe sign-LSH ANN (q477): determinism, the
  * recall improvement multi-probe exists for (vs single-probe at
  * the SAME index size), and candidate IO == the probed buckets'
  * rows exactly — the contracts standing in for a SQL oracle on an
  * approximate operator.
  */
class MultiProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private def queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"))
  private val planes = Vec.deterministicPlanes(nPlanes = 6, dim = 64)

  private def bruteTopK(k: Int): Map[Long, Set[Long]] = {
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    (0L until 20L).map { q =>
      q -> vs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
  }

  private def recallAt(nProbes: Int): Double = {
    val exact = bruteTopK(5)
    val got = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
        queries, planes, nProbes, k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    (0L until 20L).map { q =>
      got.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0
    }.sum / 20.0
  }

  test("multi-probe is bitwise run-to-run deterministic") {
    def run() = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
        queries, planes, nProbes = 4, k = 5)
      .collect().map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}")
      .sorted.toSeq
    val a = run()
    assert(a.nonEmpty && a == run())
  }

  test("probing flip buckets recovers recall single-probe loses — at the SAME index size") {
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    val r7 = recallAt(7)
    info(s"recall@5: single-probe $r1, 4 probes $r4, 7 probes $r7")
    assert(r4 > r1, s"multi-probe must beat single-probe: $r4 vs $r1")
    assert(r7 >= r4, "recall must be probe-monotone")
    assert(r4 >= 0.2, s"4-probe recall collapsed: $r4")
  }

  test("candidate IO is exactly the probed buckets' rows") {
    val cands = Similarity.multiProbeCandidates(emb, "vec_id", "embedding",
      queries, planes, nProbes = 4).localCheckpoint()
    // per query: at most 4 distinct probed buckets surface (empty
    // probes produce no rows)
    val perQ = cands.groupBy("query_id")
      .agg(countDistinct(col("bucket")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perQ.nonEmpty && perQ.values.forall(_ <= 4))
    // per (query, probed bucket): EVERY row of that bucket minus the
    // query itself, nothing else — candidate IO ∝ probed buckets
    val sizes = emb.select(Vec.lshBucket(col("embedding"), planes).as("b"))
      .groupBy("b").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val own = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), Vec.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byQB = cands.groupBy("query_id", "bucket").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    byQB.foreach { case ((q, b), n) =>
      val expect = sizes(b) - (if (own(q) == b) 1L else 0L)
      assert(n == expect,
        s"query $q bucket $b: $n candidates vs bucket size ${sizes(b)}")
    }
  }

  test("an nProbes beyond base+one-flip-per-plane fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.multiProbeTopK(emb, "vec_id", "embedding", queries,
        planes, nProbes = 10, k = 5)
    }
    assert(e.getMessage.contains("nProbes"))
  }
}
