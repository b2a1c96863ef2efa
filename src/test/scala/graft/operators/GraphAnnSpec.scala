package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for graph-based ANN (q437/q438): build determinism and
  * degree bounds, edge quality vs exact neighbors, and the beam
  * search's recall floor vs exact cosine top-k — the contracts that
  * stand in for a SQL oracle on an approximate operator.
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def bruteTopK(k: Int, ids: Seq[Long]): Map[Long, Seq[Long]] = {
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    ids.map { q =>
      q -> vs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }.toMap
  }

  test("knn graph: deterministic, degree-bounded, edges mostly exact neighbors") {
    def run() = GraphAnn.knnGraph(emb, "vec_id", "embedding", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    val g = run()
    assert(g == run(), "graph build must be bitwise reproducible")
    val bySrc = g.groupBy(_._1)
    assert(bySrc.values.forall(_.size <= 8), "out-degree must be <= k")
    assert(bySrc.size == emb.count(), "every vector is a source")
    // edge quality: on a 100-node sample, the graph's rank-1 edge is
    // the TRUE nearest neighbor for most nodes (IVF candidates can
    // miss across list boundaries — that is the documented trade)
    val sample = bySrc.keys.toSeq.sorted.take(100)
    val exact = bruteTopK(1, sample)
    val hit = sample.count(s => bySrc(s).minBy(_._3)._2 == exact(s).head)
    info(s"rank-1 edge = true NN for $hit/100 sampled nodes")
    assert(hit >= 70, s"graph edges degraded: $hit/100 true-NN rank-1 edges")
  }

  test("beam search: deterministic and clears the recall floor vs exact top-5") {
    val graph = GraphAnn.knnGraph(emb, "vec_id", "embedding", k = 8)
      .localCheckpoint()
    val qids = (0L until 20L)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"))
    def run() = GraphAnn.beamSearch(graph, emb, "vec_id", "embedding",
        queries, beam = 24, hops = 4, kOut = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    val got = run()
    assert(got == run(), "beam search must be bitwise reproducible")
    assert(got.groupBy(_._1).size == 20 && got.size == 100,
      "5 neighbors per query")
    val exact = bruteTopK(5, qids)
    val byQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recall = qids.map(q => (byQ(q) & exact(q).toSet).size).sum / (5.0 * 20)
    info(s"graph ANN recall@5 (beam=24, hops=4): $recall")
    assert(recall >= 0.6, s"beam-search recall collapsed: $recall")
    // a wider beam with more hops must not do worse
    val wide = GraphAnn.beamSearch(graph, emb, "vec_id", "embedding",
        queries, beam = 64, hops = 6, kOut = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recallWide = qids.map(q => (wide(q) & exact(q).toSet).size)
      .sum / (5.0 * 20)
    info(s"graph ANN recall@5 (beam=64, hops=6): $recallWide")
    assert(recallWide >= recall,
      "wider beam + more hops must not reduce recall")
  }
}
