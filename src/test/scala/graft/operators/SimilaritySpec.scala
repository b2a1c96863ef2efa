package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def bruteTopK(k: Int, nQueries: Int): Map[Long, Seq[Long]] = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    (0L until nQueries.toLong).map { q =>
      q -> emb.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(emb(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }.toMap
  }

  test("IVF with nprobe == nlist probes everything → exact top-k") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexed = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    val queries = emb.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"))
    val got = Similarity.ivfTopK(indexed, "vec_id", "embedding", queries,
        nlist = 8, nprobe = 8, k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    val exact = bruteTopK(5, 10)
    assert(got == exact)
  }

  test("IVF index assigns every vector to exactly one list") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexed = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    assert(indexed.count() == emb.count())
    assert(indexed.select("ivf_list").distinct().count() <= 8)
  }

  test("IVF recall@5 with nprobe=4/nlist=16 clears 0.5 on random data") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexed = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 16)
    val queries = emb.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"))
    val got = Similarity.ivfTopK(indexed, "vec_id", "embedding", queries,
        nlist = 16, nprobe = 4, k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val exact = bruteTopK(5, 20)
    val recall = (0L until 20L).map { q =>
      got.getOrElse(q, Set.empty).intersect(exact(q).toSet).size / 5.0
    }.sum / 20.0
    assert(recall >= 0.5, s"recall=$recall")
  }
}
