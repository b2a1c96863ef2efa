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

  test("IVF fails loudly when nprobe exceeds the trained centroid count") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8)
    val indexed = Similarity.ivfIndex(emb, "embedding", cents)
    val queries = emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(indexed, "vec_id", "embedding", queries,
        cents, nprobe = cents.length + 1, k = 5)
    }
    assert(e.getMessage.contains("nprobe"))
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(indexed, "vec_id", "embedding", queries,
        cents, nprobe = 0, k = 5)
    }
  }

  test("IVF index assigns every vector to exactly one list") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexed = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    assert(indexed.count() == emb.count())
    assert(indexed.select("ivf_list").distinct().count() <= 8)
  }

  private def recallAt(nprobe: Int): Double = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexed = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 16)
    val queries = emb.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"))
    val got = Similarity.ivfTopK(indexed, "vec_id", "embedding", queries,
        nlist = 16, nprobe = nprobe, k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val exact = bruteTopK(5, 20)
    (0L until 20L).map { q =>
      got.getOrElse(q, Set.empty).intersect(exact(q).toSet).size / 5.0
    }.sum / 20.0
  }

  test("blocked cosine-threshold join ≡ brute-force cross join (exact, any block count)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .filter(graft.functions.Vec.cosine(col("va"), col("vb")) >= 0.45)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (blocks <- Seq(1, 7, 32)) {
      val got = Similarity.cosineThresholdPairs(emb, "vec_id", "embedding",
          threshold = 0.45, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"blocks=$blocks")
    }
  }

  test("cosine-threshold join collapses identical vectors — candidates O(distinct²), expansion exact") {
    // the jaccardPairs discipline ported to embeddings: 5 exact
    // copies of every vector must produce exactly 25× the base cross
    // pairs plus C(5,2)=10 internal pairs per (nonzero) group — and
    // the triangle join must have run over the 500 distinct vectors,
    // not the 2500-row corpus
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = Similarity.cosineThresholdPairs(emb, "vec_id", "embedding",
      threshold = 0.45, blocks = 8).count()
    val nVec = emb.count()
    val fiveX = (0 until 5).map(i =>
      emb.select((col("vec_id") + lit(i * 100000L)).as("vec_id"),
        col("embedding"))).reduce(_ unionByName _)
    val got = Similarity.cosineThresholdPairs(fiveX, "vec_id", "embedding",
      threshold = 0.45, blocks = 8).count()
    assert(got == 25L * base + 10L * nVec,
      s"expected ${25L * base + 10L * nVec} (= 25·$base cross + 10·$nVec intra), got $got")
  }

  test("identical ZERO vectors never pair — the collapse preserves the norm-0 rule") {
    import spark.implicits._
    val z = Seq(
      (1L, Array(0f, 0f, 0f, 0f)), (2L, Array(0f, 0f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f)), (4L, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.cosineThresholdPairs(z, "vec_id", "embedding",
        threshold = 0.5, blocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the unit-vector twins pair; the zero-vector twins must not
    assert(got == Set((3L, 4L)), got.toString)
  }

  test("crossCosinePairs ≡ brute force cross-side (incl. planted duplicates on both sides)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // plant exact copies on BOTH sides (+200000 preserves vec_id % 10,
    // so each copy lands on its original's side) — the collapse +
    // cross-side expansion path must reproduce every member pair
    val planted = emb.unionByName(emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + lit(200000L)).as("vec_id"), col("embedding")))
    val q = planted.filter(col("vec_id") % 10 === 7)
    val c = planted.filter(col("vec_id") % 10 =!= 7)
    for (t <- Seq(0.3, 0.45)) {
      val got = Similarity.crossCosinePairs(q, c, "vec_id", "embedding", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = q.select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        .crossJoin(c.select(col("vec_id").as("c_id"), col("embedding").as("vc")))
        .filter(graft.functions.Vec.cosine(col("vq"), col("vc")) >= t)
        .select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"t=$t: got=${got.size} brute=${brute.size}")
    }
  }

  test("crossCosinePairs: zero-norm vectors match nothing; oversize query side fails loudly") {
    import spark.implicits._
    val q = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val c = Seq((10L, Array(0f, 0f, 0f)), (11L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.crossCosinePairs(q, c, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the unit vectors pair cross-side; neither zero vector pairs with
    // ANYTHING — not even the identical zero vector on the other side
    assert(got == Set((2L, 11L)), got.toString)
    val e = intercept[IllegalArgumentException] {
      Similarity.crossCosinePairs(q, c, "vec_id", "embedding", 0.5,
        maxQueryRows = 1L)
    }
    assert(e.getMessage.contains("broadcasts the query side"))
  }

  test("LSH near-dup finds every planted duplicate at τ=0.9 (documented miss bound)") {
    // 40 random base vectors (max pairwise sim 0.69 at 64 dims) + 10
    // perturbed copies at cosine 0.93–0.95 — a corpus with the gapped
    // similarity distribution the LSH path is FOR.
    val dim = 64
    val next = graft.TestSpark.splitmixUnit(7L)
    def normalize(v: Array[Double]) = {
      val n = math.sqrt(v.map(e => e * e).sum); v.map(_ / n)
    }
    val base = Array.fill(40)(normalize(Array.fill(dim)(next())))
    val planted = (0 until 10).map { i =>
      val noise = Array.fill(dim)(next() * 0.04)
      (100L + i, normalize(base(i).zip(noise).map { case (e, n) => e + n }))
    }
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) } ++
      planted.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
    import spark.implicits._
    val emb = rows.toSeq.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

    val got = Similarity.cosineNearDupLsh(emb, "vec_id", "embedding",
        threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = planted.indices.map(i => (i.toLong, 100L + i)).toSet
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("LSH near-dup fails loudly on a dim mismatch (not an empty result)") {
    import spark.implicits._
    val emb = Seq((1L, Seq.fill(32)(0.1f)), (2L, Seq.fill(32)(0.1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.cosineNearDupLsh(emb, "vec_id", "embedding",
        threshold = 0.9, dim = 64).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("sketch was built for")), e.getMessage)
  }

  test("IVF recall@5 vs nprobe on random data (k-means centroids)") {
    val r4 = recallAt(4)
    val r8 = recallAt(8)
    val r12 = recallAt(12)
    info(s"recall@5 nlist=16: nprobe=4 → $r4, nprobe=8 → $r8, nprobe=12 → $r12")
    assert(r4 >= 0.6, s"nprobe=4 recall=$r4")
    assert(r8 >= 0.8, s"nprobe=8 recall=$r8")
    assert(r12 >= 0.9, s"nprobe=12 recall=$r12")
    assert(r4 <= r8 && r8 <= r12, "recall must be monotone in nprobe")
  }

  test("q205: recall harness agrees with its own ground truth and clears the floor") {
    val rows = graft.SparkEntry.queries("q205_ann_recall")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20, "one row per query")
    rows.foreach { r =>
      val (n, rec) = (r.getLong(1), r.getDouble(2))
      assert(n >= 0 && n <= 5)
      assert(rec == n.toDouble / 5.0, "recall must be the exact n/5 rational")
    }
    val mean = rows.map(_.getLong(1)).sum.toDouble / (5.0 * rows.length)
    info(s"q205 corpus recall@5 (nprobe=4): $mean")
    assert(mean >= 0.6, s"corpus recall floor: $mean")
  }

  test("PQ ANN is deterministic (bit-identical reruns) and clears the recall floor") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"))
    def run(rerank: Int): Seq[(Long, Long, Long, Long)] = {
      val model = Pq.train(emb, "vec_id", "embedding")
      Pq.topK(emb, "vec_id", "embedding", queries, model, k = 5, rerank = rerank)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    }
    // pure-ADC path: integer distances → bit-identical reruns
    val a = run(rerank = 0)
    val b = run(rerank = 0)
    assert(a == b, "trained codebooks / packed codes / rankings must be reproducible")
    assert(a.groupBy(_._1).size == 20 && a.size == 100, "5 neighbors per query")

    // serving path (ADC shortlist 32 → exact rerank): recall@5 vs
    // exact cosine, conservative corpus-level floor
    val served = run(rerank = 32)
    assert(served == run(rerank = 32), "rerank path must be reproducible too")
    val exact = bruteTopK(5, 20)
    val got = served.groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val hits = exact.map { case (q, ids) => (got(q) & ids.toSet).size }.sum
    val recall = hits.toDouble / (5.0 * 20)
    // pure-ADC recall, for the spec log (no floor — 4-bit codes on
    // near-random data are honestly coarse; the serving path is the
    // contract)
    val gotAdc = a.groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val adcRecall = exact.map { case (q, ids) => (gotAdc(q) & ids.toSet).size }.sum
      .toDouble / (5.0 * 20)
    info(s"PQ (m=16, ksub=16) recall@5: ADC-only $adcRecall, shortlist-32+rerank $recall")
    assert(recall >= 0.5, s"PQ serving recall floor: $recall")
    assert(recall >= adcRecall, "exact rerank cannot reduce recall at equal shortlist")
  }
}
