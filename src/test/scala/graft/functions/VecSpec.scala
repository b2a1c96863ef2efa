package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot / norm / cosine against hand values") {
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f))
    ).toDF("a", "b")
    val rows = df.select(
      Vec.dot(col("a"), col("b")).as("dot"),
      Vec.cosine(col("a"), col("b")).as("cos")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(1) == 0.0)
    assert(rows(1).getDouble(0) == 18.0)
    assert(math.abs(rows(1).getDouble(1) - 1.0) < 1e-12) // parallel vectors
  }

  test("LSH bucket: identical vectors share a bucket, planes deterministic") {
    val planes1 = Vec.deterministicPlanes(8, 4)
    val planes2 = Vec.deterministicPlanes(8, 4)
    assert(planes1.flatten.toSeq == planes2.flatten.toSeq)
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 0.75f, 0.1f)),
      (2L, Array(0.5f, -0.25f, 0.75f, 0.1f)),
      (3L, Array(-0.5f, 0.25f, -0.75f, -0.1f))
    ).toDF("id", "v")
    val buckets = df.select(col("id"), Vec.lshBucket(col("v"), planes1).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(1L) == buckets(2L))
    // antipodal vector flips every sign bit → complementary bucket
    assert(buckets(3L) == (~buckets(1L) & ((1L << 8) - 1)))
  }

  test("length-mismatched vectors yield null in BOTH cosine implementations") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val row = df.select(
      Vec.cosine(col("a"), col("b")).as("fast"),
      Vec.cosineComposed(col("a"), col("b")).as("ref")).collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("native VecDotLong: hand values, null on length mismatch, A/B vs composed form") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),     // 4 + 10 + 18 = 32
      (Array(255L, 255L), Array(255L, 255L))       // max int8 codes
    ).toDF("a", "b")
    val rows = df.select(
      Vec.dotLong(col("a"), col("b")).as("fast"),
      Vec.dotLongComposed(col("a"), col("b")).as("ref")).collect()
    assert(rows(0).getLong(0) == 32L && rows(0).getLong(1) == 32L)
    assert(rows(1).getLong(0) == 2L * 255L * 255L)
    val mism = Seq((Array(1L, 2L), Array(1L)))
      .toDF("a", "b")
      .select(Vec.dotLong(col("a"), col("b")).as("d")).collect().head
    assert(mism.isNullAt(0))
  }

  test("native VecCosine is bit-identical to the composed zip_with/aggregate form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va")).filter(col("ia") < 40)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb")).filter(col("ib") < 40)
    val pairs = a.crossJoin(b)
    val diffs = pairs.select(
        Vec.cosine(col("va"), col("vb")).as("fast"),
        Vec.cosineComposed(col("va"), col("vb")).as("ref"))
      .filter(col("fast") =!= col("ref")) // bitwise: NaN≠NaN excluded by construction
      .count()
    assert(diffs == 0)
  }

  test("brute-force ANN top-k agrees with driver-side computation on sf0.001") {
    val got = graft.queries.VectorOps.queries("q40_ann_topk")(spark, "/root/testdata/sf0.001")
      .filter(col("query_id") === 0).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = emb(0L)
    val expected = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got == expected)
  }
}
