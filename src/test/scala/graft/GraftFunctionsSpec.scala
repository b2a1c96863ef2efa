package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL surface matches the Column API for the native expressions") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.limit(50).createOrReplaceTempView("e_sql")

    val viaSql = spark.sql(
      """SELECT a.vec_id qa, b.vec_id qb, vec_cosine(a.embedding, b.embedding) c
         FROM e_sql a JOIN e_sql b ON a.vec_id < b.vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaCol = {
      val a = emb.limit(50).select(col("vec_id").as("qa"), col("embedding").as("va"))
      val b = emb.limit(50).select(col("vec_id").as("qb"), col("embedding").as("vb"))
      a.crossJoin(b).filter(col("qa") < col("qb"))
        .select(col("qa"), col("qb"),
          graft.functions.Vec.cosine(col("va"), col("vb")).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    assert(viaSql == viaCol)

    val sh = spark.sql(
      "SELECT simhash64(transform(split('a b c', ' '), t -> xxhash64(t))) v")
      .collect().head.getLong(0)
    assert(sh != 0L)
  }
}
