package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spark.sql over registered views matches the DataFrame API") {
    Sql.registerTables(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT date_format(l_shipdate, 'yyyy-MM-dd') AS ship_date, p_brand,
                count(*) AS listen_count,
                sum(l_quantity) AS total
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2""")
    val viaDf = {
      import org.apache.spark.sql.functions._
      val t = Tables(spark, "/root/testdata/sf0.001")
      t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"), col("p_brand"))
        .agg(count(lit(1)).as("listen_count"), sum(col("l_quantity")).as("total"))
    }
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    // graft's native functions are SQL-callable after registration
    assert(spark.sql(
      "SELECT vec_cosine(embedding, embedding) c FROM embeddings LIMIT 1")
      .collect().head.getDouble(0) > 0.99)
  }
}
