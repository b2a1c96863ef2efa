package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain-SQL surface: register the benchmark tables as temp views
  * (plus graft's SQL functions) so `spark.sql("...")` is a complete
  * query interface over the same data the DataFrame API sees.
  */
object Sql {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    tableNames.foreach { n =>
      val df: DataFrame = n match {
        case "region" => t.region;     case "nation" => t.nation
        case "customer" => t.customer; case "supplier" => t.supplier
        case "part" => t.part;         case "orders" => t.orders
        case "lineitem" => t.lineitem; case "events" => t.events
        case "documents" => t.documents
        case "embeddings" => t.embeddings
      }
      df.createOrReplaceTempView(n)
    }
    GraftFunctions.register(spark)
  }
}
