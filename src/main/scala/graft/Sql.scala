package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain-SQL surface: register the benchmark tables as temp views
  * (plus graft's SQL functions) so `spark.sql("...")` is a complete
  * query interface over the same data the DataFrame API sees.
  */
object Sql {

  private def registry(t: Tables): Seq[(String, () => DataFrame)] = Seq(
    "region" -> (() => t.region), "nation" -> (() => t.nation),
    "customer" -> (() => t.customer), "supplier" -> (() => t.supplier),
    "part" -> (() => t.part), "orders" -> (() => t.orders),
    "lineitem" -> (() => t.lineitem), "events" -> (() => t.events),
    "documents" -> (() => t.documents), "embeddings" -> (() => t.embeddings))

  // thunks are not invoked here, so the placeholder receiver is safe
  val tableNames: Seq[String] = registry(null).map(_._1)

  /** Register every table that the session can read; a table the
    * session cannot open (e.g. `events` needs the nanos-as-long conf
    * — see GraftSession) is skipped with a warning instead of taking
    * the whole surface down.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    registry(t).foreach { case (n, df) =>
      try df().createOrReplaceTempView(n)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft.Sql] skipping view '$n': ${e.getMessage}")
      }
    }
    GraftFunctions.register(spark)
  }
}
