package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-loop helper: print the formatted plan of named queries.
  * `runMain graft.tools.PlanPeek <sfDir> <query...>`
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[8]").appName("graft-plan-peek"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      println(s"===== $q =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
