package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Optimization-round helper: dump `.explain("formatted")` of named
  * queries to individual files.
  * `runMain graft.tools.PlanDumpR17 <sfDir> <outDir> <suffix> <query...>`
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[8]").appName("graft-plan-dump"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.drop(3).foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), plan)
        println(s"[plandump] wrote $q")
      } catch {
        case e: Exception =>
          println(s"[plandump] FAILED $q: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
