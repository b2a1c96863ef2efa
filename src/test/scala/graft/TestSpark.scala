package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork := true →
  * single JVM per test run).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-test")
        // static conf — needed by BucketingSpec's saveAsTable
        .config("spark.sql.warehouse.dir", tmpDir("graft-warehouse").toString),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }
}
