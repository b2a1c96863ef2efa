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

  /** Deterministic splitmix64 stream for test fixtures — ONE audited
    * copy of the constants (mirrors Dedup.splitmix) instead of a
    * hand-rolled generator per suite.
    */
  def splitmix(seed: Long): () => Long = {
    var x = seed
    () => {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** splitmix64 mapped to a double uniform in [-1, 1) (the same
    * mapping Vec.deterministicPlanes uses).
    */
  def splitmixUnit(seed: Long): () => Double = {
    val next = splitmix(seed)
    () => (next() >>> 11) * (1.0 / (1L << 52)) * 2.0 - 1.0
  }
}
