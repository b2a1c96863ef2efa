package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local-mode defaults are sized for the test harness (local[32],
  * 128 GiB single JVM), but every setting here is the one we'd also
  * ship on a 1000-executor cluster: AQE on (runtime re-planning,
  * skew-join splitting, partition coalescing), broadcast threshold
  * high enough to broadcast every dimension table in the star schema,
  * UTC session time zone for deterministic timestamp semantics.
  */
object GraftSession {

  /** Apply graft's standard configs to an existing builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // the testdata events parquet carries TIMESTAMP(NANOS) which
      // Spark's µs TimestampType cannot hold; read as Long (ns since
      // epoch) and normalize in the loader (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (saveAsTable — the catalog surface) land in
      // tmp, never in the repo working dir (static conf: the first
      // session of the JVM decides)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          "graft-warehouse").toString)
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = tune(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
