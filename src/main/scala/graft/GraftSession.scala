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
      // AQE's coalescer merges small shuffle partitions up to
      // max(total/defaultParallelism, minPartitionSize); the 1 MB
      // default floor is sized for IO-bound stages, but this engine's
      // small intermediate shuffles are CPU-DENSE per compressed byte
      // (hash aggregates at near-input group counts, keyed windows,
      // sorted-array intersect verifies), and narrow integer rows
      // compress ~5-10x — a 1 MB floor was handing 600k-row window
      // stages 3-6 tasks on a 32-core box (r18 job census: q10/q12/
      // q38/q121/q150 all 10-30% faster at a 128k floor). Scale-safe
      // by construction: on big shuffles total/parallelism dominates
      // the max(), and the floor only bounds MERGING (partition count
      // never exceeds the configured shuffle width). Env-overridable
      // for cluster profiles where IO-bound small stages dominate.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "128k"))
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
