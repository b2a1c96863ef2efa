package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated benchmark tables (TESTDATA.md).
  *
  * Star schema: `lineitem` / `orders` / `events` are facts;
  * `part` / `supplier` / `customer` / `nation` / `region` are
  * dimensions small enough to broadcast at any scale factor that
  * keeps TPC-H proportions (part is ~0.2% of lineitem bytes).
  * `documents` / `embeddings` feed the training-data-pipeline
  * operators (dedup, similarity, text analysis).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `ts` has arrived from the fixture generator as THREE different
    * parquet types across rounds — TIMESTAMP(NANOS) (read as Long
    * under `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (Spark's TIMESTAMP_NTZ), and plain
    * TIMESTAMP — so the loader normalizes ALL of them to Spark's µs
    * TimestampType: ns→µs by exact integer floor-division, NTZ by a
    * cast that is micros-exact because the session time zone is
    * pinned to UTC (GraftSession.tune). Every consumer downstream
    * (unix_micros, session_window, watermarks) sees one type.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** The corpus tables fan out AT THE LOADER: the fixtures are
    * single-file, single-row-group parquet, so every scan arrives as
    * ONE partition and `spark.sql.files.maxPartitionBytes` cannot
    * split it (byte-range splits of one row group yield empty
    * partitions) — while nearly every consumer runs CPU-bound
    * interpreted maps (shingling, LSH signatures, IVF assignment)
    * that serialize on one core without a fan-out. Guarded the same
    * way as the per-operator `parallelized()` helpers (which now
    * no-op on these loaders): a real multi-file corpus at cluster
    * scale already arrives split, and this repartition never fires.
    */
  private def fannedOut(df: DataFrame): DataFrame = {
    val parallelism = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(parallelism / 2, 1))
      df.repartition(parallelism)
    else df
  }

  def documents: DataFrame  = fannedOut(t("documents"))
  def embeddings: DataFrame = fannedOut(t("embeddings"))
}
