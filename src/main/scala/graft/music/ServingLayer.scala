package graft.music

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The consumer-side read path (SURVEY §3 entry point 3): the
  * reference serves KPIs from DynamoDB with a partition-key lookup +
  * sort + limit (`README.md:70-75`). Spark-native equivalent: KPI
  * tables published as parquet partitioned by the `date` key, so a
  * date-filtered query is a single-partition read (partition
  * pruning), and top-k plans as TakeOrderedAndProject.
  *
  * At 100 TB the partition column is the only thing that matters
  * here: one directory per day keeps every serving query I/O-bounded
  * by a single day's slice regardless of history length.
  */
object ServingLayer {

  /** Publish a KPI result set partitioned by date (dynamic overwrite
    * touches only the dates present in `df` — an idempotent re-run
    * of one day never truncates history).
    */
  def publish(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date")
      .parquet(path)

  /** `SELECT * FROM t WHERE date = ? ORDER BY listen_count DESC
    * LIMIT n` (`README.md:70-75`).
    */
  def topForDate(spark: SparkSession, path: String, date: String, n: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("date") === date)
      .orderBy(col("listen_count").desc, col("track_id"))
      .limit(n)
}
