package graft.music

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The DynamoDB write contract (SURVEY §1.4, `glue_job.py:103-132`):
  * per-item upsert keyed by the destination table's primary key,
  * last-writer-wins, never truncate-and-load.
  *
  * `ParquetKeyedUpsertSink` is the local/test implementation: the
  * table is a parquet directory; an upsert merges new rows over
  * existing ones by key (anti-join out the overwritten keys), writes
  * to a staging directory, then atomically swaps. Within one batch,
  * duplicate keys collapse deterministically (max by a total order
  * over the remaining columns) — mirroring "last writer wins" while
  * staying reproducible under Spark's unordered execution.
  *
  * A cloud implementation (e.g. DynamoDB `batchWriteItem` via
  * `df.foreachPartition` + an SDK client) plugs in behind the same
  * trait; the KPI job depends only on the contract. `BatchedKvSink`
  * demonstrates that write path against a pluggable client.
  *
  * CONCURRENCY CONTRACT: `upsert` assumes a SINGLE WRITER per table
  * path. The parquet implementation's read-merge-swap is atomic for
  * readers (they see the old or the new table, never a half-written
  * one) but not for concurrent writers: two interleaved upserts to
  * the same path can lose one writer's keys or collide on the shared
  * `.staging`/`.old` paths. This mirrors the reference pipeline,
  * where one job owns the KPI tables (`glue_job.py` runs as the DAG's
  * only compute step) and the streaming path serializes upserts
  * through `foreachBatch` (one batch at a time per query). Callers
  * needing multi-writer semantics must serialize externally (a lock
  * file / lease) or use a sink whose backend does per-item CAS (the
  * DynamoDB-style `BatchedKvSink`, where last-writer-wins is enforced
  * by the store, not the merge).
  */
trait KeyedUpsertSink {
  def upsert(df: DataFrame, keyCols: Seq[String]): Unit
  def read(spark: SparkSession): DataFrame
}

final case class ParquetKeyedUpsertSink(path: String) extends KeyedUpsertSink {

  override def upsert(df: DataFrame, keyCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val target = new Path(path)
    // the path's own filesystem, not the default FS — the sink must
    // work when the table lives on s3a:// etc. while defaultFS is
    // file:// or hdfs://
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".staging")
    recoverIfInterrupted(fs, target)

    // collapse in-batch duplicate keys deterministically
    val valueCols = df.columns.filterNot(keyCols.contains)
    val collapsed =
      if (valueCols.isEmpty) df.dropDuplicates(keyCols)
      else df.groupBy(keyCols.map(col): _*)
        .agg(max(struct(valueCols.map(col): _*)).as("__v"))
        .select(keyCols.map(col) ++ valueCols.map(c => col(s"__v.$c")): _*)

    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(path)
        existing.join(collapsed.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(collapsed)
      } else collapsed

    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // atomic swap: the reader never sees a half-written table
    val old = new Path(path + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(staging, target)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** A crash between the two swap renames leaves the live table at
    * `path + ".old"` and nothing at `path`. Roll it back before any
    * read or merge so no committed data is ever dropped.
    */
  private def recoverIfInterrupted(fs: FileSystem, target: Path): Unit = {
    val old = new Path(path + ".old")
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
  }

  override def read(spark: SparkSession): DataFrame = {
    val target = new Path(path)
    recoverIfInterrupted(
      target.getFileSystem(spark.sparkContext.hadoopConfiguration), target)
    spark.read.parquet(path)
  }
}
