package graft.music

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicInteger

/** One item of the KV write contract: a composed primary key plus
  * the row's columns as a string attribute map — the per-record
  * shape the reference's DynamoDB writes carry (`glue_job.py:110-132`
  * converts each KPI DataFrame to a DynamicFrame and hands it to
  * `write_dynamic_frame.from_options` with the DynamoDB connector,
  * `overwrite=true`).
  */
final case class KvItem(key: String, attrs: Map[String, String])

/** Client contract mirroring a cloud KV store's batch-write API
  * (DynamoDB `batchWriteItem`): accepts up to its batch limit of
  * items, writes what it can, and returns the UNPROCESSED remainder
  * (throttling / partial failure). Puts are idempotent per key with
  * last-writer-wins, so retrying unprocessed items is always safe.
  */
trait KvBatchClient extends Serializable {
  /** Max items per putBatch call (DynamoDB: 25). */
  def maxBatchSize: Int
  /** Write a batch; returns the unprocessed subset (empty = all landed). */
  def putBatch(items: Seq[KvItem]): Seq[KvItem]
  /** Full scan, for the read-back side of the sink contract. */
  def scan(): Seq[KvItem]
  /** One segment of a parallel scan (the DynamoDB
    * `Scan(Segment, TotalSegments)` shape): the `total` segments
    * partition the key space, each executor reads only its own. The
    * default routes through `scan()` and filters by key hash —
    * correct for the in-memory client; an SDK-backed client overrides
    * it with the store's native segmented scan.
    */
  def scanSegment(segment: Int, total: Int): Seq[KvItem] = {
    require(total > 0 && segment >= 0 && segment < total,
      s"scanSegment($segment, $total) out of range")
    scan().filter(i => math.floorMod(i.key.hashCode, total) == segment)
  }
}

/** `foreachPartition`-based keyed upsert against a [[KvBatchClient]]
  * — the batchWriteItem-shaped scale analogue of the reference's
  * DynamoDB connector writes (`glue_job.py:110-132`,
  * `write_dynamic_frame.from_options` with `overwrite=true`), which
  * under the hood batch-puts each partition against the table:
  *
  *  - rows never funnel through the driver: each task converts its
  *    partition to items and writes batches of `client.maxBatchSize`;
  *  - unprocessed leftovers (throttling) retry with capped attempts
  *    and exponential backoff; exhausting retries throws, failing the
  *    task so Spark's task retry takes over (safe: puts are
  *    idempotent LWW per key);
  *  - in-batch duplicate keys collapse deterministically BEFORE the
  *    write (same max-over-value-struct rule as the parquet sink), so
  *    the store never sees two versions of a key from one upsert.
  *
  * Unlike the parquet sink's read-merge-swap, per-item puts need no
  * single-writer assumption — concurrency is delegated to the
  * store's own per-key atomicity.
  */
final class BatchedKvSink(
    client: KvBatchClient,
    maxRetries: Int = 3,
    backoffMs: Long = 0L) extends KeyedUpsertSink with Serializable {

  override def upsert(df: DataFrame, keyCols: Seq[String]): Unit = {
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    val collapsed =
      if (valueCols.isEmpty) df.dropDuplicates(keyCols)
      else df.groupBy(keyCols.map(col): _*)
        .agg(max(struct(valueCols.map(col): _*)).as("__v"))
        .select(keyCols.map(col) ++ valueCols.map(c => col(s"__v.$c")): _*)

    val cl = client
    val retries = maxRetries
    val backoff = backoffMs
    val keys = keyCols
    collapsed.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(cl.maxBatchSize).foreach { group =>
        var pending: Seq[KvItem] = group.map(toItem(_, keys))
        var attempt = 0
        while (pending.nonEmpty) {
          val unprocessed = cl.putBatch(pending)
          if (unprocessed.nonEmpty) {
            attempt += 1
            if (attempt > retries)
              throw new java.io.IOException(
                s"KV batch write: ${unprocessed.size} items unprocessed after $retries retries")
            if (backoff > 0) Thread.sleep(backoff << (attempt - 1))
          }
          pending = unprocessed
        }
      }
    }
  }

  private def toItem(r: Row, keyCols: Seq[String]): KvItem = {
    val attrs = r.schema.fieldNames.iterator.zipWithIndex.collect {
      case (name, i) if !r.isNullAt(i) => name -> String.valueOf(r.get(i))
    }.toMap
    // a null key component has no well-defined identity — reject it
    // like the real store would, instead of colliding on ""
    val parts = keyCols.map { k =>
      attrs.getOrElse(k, throw new IllegalArgumentException(
        s"KV upsert: null value in key column '$k'"))
    }
    // escape the separator so composite keys can't collide across
    // different component splits ("a|b","c" vs "a","b|c")
    val key = parts.map(_.replace("\\", "\\\\").replace("|", "\\|")).mkString("|")
    KvItem(key, attrs)
  }

  /** Read-back as an all-string DataFrame (the KV store is
    * schemaless; columns are the union of attribute names).
    *
    * The scan materializes on the driver — acceptable for this
    * contract because the stored tables are KPI-sized result sets
    * (thousands of rows), not corpus-scale data; a corpus-scale KV
    * read would go through a DSv2 source with partitioned scans
    * instead.
    */
  override def read(spark: SparkSession): DataFrame = {
    val items = client.scan()
    val columns = items.flatMap(_.attrs.keys).distinct.sorted
    val rows = items.map(i => Row.fromSeq(columns.map(c => i.attrs.get(c).orNull)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 1000 + 1)),
      StructType(columns.map(StructField(_, StringType))))
  }
}

/** In-memory [[KvBatchClient]] with deterministic throttling
  * injection, for proving the batched-write path (splits, retries,
  * partial failure) without a network. State lives in a shared
  * registry keyed by table name — executors reach it because tests
  * run `local[*]` (one JVM); a real deployment substitutes an SDK
  * client here and nothing else changes.
  */
final case class InMemoryKvClient(
    table: String,
    maxBatchSize: Int = 25,
    throttleFirstCalls: Int = 0) extends KvBatchClient {

  override def putBatch(items: Seq[KvItem]): Seq[KvItem] = {
    require(items.nonEmpty && items.size <= maxBatchSize,
      s"putBatch size ${items.size} violates limit $maxBatchSize")
    val calls = InMemoryKvServer.callCounter(table).incrementAndGet()
    // throttled call: accept the first half, return the rest
    // unprocessed — the DynamoDB partial-failure shape
    val accepted = if (calls <= throttleFirstCalls) items.take(items.size / 2) else items
    val t = InMemoryKvServer.tableFor(table)
    accepted.foreach(i => t.put(i.key, i.attrs))
    items.drop(accepted.size)
  }

  override def scan(): Seq[KvItem] =
    InMemoryKvServer.tableFor(table).toSeq.sortBy(_._1)
      .map { case (k, v) => KvItem(k, v) }
}

/** Shared in-JVM store backing [[InMemoryKvClient]]. */
object InMemoryKvServer {
  private val tables = TrieMap.empty[String, TrieMap[String, Map[String, String]]]
  private val calls = TrieMap.empty[String, AtomicInteger]

  private[music] def tableFor(name: String): TrieMap[String, Map[String, String]] =
    tables.getOrElseUpdate(name, TrieMap.empty)

  private[music] def callCounter(name: String): AtomicInteger =
    calls.getOrElseUpdate(name, new AtomicInteger(0))

  /** Test hook: total putBatch calls observed for a table. */
  def putCalls(name: String): Int = callCounter(name).get()

  /** True iff the table has been registered in THIS JVM. Readers use
    * this to fail loudly instead of scanning an auto-created empty
    * table — on a multi-JVM cluster the in-memory registry is
    * driver-local, and a silent 0-row scan would mask the misdeploy.
    */
  def tableExists(name: String): Boolean = tables.contains(name)

  /** Test hook: drop a table and its counters. */
  def reset(name: String): Unit = { tables.remove(name); calls.remove(name) }
}
