package graft.music

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 READ surface for the KV store — the distributed
  * twin of `BatchedKvSink.read` (which materializes on the driver and
  * is bounded to KPI-sized tables). This source plans one input
  * partition per scan SEGMENT, the DynamoDB parallel-scan shape
  * (`Scan(Segment, TotalSegments)`): each executor reads only its
  * slice of the key space, so a corpus-scale table never funnels
  * through the driver.
  *
  * {{{
  * spark.read.format("graft-kv")
  *   .option("table", "genre_kpis")   // registry / table name
  *   .option("segments", "16")        // parallel-scan fan-out
  *   .load()
  * }}}
  *
  * Schema: the store is schemaless (string attribute maps); columns
  * are the sorted union of attribute names, all strings — identical
  * to `BatchedKvSink.read`. Inference here scans the in-memory
  * registry; an SDK-backed deployment overrides it with a sampled
  * or user-supplied schema and `KvBatchClient.scanSegment` with the
  * store's native segmented scan — nothing else changes.
  */
class KvScanSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-kv"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val table = options.get("table")
    require(table != null && table.nonEmpty, "graft-kv requires option 'table'")
    val columns = InMemoryKvClient(table).scan()
      .flatMap(_.attrs.keys).distinct.sorted
    StructType(columns.map(StructField(_, StringType)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvScanTable(schema, properties)
}

final class KvScanTable(tableSchema: StructType, props: util.Map[String, String])
    extends Table with SupportsRead {

  private val tableName: String = {
    val v = props.get("table")
    require(v != null && v.nonEmpty, "graft-kv requires option 'table'")
    v
  }

  private val segments: Int = {
    val v = props.getOrDefault("segments", "8")
    val n = v.toInt
    require(n > 0, s"graft-kv: segments must be positive, got $n")
    n
  }

  override def name(): String = s"graft-kv:$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** Scan building with the two DSv2 pushdown surfaces a KV store
    * can honor natively:
    *  - column pruning — attribute maps are fetched per item anyway,
    *    but only the REQUIRED columns are materialized into rows
    *    (and an SDK-backed store would pass a projection expression);
    *  - filter pushdown — attribute equality and existence tests
    *    evaluate inside the scan (a real DynamoDB scan takes these
    *    as FilterExpression), so fully-pushed predicates leave NO
    *    post-scan Filter node in the plan.
    * Unsupported predicates are returned as residuals for Spark to
    * evaluate — correctness never depends on the store's abilities.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}

      private var required: StructType = tableSchema
      private var pushed: Array[Filter] = Array.empty

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (sup, residual) = filters.partition {
          case EqualTo(a, _: String) => tableSchema.fieldNames.contains(a)
          case IsNotNull(a) => tableSchema.fieldNames.contains(a)
          case _ => false
        }
        pushed = sup
        residual
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toBatch: Batch =
          new KvScanBatch(tableName, segments, required, pushed)
        override def description(): String =
          s"graft-kv:$tableName pushed=[${pushed.mkString(", ")}] " +
            s"columns=[${required.fieldNames.mkString(", ")}]"
      }
    }
}

private final case class KvSegmentPartition(segment: Int, total: Int) extends InputPartition

private final class KvScanBatch(table: String, segments: Int, schema: StructType,
                                pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Batch {

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(segments)(i => KvSegmentPartition(i, segments))

  override def createReaderFactory(): PartitionReaderFactory = {
    import org.apache.spark.sql.sources.{EqualTo, IsNotNull}
    val tableName = table
    val fieldNames = schema.fieldNames.toSeq
    val filters = pushed
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[KvSegmentPartition]
      new PartitionReader[InternalRow] {
        // Executor-side segmented scan: only this partition's slice
        // of the key space is fetched. The in-memory registry is
        // JVM-local — if this executor can't see the table (non-local
        // deployment without an SDK client substituted), fail loudly
        // rather than return an empty-but-successful scan.
        require(InMemoryKvServer.tableExists(tableName),
          s"graft-kv: table '$tableName' not present in this executor's " +
            "registry — InMemoryKvClient only works in local mode; " +
            "substitute an SDK-backed KvBatchClient for cluster runs")
        // pushed predicates evaluate against the attribute map BEFORE
        // rows materialize — the FilterExpression position of a real
        // KV scan
        private def keep(attrs: Map[String, String]): Boolean =
          filters.forall {
            case EqualTo(a, v: String) => attrs.get(a).contains(v)
            case IsNotNull(a) => attrs.contains(a)
            case f => throw new IllegalStateException(
              s"graft-kv: unpushable filter reached the reader: $f")
          }
        private val items = InMemoryKvClient(tableName)
          .scanSegment(p.segment, p.total).iterator
          .filter(i => keep(i.attrs))
        private var current: InternalRow = _
        override def next(): Boolean =
          if (!items.hasNext) false
          else {
            val attrs = items.next().attrs
            current = InternalRow.fromSeq(fieldNames.map(c =>
              attrs.get(c).map(UTF8String.fromString).orNull))
            true
          }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}
