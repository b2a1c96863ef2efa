package graft.music

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface for the keyed upsert sink, so the write
  * contract is reachable from the standard writer API — the
  * Spark-native equivalent of the reference's options-dict DynamoDB
  * connector (`glue_job.py:110-132`):
  *
  * {{{
  * df.write.format("graft-upsert")
  *   .option("path", "/tables/genre_kpis")
  *   .option("keys", "date,track_genre")   // ≈ itemHashKey
  *   .mode("append")                        // every mode upserts
  *   .save()
  * }}}
  *
  * The write is a `V1Write` bridge: Spark hands the batch to
  * `InsertableRelation.insert` on the driver, which runs the same
  * staged, atomically-swapped merge as `ParquetKeyedUpsertSink` —
  * one code path for both surfaces, last-writer-wins per key
  * (SURVEY §1.4: upsert, never truncate-and-load).
  */
class UpsertDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-upsert"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema comes from the batch

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UpsertTable(schema, properties)
}

final class UpsertTable(schema: StructType, props: util.Map[String, String])
    extends Table with SupportsWrite {

  private def required(key: String): String = {
    val v = props.get(key)
    require(v != null && v.nonEmpty, s"graft-upsert requires option '$key'")
    v
  }

  override def name(): String = s"graft-upsert:${props.get("path")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = required("path")
    val keys = required("keys").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data, _) => ParquetKeyedUpsertSink(path).upsert(data, keys)
      }
    }
  }
}
