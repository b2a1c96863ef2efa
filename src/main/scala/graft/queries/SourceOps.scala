package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth beyond parquet (SURVEY §2.1): each
  * query is a full write→read round-trip through another columnar or
  * text format, then an aggregate over the re-read frame — so the
  * oracle (which reads the original parquet) proves the round-trip
  * was lossless, not just that the write succeeded.
  *
  * The JSON-lines twin lives in CorpusOps (q77). Avro is not
  * shipped in this Spark build (no spark-avro datasource jar), so
  * the format matrix here is parquet (everywhere), ORC, CSV, JSONL.
  *
  * Scale notes: a format round-trip is a narrow write + narrow scan
  * — no shuffle beyond the final aggregate. Staging dirs are
  * content-addressed per (format, input dir) and overwritten per
  * invocation, so repeated verify/bench runs stay bounded.
  */
object SourceOps {

  /** Content-addressed scratch dir under java.io.tmpdir. */
  private def scratch(tag: String, inputDir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-" + Integer.toHexString(inputDir.hashCode)).toString

  /** A killed earlier run can leave an orphaned managed-table
    * location that a FRESH session's in-memory catalog knows nothing
    * about — overwrite then fails with LOCATION_ALREADY_EXISTS.
    * Clear it first (it is ours by construction: content-addressed
    * name under the graft warehouse in tmp).
    */
  private def clearStaleLocation(s: SparkSession, tbl: String): Unit =
    if (!s.catalog.tableExists(tbl)) {
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        tbl.toLowerCase))
    }

  /** Explicit CSV read schema — header inference would cost an extra
    * pass and type inference is not deterministic enough for an
    * engine surface (S1's lesson from the reference: always pass the
    * schema).
    */
  private val partCsvSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ORC round-trip: documents metadata → ORC → per-source stats.
    // ORC is Spark-native (vectorized reader, predicate pushdown);
    // the aggregate matching the parquet oracle pins losslessness.
    "q87_orc_roundtrip" -> ((s, d) => {
      val dir = scratch("orc", d)
      Tables(s, d).documents
        .select(col("doc_id"), col("source"), col("n_chars"))
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    }),

    // CSV round-trip: the full part dimension through text-with-
    // header (the reference's raw-data format), re-read with an
    // EXPLICIT schema, aggregated per type. Doubles survive exactly:
    // Spark writes shortest-round-trip decimal representations.
    "q88_csv_roundtrip" -> ((s, d) => {
      val dir = scratch("csv", d)
      Tables(s, d).part.write.mode("overwrite")
        .option("header", "true").csv(dir)
      s.read.schema(partCsvSchema).option("header", "true").csv(dir)
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("p_size")).as("sum_size"),
          round(sum(col("p_retailprice")), 2).as("total_price"))
    }),

    // Hive-style partitioned layout: events written partitionBy the
    // type column, re-read with a partition-key filter — the scan
    // must touch ONLY the matching directory (PartitionFilters,
    // pinned in PlanSpec), the mechanism that turns a 100 TB scan
    // into a 4 TB one when queries slice on the layout key.
    "q110_partitioned_write" -> ((s, d) => {
      val dir = scratch("partwrite", d)
      Tables(s, d).events
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .filter(col("event_type") === "click")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }),

    // Nested-JSON interchange: each doc serialized with an array-of-
    // struct tags field, re-read through from_json with an explicit
    // nested schema, and the array INLINE-exploded back to long form
    // — the metadata-sidecar shape of every dataset exchange format.
    // The oracle rebuilds the long form relationally, so a row
    // proves the nested write→parse→explode path is lossless.
    // Catalog surface (the reference platform's Data-Catalog role):
    // a managed table registered via saveAsTable, re-resolved BY NAME
    // through the session catalog and aggregated — the decoupling of
    // "where the files live" from "what the table is called" that a
    // crawler/catalog provides. Overwrite keeps re-runs idempotent;
    // the warehouse lives in tmp (GraftSession), never the repo.
    "q184_catalog_table" -> ((s, d) => {
      val tbl = "graft_docs_" + Integer.toHexString(d.hashCode)
      // overwrite handles a table the CATALOG knows about, but a
      // fresh session (in-memory catalog) plus a stale warehouse dir
      // from a killed earlier run fails with LOCATION_ALREADY_EXISTS
      // — clear the orphaned location first (it is ours by
      // construction: content-addressed name under the graft
      // warehouse in tmp)
      if (!s.catalog.tableExists(tbl)) {
        graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(
          s.conf.get("spark.sql.warehouse.dir")
            .stripPrefix("file:"), tbl.toLowerCase))
      }
      Tables(s, d).documents
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .write.mode("overwrite").saveAsTable(tbl)
      require(s.catalog.tableExists(tbl), s"catalog must resolve $tbl")
      s.table(tbl)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    }),

    // Bucketed co-located fact–fact join: both facts land as
    // managed tables bucketBy(8, join key), then join via
    // sort-merge — the bucket layout IS the exchange, paid once at
    // ingest and amortized across every downstream join on that
    // key. The join itself plans with ZERO shuffle (PlanSpec pins
    // exactly one Exchange in the whole plan — the final
    // aggregate); at 100 TB that is the difference between
    // re-shuffling two facts on every query and a layout decision.
    // Money sums as exact integer cents (CLAUDE.md discipline).
    "q253_bucketed_join" -> ((s, d) => {
      val suf = Integer.toHexString(d.hashCode)
      val tOrd = s"graft_bkt_orders_$suf"
      val tLin = s"graft_bkt_lineitem_$suf"
      clearStaleLocation(s, tOrd)
      clearStaleLocation(s, tLin)
      val t = Tables(s, d)
      t.orders.select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(tOrd)
      t.lineitem.select(col("l_orderkey"), col("l_quantity"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(tLin)
      val o = s.table(tOrd)
      val l = s.table(tLin)
      o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(col("cents")).as("sum_cents"))
    }),

    // XML scalar functions (xpath_*): column-built XML round-tripped
    // through typed xpath extraction — the XML-bearing-column path
    // (feeds, sitemaps, legacy exports) without needing a file
    // source. Oracle: the original columns (lossless extraction).
    "q225_xpath_roundtrip" -> ((s, d) => {
      Tables(s, d).documents
        .withColumn("xml", concat(lit("<doc><lang>"), col("lang"),
          lit("</lang><src>"), col("source"), lit("</src><n>"),
          col("n_chars").cast("string"), lit("</n></doc>")))
        .select(col("doc_id"),
          expr("xpath_string(xml, '/doc/lang')").as("lang2"),
          expr("xpath_string(xml, '/doc/src')").as("src2"),
          expr("xpath_long(xml, '/doc/n')").as("n2"))
    }),

    "q181_nested_json" -> ((s, d) => {
      val tagsSchema = org.apache.spark.sql.types.DataType
        .fromDDL("doc_id BIGINT, tags ARRAY<STRUCT<k: STRING, v: STRING>>")
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      Tables(s, d).documents
        .select(to_json(struct(col("doc_id"), array(
          struct(lit("lang").as("k"), col("lang").as("v")),
          struct(lit("src").as("k"), col("source").as("v"))).as("tags"))).as("j"))
        .select(from_json(col("j"), tagsSchema).as("p"))
        .select(col("p.doc_id").as("doc_id"), explode(col("p.tags")).as("tag"))
        .select(col("doc_id"), col("tag.k").as("k"), col("tag.v").as("v"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q253_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                sum(l_quantity)::BIGINT AS sum_qty,
                sum(round(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_cents
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "q225_xpath_roundtrip" ->
      """SELECT doc_id, lang AS lang2, source AS src2,
                n_chars::BIGINT AS n2
         FROM documents""",
    "q184_catalog_table" ->
      """SELECT source, lang, count(*) AS n_docs,
                sum(n_chars)::BIGINT AS total_chars
         FROM documents GROUP BY 1, 2""",
    "q181_nested_json" ->
      """SELECT doc_id, 'lang' AS k, lang AS v FROM documents
         UNION ALL
         SELECT doc_id, 'src', source FROM documents""",
    "q110_partitioned_write" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
                count(DISTINCT user_id) AS n_users
         FROM events WHERE event_type = 'click' GROUP BY 1""",
    "q87_orc_roundtrip" ->
      """SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
         FROM documents GROUP BY 1""",
    "q88_csv_roundtrip" ->
      """SELECT p_type, count(*) AS n_parts, sum(p_size)::BIGINT AS sum_size,
                round(sum(p_retailprice), 2) AS total_price
         FROM part GROUP BY 1"""
  )
}
