package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the lake-maintenance operators beyond the
  * oracle gate: bookmark exactly-once across three runs, schema
  * evolution null semantics, compaction layout invariants, and the
  * multiset set-op partition law.
  */
class LakeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q162 bookmark: run 2 processes exactly drop 2, a third run processes nothing") {
    val got = LakeOps.queries("q162_bookmark_ingest")(spark, sf)
    val t = Tables(spark, sf)
    val expected = t.events.filter(col("event_id") % 10 >= 7)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotMap = got.select("event_type", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotMap == expected,
      "run 2 must aggregate exactly the second drop's rows")

    // a third run with no new landing files must be an incremental
    // no-op: the ledger already covers every file
    val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft-bookmark-" + Integer.toHexString(sf.hashCode))
    val ledger = base.resolve("ledger.txt")
    val seen = scala.io.Source.fromFile(ledger.toFile).getLines().toSet
    val landing = base.resolve("landing").toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(landing.nonEmpty && landing.subsetOf(seen),
      "after run 2 the ledger must cover every landed file")
  }

  test("q163 schema evolution: pre-evolution rows surface with null rev, none dropped") {
    val got = LakeOps.queries("q163_schema_evolution")(spark, sf)
      .agg(sum(col("n_docs")), sum(col("n_with_rev"))).collect()(0)
    val docs = Tables(spark, sf).documents
    assert(got.getLong(0) == docs.count())
    assert(got.getLong(1) == docs.filter(col("doc_id") % 2 === 1).count())
  }

  test("q164 compaction: exactly 4 output files, content unchanged") {
    val row = LakeOps.queries("q164_compaction")(spark, sf).collect()(0)
    assert(row.getLong(0) == 4L, "compacted layout must be exactly 4 files")
    assert(row.getLong(1) == Tables(spark, sf).events.count())
  }

  test("intersectAll + exceptAll partition the left multiset (q158/q159 law)") {
    val inter = Relational.queries("q158_intersect_all")(spark, sf).count()
    val exc = Relational.queries("q159_except_all")(spark, sf).count()
    val left = Tables(spark, sf).orders
      .filter(col("o_orderstatus") === "O").count()
    assert(inter + exc == left,
      "multiset law |A ∩all B| + |A \\all B| = |A| must hold")
  }

  test("q160 recursive CTE: final running total equals the order count") {
    val cum = Relational.queries("q160_recursive_cte")(spark, sf)
    val last = cum.orderBy(col("month").desc).select("cum_n").limit(1)
      .collect()(0).getLong(0)
    assert(last == Tables(spark, sf).orders.count(),
      "last month's cumulative count must equal total orders")
    assert(cum.select("month").distinct().count() == cum.count(),
      "one row per month")
  }

  test("q223: written footers carry a bloom filter for user_id only; files are key-sorted") {
    // run the query (it writes the layout as a side effect)
    assert(LakeOps.queries("q223_bloom_layout")(spark, sf).count() > 0)
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft-bloomlayout-" + Integer.toHexString(sf.hashCode))
    val files = java.nio.file.Files.list(dir)
    val parquets =
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
      } finally files.close()
    assert(parquets.nonEmpty, s"no parquet files under $dir")
    val conf = new org.apache.hadoop.conf.Configuration()
    parquets.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        conf, new org.apache.hadoop.fs.Path(p.toUri))
      try {
        import scala.jdk.CollectionConverters._
        val rgs = reader.getFooter.getBlocks.asScala
        assert(rgs.nonEmpty)
        rgs.foreach { rg =>
          val byName = rg.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          assert(byName("user_id").getBloomFilterOffset >= 0,
            s"user_id bloom filter missing in $p")
          assert(byName("event_type").getBloomFilterOffset < 0,
            "bystander column must not pay for a bloom filter")
        }
        // sorted-by-key layout: user_id min/max monotone across the
        // file's row groups
        val ranges: Seq[(Long, Long)] = rgs.map { rg =>
          val st = rg.getColumns.asScala
            .find(_.getPath.toDotString == "user_id").get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        }.toSeq
        ranges.zip(ranges.drop(1)).foreach { case ((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"row groups out of key order in $p")
        }
      } finally reader.close()
    }
  }
}
