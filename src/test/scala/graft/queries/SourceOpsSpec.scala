package graft.queries

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Format round-trip robustness beyond the happy-path driver
  * queries: hostile CSV values (delimiters, quotes, newlines,
  * unicode, nulls) and ORC nulls/extreme numerics must survive a
  * write→read cycle byte-for-byte. The oracle gate proves q87/q88
  * on the benchmark tables; these pin the corner cases those tables
  * don't contain.
  */
class SourceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-srcspec-$tag").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("x", DoubleType)))

  private val hostile = Seq(
    Row(1L, "plain", 1.5),
    Row(2L, "comma, inside", -0.25),
    Row(3L, "quote \" inside", 1e300),
    Row(4L, "newline\ninside", java.lang.Double.MIN_VALUE),
    Row(5L, "unicode ünïcodé — dash", 0.1),          // 0.1 is inexact in binary
    Row(6L, null, null),
    Row(7L, "", 0.0),
    Row(8L, "tab\tinside", -1e-300))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(hostile, 2), schema)

  test("CSV round-trip preserves hostile strings and exact doubles (multiLine + null marker)") {
    val dir = tmp("csv")
    // CSV collapses null and "" unless the writer emits an explicit
    // null marker — the recipe a lossless text-format exchange needs:
    // nullValue on BOTH sides, multiLine on read for embedded newlines
    df.write.mode("overwrite").option("header", "true")
      .option("nullValue", "\\N").csv(dir)
    val back = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true")
      .option("nullValue", "\\N").csv(dir)
    assert(back.count() == hostile.size)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(6L).isNullAt(1), "null string must stay null")
    assert(byId(7L).getString(1) == "", "empty string must stay empty")
  }

  test("CSV without a null marker collapses null and empty string — the documented lossy mode") {
    val dir = tmp("csvnull")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").csv(dir)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    // both arrive as null: the asymmetry q88 avoids by aggregating
    // only non-string-null columns
    assert(byId(6L).isNullAt(1) && byId(7L).isNullAt(1))
  }

  test("ORC round-trip preserves nulls, unicode, and extreme doubles bitwise") {
    val dir = tmp("orc")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("ORC scan prunes columns and pushes filters") {
    val dir = tmp("orcplan")
    df.write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("id") > 3).select("id", "s")
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("id") && !read.contains("\"x\""), s"column not pruned: $read")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("id"), s"filter not pushed: $pushed")
  }

  test("JSONL round-trip preserves hostile strings (q351's write+read path)") {
    // q351's oracle gates aggregate parity on the benign fixture; this
    // pins the escaping corner cases: embedded quotes, newlines, tabs,
    // unicode, and backslashes must survive the JSON writer's escape +
    // the reader's unescape byte-for-byte. Null string stays null and
    // empty stays empty — JSONL, unlike bare CSV, distinguishes them
    // without a null-marker convention.
    val dir = tmp("jsonl")
    val withBackslash = hostile :+ Row(9L, "back\\slash \\n literal", 2.0)
    val jdf = spark.createDataFrame(
      spark.sparkContext.parallelize(withBackslash, 2), schema)
    jdf.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == withBackslash.size)
    assert(back.exceptAll(jdf).isEmpty && jdf.exceptAll(back).isEmpty)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(6L).isNullAt(1), "null string must stay null")
    assert(byId(7L).getString(1) == "", "empty string must stay empty")
    assert(byId(4L).getString(1) == "newline\ninside")
    assert(byId(9L).getString(1) == "back\\slash \\n literal")
  }
}
