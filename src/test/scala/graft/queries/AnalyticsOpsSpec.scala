package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-4 analytics operators — invariants
  * the row-hash oracle can't express (the oracle proves equality
  * with DuckDB; these prove the CONTRACT both engines implement is
  * the intended one).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("SCD2: dense versions, contiguous intervals, exactly one open version per user") {
    val scd = SparkEntry.queries("q86_scd2")(spark, sf).cache()
    try {
      // exactly one current (open-ended) version per user
      val multiCurrent = scd.groupBy("user_id")
        .agg(sum(col("is_current")).as("n_open"))
        .filter(col("n_open") =!= 1).count()
      assert(multiCurrent == 0)
      // versions are dense 1..n per user
      val dense = scd.groupBy("user_id")
        .agg(count(lit(1)).as("n"), max(col("version")).as("mx"),
          min(col("version")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
      assert(dense == 0)
      // interval chain: version n's valid_to equals version n+1's valid_from
      val a = scd.select(col("user_id"), col("version"), col("valid_to"))
      val b = scd.select(col("user_id"), (col("version") - 1).as("version"),
        col("valid_from").as("next_from"))
      val broken = a.join(b, Seq("user_id", "version"))
        .filter(col("valid_to") =!= col("next_from")).count()
      assert(broken == 0)
    } finally scd.unpersist()
  }

  test("incremental SCD2 equals the full rebuild at any cutoff (including all-delta and no-delta)") {
    val full = SparkEntry.queries("q86_scd2")(spark, sf).cache()
    try {
      // the driver-gate cutoff plus both degenerate splits
      for (cut <- Seq("2024-01-24 00:00:00", "2023-01-01 00:00:00", "2025-01-01 00:00:00")) {
        val ev = graft.Tables(spark, sf).events
          .select(col("user_id"), col("event_id"),
            col("event_type").as("state"), col("ts"))
        val cutoff = lit(cut).cast("timestamp")
        val priorRaw = ev.filter(col("ts") < cutoff)
        val delta = ev.filter(col("ts") >= cutoff)
        val affected = delta.select("user_id").distinct()
        // mirror q105's composition with this cutoff
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        def build(df: org.apache.spark.sql.DataFrame) =
          df.select(col("user_id"), col("event_id"), col("state"),
            row_number().over(w).cast("long").as("version"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
            date_format(lead(col("ts"), 1).over(w), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
            when(lead(col("ts"), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)).as("is_current"))
        val inc = build(priorRaw).join(affected, Seq("user_id"), "left_anti")
          .unionByName(build(
            priorRaw.join(affected, Seq("user_id"), "left_semi").unionByName(delta)))
        assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
          s"incremental != full at cutoff $cut")
      }
    } finally full.unpersist()
  }

  test("funnel: stages in range and monotone (each stage a subset of the previous)") {
    val f = SparkEntry.queries("q96_funnel")(spark, sf).cache()
    try {
      assert(f.filter(col("stage") < 0 || col("stage") > 3).count() == 0)
      val ev = graft.Tables(spark, sf).events
      // stage >= 1 requires a view event; stage >= 3 requires a purchase
      val viewers = ev.filter(col("event_type") === "view")
        .select("user_id").distinct()
      val noView = f.filter(col("stage") >= 1)
        .join(viewers, Seq("user_id"), "left_anti").count()
      assert(noView == 0)
      val purchasers = ev.filter(col("event_type") === "purchase")
        .select("user_id").distinct()
      val noPurchase = f.filter(col("stage") === 3)
        .join(purchasers, Seq("user_id"), "left_anti").count()
      assert(noPurchase == 0)
    } finally f.unpersist()
  }

  test("quantization: codes in [0,255] and reconstruction error within one bucket") {
    val q = SparkEntry.queries("q95_embed_quantize")(spark, sf)
    val e = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("x").cast("double").as("x"))
    val stats = e.groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val bad = q.join(e, Seq("vec_id", "dim")).join(stats, "dim")
      .withColumn("s", (col("mx") - col("mn")) / 255.0)
      .withColumn("xhat", col("mn") + col("q") * col("s"))
      // x lies in [xhat, xhat + s] (floor maps each x to its bucket's
      // left edge; the top code also absorbs x = mx exactly)
      .filter(col("q") < 0 || col("q") > 255 ||
        col("x") < col("xhat") - lit(1e-9) ||
        col("x") > col("xhat") + col("s") + lit(1e-9))
      .count()
    assert(bad == 0)
  }

  test("stream-stream join equals the batch range join") {
    val streaming = SparkEntry.queries("q94_stream_join")(spark, sf)
      .select("user_id", "click_id", "purchase_id")
    val ev = graft.Tables(spark, sf).events
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") && col("pts") < col("cts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "click_id", "purchase_id")
    assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty)
  }

  test("fuzzy match: canonical pairs, distances honest") {
    val m = SparkEntry.queries("q102_fuzzy_match")(spark, sf).cache()
    try {
      assert(m.filter(col("a_id") >= col("b_id")).count() == 0)
      assert(m.filter(col("dist") > 3 || col("dist") < 0).count() == 0)
      // re-derive one pair's distance through the scalar function
      val row = m.limit(1).join(graft.Tables(spark, sf).part
          .select(col("p_partkey").as("a_id"), col("p_name").as("an")), "a_id")
        .join(graft.Tables(spark, sf).part
          .select(col("p_partkey").as("b_id"), col("p_name").as("bn")), "b_id")
        .select(col("dist"), levenshtein(col("an"), col("bn")).cast("long").as("re"))
        .collect().head
      assert(row.getLong(0) == row.getLong(1))
    } finally m.unpersist()
  }
}
