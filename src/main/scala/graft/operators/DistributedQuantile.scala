package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact linear-interpolated quantiles computed DISTRIBUTED — the
  * scale-safe twin of `percentile(col, p)`.
  *
  * Spark's exact `percentile` aggregate buffers every value of the
  * group in one aggregation buffer: correct, but one reducer holds
  * the whole column — the classic 100 TB cliff. This operator gets
  * the same exact answer with distributed machinery only:
  *
  *   1. `repartitionByRange` on (value, tie) — Spark's sampled
  *      range exchange, the same primitive a distributed sort uses;
  *      partition i holds values entirely ≤ partition i+1's.
  *   2. Per-partition local index: a window PARTITIONED by the
  *      range-partition id — P parallel groups, never a global
  *      single-partition window.
  *   3. Partition offsets: aggregate P rows, prefix-sum over those
  *      P rows only, broadcast back (the q106 two-phase prefix-sum
  *      idiom). global_idx = offset + local_idx.
  *   4. The two rows bracketing position (n-1)·p + 1 are filtered
  *      out (≤ 2 rows per requested p) and interpolated with a
  *      conditional aggregate.
  *
  * Determinism: positions land on the 1/4 grid for p ∈ {.25,.75}
  * (exactly representable), interpolation weights are exact binary
  * fractions, and long values below 2^53 interpolate exactly — so
  * results hash-match DuckDB's `quantile_cont` bit for bit.
  */
object DistributedQuantile {

  /** One-row frame with one DOUBLE column per requested quantile,
    * named by `names`. `valueCol` must be integral (long-castable);
    * `tieCol` makes the global order total so retries/AQE cannot
    * reorder equal values across a bracket boundary.
    */
  def exactQuantiles(df: DataFrame, valueCol: Column, tieCol: Column,
                     ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty)
    val vals = df.select(valueCol.cast("long").as("v"), tieCol.as("t"))
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    val ranged = vals.repartitionByRange(parts, col("v"), col("t"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("v"), col("t"))
    val local = ranged.withColumn("li", row_number().over(wLocal))
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select("pid", "off")
    val indexed = local.join(broadcast(offsets), "pid")
      .withColumn("gi", col("off") + col("li"))
    val total = vals.agg(count(lit(1)).as("n"))
    // bracket rows for every requested p, then interpolate:
    // q = v_lo·(1-frac) + v_hi·frac; when frac = 0 the lo and hi
    // conditions coincide on one row and the hi term contributes 0.
    val withPos = indexed.crossJoin(broadcast(total))
    val bracketFilter = ps.map { case (_, p) =>
      val pos = (col("n") - 1) * p + 1
      col("gi") === floor(pos) || col("gi") === ceil(pos)
    }.reduce(_ || _)
    val aggs = ps.map { case (name, p) =>
      val pos = (col("n") - 1) * p + 1
      val frac = pos - floor(pos).cast("double")
      (sum(when(col("gi") === floor(pos),
        col("v").cast("double") * (lit(1.0) - frac)).otherwise(0.0)) +
        sum(when(col("gi") === ceil(pos) && col("gi") =!= floor(pos),
          col("v").cast("double") * frac).otherwise(0.0))).as(name)
    }
    withPos.filter(bracketFilter).agg(aggs.head, aggs.tail: _*)
  }
}
