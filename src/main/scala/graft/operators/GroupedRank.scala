package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}

/** Two-phase distributed ranking — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(lowCardCol).orderBy(...))`.
  *
  * A window partitioned by a LOW-cardinality key (event_type: 5
  * values, modality: 2) hands each key's ENTIRE corpus slice to one
  * task — correct at test scale, a single-reducer sort at 100 TB.
  * This operator produces the identical per-group `row_number` with
  * distributed machinery only (the q171/q293 two-phase shape, shared
  * with [[DistributedQuantile]]):
  *
  *   1. `repartitionByRange` on (group…, order…) — Spark's sampled
  *      range exchange; every group's rows land in key order across
  *      partitions, each partition sized by cluster parallelism,
  *      never by group cardinality.
  *   2. Local rank: a window partitioned by (partition-id, group…) —
  *      P parallel sorts of ~1/P of the data each.
  *   3. Offsets: per-(pid, group) counts — ≤ P·G rows, collected and
  *      prefix-summed on the driver (the q171 offset-table
  *      discipline; no window of ANY kind over an unpartitioned
  *      frame) and broadcast-joined back. rank = offset + local.
  *
  * The `localCheckpoint` pins one partition assignment so the count
  * action and the rank pass cannot see different samplings of the
  * range exchange. Order columns must make the per-group order TOTAL
  * (include a tiebreak) or ranks at partition boundaries are
  * nondeterministic.
  */
object GroupedRank {

  /** `df` plus column `rankName` = 1-based global row_number within
    * each `groups` key, ordered by `order` (which must be a total
    * order within the group). Runs P parallel window sorts
    * regardless of group cardinality.
    */
  def withRank(df: DataFrame, groups: Seq[String], order: Seq[Column],
               rankName: String, parts: Int = 0): DataFrame = {
    require(order.nonEmpty, "order columns required (must be total)")
    val s = df.sparkSession
    val gCols = groups.map(col)
    val p = if (parts > 0) parts
      else math.max(s.sparkContext.defaultParallelism, 2)
    val ranged = df.repartitionByRange(p, (gCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // __dis rides the same counts aggregate to enforce the TOTAL
    // order precondition at runtime (prose alone let q284 ship a
    // tied order): duplicate (group, order…) tuples make boundary
    // ranks nondeterministic, and because a range partition is a
    // pure function of the key, duplicates always co-locate — the
    // per-(pid, group) distinct count catches every violation.
    val countsDf = ranged
      .groupBy(col("__pid") +: gCols: _*)
      .agg(count(lit(1)).as("__cnt"),
        count_distinct(struct(order: _*)).as("__dis"))
    // ≤ P·G rows: prefix-sum per group on the driver, rebuild as a
    // broadcast offsets frame (row layout: __pid, groups…, __cnt)
    val cntIdx = groups.size + 1
    val collected = countsDf.collect()
    collected.foreach { r =>
      require(r.getLong(cntIdx) == r.getLong(cntIdx + 1),
        s"GroupedRank.withRank: order is not TOTAL within group " +
          s"${groups.zipWithIndex.map { case (g, i) => s"$g=${r.get(i + 1)}" }
            .mkString("(", ", ", ")")} — " +
          s"${r.getLong(cntIdx) - r.getLong(cntIdx + 1)} duplicate order " +
          "tuple(s); add a tiebreak column (ranks at partition " +
          "boundaries would be nondeterministic)")
    }
    val offRows = collected
      .groupBy(r => groups.indices.map(i => r.get(i + 1)))
      .valuesIterator.flatMap { rs =>
        val sorted = rs.sortBy(_.getInt(0))
        sorted.zip(sorted.map(_.getLong(cntIdx)).scanLeft(0L)(_ + _))
          .map { case (r, off) => Row.fromSeq(r.toSeq.dropRight(2) :+ off) }
      }.toSeq
    val offSchema = StructType(countsDf.schema.fields.dropRight(2) :+
      StructField("__off", LongType, nullable = false))
    val offsets = s.createDataFrame(offRows.asJava, offSchema)
    val wLocal = Window.partitionBy(col("__pid") +: gCols: _*)
      .orderBy(order: _*)
    ranged.withColumn("__li", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), "__pid" +: groups)
      .withColumn(rankName, col("__off") + col("__li"))
      .drop("__pid", "__li", "__off")
  }

  /** Ungrouped variant: the exact global row_number over `order`
    * (q171's shape) as a reusable call.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankName: String,
                     parts: Int = 0): DataFrame =
    withRank(df, Seq.empty, order, rankName, parts)

  /** `df` plus `totalName` = the GLOBAL running sum of `value` over
    * the total `order` — the sweep-line / cumulative-balance
    * primitive — without a single-task window: range-partition on
    * the order, cumsum within each partition in parallel, then add
    * each partition's offset (the sum of all earlier partitions,
    * prefix-summed on the driver from a ≤P-row per-partition totals
    * table, the q293 budget-allocation shape made reusable).
    *
    * `value` must be a non-null integral column (the per-partition
    * totals are read back as longs); `order` must be TOTAL — both
    * preconditions are enforced loudly by the same collected pass.
    */
  def withRunningTotal(df: DataFrame, order: Seq[Column], value: Column,
                       totalName: String, parts: Int = 0): DataFrame = {
    require(order.nonEmpty, "order columns required (must be total)")
    val valueType = df.select(value).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(valueType),
      s"GroupedRank.withRunningTotal: value must be integral " +
        s"(Byte/Short/Int/Long), got $valueType — a fractional value " +
        "would be silently truncated by the long cast on the " +
        "per-partition offsets; cast or round explicitly first")
    val s = df.sparkSession
    val p = if (parts > 0) parts
      else math.max(s.sparkContext.defaultParallelism, 2)
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val statsDf = ranged.groupBy(col("__pid"))
      .agg(sum(value).cast("long").as("__sum"), count(lit(1)).as("__cnt"),
        count_distinct(struct(order: _*)).as("__dis"),
        sum(when(value.isNull, 1L).otherwise(0L)).as("__nulls"))
    val rows = statsDf.collect().sortBy(_.getInt(0))
    rows.foreach { r =>
      require(r.getLong(4) == 0L,
        s"GroupedRank.withRunningTotal: value column contains nulls — a " +
          "running sum over nulls silently skips rows; coalesce first")
      require(r.getLong(2) == r.getLong(3),
        s"GroupedRank.withRunningTotal: order is not TOTAL " +
          s"(${r.getLong(2) - r.getLong(3)} duplicate order tuple(s)) — " +
          "intermediate running values would be nondeterministic; add a " +
          "tiebreak column")
    }
    val offRows = rows.zip(
        rows.scanLeft(0L)((acc, r) => acc + r.getLong(1)).init)
      .map { case (r, off) => Row(r.getInt(0), off) }.toSeq
    val offSchema = StructType(Seq(
      StructField("__pid", statsDf.schema.fields.head.dataType, nullable = false),
      StructField("__off", LongType, nullable = false)))
    val offsets = s.createDataFrame(offRows.asJava, offSchema)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__run", sum(value).over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(totalName, col("__off") + col("__run"))
      .drop("__pid", "__run", "__off")
  }

  /** One row per DISTINCT value of `valueCol`: (`__v`, `s2Name`),
    * where `s2Name` = TWICE the midrank (average competition rank,
    * the Spearman/Mann-Whitney tie convention) of that value in the
    * global ranking of `df`'s rows by `valueCol`. Doubling keeps the
    * statistic integral — a run of `cnt` equal values starting at
    * rank `r` has average rank `r + (cnt−1)/2`, so twice it is
    * `2·cum − cnt + 1` with `cum` the inclusive running count.
    * Join back on the value to midrank every row; rows never
    * shuffle — only the value-cardinality frame does, and its
    * cumulative count rides [[withRunningTotal]]'s range exchange
    * (never a one-task window). `valueCol` must be non-null
    * (filter/coalesce first — a null value-group would midrank
    * nondeterministically across engines).
    */
  def scaledMidranks(df: DataFrame, valueCol: Column,
                     s2Name: String): DataFrame = {
    val vals = df.groupBy(valueCol.as("__v")).agg(count(lit(1)).as("__cnt"))
    withRunningTotal(vals, Seq(col("__v")), col("__cnt"), "__cum")
      .select(col("__v"),
        (col("__cum") * 2 - col("__cnt") + 1).as(s2Name))
  }

  /** `df` plus `prevName` = `lag(orderCol, 1)` over the GLOBAL
    * `orderCol` order (total order required), computed without a
    * single-task window: range-partition on the key, lag within each
    * partition in parallel, then stitch each partition's first row
    * to its global predecessor — the previous non-empty partition's
    * max, computed on the driver from a ≤P-row bounds table. The
    * islands-and-gaps primitive at any scale.
    */
  def withGlobalLag(df: DataFrame, orderCol: Column, prevName: String,
                    parts: Int = 0): DataFrame = {
    val s = df.sparkSession
    val p = if (parts > 0) parts
      else math.max(s.sparkContext.defaultParallelism, 2)
    val ranged = df.repartitionByRange(p, orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // per-partition max key (≤ P rows): each partition's first row's
    // predecessor is the running max over all earlier partitions —
    // range partitioning guarantees that IS the global predecessor.
    // __nulls rides the same pass to enforce the no-nulls
    // precondition at runtime: null order values range-sort into the
    // first partition while max() ignores them, so the stitch would
    // silently skip rows — fail loud instead.
    val boundsDf = ranged.groupBy(col("__pid")).agg(max(orderCol).as("__mx"),
      sum(when(orderCol.isNull, 1L).otherwise(0L)).as("__nulls"))
    val sorted = boundsDf.collect().sortBy(_.getInt(0))
    val nNulls = sorted.map(_.getLong(2)).sum
    require(nNulls == 0,
      s"GroupedRank.withGlobalLag: order column contains $nNulls null " +
        "value(s) — nulls range-sort into the first partition and the " +
        "boundary max ignores them, so the stitched lag would silently " +
        "mis-order; filter or coalesce nulls before lagging")
    val prevRows = sorted.zip(
        sorted.scanLeft(null: Any)((acc, r) => r.get(1)).init)
      .map { case (r, prev) => Row(r.get(0), prev) }.toSeq
    val prevSchema = StructType(Seq(boundsDf.schema.fields.head,
      boundsDf.schema.fields(1).copy(name = "__prev_mx", nullable = true)))
    val bounds = s.createDataFrame(prevRows.asJava, prevSchema)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCol)
    ranged.withColumn("__lag", lag(orderCol, 1).over(wLocal))
      .join(broadcast(bounds), Seq("__pid"))
      .withColumn(prevName, coalesce(col("__lag"), col("__prev_mx")))
      .drop("__pid", "__lag", "__prev_mx")
  }
}
