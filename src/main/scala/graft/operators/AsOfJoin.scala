package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest-earlier match): each left row picks the value
  * columns of the right row with the greatest `rightTs <= leftTs`
  * for the same key — the standard time-series enrichment operator
  * Spark's join zoo lacks.
  *
  * Implementation is the scalable union+window form, NOT a range
  * join: tag both inputs, union them, sort each key's timeline once
  * (right rows before left rows at equal timestamps → inclusive
  * `<=`), and carry the last-seen right payload forward with
  * `last(ignoreNulls)` over an unbounded-preceding frame. One
  * shuffle + one sort over |L|+|R| rows, no pair explosion —
  * the plan you want when both sides are 100 TB fact tables.
  *
  * Right-side (key, ts) duplicates are collapsed to the max payload
  * struct first, so results are deterministic.
  *
  * Null contract (both directions): a left row with a NULL key or
  * NULL timestamp can never satisfy an as-of predicate (SQL equality
  * and ordering are both null-rejecting), so it surfaces in the
  * output UNMATCHED (right value columns null) — it is never dropped
  * and never allowed into the window walk, where null ordering
  * (nulls-last under a descending sort) would hand it an arbitrary
  * match. Null-key/ts right rows are filtered for the same reason.
  */
object AsOfJoin {

  def latestEarlier(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      leftTs: Column,
      rightKey: Column,
      rightTs: Column,
      rightValueCols: Seq[String]): DataFrame =
    impl(left, right, leftKey, leftTs, rightKey, rightTs, rightValueCols,
      forward = false)

  /** Forward as-of join (earliest-later match): each left row picks
    * the right row with the SMALLEST `rightTs >= leftTs` for the
    * same key — the "next event after" direction (e.g. first
    * fulfillment after an order). Same union+window scale shape as
    * [[latestEarlier]], with the timeline walked in descending
    * order so the carry-forward holds the nearest LATER right row;
    * right rows sort before left rows at equal timestamps, making
    * the match inclusive. Right (key, ts) duplicates collapse to
    * the min payload struct for determinism.
    */
  def earliestLater(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      leftTs: Column,
      rightKey: Column,
      rightTs: Column,
      rightValueCols: Seq[String]): DataFrame =
    impl(left, right, leftKey, leftTs, rightKey, rightTs, rightValueCols,
      forward = true)

  private def impl(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      leftTs: Column,
      rightKey: Column,
      rightTs: Column,
      rightValueCols: Seq[String],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    val leftStructType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rightVals = struct(rightValueCols.map(col): _*)

    val r = right
      // null right ts/key can never match, and a null ts would sort
      // into the timeline and poison the carry-forward
      .filter(rightTs.isNotNull && rightKey.isNotNull)
      .groupBy(rightKey.as("__k"), rightTs.as("__t"))
      .agg((if (forward) min(rightVals) else max(rightVals)).as("__v"))
      .withColumn("__side", lit(0))
      .withColumn("__l", lit(null).cast(leftStructType))

    val l = left.select(
      leftKey.as("__k"), leftTs.as("__t"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(r.schema("__v").dataType).as("__v"))
    // null-key/ts left rows bypass the window entirely → unmatched
    val lValid = l.filter(col("__k").isNotNull && col("__t").isNotNull)
    val lUnmatched = l.filter(col("__k").isNull || col("__t").isNull)
      .withColumn("__m", lit(null).cast(r.schema("__v").dataType))

    val w = Window.partitionBy(col("__k"))
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.select("__k", "__t", "__side", "__l", "__v")
      .unionByName(lValid)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .unionByName(lUnmatched)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
