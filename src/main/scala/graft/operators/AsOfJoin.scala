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
  */
object AsOfJoin {

  def latestEarlier(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      leftTs: Column,
      rightKey: Column,
      rightTs: Column,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val leftStructType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rightVals = struct(rightValueCols.map(col): _*)

    val r = right
      // a null right timestamp can never satisfy ts >= rightTs, but
      // it would sort nulls-first and poison the carry-forward
      .filter(rightTs.isNotNull)
      .groupBy(rightKey.as("__k"), rightTs.as("__t"))
      .agg(max(rightVals).as("__v"))
      .withColumn("__side", lit(0))
      .withColumn("__l", lit(null).cast(leftStructType))

    val l = left.select(
      leftKey.as("__k"), leftTs.as("__t"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(r.schema("__v").dataType).as("__v"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.select("__k", "__t", "__side", "__l", "__v")
      .unionByName(l)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*)
  }

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
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val leftStructType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rightVals = struct(rightValueCols.map(col): _*)

    val r = right
      .filter(rightTs.isNotNull)
      .groupBy(rightKey.as("__k"), rightTs.as("__t"))
      .agg(min(rightVals).as("__v"))
      .withColumn("__side", lit(0))
      .withColumn("__l", lit(null).cast(leftStructType))

    val l = left.select(
      leftKey.as("__k"), leftTs.as("__t"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(r.schema("__v").dataType).as("__v"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.select("__k", "__t", "__side", "__l", "__v")
      .unionByName(l)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
