package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resample + last-observation-carried-forward — the
  * reusable densify/fill primitive behind q341, the feature-store
  * alignment every irregular event series needs before a model
  * consumes it.
  *
  * Per key: the [first, last] slot span is densified (`sequence` +
  * explode — grid size is span-bounded, never corpus-bounded), each
  * slot takes its LAST observation (max(struct) pick over (order,
  * value) — an aggregate, not a window), and gaps forward-fill via
  * the engine-portable fill-group trick: a running count of non-null
  * observations keys every gap row to the observation that heads it,
  * and a per-(key, group) max propagates the value — no IGNORE NULLS
  * dependence, bit-identical in any engine.
  *
  * `filled` marks carried rows. All windows are key-partitioned —
  * parallel at any key cardinality; a key's grid is its own span, so
  * skew follows the data's span skew, not its event skew.
  */
object Resample {

  def locfGrid(
      events: DataFrame,
      keyCol: String,
      orderCol: String, // integral event position (e.g. epoch micros)
      tieCol: String,   // unique within (key, order) — deterministic pick
      valueCol: String, // integral observation
      slotWidth: Long): DataFrame = {
    require(slotWidth > 0, s"slotWidth must be positive, got $slotWidth")
    // FLOOR division, matching the documented Math.floorDiv
    // reference semantics: plain `div` truncates toward zero, which
    // would merge the slots on either side of zero for negative
    // order values (epoch micros before 1970, signed deltas). Spark's
    // `%` carries the dividend's sign, so a negative remainder is
    // exactly the truncate-vs-floor disagreement case — subtract 1
    // there. Pure integer math, ANSI-safe (slotWidth > 0 required).
    val slotted = events
      .select(col(keyCol), col(orderCol), col(tieCol), col(valueCol))
      .withColumn("__slot", expr(
        s"$orderCol div ${slotWidth}L - " +
          s"(CASE WHEN $orderCol % ${slotWidth}L < 0 THEN 1L ELSE 0L END)"))
    val perSlot = slotted
      .groupBy(col(keyCol), col("__slot"))
      .agg(max(struct(col(orderCol), col(tieCol), col(valueCol))).as("__m"))
      .select(col(keyCol), col("__slot"),
        col(s"__m.$valueCol").as("__obs"))
    val grid = slotted.groupBy(col(keyCol))
      .agg(min(col("__slot")).as("__mn"), max(col("__slot")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"))).as("__slot"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, Seq(keyCol, "__slot"), "left")
      .withColumn("__fill",
        sum(when(col("__obs").isNotNull, 1L).otherwise(0L)).over(w))
      .withColumn(valueCol, max(col("__obs"))
        .over(Window.partitionBy(col(keyCol), col("__fill"))))
      .select(col(keyCol), col("__slot").as("slot"), col(valueCol),
        col("__obs").isNull.as("filled"))
  }
}
