package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4's
  * column-node architecture), plus the Dataset/ordering entry points
  * a planner extension needs. Lives inside the `org.apache.spark.sql`
  * package solely to satisfy the access modifiers — the standard
  * pattern for Catalyst extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an (already resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan behind a DataFrame (for building custom
    * logical nodes over existing frames).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Interpreted ordering for an atomic type's eval() values. */
  def interpretedOrdering(dt: DataType): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dt)
}
