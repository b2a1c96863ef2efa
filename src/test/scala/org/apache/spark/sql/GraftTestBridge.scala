package org.apache.spark.sql

import org.apache.spark.SparkContext
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Test-only accessors for `private[spark]` / `private[sql]` surface
  * the unpartitioned-window tripwire needs (the same pattern as
  * [[GraftColumnBridge]] on the main side):
  *
  *  - flushing the async listener bus, so QueryExecutionListener
  *    events from a query (including its eager localCheckpoint
  *    executions) are fully delivered BEFORE the next query runs —
  *    without the flush, hit attribution races across queries;
  *  - walking an executed plan INTO AQE subtrees
  *    ([[AdaptiveSparkPlanExec]] is a leaf node whose real plan hangs
  *    off `executedPlan`, invisible to a plain `children` walk).
  */
object GraftTestBridge {

  /** Block until every queued listener event has been dispatched. */
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Every [[WindowExec]] in `plan` whose partition spec is EMPTY —
    * the "move all data to a single partition" shape — rendered as a
    * short signature (window expressions + order), descending into
    * AQE subtrees and subqueries.
    */
  def unpartitionedWindows(plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          out += (w.windowExpression.map(_.sql).mkString(", ") +
            " ORDER BY " + w.orderSpec.map(_.sql).mkString(", ")).take(160)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        // AQE wraps every stage — including, since Spark 4, the
        // RESULT stage — in leaf QueryStageExec nodes whose real
        // subtree hangs off `plan`; a plain children walk sees none
        // of it
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }
}
