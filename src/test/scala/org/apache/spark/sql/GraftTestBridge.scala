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

  /** Every file-source input file an EXECUTED SparkPlan read —
    * collected from each `FileSourceScanExec`'s file index (which,
    * for a manifest-pruned read, holds exactly the pruned member
    * paths), descending into AQE subtrees and subqueries. Feed it
    * from a QueryExecutionListener to pin the file IO of an eager
    * multi-action operator (a foldBatch).
    */
  def fileScanInputs(plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          out ++= f.relation.location.inputFiles
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }

  /** Every file-source input file a DataFrame's plan would scan —
    * read from the ANALYZED plan's `HadoopFsRelation` locations, so a
    * spec can pin WHICH member files a pruned stored-index read opens
    * without executing the frame. Frames hidden behind an eager
    * `localCheckpoint` (already-materialized inputs) contribute
    * nothing, which is exactly right: only scans the returned plan
    * would still run are counted.
    */
  def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten
}
