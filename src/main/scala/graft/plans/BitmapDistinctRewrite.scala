package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BitmapBitPosition, BitmapBucketNumber, BitmapConstructAgg, BitmapCount, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite `count(DISTINCT intCol)` aggregates into
  * the two-phase bitmap-index form (the q186 shape, applied
  * AUTOMATICALLY to user queries):
  *
  * {{{
  *   Aggregate g, count(DISTINCT c)
  *     ⇒ Aggregate g, sum(bitmap_count(bm))
  *         Aggregate (g, bitmap_bucket_number(c)),
  *                   bitmap_construct_agg(bitmap_bit_position(c)) AS bm
  * }}}
  *
  * Why: a plain count(DISTINCT) shuffles one row per distinct
  * (group, value) pair; the bitmap form shuffles one FIXED 4 KiB
  * bit vector per (group, 32768-id bucket) — on a dense id domain
  * that is orders of magnitude less traffic, and the partial
  * aggregation is map-side mergeable. The result is EXACT: bucket
  * bitmaps partition the id space (nulls are dropped by the agg, a
  * null bucket contributes an empty bitmap — matching count
  * DISTINCT's null semantics).
  *
  * The trade is wrong on SPARSE domains (xxhash-style ids would pay
  * 4 KiB per value), which the optimizer cannot know from the
  * schema — so the rule is OPT-IN via
  * `spark.graft.rewrite.bitmapDistinct=true`, the same judgment
  * call a DBA makes when building a bitmap index.
  *
  * Wiring: `GraftExtensions` (spark.sql.extensions) injects it at
  * session build; `spark.experimental.extraOptimizations` attaches
  * it to a live session. Rewrites only resolved, non-streaming
  * aggregates whose grouping keys are plain attributes and whose
  * single aggregate is an unfiltered count(DISTINCT) of one
  * integral column — anything else passes through untouched.
  */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.rewrite.bitmapDistinct"

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** The single unfiltered count(DISTINCT integral) alias, if this
    * aggregate is eligible.
    */
  private def eligibleCount(agg: Aggregate): Option[Alias] = {
    if (!agg.resolved || agg.isStreaming) return None
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None
    val groupSet = agg.groupingExpressions.map(_.asInstanceOf[Attribute].exprId).toSet
    val (counts, rest) = agg.aggregateExpressions.partition {
      case Alias(ae: AggregateExpression, _) => ae.isDistinct
      case _ => false
    }
    val passthroughsOk = rest.forall {
      case a: Attribute => groupSet.contains(a.exprId)
      case _ => false
    }
    counts match {
      case Seq(a @ Alias(ae: AggregateExpression, _)) if passthroughsOk =>
        ae.aggregateFunction match {
          case Count(Seq(c))
              if ae.filter.isEmpty && ae.mode == Complete &&
                isIntegral(c) && c.deterministic =>
            Some(a)
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.getConfString(FLAG, "false") != "true") return plan
    plan.transformUp {
      case agg: Aggregate if eligibleCount(agg).isDefined =>
        val cntAlias = eligibleCount(agg).get
        val c = cntAlias.child.asInstanceOf[AggregateExpression]
          .aggregateFunction.asInstanceOf[Count].children.head
        val groupAttrs = agg.groupingExpressions.map(_.asInstanceOf[Attribute])

        // the bitmap scalar functions are RuntimeReplaceable, and
        // ReplaceExpressions has ALREADY run by the time injected
        // optimizer rules fire — insert their replacements directly
        // or eval() asserts at runtime
        val bucketExpr = BitmapBucketNumber(c).replacement
        val bucketAlias = Alias(bucketExpr, "__graft_bkt")()
        val bmAlias = Alias(
          AggregateExpression(
            BitmapConstructAgg(BitmapBitPosition(c).replacement),
            Complete, isDistinct = false),
          "__graft_bm")()
        val inner = Aggregate(
          groupAttrs :+ bucketExpr,
          (groupAttrs: Seq[NamedExpression]) ++ Seq(bucketAlias, bmAlias),
          agg.child)

        // coalesce to 0: count(DISTINCT) over empty input is 0 (and
        // non-nullable), but Sum over the zero inner rows of a
        // global (no-GROUP-BY) aggregate is NULL — without this the
        // rewrite silently changes an empty-input answer.
        val total = Alias(
          Coalesce(Seq(
            AggregateExpression(
              Sum(BitmapCount(bmAlias.toAttribute).replacement),
              Complete, isDistinct = false),
            Literal(0L))),
          cntAlias.name)(exprId = cntAlias.exprId)
        val outer = agg.aggregateExpressions.map {
          case Alias(ae: AggregateExpression, _) if ae.isDistinct => total
          case other => other
        }
        Aggregate(groupAttrs, outer, inner)
    }
  }
}
