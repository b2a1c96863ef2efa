package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the whole-operator form of `AsOfJoin`'s
  * union+window composition: a custom logical node, a planner
  * Strategy, and a sort-merge physical operator, the (c) rung of the
  * custom-operator ladder (compose → Expression → LogicalPlan +
  * Strategy + SparkPlan).
  *
  * Semantics (identical to `graft.operators.AsOfJoin`, A/B-pinned in
  * `NativeAsOfJoinSpec`): for every left row, attach the value
  * columns of the right row with the greatest `rightTs <= leftTs`
  * (backward) or smallest `rightTs >= leftTs` (forward) for the same
  * key; unmatched and null-key/ts left rows surface with null value
  * columns; null-key/ts right rows never match.
  *
  * Physical shape: both children hash-clustered on the key and
  * sorted (key, ts) — EnsureRequirements inserts exactly one
  * exchange + one sort per side — then a single streaming merge walk
  * per partition holds ONE candidate row of state (backward) or a
  * one-row lookahead (forward). Per-partition cost is
  * O(|L| + |R|) with O(1) state: no union materialization, no
  * window buffering, no last(ignoreNulls) carry chain — the operator
  * a 100 TB × 100 TB as-of enrichment wants.
  */
object NativeAsOfJoin {

  /** Logical node. Built PRE-RESOLVED (all expressions are
    * attributes of the analyzed children), so the analyzer passes it
    * through unchanged and DeduplicateRelations never has to guess
    * about key/value expression rewrites.
    *
    * `valueOutput` (the node-produced nullable copies of the right
    * value columns) is a CONSTRUCTOR field, minted exactly once by
    * the builder: computing it inside `output` would re-mint fresh
    * expression ids on every tree copy (ColumnPruning, AQE
    * re-planning), detaching every downstream reference.
    */
  case class AsOfJoinNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Attribute,
      leftTs: Attribute,
      rightKey: Attribute,
      rightTs: Attribute,
      rightValues: Seq[Attribute],
      valueOutput: Seq[Attribute],
      forward: Boolean) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ valueOutput
    // declared node-produced — without this the node reports
    // missingInput (the `!` plan marker)
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(valueOutput)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: AsOfJoinNode =>
        AsOfJoinExec(planLater(n.left), planLater(n.right),
          n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.rightValues,
          n.forward, n.left.output ++ n.valueOutput) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Attribute,
      leftTs: Attribute,
      rightKey: Attribute,
      rightTs: Attribute,
      rightValues: Seq[Attribute],
      forward: Boolean,
      override val output: Seq[Attribute]) extends BinaryExecNode {

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) ::
        ClusteredDistribution(rightKey :: Nil) :: Nil

    // The right side also orders by the payload columns: (key, ts)
    // duplicates then resolve deterministically to the MAX payload
    // backward (last duplicate consumed wins) and the MIN payload
    // forward (first head wins) — bit-identical to the composed
    // operator's max/min-struct collapse.
    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
          rightValues.map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    // left (key, ts) order survives the merge walk
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(
        output.drop(left.output.size))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    protected override def doExecute(): RDD[InternalRow] = {
      val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
      val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
      val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
      val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
      val keyOrd = GraftColumnBridge.interpretedOrdering(leftKey.dataType)
      val tsOrd = GraftColumnBridge.interpretedOrdering(leftTs.dataType)
      val rightVals = rightValues
      val rightOut = right.output
      val leftOut = left.output
      val fwd = forward
      // the common case — long/int/timestamp/date keys — walks on
      // primitive longs: ordinal reads + '<' comparisons, no per-row
      // eval() boxing and no interpreted-ordering virtual dispatch
      val fastGetters = for {
        lkG <- NativeAsOfJoin.longGetter(leftKey, leftOut)
        ltG <- NativeAsOfJoin.longGetter(leftTs, leftOut)
        rkG <- NativeAsOfJoin.longGetter(rightKey, rightOut)
        rtG <- NativeAsOfJoin.longGetter(rightTs, rightOut)
      } yield (lkG, ltG, rkG, rtG)
      // string keys with a long-backed ts: direct UTF8String binary
      // compares (identical to Spark's StringType sort order), no
      // eval() boxing, no interpreted-ordering dispatch — the key is
      // only cloned when a backward candidate is captured, never per
      // head refresh
      val fastStrGetters = if (fastGetters.isDefined) None else for {
        lkG <- NativeAsOfJoin.strGetter(leftKey, leftOut)
        ltG <- NativeAsOfJoin.longGetter(leftTs, leftOut)
        rkG <- NativeAsOfJoin.strGetter(rightKey, rightOut)
        rtG <- NativeAsOfJoin.longGetter(rightTs, rightOut)
      } yield (lkG, ltG, rkG, rtG)

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val rValProj = UnsafeProjection.create(rightVals, rightOut)
        val resultProj = UnsafeProjection.create(
          (leftOut ++ rightVals).zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, nullable = true)
          })
        val nullVals = new GenericInternalRow(rightVals.size)
        val joined = new JoinedRow
        val rBuf = rIter.buffered

        if (fastGetters.isDefined) {
          val (lkG, ltG, rkG, rtG) = fastGetters.get
          // head cache: (key, ts) of the current right head, refreshed
          // only when the buffer advances — each right row's key/ts is
          // decoded exactly once across the whole walk
          var headValid = false
          var headKey = 0L
          var headTs = 0L
          def refreshHead(): Boolean = {
            while (!headValid && rBuf.hasNext) {
              val hr = rBuf.head
              if (rkG.isNull(hr) || rtG.isNull(hr)) rBuf.next()
              else { headKey = rkG.get(hr); headTs = rtG.get(hr); headValid = true }
            }
            headValid
          }
          var candSet = false
          var candKey = 0L
          var candVals: UnsafeRow = null

          lIter.map { lr =>
            if (lkG.isNull(lr) || ltG.isNull(lr)) {
              resultProj(joined(lr, nullVals))
            } else {
              val lk = lkG.get(lr)
              val lts = ltG.get(lr)
              if (!fwd) {
                var advance = true
                while (advance && refreshHead()) {
                  if (headKey < lk || (headKey == lk && headTs <= lts)) {
                    if (headKey == lk) {
                      candSet = true; candKey = lk
                      candVals = rValProj(rBuf.head).copy()
                    }
                    rBuf.next(); headValid = false
                  } else advance = false
                }
                resultProj(joined(lr,
                  if (candSet && candKey == lk) candVals else nullVals))
              } else {
                var advance = true
                while (advance && refreshHead()) {
                  if (headKey < lk || (headKey == lk && headTs < lts)) {
                    rBuf.next(); headValid = false
                  } else advance = false
                }
                val matched = refreshHead() && headKey == lk
                resultProj(joined(lr,
                  if (matched) rValProj(rBuf.head) else nullVals))
              }
            }
          }
        } else if (fastStrGetters.isDefined) {
          val (lkG, ltG, rkG, rtG) = fastStrGetters.get
          // head key/ts point INTO the buffered head row — valid until
          // rBuf.next(); headValid is cleared at every next(), so the
          // cache never outlives its row
          var headValid = false
          var headKey: UTF8String = null
          var headTs = 0L
          def refreshHead(): Boolean = {
            while (!headValid && rBuf.hasNext) {
              val hr = rBuf.head
              if (rkG.isNull(hr) || rtG.isNull(hr)) rBuf.next()
              else { headKey = rkG.get(hr); headTs = rtG.get(hr); headValid = true }
            }
            headValid
          }
          // candKey is retained across next() → owned clone
          var candKey: UTF8String = null
          var candVals: UnsafeRow = null

          lIter.map { lr =>
            if (lkG.isNull(lr) || ltG.isNull(lr)) {
              resultProj(joined(lr, nullVals))
            } else {
              val lk = lkG.get(lr)
              val lts = ltG.get(lr)
              if (!fwd) {
                var advance = true
                while (advance && refreshHead()) {
                  val c = headKey.compareTo(lk)
                  if (c < 0 || (c == 0 && headTs <= lts)) {
                    if (c == 0) {
                      candKey = headKey.clone()
                      candVals = rValProj(rBuf.head).copy()
                    }
                    rBuf.next(); headValid = false
                  } else advance = false
                }
                resultProj(joined(lr,
                  if (candKey != null && candKey.compareTo(lk) == 0) candVals
                  else nullVals))
              } else {
                var advance = true
                while (advance && refreshHead()) {
                  val c = headKey.compareTo(lk)
                  if (c < 0 || (c == 0 && headTs < lts)) {
                    rBuf.next(); headValid = false
                  } else advance = false
                }
                val matched = refreshHead() && headKey.compareTo(lk) == 0
                resultProj(joined(lr,
                  if (matched) rValProj(rBuf.head) else nullVals))
              }
            }
          }
        } else {
          // generic path: any atomic key/ts type via interpreted
          // orderings. eval'd UTF8String keys point into reused row
          // buffers — copy anything retained across next()
          def own(v: Any): Any = v match {
            case s: UTF8String => s.clone()
            case x => x
          }

          // backward state: payload + key of the last same-key right
          // row consumed with rts <= current lts
          var candKey: Any = null
          var candVals: UnsafeRow = null

          lIter.map { lr =>
            val lk = lKeyB.eval(lr)
            val lts = lTsB.eval(lr)
            if (lk == null || lts == null) {
              resultProj(joined(lr, nullVals))
            } else if (!fwd) {
              // consume right rows that are before-or-equal (key, ts)
              var advance = true
              while (advance && rBuf.hasNext) {
                val hr = rBuf.head
                val rk = rKeyB.eval(hr)
                val rts = rTsB.eval(hr)
                if (rk == null || rts == null) rBuf.next()
                else {
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0 || (c == 0 && tsOrd.compare(rts, lts) <= 0)) {
                    if (c == 0) {
                      candKey = own(rk)
                      candVals = rValProj(hr).copy()
                    }
                    rBuf.next()
                  } else advance = false
                }
              }
              val matched = candKey != null && keyOrd.compare(candKey, lk) == 0
              resultProj(joined(lr, if (matched) candVals else nullVals))
            } else {
              // forward: advance right strictly before (key, ts); the
              // surviving head (same key) is the earliest-later match —
              // NOT consumed, so later left rows can share it
              var advance = true
              while (advance && rBuf.hasNext) {
                val hr = rBuf.head
                val rk = rKeyB.eval(hr)
                val rts = rTsB.eval(hr)
                if (rk == null || rts == null) rBuf.next()
                else {
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0 || (c == 0 && tsOrd.compare(rts, lts) < 0)) rBuf.next()
                  else advance = false
                }
              }
              val matched = rBuf.hasNext && {
                val rk = rKeyB.eval(rBuf.head)
                rk != null && keyOrd.compare(rk, lk) == 0
              }
              resultProj(joined(lr, if (matched) rValProj(rBuf.head) else nullVals))
            }
          }
        }
      }
    }
  }

  /** Primitive row accessor for long-backed atomic types. A plain
    * `InternalRow => Long` lambda would box: Function1 specializes
    * on primitive ARGUMENT types only, and InternalRow is an AnyRef,
    * so calls route through the generic Object→Object bridge. An
    * abstract class with a monomorphic call site keeps the walk
    * allocation-free.
    */
  private[plans] abstract class LongGetter extends Serializable {
    def isNull(r: InternalRow): Boolean
    def get(r: InternalRow): Long
  }

  /** A getter when `a`'s type is long-backed (long/timestamp/int/
    * date/short/byte); None otherwise → the generic interpreted walk.
    */
  private[plans] def longGetter(a: Attribute,
      out: Seq[Attribute]): Option[LongGetter] = {
    import org.apache.spark.sql.types._
    val i = out.indexWhere(_.exprId == a.exprId)
    if (i < 0) None
    else a.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        Some(new LongGetter {
          def isNull(r: InternalRow): Boolean = r.isNullAt(i)
          def get(r: InternalRow): Long = r.getLong(i)
        })
      case IntegerType | DateType =>
        Some(new LongGetter {
          def isNull(r: InternalRow): Boolean = r.isNullAt(i)
          def get(r: InternalRow): Long = r.getInt(i).toLong
        })
      case ShortType =>
        Some(new LongGetter {
          def isNull(r: InternalRow): Boolean = r.isNullAt(i)
          def get(r: InternalRow): Long = r.getShort(i).toLong
        })
      case ByteType =>
        Some(new LongGetter {
          def isNull(r: InternalRow): Boolean = r.isNullAt(i)
          def get(r: InternalRow): Long = r.getByte(i).toLong
        })
      case _ => None
    }
  }

  /** UTF8String accessor for StringType attributes; the returned
    * value points into the row's buffer — clone before retaining it
    * across an iterator advance.
    */
  private[plans] abstract class StrGetter extends Serializable {
    def isNull(r: InternalRow): Boolean
    def get(r: InternalRow): UTF8String
  }

  private[plans] def strGetter(a: Attribute,
      out: Seq[Attribute]): Option[StrGetter] = {
    import org.apache.spark.sql.types._
    val i = out.indexWhere(_.exprId == a.exprId)
    if (i < 0) None
    else a.dataType match {
      case StringType =>
        Some(new StrGetter {
          def isNull(r: InternalRow): Boolean = r.isNullAt(i)
          def get(r: InternalRow): UTF8String = r.getUTF8String(i)
        })
      case _ => None
    }
  }

  /** Register the planner strategy on a session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not found in ${plan.output.map(_.name).mkString(", ")}"))

  /** Backward as-of (latest `rightTs <= leftTs` per key). Column
    * names must be unambiguous within each side. The right side is
    * re-aliased defensively (fresh expression ids), so self-source
    * as-of joins (left and right carved from the same table) plan
    * cleanly.
    */
  def latestEarlier(left: DataFrame, right: DataFrame, leftKey: String,
      leftTs: String, rightKey: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame =
    build(left, right, leftKey, leftTs, rightKey, rightTs, rightValueCols,
      forward = false)

  /** Forward as-of (earliest `rightTs >= leftTs` per key). */
  def earliestLater(left: DataFrame, right: DataFrame, leftKey: String,
      leftTs: String, rightKey: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame =
    build(left, right, leftKey, leftTs, rightKey, rightTs, rightValueCols,
      forward = true)

  private def build(left: DataFrame, right: DataFrame, leftKey: String,
      leftTs: String, rightKey: String, rightTs: String,
      rightValueCols: Seq[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    // fresh exprIds on the right so a self-source join never collides
    val rFresh = right.toDF(right.columns.toIndexedSeq: _*)
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(rFresh)
    val rVals = rightValueCols.map(attr(rPlan, _))
    val (lk, lt) = (attr(lPlan, leftKey), attr(lPlan, leftTs))
    val (rk, rt) = (attr(rPlan, rightKey), attr(rPlan, rightTs))
    // fail fast on mismatched sides: keyOrd/tsOrd are built from the
    // LEFT types and applied to RIGHT eval values, so a long-vs-int
    // drift would otherwise surface as a ClassCastException deep in
    // the partition walk
    require(lk.dataType == rk.dataType,
      s"as-of key type mismatch: $leftKey is ${lk.dataType.simpleString}, " +
        s"$rightKey is ${rk.dataType.simpleString}")
    require(lt.dataType == rt.dataType,
      s"as-of ts type mismatch: $leftTs is ${lt.dataType.simpleString}, " +
        s"$rightTs is ${rt.dataType.simpleString}")
    // nested key/ts types are rejected because the walk's own() only
    // deep-copies UTF8String — an array/struct retained across
    // rBuf.next() would silently read reused buffers
    for (a <- Seq(lk, lt)) a.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType =>
        throw new IllegalArgumentException(
          s"as-of key/ts must be an atomic type; '${a.name}' is " +
            a.dataType.simpleString)
      case _ => ()
    }
    val node = AsOfJoinNode(lPlan, rPlan, lk, lt, rk, rt,
      rVals, rVals.map(_.withNullability(true).newInstance()), forward)
    GraftColumnBridge.ofRows(spark, node)
  }
}
