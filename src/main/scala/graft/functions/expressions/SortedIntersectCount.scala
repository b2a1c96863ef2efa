package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED, duplicate-free `array<long>` columns via a
  * single merge walk — no hash set, no materialized intersection
  * array. This is the verify-stage inner loop of the exact Jaccard
  * joins (millions of candidate pairs × set arrays):
  * `size(array_intersect(a, b))` builds an OpenHashSet and an output
  * ArrayData per pair just to take its length; the merge walk does
  * the same count allocation-free, and the union size follows as
  * `|A| + |B| − |A∩B|`.
  *
  * PRECONDITION (caller-enforced, as with Spark's own sortmerge
  * operators): both arrays ascending and distinct — the Jaccard core
  * builds them with `array_sort` over set-valued hashes. Null array →
  * null count.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // SQL-surface safety: array<int> literals coerce to array<long>
  // instead of getLong reading 8-byte strides over 4-byte slots
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
        int $na = $a.numElements(); int $nb = $b.numElements();
        int $i = 0; int $j = 0; long $c = 0L;
        while ($i < $na && $j < $nb) {
          long $xi = $a.getLong($i); long $yj = $b.getLong($j);
          if ($xi < $yj) { $i++; }
          else if ($xi > $yj) { $j++; }
          else { $c++; $i++; $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}
