package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Drop the elements of a token array whose 1-BASED positions appear
  * in a SORTED removal-position array — one merge walk, O(tokens +
  * |rm|). This is the rewrite step of repeated-span excision (q479):
  * the composed form `filter(toks, (t, i) => !array_contains(rm,
  * i + 1))` runs an interpreted lambda PER TOKEN and a linear
  * `array_contains` scan inside it — O(tokens × |rm|) per document,
  * where a heavily-boilerplated doc's removal set covers most of its
  * positions. The merge walk advances one pointer through each array
  * instead (both are ascending), allocation-free until the single
  * output array.
  *
  * PRECONDITION (caller-enforced, as with [[SortedIntersectCount]]):
  * `rm` ascending and duplicate-free — the excision builds it with
  * `array_sort(collect_set(p))`. Positions in `rm` outside
  * [1, |toks|] are simply never matched (harmless). Null array on
  * either side → null (callers guard the no-removals case with
  * `when(rm.isNull, ...)`).
  */
case class ExcisePositions(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))

  // pass the token array's type through verbatim (nullability incl.)
  override def dataType: DataType = left.dataType

  override def nullSafeEval(t: Any, r: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val rm = r.asInstanceOf[ArrayData]
    val n = toks.numElements(); val m = rm.numElements()
    val kept = new Array[AnyRef](n)
    var k = 0; var j = 0; var i = 0
    while (i < n) {
      val p = i + 1
      while (j < m && rm.getInt(j) < p) j += 1
      if (!(j < m && rm.getInt(j) == p)) {
        kept(k) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, rm) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val kept = ctx.freshName("kept"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val gad = classOf[GenericArrayData].getName
      s"""
        int $n = $toks.numElements(); int $m = $rm.numElements();
        Object[] $kept = new Object[$n];
        int $k = 0; int $j = 0;
        for (int $i = 0; $i < $n; $i++) {
          int $p = $i + 1;
          while ($j < $m && $rm.getInt($j) < $p) { $j++; }
          if (!($j < $m && $rm.getInt($j) == $p)) {
            $kept[$k++] = $toks.isNullAt($i) ? null : $toks.getUTF8String($i);
          }
        }
        ${ev.value} = new $gad(java.util.Arrays.copyOf($kept, $k));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExcisePositions =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "excise_positions"
}
