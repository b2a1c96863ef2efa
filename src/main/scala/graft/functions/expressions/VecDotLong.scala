package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native integer dot product over two `array<long>` columns — the
  * scoring kernel for QUANTIZED vector serving (int8 codes widened
  * to long). Integer arithmetic means the score is EXACT: rank
  * orders are reproducible bit-for-bit across engines and cluster
  * sizes, unlike float dot products that accumulate differently
  * per partitioning.
  *
  * Overflow safety under ANSI mode: int8 codes are ≤ 255, so a
  * 64-dim dot is ≤ 64·255² ≈ 4.2e6 — a long accumulator has ~12
  * orders of magnitude of headroom; codes up to ~2^27 with 2^9
  * dims remain safe. Sums run in a single fused codegen loop (the
  * higher-order `aggregate`/`zip_with` form pays interpreter
  * overhead per element — see VecCosine).
  *
  * Null array → null; length mismatch → null (a truncated score
  * would silently accept a corrupt code row).
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0L; var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $dot = 0L;
          int $n = $a.numElements();
          for (int $i = 0; $i < $n; $i++) {
            $dot += $a.getLong($i) * $b.getLong($i);
          }
          ${ev.value} = $dot;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}
