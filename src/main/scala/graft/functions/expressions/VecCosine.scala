package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two `array<float>` columns.
  *
  * Replaces the `zip_with`/`aggregate` formulation: higher-order
  * functions evaluate their lambda per element through the
  * interpreter, which dominates the ANN inner loop (64 mults × every
  * candidate pair). This expression generates a single fused Java
  * loop inside whole-stage codegen — the operation a 100 TB
  * similarity sweep actually spends its cycles in.
  *
  * Accumulation order (index-ascending, float widened to double)
  * matches the `Vec.dot`/`Vec.norm` composition bit-for-bit, so
  * swapping implementations cannot change any oracle result.
  *
  * Null array → null result; null *elements* are not expected
  * (embedding vectors are dense) and read as 0.0.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // SQL-surface safety: getFloat on an array<double> input would
  // silently read half-strides — declare the float-vector contract so
  // analysis coerces compatible arrays and rejects the rest
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // nullable even over non-null children: length mismatch → null.
  // (Also keeps ev.isNull a real variable in generated code.)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → null, matching the composed zip_with form
    // (null-padded products null the whole aggregate); a truncated
    // similarity would silently accept a corrupt embedding row
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          int $n = $a.numElements();
          for (int $i = 0; $i < $n; $i++) {
            double $xi = (double) $a.getFloat($i);
            double $yi = (double) $b.getFloat($i);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}
