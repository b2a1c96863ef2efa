package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a column of token hashes (`array<long>`).
  *
  * Bit k of the fingerprint is set when ≥ half of the token hashes
  * have bit k set (the majority-vote formulation: `2*ones >= n`,
  * identical to the `size(filter(...))` composition it replaces —
  * which evaluated 64 interpreted lambda passes per document; this
  * is one fused codegen loop).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // declared input types: the SQL surface coerces compatible arrays
  // (array<int> → array<long>) and rejects the rest at analysis time
  // instead of letting getLong read garbage strides at runtime
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < 64) { votes(k) += ((h >>> k) & 1L).toInt; k += 1 }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (2 * votes(k) >= n) fp |= (1L << k); k += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
        int $n = $a.numElements();
        int[] $votes = new int[64];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $k = 0; $k < 64; $k++) { $votes[$k] += (int) (($h >>> $k) & 1L); }
        }
        long $fp = 0L;
        for (int $k = 0; $k < 64; $k++) { if (2 * $votes[$k] >= $n) $fp |= (1L << $k); }
        ${ev.value} = $fp;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
