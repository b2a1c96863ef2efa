package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All adjacent symbol pairs of an array<string>, each encoded as
  * `left  right` in ONE native pass.
  *
  * Replaces the `transform(sequence(1, size-1), i ->
  * struct(element_at(...), element_at(...)))` composition whose
  * lambda runs interpreted per element — the per-round corpus pass
  * of BPE training. The  separator sorts below every corpus
  * character, so lexicographic order on the encoded pair equals
  * (left, right) tuple order — tie-breaks survive the encoding.
  */
case class AdjacentPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toArray[UTF8String](StringType)
    if (arr.length < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[UTF8String](arr.length - 1)
      var i = 0
      while (i < arr.length - 1) {
        out(i) = UTF8String.concat(arr(i), AdjacentPairs.SepU8, arr(i + 1))
        i += 1
      }
      new GenericArrayData(out.asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)

  override def prettyName: String = "adjacent_pairs"
}

object AdjacentPairs {
  val Sep = ""
  private[expressions] val SepU8 = UTF8String.fromString(Sep)
}
