package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All ordered pairs of a SORTED DISTINCT long array, packed as
  * `(a(i) << 32) + a(j)` for every i < j — the co-occurrence pair
  * generation of q312 in one native loop.
  *
  * The SQL form it replaces —
  * `flatten(transform(ws, (x, i) -> transform(slice(ws, i + 2,
  * size(ws)), y -> struct(x, y))))` followed by
  * `shiftleft(pa, 32) + pb` — runs its lambdas INTERPRETED per
  * element and materializes a fresh suffix COPY of the array per
  * element (the `slice`), i.e. O(m²) allocations per basket before
  * any pair exists. Here a basket of m items is one m²/2 loop writing
  * packed longs. Values must fit the pack (ids < 2³²), exactly the
  * assumption the SQL form already made.
  */
case class PackedPairs64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](m * (m - 1) / 2)
      var k = 0
      var i = 0
      while (i < m) {
        val hi = arr.getLong(i) << 32
        var j = i + 1
        while (j < m) {
          out(k) = hi + arr.getLong(j)
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PackedPairs64 =
    copy(child = newChild)

  override def prettyName: String = "packed_pairs64"
}
