package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a frozen BPE merge table (rank order) to a token array in
  * ONE native pass.
  *
  * Replaces k chained `aggregate(syms, ..., (acc, x) -> ...)` folds:
  * higher-order `aggregate` runs its lambda through the interpreter
  * per ELEMENT per merge — k × n lambda invocations per document.
  * Here the same greedy left-to-right semantics run as k tight JVM
  * array passes (~ns per element), one virtual call per ROW
  * (CodegenFallback — the overhead eliminated was per element).
  *
  * Semantics (must equal BpeTrain.applyMerge chained in rank order):
  * for each merge (l, r), scan left to right; when the last emitted
  * symbol equals l and the current symbol equals r, replace the last
  * emitted symbol with l+Sep+r. The merged symbol CAN immediately
  * participate as the left side of the SAME merge's next application
  * only if it literally equals l (exactly the fold's acc-last check).
  */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)],
                          sep: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: Array[(UTF8String, UTF8String, UTF8String)] =
    merges.map { case (l, r) =>
      (UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(l + sep + r))
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    var cur = input.asInstanceOf[ArrayData].toArray[UTF8String](StringType)
    var i = 0
    while (i < table.length) {
      val (l, r, lr) = table(i)
      val out = new Array[UTF8String](cur.length)
      var k = 0
      var j = 0
      while (j < cur.length) {
        val x = cur(j)
        if (k > 0 && out(k - 1) == l && x == r) out(k - 1) = lr
        else { out(k) = x; k += 1 }
        j += 1
      }
      cur = if (k == cur.length) out else java.util.Arrays.copyOf(out, k)
      i += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply_merges"
}
