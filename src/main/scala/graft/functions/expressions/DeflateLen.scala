package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the
  * compression-ratio quality signal (CCNet/RefinedWeb style):
  * highly repetitive or templated text compresses far below natural
  * prose, so `deflate_len(text) / length(text)` separates boilerplate
  * from content with zero linguistic machinery.
  *
  * Deterministic for a fixed input on a fixed JDK zlib (level and
  * strategy pinned), but NOT portable across compressor
  * implementations — so queries built on it are rows-only gated,
  * with the semantics pinned in spec (run-to-run equality,
  * repetitive < prose ordering).
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compressedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.DeflateLen.compressedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // one native zlib handle + scratch buffer per executor thread,
  // reset() between rows — constructing/end()ing a Deflater per row
  // makes native handle churn dominate short-string workloads.
  // The handles are never end()'d: bounded at one per pool thread,
  // reclaimed by the JDK's Deflater Cleaner when the thread dies —
  // a deliberate reliance, not a leak
  private val local =
    ThreadLocal.withInitial[(java.util.zip.Deflater, Array[Byte])](() =>
      (new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_COMPRESSION, /* nowrap = */ true),
        new Array[Byte](8192)))

  def compressedLength(s: UTF8String): Long = {
    val bytes = s.getBytes
    val (d, buf) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
