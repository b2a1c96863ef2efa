package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Distinct word-n-gram shingle hashes of a text column in ONE
  * native pass.
  *
  * Replaces the `array_distinct(transform(sequence(...), i =>
  * xxhash64(concat_ws(...))))` composition: higher-order `transform`
  * evaluates its lambda through the interpreter at ~20 µs per
  * shingle — the dominant cost of every dedup signature pass. Here
  * the whole tokenize → join-with-\\u0001 → xxhash64 → distinct
  * chain is plain JVM code (~100 ns per shingle).
  *
  * Semantics match the composed form: tokens split on single
  * spaces, shingles joined with \\u0001 (so token sequences can't
  * collide by concatenation), documents shorter than n tokens yield
  * one whole-doc shingle, output de-duplicated. Hash = XXH64 of the
  * UTF-8 bytes, seed 42.
  *
  * CodegenFallback: one virtual call per ROW (not per element) —
  * the interpreter overhead this expression eliminates was per
  * shingle.
  */
case class ShingleHashes64(child: Expression, n: Int,
    distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(" ", -1)
    val sb = new java.lang.StringBuilder(64)
    // distinct = the dedup-signature contract; distinct = false keeps
    // one hash PER WINDOW POSITION in order (the span-occurrence
    // counting shape — q119's per-position rows)
    val seen = if (distinct) new java.util.LinkedHashSet[java.lang.Long]() else null
    val all = if (distinct) null else new scala.collection.mutable.ArrayBuilder.ofLong
    def hashJoined(from: Int, until: Int): Unit = {
      sb.setLength(0)
      var j = from
      while (j < until) {
        if (j > from) sb.append('')
        sb.append(toks(j))
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      if (distinct) seen.add(h) else all += h
    }
    if (toks.length < n) hashJoined(0, toks.length)
    else {
      var i = 0
      while (i <= toks.length - n) { hashJoined(i, i + n); i += 1 }
    }
    if (!distinct) new GenericArrayData(all.result())
    else {
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes64 =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes64"
}
