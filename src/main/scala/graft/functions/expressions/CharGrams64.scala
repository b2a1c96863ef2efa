package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Positional-multiset CHARACTER q-gram hashes of a string, in one
  * native pass — the blocking signature for edit-distance candidate
  * generation (q-gram count filtering, Gravano et al.'s approximate
  * string joins; reference capability: record-matching over the
  * string-keyed tables `glue_job.py:51-58` reads).
  *
  * Distinct from [[ShingleHashes64]] (WORD n-grams, de-duplicated):
  * edit-distance filtering needs the q-gram MULTISET — an edit
  * destroys at most q grams counted WITH multiplicity, so dropping
  * duplicates would break the `shared >= max(|G(a)|,|G(b)|) - k*q`
  * count bound. Multiset semantics are kept by SEEDING the i-th
  * occurrence of a gram with `42 + i`: equal (gram, occurrence)
  * pairs hash equal across strings, so plain set intersection of
  * the outputs IS the multiset intersection, and a sorted-array
  * prefix under plain `array_sort` is a valid AllPairs prefix under
  * one global total order (the hash order).
  *
  * A string shorter than q yields one whole-string gram (callers
  * route such rows through their exhaustive short-string bucket);
  * an empty string yields an empty array. Hash = XXH64 of the
  * gram's UTF-8 bytes. The composed HOF form
  * (`transform(sequence(...), i -> xxhash64(substring(...),
  * occurrence-filter))`) is O(m^2) INTERPRETED lambda evals per
  * row — this pass is linear JVM code with a small reused map.
  *
  * CodegenFallback: one virtual call per row, same trade as
  * [[ShingleHashes64]].
  */
case class CharGrams64(child: Expression, q: Int)
    extends UnaryExpression with CodegenFallback {

  require(q >= 1, s"char gram size must be >= 1, got $q")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val occ = new java.util.HashMap[String, Integer]()
    def hashGram(g: String): Long = {
      val n = occ.merge(g, 1, (a: Integer, b: Integer) => a + b)
      val bytes = g.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L + n)
    }
    if (s.length < q) new GenericArrayData(Array(hashGram(s)))
    else {
      val out = new Array[Long](s.length - q + 1)
      var i = 0
      while (i <= s.length - q) {
        out(i) = hashGram(s.substring(i, i + q))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams64 =
    copy(child = newChild)

  override def prettyName: String = "char_grams64"
}
