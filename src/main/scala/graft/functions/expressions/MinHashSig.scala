package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over a shingle-hash array in ONE pass.
  *
  * Replaces `array(minhash_1, …, minhash_k)` built from k separate
  * `array_min(transform(...))` columns — k interpreted lambda sweeps
  * per row — with a single fused loop: for each shingle, mix once
  * with xxhash64 (seed 42, matching Spark's `xxhash64` builtin),
  * then fold each of the k salted re-mixes into a running min.
  *
  * Identical hash family to the Column formulation
  * `xxhash64(x, lit(salt_i))`: Spark's XxHash64 chains
  * `hash(salt, hash(x, 42))`, reproduced here via XXH64.hashLong.
  */
case class MinHashSig(child: Expression, salts: Seq[Long])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(salts.nonEmpty, "minhash_sig: numPerm must be positive")

  // SQL-surface safety: coerce array<int> → array<long>, reject
  // incompatible element types at analysis time
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  // salts is Seq (not Array) so case-class equality is structural:
  // semantically identical minhash_sig expressions compare equal,
  // which canonicalization / common-subexpression elimination needs.
  // The hot loops run over this materialized primitive array.
  private lazy val saltArr: Array[Long] = salts.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val salts = saltArr
    val mins = Array.fill(salts.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val inner = XXH64.hashLong(arr.getLong(i), 42L)
      var p = 0
      while (p < salts.length) {
        val h = XXH64.hashLong(salts(p), inner)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val saltsRef = ctx.addReferenceObj("salts", saltArr, "long[]")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val inner = ctx.freshName("inner")
      val h = ctx.freshName("h")
      s"""
        int $n = $a.numElements();
        long[] $mins = new long[$saltsRef.length];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $i = 0; $i < $n; $i++) {
          long $inner = $xxh.hashLong($a.getLong($i), 42L);
          for (int $p = 0; $p < $saltsRef.length; $p++) {
            long $h = $xxh.hashLong($saltsRef[$p], $inner);
            if ($h < $mins[$p]) $mins[$p] = $h;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
