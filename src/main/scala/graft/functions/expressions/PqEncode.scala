package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization encoder: an `array<float>` vector mapped to
  * ONE packed long of `m` 4-bit subspace codes — each code the
  * argmin-L2 centroid of its contiguous `dsub`-dim subspace, on the
  * same fixed integer grid (`round(x·10000)`) the trained codebook is
  * quantized to, so encoding is exact integer arithmetic with a
  * deterministic lowest-index tie-break.
  *
  * The packed-long layout (code j in bits 4j..4j+3) is the point:
  * the serving shuffle carries 8 BYTES per vector instead of 256
  * (64 × float), which is the memory/bandwidth economics that makes
  * PQ the standard billion-vector index format (Jégou et al. 2011,
  * "Product quantization for nearest neighbor search").
  *
  * CodegenFallback — one virtual call per ROW; the inner m·ksub·dsub
  * loop is plain JVM long arithmetic (same rationale as
  * ShingleHashes64). Null vector → null; wrong dimensionality → null
  * (a truncated encode would silently index a corrupt row).
  *
  * `codebook` is flat `[m][ksub][dsub]` quantized-grid longs.
  */
case class PqEncode(
    child: Expression,
    codebook: Array[Long],
    m: Int,
    ksub: Int,
    dsub: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(m >= 1 && m <= 16, s"m=$m out of packed-long range [1, 16]")
  require(ksub >= 1 && ksub <= 16, s"ksub=$ksub needs more than 4 bits")
  require(codebook.length == m * ksub * dsub,
    s"codebook length ${codebook.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    // unit-normalize first: cosine neighbors ≡ L2 neighbors on unit
    // vectors, which is what the (unit-trained) codebooks quantize
    var nrm = 0.0
    var t = 0
    val n = m * dsub
    while (t < n) {
      val x = v.getFloat(t).toDouble; nrm += x * x; t += 1
    }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    var packed = 0L
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Long.MaxValue
      var c = 0
      while (c < ksub) {
        var dist = 0L
        var d = 0
        val base = (j * ksub + c) * dsub
        while (d < dsub) {
          val q = Math.round(v.getFloat(j * dsub + d).toDouble * inv * 10000.0)
          val diff = q - codebook(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      packed |= best.toLong << (4 * j)
      j += 1
    }
    packed
  }

  // Array fields compare by reference, which would make two
  // structurally identical encoders never semanticEquals — defeating
  // canonicalization and common-subexpression elimination. Value
  // equality restores that while keeping the unboxed Array hot loop.
  override def equals(o: Any): Boolean = o match {
    case p: PqEncode => child == p.child && m == p.m && ksub == p.ksub &&
      dsub == p.dsub && java.util.Arrays.equals(codebook, p.codebook)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m), Int.box(ksub), Int.box(dsub),
      Int.box(java.util.Arrays.hashCode(codebook)))

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Symmetric PQ code-to-code distance: the sum over subspaces of the
  * PRECOMPUTED centroid-pair squared L2 (integer grid) — scoring
  * never touches a float vector, only two packed longs and a
  * literal `m·ksub²` lookup table. Exact integer output → the
  * ranking is bit-reproducible across partitionings.
  */
case class PqDist(
    left: Expression,
    right: Expression,
    tables: Array[Long],
    m: Int,
    ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  require(tables.length == m * ksub * ksub,
    s"tables length ${tables.length} != m*ksub^2 = ${m * ksub * ksub}")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ca = a.asInstanceOf[Long]
    val cb = b.asInstanceOf[Long]
    var dist = 0L
    var j = 0
    while (j < m) {
      val x = ((ca >>> (4 * j)) & 0xFL).toInt
      val y = ((cb >>> (4 * j)) & 0xFL).toInt
      dist += tables(j * ksub * ksub + x * ksub + y)
      j += 1
    }
    dist
  }

  // same reference-equality trap as PqEncode's codebook field
  override def equals(o: Any): Boolean = o match {
    case p: PqDist => left == p.left && right == p.right && m == p.m &&
      ksub == p.ksub && java.util.Arrays.equals(tables, p.tables)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(m), Int.box(ksub),
      Int.box(java.util.Arrays.hashCode(tables)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDist =
    copy(left = newLeft, right = newRight)
}
