package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF-PQ residual encoder — the encode step of the standard FAISS
  * IVFPQ recipe (Jégou et al. 2011 §V: quantize `r = y − q1(y)`, the
  * residual after the coarse quantizer, NOT the raw vector): given a
  * vector and its assigned coarse list, unit-normalize the vector
  * (cosine → L2 on the unit sphere, same convention as [[PqEncode]]
  * and the spherical-k-means coarse centroids), subtract the list's
  * centroid, and PQ-code the residual against a SHARED residual
  * codebook — all in one native pass, emitting one packed long of
  * `m` 4-bit codes.
  *
  * Residuals are deliberately NOT re-normalized: their magnitude IS
  * the information (a vector near its centroid has a small residual;
  * normalizing would rank by residual direction only and break the
  * ADC distance). The integer grid (`round(x·10000)`) matches the
  * codebook's, so encoding stays exact integer compare with
  * lowest-index tie-break — bit-reproducible across partitionings.
  *
  * Distance between two codes OF THE SAME LIST via [[PqDist]] is the
  * usual symmetric ADC; cross-list codes are never compared (the
  * probe join is keyed on the list).
  *
  * `centroids` is flat `[nlist][dim]` unit-norm floats; `codebook`
  * flat `[m][ksub][dsub]` quantized-grid longs. Null/wrong-dim
  * vector or out-of-range list → null (a truncated encode would
  * silently index a corrupt row).
  */
case class PqEncodeResidual(
    vec: Expression,
    list: Expression,
    centroids: Array[Float],
    codebook: Array[Long],
    m: Int,
    ksub: Int,
    dsub: Int)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(m >= 1 && m <= 16, s"m=$m out of packed-long range [1, 16]")
  require(ksub >= 1 && ksub <= 16, s"ksub=$ksub needs more than 4 bits")
  require(codebook.length == m * ksub * dsub,
    s"codebook length ${codebook.length} != m*ksub*dsub = ${m * ksub * dsub}")
  require(centroids.length % (m * dsub) == 0,
    s"centroids length ${centroids.length} not a multiple of dim ${m * dsub}")

  override def left: Expression = vec
  override def right: Expression = list
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_residual"

  override def nullSafeEval(vecAny: Any, listAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData]
    val li = listAny.asInstanceOf[Int]
    val dim = m * dsub
    if (v.numElements() != dim) return null
    if (li < 0 || (li + 1) * dim > centroids.length) return null
    var nrm = 0.0
    var t = 0
    while (t < dim) {
      val x = v.getFloat(t).toDouble; nrm += x * x; t += 1
    }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val cOff = li * dim
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
          val x = v.getFloat(j * dsub + d).toDouble * inv -
            centroids(cOff + j * dsub + d).toDouble
          val q = Math.round(x * 10000.0)
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

  // value equality over the array fields — same canonicalization
  // rationale as PqEncode
  override def equals(o: Any): Boolean = o match {
    case p: PqEncodeResidual => vec == p.vec && list == p.list &&
      m == p.m && ksub == p.ksub && dsub == p.dsub &&
      java.util.Arrays.equals(centroids, p.centroids) &&
      java.util.Arrays.equals(codebook, p.codebook)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, list, Int.box(m), Int.box(ksub), Int.box(dsub),
      Int.box(java.util.Arrays.hashCode(centroids)),
      Int.box(java.util.Arrays.hashCode(codebook)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeResidual =
    copy(vec = newLeft, list = newRight)
}

/** Asymmetric ADC for IVF-PQ (the FAISS default): distance from the
  * QUERY's exact residual (grid-quantized but never 4-bit-coded) to
  * a candidate's reconstructed residual — `Σ_d (q_d − cb[code])²`
  * per subspace. Halves the quantization noise of the symmetric
  * code-to-code [[PqDist]] (only the CANDIDATE side is coded), which
  * on coarse 4-bit codebooks is the difference between a usable and
  * a noise-dominated shortlist. Exact integer arithmetic on the
  * shared `round(x·10000)` grid → rankings stay bit-reproducible.
  *
  * Inputs: the query vector (unit-normalized internally), the probed
  * list (its centroid defines the query residual), and the
  * candidate's packed code. Cross-list codes are never compared —
  * the probe join is keyed on the list.
  */
case class PqAdcResidual(
    vec: Expression,
    list: Expression,
    code: Expression,
    centroids: Array[Float],
    codebook: Array[Long],
    m: Int,
    ksub: Int,
    dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  require(m >= 1 && m <= 16, s"m=$m out of packed-long range [1, 16]")
  require(ksub >= 1 && ksub <= 16, s"ksub=$ksub needs more than 4 bits")
  require(codebook.length == m * ksub * dsub,
    s"codebook length ${codebook.length} != m*ksub*dsub = ${m * ksub * dsub}")
  require(centroids.length % (m * dsub) == 0,
    s"centroids length ${centroids.length} not a multiple of dim ${m * dsub}")

  override def first: Expression = vec
  override def second: Expression = list
  override def third: Expression = code
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), IntegerType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_residual"

  override def nullSafeEval(vecAny: Any, listAny: Any, codeAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData]
    val li = listAny.asInstanceOf[Int]
    val packed = codeAny.asInstanceOf[Long]
    val dim = m * dsub
    if (v.numElements() != dim) return null
    if (li < 0 || (li + 1) * dim > centroids.length) return null
    var nrm = 0.0
    var t = 0
    while (t < dim) {
      val x = v.getFloat(t).toDouble; nrm += x * x; t += 1
    }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val cOff = li * dim
    var dist = 0L
    var j = 0
    while (j < m) {
      val c = ((packed >>> (4 * j)) & 0xFL).toInt
      // a code nibble >= ksub is a corrupt/foreign packed long: with
      // ksub < 16 it would silently index a NEIGHBORING subquantizer's
      // codebook block (wrong distance) or walk off the array on the
      // last subspace — follow the null contract the other malformed
      // inputs use instead
      if (c >= ksub) return null
      val base = (j * ksub + c) * dsub
      var d = 0
      while (d < dsub) {
        val x = v.getFloat(j * dsub + d).toDouble * inv -
          centroids(cOff + j * dsub + d).toDouble
        val q = Math.round(x * 10000.0)
        val diff = q - codebook(base + d)
        dist += diff * diff
        d += 1
      }
      j += 1
    }
    dist
  }

  override def equals(o: Any): Boolean = o match {
    case p: PqAdcResidual => vec == p.vec && list == p.list &&
      code == p.code && m == p.m && ksub == p.ksub && dsub == p.dsub &&
      java.util.Arrays.equals(centroids, p.centroids) &&
      java.util.Arrays.equals(codebook, p.codebook)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, list, code, Int.box(m), Int.box(ksub),
      Int.box(dsub), Int.box(java.util.Arrays.hashCode(centroids)),
      Int.box(java.util.Arrays.hashCode(codebook)))

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcResidual =
    copy(vec = newFirst, list = newSecond, code = newThird)
}
