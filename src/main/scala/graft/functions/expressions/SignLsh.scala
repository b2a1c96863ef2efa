package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-table sign-LSH sketch of an `array<float>` vector in ONE
  * pass: `planes` holds `numTables × planesPerTable` hyperplanes
  * (row-major, flattened), and the output is `array<long>` of
  * `numTables` bucket codes — code `t` packs the sign bit of the
  * projection onto each of table `t`'s planes.
  *
  * Replaces `planesPerTable × numTables` separate
  * `aggregate(zip_with(...))` columns, whose lambdas run interpreted
  * per element — this is the candidate-generation inner loop of the
  * LSH near-dup join, fused into a single codegen'd loop nest like
  * the other sketch expressions (MinHashSig, SimHash64).
  *
  * `planes` is a Seq (not Array) so case-class equality is
  * structural and canonicalization / CSE can merge identical
  * sketches. Vector length ≠ `dim` THROWS: unlike VecCosine's
  * per-pair null (one corrupt row shouldn't sink a whole sweep), a
  * sketch built with the wrong `dim` nulls EVERY row, and the
  * downstream explode would silently turn the misconfiguration into
  * an empty "no near-duplicates" result.
  */
case class SignLsh(child: Expression, planes: Seq[Double], planesPerTable: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(planesPerTable > 0 && planesPerTable < 64, "1 ≤ planesPerTable ≤ 63")
  require(planes.length % (planesPerTable * dim) == 0,
    "planes length must be numTables × planesPerTable × dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  private def numTables: Int = planes.length / (planesPerTable * dim)

  private lazy val planeArr: Array[Double] = planes.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"sign_lsh: vector has ${v.numElements()} dims but the sketch was built for $dim")
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var code = 0L
      var b = 0
      while (b < planesPerTable) {
        val base = (t * planesPerTable + b) * dim
        var proj = 0.0
        var d = 0
        while (d < dim) { proj += v.getFloat(d).toDouble * planeArr(base + d); d += 1 }
        if (proj >= 0) code |= 1L << b
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", planeArr, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val proj = ctx.freshName("proj")
      val code = ctx.freshName("code")
      s"""
        if ($a.numElements() != $dim) {
          throw new IllegalArgumentException(
            "sign_lsh: vector has " + $a.numElements() + " dims but the sketch was built for " + $dim);
        } else {
          long[] $out = new long[$numTables];
          for (int $t = 0; $t < $numTables; $t++) {
            long $code = 0L;
            for (int $b = 0; $b < $planesPerTable; $b++) {
              int $base = ($t * $planesPerTable + $b) * $dim;
              double $proj = 0.0;
              for (int $d = 0; $d < $dim; $d++) {
                $proj += (double) $a.getFloat($d) * $planesRef[$base + $d];
              }
              if ($proj >= 0) $code |= 1L << $b;
            }
            $out[$t] = $code;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SignLsh =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh"
}
