package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so the expressions stay inside whole-stage codegen and
  * never serialize rows out of Tungsten format.
  *
  * Products are computed in float64 after an explicit element cast:
  * deterministic left-to-right accumulation, independent of
  * partitioning.
  */
object Vec {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two float vectors in float64. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native codegen expression (one fused Java
    * loop per pair; see VecCosine). Bit-identical to
    * `dot(a,b) / (norm(a) * norm(b))`, which remains available as
    * the composed reference implementation.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.VecCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** The pre-codegen formulation, kept for A/B correctness tests. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact integer dot product over `array<long>` quantization codes
    * — native codegen expression (see VecDotLong); the serving-path
    * scorer for int8-quantized vectors.
    */
  def dotLong(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.VecDotLong(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** The composed `zip_with`/`aggregate` integer-dot twin, for A/B
    * tests against [[dotLong]].
    */
  def dotLongComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Sign-bit locality-sensitive hash: the bucket id packs the sign
    * of the projection onto each hyperplane. `planes` must be small
    * (nPlanes × dim doubles) — it ships as a literal in the plan and
    * is evaluated per row without any join.
    */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(aggregate(zip_with(plane, asDouble(v), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-table sign-LSH sketch: `array<long>` of
    * `planes.length / planesPerTable` bucket codes, one fused
    * codegen loop (see SignLsh). Table `t` uses planes
    * `[t·planesPerTable, (t+1)·planesPerTable)`.
    */
  def signLshBuckets(v: Column, planes: Array[Array[Double]], planesPerTable: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.SignLsh(
      GraftColumnBridge.expression(v),
      planes.flatten.toSeq, planesPerTable, planes.head.length))
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 over a
    * fixed seed) — reproducible across runs and engines without an
    * RNG at execution time.
    */
  def deterministicPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(nPlanes, dim) {
      // uniform in [-1, 1): plenty for sign-projection LSH
      (next() >>> 11) * (1.0 / (1L << 52)) * 2.0 - 1.0
    }
  }
}
