package graft

import graft.functions.expressions.{MinHashSig, SimHash64, SortedIntersectCount, VecCosine, VecDotLong}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT vec_cosine(a, b) ...")` works the same as the
  * Column API.
  *
  * Two wiring paths:
  *  - `register(spark)` — programmatic, for an existing session;
  *  - `GraftExtensions` — `spark.sql.extensions=graft.GraftExtensions`
  *    for cluster-wide injection at session build time.
  */
object GraftFunctions {

  /** The optional `numPerm` argument must be an integer literal: it
    * sizes the salt family baked into the expression tree, so a
    * non-foldable argument (a column reference) can't be honored —
    * reject it with a clear error instead of an opaque NPE from an
    * eager eval().
    */
  private def seedOf(e: Seq[Expression], default: Long = 42L): Seq[Long] = {
    val numPerm =
      if (e.length <= 1) 32
      else {
        val arg = e(1)
        if (!arg.foldable) throw new IllegalArgumentException(
          "minhash_sig: numPerm must be an integer literal, got a non-foldable expression")
        arg.eval() match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_sig: numPerm must be an integer literal, got: $other")
        }
      }
    // a non-positive literal would produce an empty salt family and
    // silently empty signatures for every row
    if (numPerm <= 0) throw new IllegalArgumentException(
      s"minhash_sig: numPerm must be positive, got: $numPerm")
    graft.operators.Dedup.permSalts(numPerm, default)
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_cosine" -> (es => VecCosine(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    // minhash_sig(shingles [, numPerm]) with the library's salt stream
    "minhash_sig" -> (es => MinHashSig(es.head, seedOf(es))),
    // |A ∩ B| of sorted duplicate-free long arrays (merge walk)
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    // exact integer dot product over quantization-code arrays
    "vec_dot_long" -> (es => VecDotLong(es(0), es(1))),
    // distinct word-n-gram shingle hashes; n must be a literal (it
    // shapes the expression, same rule as minhash_sig's numPerm)
    "shingle_hashes64" -> (es =>
      graft.functions.expressions.ShingleHashes64(es.head, intLit(es, 1, 2,
        "shingle_hashes64: n"))),
    // adjacent symbol pairs of an array<string>, separator-encoded
    "adjacent_pairs" -> (es =>
      graft.functions.expressions.AdjacentPairs(es.head)),
    // exact per-group top-k values via a bounded mergeable min-heap
    // (TypedImperativeAggregate) — k must be a literal (it bounds
    // the buffer, same rule as minhash_sig's numPerm)
    "topk_agg" -> (es =>
      graft.functions.expressions.TopKAgg(es.head, intLit(es, 1, 10,
        "topk_agg: k"))),
    // Unicode NFC canonical composition (JDK Normalizer, codegen)
    "nfc_normalize" -> (es =>
      graft.functions.expressions.NfcNormalize(es.head)),
    // DEFLATE-compressed byte length (compression-ratio quality gate)
    "deflate_len" -> (es =>
      graft.functions.expressions.DeflateLen(es.head))
  )

  /** Evaluate argument `idx` as a positive integer literal (or
    * `default` when absent) — the shared rule for arguments that
    * shape the expression tree.
    */
  private def intLit(e: Seq[Expression], idx: Int, default: Int,
                     what: String): Int = {
    if (e.length <= idx) default
    else {
      val arg = e(idx)
      if (!arg.foldable) throw new IllegalArgumentException(
        s"$what must be an integer literal, got a non-foldable expression")
      val v = arg.eval() match {
        case i: Int => i
        case l: Long if l.isValidInt => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got: $other")
      }
      if (v <= 0) throw new IllegalArgumentException(
        s"$what must be positive, got: $v")
      v
    }
  }

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  private[graft] def inject(e: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // conf-gated (spark.graft.rewrite.bitmapDistinct) — a no-op
    // unless explicitly enabled, so injecting unconditionally is safe
    e.injectOptimizerRule(_ => graft.plans.BitmapDistinctRewrite)
    // only fires on AsOfJoinNode plans (built via NativeAsOfJoin's
    // builder API) — inert for every other query
    e.injectPlannerStrategy(_ => graft.plans.NativeAsOfJoin.AsOfJoinStrategy)
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
