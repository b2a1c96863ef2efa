package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Exact frequent-items ("heavy hitters") via the Misra–Gries
  * summary as a candidate generator plus an exact recount — the
  * sketch-then-verify pattern: approximate structures bound the
  * candidate set, exact arithmetic decides membership, so the
  * OUTPUT is exact even though the sketch is not.
  *
  * Phase 1 (narrow): each partition streams its rows through a
  * Misra–Gries summary with `k-1` counters. Guarantee: any item
  * with partition frequency > n_p/k survives the partition summary,
  * and an item with GLOBAL frequency > N/k must exceed n_p/k in at
  * least one partition (else summing the per-partition bounds
  * contradicts N/k). So the union of per-partition survivors — at
  * most (k-1)·P candidate KEYS, independent of N — is a superset of
  * the true heavy hitters. That bounded candidate set is the whole
  * point at 100 TB: the alternative (full groupBy) shuffles every
  * distinct key; this shuffles ≤ (k-1)·P keys for the candidate
  * pass, and the verify pass is a semi-join keyed recount.
  *
  * Phase 2 (exact): semi-join the input to the candidates, recount
  * exactly, and keep `count · k > N` (integer compare — no float
  * thresholds). Candidates that were only locally frequent are
  * dropped here, so no false positives survive either.
  *
  * Published algorithm: Misra & Gries, "Finding repeated elements"
  * (1982); the merge-by-union property used for phase 1 is the
  * standard mergeable-summaries result (Agarwal et al., PODS'12).
  */
object HeavyHitters {

  /** Misra–Gries summary of one iterator with `k-1` counters;
    * returns surviving candidate keys.
    */
  private[operators] def misraGries(it: Iterator[Long], k: Int): Iterator[Long] = {
    val counters = mutable.LongMap.empty[Long]
    it.foreach { x =>
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < k - 1) counters(x) = 1L
      else {
        // decrement-all; drop zeros. Amortized O(1) per input row:
        // each decrement pass removes >= 1 full "round" paid for by
        // the k rows that incremented.
        val dead = mutable.ArrayBuffer.empty[Long]
        counters.foreachEntry((key, c) =>
          if (c == 1L) dead += key else counters(key) = c - 1L)
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Keys of `df.keyCol` (long-typed) with frequency strictly
    * greater than N/k, with exact counts and exact-rational share.
    * Output columns: key, n, share.
    */
  def frequentKeys(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"heavy-hitter k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(keyCol.cast("long").as("key"))
    val candidates = keys.as[Long]
      .mapPartitions(it => misraGries(it, k))
      .toDF("key").distinct()
    val total = keys.agg(count(lit(1)).as("total"))
    keys.join(candidates, Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .crossJoin(total) // 1 row — broadcast
      .filter(col("n") * k > col("total"))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"))
  }
}
