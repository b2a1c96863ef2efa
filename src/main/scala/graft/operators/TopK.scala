package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k per key, in two shapes:
  *
  *  - `direct`: one window — optimal when keys are well distributed
  *    (Spark's WindowGroupLimit already bounds per-partition state).
  *  - `salted`: two-phase for SKEWED keys (the reference's sample
  *    data has every stream on one date — one window partition would
  *    serialize the whole day through one task). Phase 1 computes a
  *    per-(key, salt) partial top-k in parallel; phase 2 re-ranks
  *    the surviving k·S rows per key — a shuffle of candidates, not
  *    of the data.
  *
  * Both produce identical results for any salt count (top-k is
  * mergeable), pinned by TopKSpec.
  */
object TopK {

  def direct(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** `saltFrom`: columns whose hash spreads a hot key across salts
    * (any row-identifying columns work; the result is salt-invariant).
    */
  def salted(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
      saltFrom: Seq[Column], salts: Int = 16, rankCol: String = "rank"): DataFrame = {
    val survivors = df
      .withColumn("__salt", pmod(hash(saltFrom: _*), lit(salts)))
      .withColumn("__r1", row_number().over(
        Window.partitionBy((keys :+ "__salt").map(col): _*).orderBy(order: _*)))
      .filter(col("__r1") <= k)
      .drop("__salt", "__r1")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    survivors.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
