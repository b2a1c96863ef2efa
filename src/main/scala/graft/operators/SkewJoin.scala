package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual salting for skewed equi-joins — the fallback when AQE's
  * runtime skew splitting can't apply (e.g. the skewed side feeds a
  * co-grouped window, or stats hide the hot key).
  *
  * The skewed (probe) side appends a deterministic salt in
  * [0, salts) derived from row content; the build side is exploded
  * ×salts so every (key, salt) partition holds the full build rows
  * for that key. One hot key then spreads over `salts` tasks instead
  * of one straggler. Build-side replication costs ×salts — size
  * `salts` to the skew factor, not higher.
  */
object SkewJoin {

  /** Inner equi-join of `skewed` ⋈ `build` on `key`, spreading each
    * skewed key across `salts` partitions. `saltFrom` seeds the
    * deterministic salt (any row-identifying columns).
    */
  def saltedInnerJoin(
      skewed: DataFrame,
      build: DataFrame,
      key: String,
      saltFrom: Seq[Column],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!skewed.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val l = skewed.withColumn("__salt", pmod(hash(saltFrom: _*), lit(salts)))
    val r = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
