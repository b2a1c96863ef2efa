package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE apply — the reusable reconciliation primitive behind
  * q334: a snapshot plus a change feed (one row per key, op ∈
  * {D, U, I}) folds into the next snapshot in ONE key-shaped
  * full-outer join.
  *
  * Semantics (the MERGE matrix, all deterministic):
  *   - matched + D  → row dropped
  *   - matched + U  → value columns replaced by the change's
  *   - matched + I  → treated as U (idempotent upsert — re-inserting
  *     an existing key must not duplicate it)
  *   - unmatched + I → row inserted
  *   - unmatched + U / unmatched + D → no-op (orphan changes ignored;
  *     a strict feed validates upstream, the apply never invents rows)
  *   - snapshot rows without a change → kept verbatim
  *
  * `src` labels each surviving row kept/updated/inserted. The change
  * feed must be key-unique — enforced loudly (a multi-change key has
  * no deterministic MERGE result; collapse the feed first).
  *
  * Scale shape: one full-outer shuffle on the key — the minimum any
  * keyed reconciliation pays; no windows, no driver state. The
  * key-uniqueness guard is a bounded limit(1) probe, the GroupedRank
  * precondition discipline.
  */
object Cdc {

  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      srcCol: String = "src"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols required")
    val dupKeys = changes.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(dupKeys.isEmpty,
      s"Cdc.applyChanges: change feed has multiple rows for key " +
        s"${dupKeys.headOption.map(_.get(0))} — a multi-change key has no " +
        "deterministic MERGE result; collapse the feed to one row per key first")

    val snapPrefixed = snapshot.select(col(keyCol) +:
      valueCols.map(c => col(c).as(s"__s_$c")): _*)
    val chPrefixed = changes.select(col(keyCol) +: col("op") +:
      valueCols.map(c => col(c).as(s"__c_$c")): _*)
    val matched = col("__matched")
    snapPrefixed.withColumn("__matched", lit(true))
      .join(chPrefixed, Seq(keyCol), "full_outer")
      // every D row drops: matched = the delete, orphan = the no-op
      .filter(coalesce(col("op"), lit("")) =!= "D")
      // orphan non-inserts are no-ops too
      .filter(!(matched.isNull && coalesce(col("op"), lit("")) =!= "I"))
      .select(col(keyCol) +:
        valueCols.map(c =>
          when(col("op").isNotNull, col(s"__c_$c"))
            .otherwise(col(s"__s_$c")).as(c)) :+
        when(col("op") === "I" && matched.isNull, lit("inserted"))
          .when(col("op").isNotNull, lit("updated"))
          .otherwise(lit("kept")).as(srcCol): _*)
  }
}
