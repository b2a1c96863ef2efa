package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning: the composite pipeline the
  * individual operators exist for. One pass of narrow maps for the
  * per-document signals, then the signature-based near-dup stage —
  * each stage's reject reason is recorded, so the output is an audit
  * table (doc_id, verdict) the caller joins back to the corpus.
  *
  * Stage order puts the cheap row-local filters (length, quality)
  * before the shuffling stages (exact dedup, minhash LSH), so at
  * scale the expensive stages see only survivors.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minStopwordRatio: Double = 0.0,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to"),
      shingleN: Int = 2,
      minhashPerms: Int = 32,
      minhashBands: Int = 8,
      nearDupThreshold: Double = 0.5)

  /** Audit table: every input doc_id with `verdict` ∈
    * {kept, too_short, too_long, low_quality, exact_dup, near_dup}.
    * Deterministic: dup groups keep the smallest doc_id.
    *
    * The verdict table carries only (id, counters, digest) — text
    * stays in the source and is re-read just once more for the
    * near-dup stage's survivors, so no corpus-sized intermediate is
    * cached or computed twice.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      conf: Config = Config()): DataFrame = {
    val id = col(idCol)
    val toks = split(col(textCol), " ")
    // Column-level stopword test — no SQL-string splicing, so
    // stopwords with quotes and arbitrary column names are safe
    val stopCount = size(filter(toks, t => t.isin(conf.stopwords: _*)))
    val stopRatio = stopCount.cast("double") / size(toks).cast("double")

    val scored = docs.select(
      id.as("doc_id"),
      size(toks).as("__ntok"),
      stopRatio.as("__stop"),
      md5(col(textCol)).as("__fp"))

    val rowVerdict = scored.withColumn("__rv",
      when(col("__ntok") < conf.minTokens, "too_short")
        .when(col("__ntok") > conf.maxTokens, "too_long")
        .when(col("__stop") < conf.minStopwordRatio, "low_quality"))

    // exact dedup among row-level survivors: smallest id per digest wins
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col("doc_id"))
    val exact = rowVerdict.withColumn("__ev",
        when(col("__rv").isNull &&
          row_number().over(exactW) > 1, "exact_dup"))
      .select("doc_id", "__rv", "__ev")
      // small (ids + verdicts); materialized once, GC-cleanable —
      // both the survivor join and the final join read it
      .localCheckpoint()

    val survivors = docs.select(id.as("doc_id"), col(textCol).as("__text"))
      .join(exact.filter(col("__rv").isNull && col("__ev").isNull)
        .select("doc_id"), "doc_id")

    // near-dup among exact-unique survivors: for each LSH-verified
    // pair (a < b), b is the duplicate
    val nearDupIds = Dedup.minHashLsh(survivors, "doc_id", "__text",
        conf.shingleN, conf.minhashPerms, conf.minhashBands, conf.nearDupThreshold)
      .select(col("b_id").as("doc_id")).distinct()

    exact
      .join(nearDupIds.withColumn("__nd", lit("near_dup")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__rv"), col("__ev"), col("__nd"), lit("kept")).as("verdict"))
  }
}
