package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source contamination detection — the decontamination
  * primitive of LLM data pipelines (does a held-out/test document
  * share verbatim n-grams with any document from another split?).
  *
  * Semantics (exact): for each document, over its DISTINCT token
  * `n`-grams (documents shorter than `n` tokens contribute their
  * whole text as one gram), count how many grams also occur in at
  * least one document of a DIFFERENT source. `contaminated` = any
  * such gram exists.
  *
  * Scale design: the only things that shuffle are (gram-hash,
  * source) pairs and per-gram source counts — document text never
  * leaves its input partition. Gram identity is xxhash64 of the gram
  * string (8 bytes instead of the n-token string in every exchange;
  * 64-bit collisions across a corpus gram vocabulary are ~V²/2⁶⁵ —
  * negligible, same argument as the Jaccard joins). The per-gram
  * distinct-source count is a two-level aggregate with map-side
  * partials; no join ever carries payloads.
  */
object Contamination {

  private def grams(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }

  /** Per-document contamination profile:
    * (doc_id, source, n_ngrams, n_foreign, contaminated).
    */
  def crossSourceOverlap(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      n: Int = 3): DataFrame = {
    val docGrams = docs.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      explode(transform(grams(col(textCol), n), g => xxhash64(g))).as("g"))
    // distinct sources per gram: a gram is "foreign" to every doc
    // when ≥ 2 sources contain it (a doc's gram always counts its
    // own source)
    val nsrc = docGrams.select("g", "source").distinct()
      .groupBy("g").agg(count(lit(1)).as("nsrc"))
    docGrams.join(nsrc, "g")
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(when(col("nsrc") >= 2, 1L).otherwise(0L)).as("n_foreign"))
      .withColumn("contaminated", col("n_foreign") > 0)
  }
}
