package graft.queries

import graft.operators.{CorpusPipeline, Dedup}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query bindings for the near-dup suite. These are approximate /
  * signature-based algorithms with no SQL formulation — the driver
  * records rows-only checks; exactness is covered by DedupSpec
  * (planted-duplicate fixtures) and the SQL-oracled exact variants
  * (q32_exact_dedup, q35_token_jaccard).
  *
  * Thresholds are tuned LOW for the synthetic corpus (uniform word
  * salad has no true near-dups) so the candidate → verify pipeline
  * actually exercises end-to-end with non-empty output.
  */
object DedupOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_minhash_lsh" -> ((s, d) =>
      Dedup.minHashLsh(Tables(s, d).documents, "doc_id", "text",
        shingleN = 2, numPerm = 32, bands = 8, threshold = 0.4)),

    "q37_simhash" -> ((s, d) =>
      Dedup.simHashPairs(Tables(s, d).documents, "doc_id", "text",
        maxHamming = 7)),

    "q38_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables(s, d).documents, "doc_id", "text",
        shingleN = 2, threshold = 0.25)),

    // Rolling-hash winnowing sketch (xxhash64 shingles → k-min);
    // no DuckDB xxhash64 → rows-only. The sketch is exploded to
    // (doc_id, pos, minhash) scalar rows: the driver's rows-only
    // check canonicalizes with a pandas sort, which cannot order
    // array cells — and the long-form layout is also the shape a
    // downstream containment join would consume.
    "q43_winnow_fp" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, posexplode}
      Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(Dedup.winnowFingerprint(col("text"))).as(Seq("pos", "minhash")))
    }),

    // End-to-end corpus cleaning: length/quality filters → exact
    // dedup → minhash near-dup, with per-doc verdicts. Rows-only
    // (contains the approximate minhash stage).
    "q59_corpus_clean" -> ((s, d) =>
      CorpusPipeline.clean(Tables(s, d).documents, "doc_id", "text")),

    // Group-level dedup sketch: merge per-doc minhash signatures per
    // source with the typed MinHashMerge Aggregator (union-of-sets
    // signature without materializing the union). Rows-only; the
    // merged signature is exploded to (source, pos, minhash) scalar
    // rows (see q43 — the gate cannot sort array cells).
    "q48_source_signatures" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, posexplode}
      import s.implicits._
      val numPerm = 32
      Tables(s, d).documents
        .select(col("source"),
          Dedup.minHashSignature(Dedup.shingleHashes(col("text"), 2), numPerm).as("sig"))
        .as[(String, Seq[Long])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new graft.functions.MinHashMerge(numPerm).toColumn.name("gsig"))
        .toDF("source", "gsig")
        .select(col("source"), posexplode(col("gsig")).as(Seq("pos", "minhash")))
    })
  )

  def oracleSql: Map[String, String] = Map.empty
}
