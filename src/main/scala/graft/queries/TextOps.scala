package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators over the `documents` table — the
  * training-data-pipeline surface (BASELINE.json north star).
  *
  * All operators are pure column expressions (whole-stage codegen,
  * no UDFs), so they scale linearly with input bytes and shuffle
  * only what each op genuinely needs (e.g. dedup shuffles 16-byte
  * digests + doc ids, never the documents themselves).
  */
object TextOps {

  /** Tokens of a document; the generated corpus is single-space
    * delimited ASCII.
    */
  private def tokens = split(col("text"), " ")

  /** Single-file parquet inputs arrive as ONE partition; CPU-bound
    * maps whose lambdas run interpreted (higher-order `transform`)
    * must fan out first or they serialize on one core (see
    * Dedup.parallelized — same guard). No-op on real multi-file
    * inputs.
    */
  private[queries] def parallelized(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(parallelism / 2, 1))
      df.repartition(parallelism)
    else df
  }

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** Marker-token sets for the n-gram-free language-ID heuristic.
    * Real deployments would use char-n-gram profiles; the voting
    * scaffold (per-language evidence count → deterministic argmax)
    * is the part that matters at scale.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "los", "que"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "bu", "le")
  )

  private def markerCount(ms: Seq[String]): org.apache.spark.sql.Column = {
    val inList = ms.map(m => s"'$m'").mkString(", ")
    expr(s"size(filter(split(text, ' '), t -> t IN ($inList)))").cast("long")
  }

  /** The q34 argmax (first language with a strictly greater marker
    * count than the running best wins — ties keep the earlier
    * language), shared with the q331 confusion audit.
    */
  private def predLangCol: org.apache.spark.sql.Column = {
    val counts = langMarkers.map { case (l, ms) => l -> markerCount(ms) }
    counts.tail.foldLeft(
      (counts.head._2, lit(counts.head._1))) { case ((bc, bl), (l, c)) =>
      (when(c > bc, c).otherwise(bc), when(c > bc, lit(l)).otherwise(bl))
    }._2
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting (whitespace tokenizer).
    "q30_token_count" -> ((s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), size(tokens).cast("long").as("n_tokens"))),

    // Vocabulary drift between corpus versions — the release
    // comparison a data-curation pipeline runs before swapping in a
    // new crawl (q271 scores per-DOC novelty; this is the
    // distribution view): token share in each half (doc_id parity
    // stands in for version), per-token |Δ| in exact permille, top-20
    // divergent tokens. One token-count aggregate per half (same
    // single pass, conditional sums), 1-row broadcast totals, a
    // 20-row TakeOrdered — the corpus shuffles once, vocab-bounded
    // output.
    "q314_vocab_drift" -> ((s, d) => {
      val occ = parallelized(Tables(s, d).documents)
        .select((col("doc_id") % 2 === 0).as("is_a"),
          explode(tokens).as("tok"))
      val counts = occ.groupBy(col("tok")).agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
      val tot = counts.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      counts.crossJoin(broadcast(tot))
        .select(col("tok"), col("na").cast("long").as("na"),
          col("nb").cast("long").as("nb"),
          expr("(na * 1000) div ta").as("share_a_pm"),
          expr("(nb * 1000) div tb").as("share_b_pm"),
          expr("abs((na * 1000) div ta - (nb * 1000) div tb)").as("drift_pm"))
        .orderBy(col("drift_pm").desc, col("tok")).limit(20)
    }),

    // Document fingerprinting: content digest, the key for exact
    // dedup. At 100 TB the digest (16 bytes) is all that shuffles.
    "q31_fingerprint" -> ((s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), md5(col("text")).as("fp"))),

    // T5-style span corruption (Raffel et al. 2020) — the denoising-
    // objective prep that turns a clean document into (corrupted,
    // target) training pairs: fixed 3-token spans, a span masked iff
    // its md5(doc_id:span) leads with 0/1/2 (≈19%, deterministic —
    // the engine-independent stand-in for the usual RNG), masked
    // spans replaced by ordinal <X_k> sentinels in the input and
    // emitted as "<X_k> tokens…" in the target. Pure per-document
    // narrow projection: flags/prefix-sums are per-row array lambdas
    // over ≤ tens of spans, nothing shuffles, nothing is stateful —
    // the shape that lets objective prep run at ingest bandwidth.
    "q317_span_corruption" -> ((s, d) => {
      parallelized(Tables(s, d).documents)
        .filter(size(tokens) >= 1)
        .withColumn("toks", tokens)
        .withColumn("spans",
          expr("sequence(0, cast((size(toks) + 2) div 3 - 1 AS int))"))
        .withColumn("flags", expr(
          "transform(spans, s -> CASE WHEN substring(md5(concat(" +
            "cast(doc_id AS string), ':', cast(s AS string))), 1, 1)" +
            " IN ('0', '1', '2') THEN 1 ELSE 0 END)"))
        .withColumn("cums", expr(
          "transform(spans, s -> aggregate(slice(flags, 1, s), 0, " +
            "(a, x) -> a + x))"))
        .select(col("doc_id"),
          size(col("spans")).cast("long").as("n_spans"),
          expr("aggregate(flags, 0, (a, x) -> a + x)").cast("long")
            .as("n_masked"),
          expr("array_join(flatten(transform(spans, s -> " +
            "IF(element_at(flags, s + 1) = 1, " +
            "array(concat('<X_', cast(element_at(cums, s + 1) AS string)," +
            " '>')), slice(toks, s * 3 + 1, 3)))), ' ')").as("corrupted"),
          expr("array_join(flatten(transform(" +
            "filter(spans, s -> element_at(flags, s + 1) = 1), s -> " +
            "concat(array(concat('<X_', cast(element_at(cums, s + 1)" +
            " AS string), '>')), slice(toks, s * 3 + 1, 3)))), ' ')")
            .as("target"))
    }),

    // Source-distribution similarity matrix — the corpus-mixing
    // diagnostic that tells you which sources are interchangeable
    // (q314 diffs two versions; this compares ALL source pairs):
    // per-source token shares in permille, pairwise HISTOGRAM
    // INTERSECTION Σ min(share_a, share_b) — integer-exact, 1000 =
    // identical distributions. One token aggregate (the only corpus
    // shuffle), then a vocab-keyed pair join whose fan-out is
    // sources-per-token², and a sources²-sized output.
    "q322_source_similarity" -> ((s, d) => {
      val counts = parallelized(Tables(s, d).documents)
        .select(col("source"), explode(tokens).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      val tots = counts.groupBy(col("source")).agg(sum(col("n")).as("tot"))
      val shares = counts.join(broadcast(tots), "source")
        .select(col("source"), col("tok"),
          expr("(n * 1000) div tot").as("pm"))
      shares.select(col("source").as("sa"), col("tok"), col("pm").as("pa"))
        .join(shares.select(col("source").as("sb"), col("tok"),
          col("pm").as("pb")), Seq("tok"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(sum(least(col("pa"), col("pb"))).cast("long").as("overlap_pm"))
    }),

    // Vocabulary truncation coverage — the decision report behind
    // every "how big does the tokenizer vocab need to be" call
    // (q82 builds the vocab; this measures what truncating it COSTS):
    // keep the top-16 tokens by (count desc, token) — a TakeOrdered,
    // never a corpus sort — broadcast the kept set, and report per
    // source the exact permille of token INSTANCES that survive plus
    // how many distinct types fall to <unk>. The corpus tokenizes
    // once; everything after the broadcast join is source-keyed.
    "q327_vocab_truncate" -> ((s, d) => {
      val tok = parallelized(Tables(s, d).documents)
        .select(col("source"), explode(tokens).as("tok"))
      val kept = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(16)
        .select(col("tok"), lit(1L).as("keep"))
      tok.join(broadcast(kept), Seq("tok"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("keep").isNotNull, 1L).otherwise(0L)).as("n_kept"),
          countDistinct(when(col("keep").isNull, col("tok")))
            .as("n_unk_types"))
        .select(col("source"), col("n_tokens"),
          expr("(n_kept * 1000) div n_tokens").as("covered_pm"),
          col("n_unk_types"))
    }),

    // Exact dedup: hash-groupBy on the digest, keep the smallest id
    // (deterministic representative pick).
    "q32_exact_dedup" -> ((s, d) =>
      Tables(s, d).documents
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))),

    // Incremental (snapshot-vs-delta) dedup — the production shape
    // of q32: the corpus is an immutable BASE snapshot (doc_id % 10
    // != 0 here) and a freshly-ingested DELTA batch (doc_id % 10 =
    // 0). A delta doc ships iff (a) it is the min-id representative
    // of its content digest WITHIN the delta and (b) the digest
    // appears nowhere in the base — one delta-side aggregate plus a
    // LEFT ANTI join against the base's digest projection. Only
    // md5 digests ever shuffle (never text), and the base is never
    // re-clustered: daily ingestion costs O(|delta| + |base|·16 B),
    // not a full-corpus re-dedup.
    "q259_incremental_dedup" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val base = docs.filter(col("doc_id") % 10 =!= 0)
        .select(md5(col("text")).as("fp")).distinct()
      val deltaRep = docs.filter(col("doc_id") % 10 === 0)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_delta_copies"))
      deltaRep.join(base, Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp"), col("n_delta_copies"))
    }),

    // Quality scoring: length / punctuation / stopword signals.
    // Ratios are exact rationals (int/int) → bit-identical across
    // engines.
    "q33_quality" -> ((s, d) => {
      val nTok = size(tokens).cast("long")
      val nStop = markerCount(stopwords)
      val punct = (length(col("text")) -
        length(regexp_replace(col("text"), "[.!?,;]", ""))).cast("long")
      Tables(s, d).documents.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        punct.as("n_punct"),
        nStop.as("n_stopwords"),
        (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"))
    }),

    // Language ID: per-language marker-token votes, deterministic
    // argmax with fixed preference order on ties.
    "q34_lang_id" -> ((s, d) => {
      val counts = langMarkers.map { case (l, ms) => l -> markerCount(ms) }
      // argmax via chained when() (predLangCol): first language whose
      // count is strictly greater than the running best wins.
      Tables(s, d).documents.select(
        (counts.map { case (l, c) => c.as(s"c_$l") } :+
          predLangCol.as("pred_lang") :+ col("doc_id").as("doc_id")): _*)
    }),

    // Language-ID confusion matrix — the classifier-quality audit on
    // top of q34: predicted vs labeled language counts plus each
    // cell's share of its TRUE-label row in exact permille (the
    // per-language recall diagonal falls out). One doc-shaped
    // aggregate; row totals ride a broadcast join; output is the
    // 5×5-bounded matrix.
    "q331_langid_confusion" -> ((s, d) => {
      val m = Tables(s, d).documents
        .select(col("lang"), predLangCol.as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      val t = m.groupBy(col("lang")).agg(sum(col("n")).as("t"))
      m.join(broadcast(t), "lang")
        .select(col("lang"), col("pred_lang"), col("n"),
          expr("(n * 1000) div t").as("share_pm"))
    }),

    // Cohen's kappa — chance-corrected agreement between the labeled
    // language and q34's predictor, the single-number audit on top of
    // q331's confusion matrix (label quality for weak supervision:
    // raw accuracy flatters any skewed label distribution; kappa
    // subtracts what agreeing-by-luck would score). One doc-shaped
    // aggregate builds the ≤25-cell matrix; everything after runs on
    // that matrix (row/col margins, the Σ rᵢcᵢ chance term via a
    // class-keyed join of 5-row frames, three 1-row broadcast cross
    // joins). Exact integer permille; the n·a and n² products run in
    // DECIMAL(38,0) (HUGEINT in the oracle) because n² overflows
    // BIGINT beyond ~3e9 docs — `div` on decimals still yields
    // BIGINT, so the OUTPUT stays oracle-safe.
    "q376_cohen_kappa" -> ((s, d) => {
      val cell = Tables(s, d).documents
        .select(col("lang"), predLangCol.as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("nn"))
      val rows = cell.groupBy(col("lang").as("cls"))
        .agg(sum(col("nn")).as("r"))
      val cols = cell.groupBy(col("pred_lang").as("cls"))
        .agg(sum(col("nn")).as("c"))
      val chance = rows.join(cols, "cls")
        .agg(coalesce(sum(col("r").cast("decimal(19,0)")
          * col("c").cast("decimal(19,0)")), lit(0).cast("decimal(38,0)"))
          .as("s"))
      val totals = cell.agg(
        sum(col("nn")).cast("long").as("n"),
        coalesce(sum(when(col("lang") === col("pred_lang"), col("nn"))),
          lit(0L)).cast("long").as("a"))
      totals.crossJoin(chance)
        .select(col("n").as("n_docs"), col("a").as("n_agree"),
          expr("a * 1000 div n").as("po_permille"),
          expr("s * 1000 div (CAST(n AS DECIMAL(38,0)) * n)")
            .as("pe_permille"),
          // n² = S ⇔ both marginals are degenerate (one class): kappa
          // is undefined there and the div would raise under ANSI
          expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - s = 0 THEN NULL " +
            "ELSE (CAST(n AS DECIMAL(38,0)) * a - s) * 1000 " +
            "div (CAST(n AS DECIMAL(38,0)) * n - s) END").as("kappa_permille"))
    }),

    // BPE-ish regex token counting: alpha runs / digit runs / single
    // punctuation, the shape of a byte-pair pre-tokenizer.
    "q39_bpe_tokens" -> ((s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
            .cast("long").as("n_bpe_tokens"))),

    // Generator surface: explode tokens → global token frequencies.
    "q61_token_freq" -> ((s, d) =>
      Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))),

    // Vocabulary construction (the tokenizer-training primitive):
    // top-k tokens by corpus frequency with deterministic tie-break,
    // assigned dense ids in rank order. Scale shape: the global
    // "sort" is a TakeOrdered top-k (never a full corpus sort), and
    // the id-assignment window runs over k rows, not the corpus.
    "q82_vocab_topk" -> ((s, d) => {
      val k = 20
      val ranked = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(k)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("token"))
      ranked.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
    }),

    // N-gram language-model counts: corpus-level bigram frequencies,
    // top-k with deterministic tie-break — the count table a
    // Kneser–Ney-style LM or a contamination heuristic starts from.
    // Generator + hash aggregate + TakeOrdered: no full sort.
    "q83_bigram_counts" -> ((s, d) => {
      val toks = split(col("text"), " ")
      parallelized(Tables(s, d).documents)
        .filter(size(toks) >= 2)
        .select(explode(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(50)
    }),

    // Within-document repetition (Gopher-style quality signal): the
    // fraction of DISTINCT bigrams — repetitive docs (boilerplate,
    // keyword stuffing, decoding loops) score low and get flagged.
    // Ratio is an exact int/int rational, so it hash-matches across
    // engines; single-token docs define ratio 1.0. Pure narrow map.
    "q84_repetition" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val bgs = transform(sequence(lit(1), greatest(size(toks) - 1, lit(1))),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
      parallelized(Tables(s, d).documents).select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        when(size(toks) >= 2,
          size(array_distinct(bgs)).cast("double") / size(bgs).cast("double"))
          .otherwise(lit(1.0)).as("distinct_bigram_ratio"))
        .withColumn("repetitive", col("distinct_bigram_ratio") < 0.5)
    }),

    // LM-based quality scoring: the fraction of a document's bigram
    // OCCURRENCES that are corpus-rare (frequency ≤ 2) — a
    // perplexity proxy that needs no trained model: gibberish and
    // OCR noise score high, boilerplate scores ~0. Join key here is
    // the bigram string for oracle parity; at 100 TB hash it first
    // (xxhash64) so the count-table shuffle carries 8-byte keys.
    // The rate is an exact int/int rational — hash-matches across
    // engines.
    "q92_rare_bigrams" -> ((s, d) => {
      val toks = split(col("text"), " ")
      // bigram keys via the native AdjacentPairs expression (one JVM
      // pass per doc) — the transform/element_at/concat_ws lambda ran
      // interpreted per element, the expensive part of this query.
      // The keys only drive grouping (never surface), and the
      // separator-join over separator-free tokens is injective, so
      // grouping matches the oracle's space-joined bigrams.
      val bgs = org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.expressions.AdjacentPairs(
          org.apache.spark.sql.GraftColumnBridge.expression(toks)))
      // One bigram-construction pass, persisted so
      // the three consumers below never re-run it. The full
      // occurrence⋈counts join would shuffle every occurrence WITH
      // its frequency; instead only occurrences of the RARE subset
      // (freq ≤ 2 — small by definition on any corpus with reuse)
      // survive into the counting semi-join, and n_bigrams is a
      // per-doc count over the same persisted pass.
      val occ = parallelized(Tables(s, d).documents)
        .filter(size(toks) >= 2)
        .select(col("doc_id"), explode(bgs).as("bigram"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rare = occ.groupBy("bigram").agg(count(lit(1)).as("freq"))
        .filter(col("freq") <= 2)
      val nRare = occ.join(rare.select("bigram"), Seq("bigram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_rare"))
      val out = occ.groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"))
        .join(nRare, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"),
          coalesce(col("n_rare"), lit(0L)).as("n_rare"))
        .withColumn("rare_rate",
          col("n_rare").cast("double") / col("n_bigrams").cast("double"))
        .localCheckpoint() // materialize per-doc rows, release the corpus cache
      occ.unpersist()
      out
    }),

    // Text normalization: lowercase, strip non-alphanumerics,
    // collapse whitespace — the canonical pre-dedup cleaning map.
    "q46_normalize" -> ((s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
            " +", " ")).as("norm_text"))),

    // Exact token-set Jaccard near-dup pairs (n-gram Jaccard with
    // n=1) via the shared AllPairs/PPJoin core (Dedup.jaccardPairs:
    // prefix + length + position filters, hash-ordered elements so
    // posting lists stay balanced under the corpus's tiny skewed
    // vocabulary). Tokens are xxhash64'd before the join — c/na/nb
    // are set cardinalities, identical on hashes (64-bit collisions
    // across a corpus vocabulary are ~V²/2⁶⁵ — negligible), and the
    // string payloads never enter a shuffle. Exact rational Jaccard
    // → threshold compare is stable across engines.
    "q35_token_jaccard" -> ((s, d) => {
      val sets = Tables(s, d).documents.select(
        col("doc_id").as("id"),
        array_sort(transform(array_distinct(tokens), t => xxhash64(t))).as("ts"))
      Dedup.jaccardPairs(sets, threshold = 0.9)
    }),

    // Exact CONTAINMENT join (C(A→B) = |A∩B|/|A| ≥ 49/50) — the
    // asymmetric dedup leg Jaccard can't see: a short doc quoted
    // inside a long one scores near-zero Jaccard but containment 1.
    // ORDERED pairs (a inside b) via Dedup.containmentPairs: A-side
    // prefix filter + B-side full postings + position/size filters +
    // identical-set collapse, threshold and permille all in integer
    // arithmetic (c·50 ≥ 49·na — no float boundaries to disagree
    // on). The quote/partial-copy detector of the dedup suite.
    "q385_containment_join" -> ((s, d) => {
      val sets = Tables(s, d).documents.select(
        col("doc_id").as("id"),
        array_sort(transform(array_distinct(tokens), t => xxhash64(t))).as("ts"))
      Dedup.containmentPairs(sets, 49, 50)
        .withColumn("containment_pm", expr("c * 1000 div na"))
    }),

    // Cross-source contamination (train/test decontamination): how
    // many of each doc's distinct 3-grams appear verbatim in another
    // source. Exact; DuckDB rebuilds the grams with a list
    // comprehension.
    "q69_contamination" -> ((s, d) =>
      graft.operators.Contamination.crossSourceOverlap(
        Tables(s, d).documents, "doc_id", "text", "source")),

    // TF-IDF top terms per document. IDF is kept as the exact
    // rational surrogate tf·N/df (no log — engines disagree on libm
    // rounding; ranking is order-isomorphic for a single-doc list
    // since log is monotone in N/df only... it is NOT across mixed
    // tf, so this is documented as lift-weighted tf, the variant
    // every cross-engine-deterministic pipeline actually ships).
    // Scale shape: tf is the one corpus-sized shuffle; df is
    // vocab-sized (broadcast); the top-3 window runs per doc.
    "q115_tfidf" -> ((s, d) => {
      val occ = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), explode(tokens).as("token"))
      val tf = occ.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nDocs = Tables(s, d).documents.agg(count(lit(1)).as("n_docs"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(broadcast(dfreq), "token")
        .crossJoin(nDocs) // 1 row
        .withColumn("score",
          (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
        .withColumn("rk", row_number().over(wDoc).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("score"), col("rk"))
    }),

    // Cross-document repeated-span detection (exact substring-level
    // dedup à la Lee et al., "Deduplicating Training Data Makes
    // Language Models Better": 20-token windows). Every sliding
    // 20-token span is fingerprinted (md5 — oracle-reproducible);
    // only fingerprints shuffle, grouped by span with a distinct-doc
    // count; a doc is flagged when any of its spans also occurs in
    // another document. Same persisted-occurrence / rare-subset
    // semi-join shape as q92.
    "q119_span_dedup" -> ((s, d) => {
      val W = 20
      val base = Tables(s, d).documents
        .select(col("doc_id"), col("text"), tokens.as("toks"))
      // per-position span keys in ONE native pass (ShingleHashes64,
      // distinct = false): the composed transform/slice/concat_ws/md5
      // lambda ran interpreted per window position and copied a
      // W-token slice per position. The key only drives grouping
      // (never surfaces), and the space-join over space-free tokens
      // is injective per fixed W, so hash keys group identically to
      // the oracle's md5 strings.
      val occ = parallelized(base.filter(size(col("toks")) >= W))
        .select(col("doc_id"),
          explode(org.apache.spark.sql.GraftColumnBridge.column(
            graft.functions.expressions.ShingleHashes64(
              org.apache.spark.sql.GraftColumnBridge.expression(col("text")),
              W, distinct = false))).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val shared = occ.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
      val nShared = occ.join(shared.select("g"), Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      val nSpans = occ.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      val out = base.select("doc_id")
        .join(nSpans, Seq("doc_id"), "left")
        .join(nShared, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .withColumn("flagged", col("n_shared") > 0)
        .localCheckpoint() // per-doc rows only; release the span cache
      occ.unpersist()
      out
    }),

    // Cross-document span REMOVAL — the actual dedup transformation
    // of Lee et al. (q119 is the detection half): every 20-token
    // span occurring in ≥2 documents keeps only its canonical
    // owner's copies (min doc_id); all other documents remove the
    // UNION of token positions covered by their removable spans
    // (overlapping spans counted once, via position explode +
    // distinct). Emits the per-doc removal accounting a corpus
    // release reports.
    "q157_span_removal" -> ((s, d) => {
      val W = 20
      val base = Tables(s, d).documents.select(col("doc_id"), tokens.as("toks"))
      val occ = parallelized(base.filter(size(col("toks")) >= W))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), size(col("toks")) - (W - 1)),
            i => md5(concat_ws(" ", slice(col("toks"), i, lit(W)))))))
        .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val owners = occ.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("nd"), min(col("doc_id")).as("owner"))
        .filter(col("nd") >= 2)
      val removable = occ.join(owners, "g")
        .filter(col("doc_id") =!= col("owner"))
      val removed = removable
        .select(col("doc_id"),
          explode(sequence(col("i"), col("i") + (W - 1))).as("p"))
        .groupBy("doc_id")
        .agg(countDistinct(col("p")).as("n_removed"))
      val out = base
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
        .join(removed, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"))
        .withColumn("n_kept", col("n_tokens") - col("n_removed"))
        .localCheckpoint() // per-doc rows only; release the span cache
      occ.unpersist()
      out
    }),

    // Cross-document span EXCISION — the CLEANED CORPUS itself (r12
    // verdict item 5; the transform half of Lee et al. 2022's
    // exact-substring dedup): q157 emits the removal ACCOUNTING,
    // this emits the rewritten text a curation pipeline actually
    // ships. Every 20-token span occurring in ≥2 documents keeps
    // only the canonical owner's copies (min doc_id); every other
    // document drops the UNION of token positions its removable
    // spans cover (overlaps counted once) and re-joins the
    // survivors single-spaced. Untouched documents pass their
    // ORIGINAL text through byte-exact — no split/re-join round
    // trip. Shape: the same persisted span grid as q119/q157; the
    // per-doc removal set is a sorted position array consumed by one
    // index-aware filter lambda (doc-grain — the kept corpus never
    // explodes); output is doc-sized. Fully hash-oracled: md5 span
    // fingerprints, integer positions, and string output are
    // engine-exact.
    "q479_span_excise" -> ((s, d) => {
      val W = 20
      val base = Tables(s, d).documents
        .select(col("doc_id"), col("text"), tokens.as("toks"))
      val occ = parallelized(base.filter(size(col("toks")) >= W))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), size(col("toks")) - (W - 1)),
            i => md5(concat_ws(" ", slice(col("toks"), i, lit(W)))))))
        .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val owners = occ.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("nd"),
          min(col("doc_id")).as("owner"))
        .filter(col("nd") >= 2)
      val removed = occ.join(owners, "g")
        .filter(col("doc_id") =!= col("owner"))
        .select(col("doc_id"),
          explode(sequence(col("i"), col("i") + (W - 1))).as("p"))
        .groupBy("doc_id")
        .agg(array_sort(collect_set(col("p"))).as("rm"))
      // the rewrite lambda: rm is SORTED (array_sort(collect_set)),
      // so the kept tokens come from one native merge walk
      // (ExcisePositions, O(tokens + |rm|)) instead of an interpreted
      // per-token array_contains scan (O(tokens × |rm|) on
      // boilerplate-heavy docs — r13 verdict note 4)
      def excise(toks: org.apache.spark.sql.Column,
          rm: org.apache.spark.sql.Column) = {
        import org.apache.spark.sql.GraftColumnBridge
        GraftColumnBridge.column(
          graft.functions.expressions.ExcisePositions(
            GraftColumnBridge.expression(toks),
            GraftColumnBridge.expression(rm)))
      }
      val out = base
        .join(removed, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("rm").isNull, col("text"))
            .otherwise(concat_ws(" ", excise(col("toks"), col("rm"))))
            .as("text_clean"),
          size(col("toks")).cast("long").as("n_tokens"),
          coalesce(size(col("rm")), lit(0)).cast("long").as("n_removed"))
        .localCheckpoint() // doc-sized; release the span cache
      occ.unpersist()
      out
    }),

    // Per-source dataset card — the summary block a corpus release
    // ships: volume, token mass, language spread, exact-dup rate.
    // One aggregation pass; dup rate via countDistinct(md5(text))
    // against doc count, both exact rationals.
    "q122_dataset_card" -> ((s, d) =>
      Tables(s, d).documents
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens)).cast("long").as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(md5(col("text"))).as("n_unique"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          (col("total_tokens").cast("double") / col("n_docs").cast("double"))
            .as("avg_tokens"),
          col("n_langs"), col("n_unique"),
          ((col("n_docs") - col("n_unique")).cast("double") /
            col("n_docs").cast("double")).as("dup_rate"))),

    // BPE-style merge training (Sennrich et al. 2016) at token
    // grain: 6 rounds of distributed pair counting + greedy
    // re-segmentation (operators.BpeTrain). Iterative stateful fold
    // — not SQL-expressible, so this is a rows-only gate; the merge
    // table is proven against a single-node reference implementation
    // in BpeTrainSpec.
    "q141_bpe_train" -> ((s, d) =>
      graft.operators.BpeTrain.train(Tables(s, d).documents, "text", k = 6)),

    // Tokenizer APPLICATION: re-segment every doc under the merge
    // table q141 trains (same corpus, same k — the frozen-vocabulary
    // lifecycle: train once, encode everywhere). The merge table is
    // k rows pulled to the driver and baked into k chained folds —
    // a pure narrow map over the corpus, no join, no shuffle.
    // Deterministic but an iterative fold — rows-only gate; the
    // encoding is proven against a single-node reference encoder in
    // BpeTrainSpec, and compression (n_after <= n_before) plus
    // round-trip (splitting merged symbols restores the original
    // tokens) are pinned there too.
    "q167_bpe_encode" -> ((s, d) => {
      import graft.operators.BpeTrain
      val docs = parallelized(Tables(s, d).documents)
      val merges = BpeTrain.train(docs, "text", k = 6)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      BpeTrain.encode(docs.select(col("doc_id"), col("text")), "text", merges)
        .select(col("doc_id"), col("n_syms_before"), col("n_syms_after"),
          concat_ws(" ", col("syms")).as("encoded"))
    }),

    // Higher-order array algebra in one projection — filter /
    // aggregate / exists over the token array without exploding
    // (row count stays 1 per doc; the explode-free form matters when
    // the per-doc reduction is all you need). Lambdas interpret per
    // element, so this surface is for SEMANTICS; the hot dedup loops
    // use the native expressions instead (CLAUDE.md note).
    "q178_array_algebra" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables(s, d).documents.select(col("doc_id"),
        size(filter(toks, t => length(t) >= 5)).cast("long").as("n_long"),
        aggregate(toks, lit(0L), (a, t) => a + length(t)).as("total_chars"),
        exists(toks, t => t === "the").as("has_the"))
    }),

    // URL NORMALIZATION + dedup — the crawl-frontier canonicalizer:
    // scheme/host case-folded, default port stripped, query+fragment
    // dropped, trailing slash removed. Planted variants (case, port,
    // query differ by doc) MUST collapse to one canonical URL per
    // page; the output is the URL-dedup table (url_norm, n_docs).
    // One codegen projection + a host-sized aggregate.
    "q180_url_normalize" -> ((s, d) => {
      val raw = concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://Site")).otherwise(lit("https://site")),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 2 === 0, lit(".Example.ORG")).otherwise(lit(".example.org")),
        when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), (col("doc_id") % 100).cast("string"),
        when(col("doc_id") % 2 === 1, lit("/?utm_source=feed#frag")).otherwise(lit("/")))
      val host = regexp_replace(
        lower(regexp_extract(raw, "^[A-Za-z]+://([^/]+)", 1)), ":443$", "")
      val path = regexp_replace(
        regexp_extract(raw, "^[A-Za-z]+://[^/]+([^?#]*)", 1), "/$", "")
      Tables(s, d).documents
        .select(concat(lit("https://"), host, path).as("url_norm"))
        .groupBy(col("url_norm"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Per-domain document cap — the frontier-politeness / diversity
    // rule (≤ 5 docs per host, chosen in deterministic md5 order,
    // not first-crawled-wins). Same shape as q165's budget but keyed
    // on the planted domain; per-domain windows stay parallel.
    "q183_domain_cap" -> ((s, d) => {
      val domain = concat(lit("site"), (col("doc_id") % 50).cast("string"),
        lit(".example.org"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables(s, d).documents
        .select(col("doc_id"), domain.as("domain"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
    }),

    // URL extraction + domain histogram (the crawl-curation pass:
    // which hosts feed the corpus, and how much). URLs are planted
    // deterministically (the synthetic corpus has none) with the
    // same construction in the oracle — one codegen'd
    // extract-explode-aggregate pass; domain cardinality is
    // host-sized, so the shuffle carries (domain, partial counts).
    "q166_url_extract" -> ((s, d) => {
      val planted = concat(col("text"),
        lit(" see https://site"), (col("doc_id") % 50).cast("string"),
        lit(".example.org/p/"), col("doc_id").cast("string"),
        lit(" and http://mirror"), (col("doc_id") % 7).cast("string"),
        lit(".example.net/x"))
      val urlRe = "https?://[a-z0-9.-]+\\.example\\.(org|net)/[A-Za-z0-9/._-]*"
      Tables(s, d).documents
        .select(col("doc_id"),
          explode(regexp_extract_all(planted, lit(urlRe), lit(0))).as("url"))
        .select(col("doc_id"),
          regexp_extract(col("url"), "https?://([a-z0-9.-]+)/", 1).as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"))
    }),

    // Crawl-frontier dedup ledger — the URL-seen-set at URL grain
    // (q166 rolls to domains): per extracted URL, the first document
    // to reference it (min doc_id — the crawl that "claimed" it) and
    // the reference count. Unique per-doc paths stay singletons; the
    // shared mirror URLs collapse — exactly the frontier ledger a
    // crawler consults before re-fetching. (url, doc_id) pairs are
    // the only shuffle.
    "q301_url_frontier" -> ((s, d) => {
      val planted = concat(col("text"),
        lit(" see https://site"), (col("doc_id") % 50).cast("string"),
        lit(".example.org/p/"), col("doc_id").cast("string"),
        lit(" and http://mirror"), (col("doc_id") % 7).cast("string"),
        lit(".example.net/x"))
      val urlRe = "https?://[a-z0-9.-]+\\.example\\.(org|net)/[A-Za-z0-9/._-]*"
      Tables(s, d).documents
        .select(col("doc_id"),
          explode(regexp_extract_all(planted, lit(urlRe), lit(0))).as("url"))
        .groupBy(col("url"))
        .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_refs"))
    }),

    // Token-association mining: top bigrams by PMI's exact-rational
    // core lift = c_xy·N / (c_x·c_y) (log omitted — monotone, so
    // the RANKING is exactly PMI's; the rational hash-matches
    // across engines where log1p rounding would not). Unigram
    // counts are vocab-sized → broadcast twice; min-support filter
    // bounds the ranked set before the TakeOrdered top-50.
    "q124_pmi_bigrams" -> ((s, d) => {
      // bigram emission via the native AdjacentPairs expression (the
      // per-position struct lambda ran interpreted); the joined key
      // carries both words through the count, and (w1, w2) split back
      // out AFTER the c_xy >= 5 filter — vocabulary-bounded rows
      // instead of every corpus position. Separator-join over
      // separator-free tokens is injective, so the grouping and the
      // reconstructed words match the lambda form exactly.
      val sep = graft.functions.expressions.AdjacentPairs.Sep
      val occ = parallelized(Tables(s, d).documents)
        .filter(size(tokens) >= 2)
        .select(explode(org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.expressions.AdjacentPairs(
            org.apache.spark.sql.GraftColumnBridge.expression(tokens))))
          .as("g"))
      val bi = occ.groupBy("g").agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
        .select(substring_index(col("g"), sep, 1).as("w1"),
          expr(s"substring(g, locate('$sep', g) + 1)").as("w2"),
          col("c_xy"))
      val uni = parallelized(Tables(s, d).documents)
        .select(explode(tokens).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      // total tokens from the vocab-sized aggregate — no second
      // corpus explode
      val nTok = uni.agg(sum(col("c")).as("n_tok"))
      bi.join(broadcast(uni.select(col("tok").as("w1"), col("c").as("c1"))), "w1")
        .join(broadcast(uni.select(col("tok").as("w2"), col("c").as("c2"))), "w2")
        .crossJoin(nTok) // 1 row
        .withColumn("lift",
          (col("c_xy") * col("n_tok")).cast("double") /
            (col("c1") * col("c2")).cast("double"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(50)
        .select(col("w1"), col("w2"), col("c_xy"), col("lift"))
    }),

    // Typo-correction fuzzy join (OCR / scrape-noise cleanup):
    // deterministic single-char-deletion typos matched back to the
    // vocabulary under an EXACTNESS-PRESERVING blocking scheme — a
    // single edit keeps the first character or the last character
    // (or both) intact, so every distance-≤1 pair appears in the
    // union of two equi-joins on (edge char, length) keys; the
    // |len(a)−len(b)| ≤ 1 band rides the key via a 3-way length
    // fan-out on the vocab side. Candidates are bounded by the
    // (char × length) bucket sizes, never the |typos| × |vocab|
    // cross product a naive fuzzy join scans; the thresholded
    // levenshtein(a, b, 1) verifies with early exit. Exact integer
    // distances → hash-oracled against DuckDB's brute force.
    "q190_fuzzy_match" -> ((s, d) => {
      val toks = parallelized(Tables(s, d).documents)
        .select(explode(tokens).as("w")).distinct()
      val vocab = toks.filter(length(col("w")) >= 3)
      val typos = toks
        .filter(length(col("w")) >= 4 &&
          substring(md5(col("w")), 2, 1) <= "7")
        .withColumn("p",
          (ascii(substring(md5(col("w")), 1, 1)) % length(col("w"))) + lit(1))
        .select(expr("concat(substring(w, 1, p - 1), substring(w, p + 1))")
          .as("typo"))
        .distinct()
        .withColumn("lt", length(col("typo")))
        .withColumn("c1", substring(col("typo"), 1, 1))
        .withColumn("cz", substring(col("typo"), -1, 1))
      val vks = vocab
        .withColumn("v1", substring(col("w"), 1, 1))
        .withColumn("vz", substring(col("w"), -1, 1))
        .withColumn("lk",
          explode(array(length(col("w")) - 1, length(col("w")),
            length(col("w")) + 1)))
      typos.join(vks, col("c1") === col("v1") && col("lt") === col("lk"))
        .unionByName(
          typos.join(vks, col("cz") === col("vz") && col("lt") === col("lk")))
        .select(col("typo"), col("w").as("vocab_token"))
        .distinct()
        .withColumn("dist", expr("levenshtein(typo, vocab_token, 1)").cast("long"))
        .filter(col("dist") >= 0)
    }),

    // regexp_extract_all → flatten: every match per document as its
    // own row (the multi-match form q22-style single extracts can't
    // express). The char-class pattern keeps Java and RE2 regex
    // semantics identical; matches are non-overlapping left-to-right
    // in both engines. Row-local codegen, one generator — no joins.
    "q199_regex_all" -> ((s, d) => {
      parallelized(Tables(s, d).documents)
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(text, '[a-z]*a[a-z]*', 0)"))
            .as("m"))
    }),

    // Tokenizer vocabulary coverage / OOV accounting: top-20 corpus
    // vocabulary (deterministic (count, token) tie-break, TakeOrdered
    // — never a global sort), broadcast back over the token stream,
    // per-doc out-of-vocabulary counts and the exact int/int rate.
    // The shape every "how much of my corpus does this tokenizer
    // cover" audit needs: one corpus-sized shuffle (token counts),
    // then a broadcast probe.
    "q200_oov_rate" -> ((s, d) => {
      val tf = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), explode(tokens).as("tok"))
      val vocab = tf.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(20)
        .select(col("tok"), lit(1).as("in_v"))
      tf.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast("double") / col("n_tok").cast("double"))
    }),

    // Compression-ratio quality signal (native DeflateLen codegen
    // expression): repetitive/templated text compresses far below
    // natural prose, so dlen/n_chars flags boilerplate with zero
    // linguistic machinery — the CCNet/RefinedWeb-style gate.
    // zlib output is implementation-specific → rows-only gate;
    // TextOpsSpec pins run-to-run equality and the
    // repetitive-compresses-more ordering.
    "q235_deflate_ratio" -> ((s, d) => {
      import org.apache.spark.sql.GraftColumnBridge
      val dlen = GraftColumnBridge.column(
        graft.functions.expressions.DeflateLen(
          GraftColumnBridge.expression(col("text"))))
      parallelized(Tables(s, d).documents)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          dlen.as("dlen"))
        .withColumn("ratio",
          col("dlen").cast("double") / col("n_chars").cast("double"))
        .withColumn("boilerplate", col("ratio") < 0.3)
    }),

    // Feature-hashing vectorizer (the hashing trick): each token
    // folded to one of 64 dims by a deterministic md5-character
    // mix, per-(doc, dim) integer counts — the classical sparse
    // bag-of-words featurization with a FIXED dimensionality and no
    // vocabulary pass. Long-form output keeps the shuffle a plain
    // two-key aggregate; exact integers hash-oracle.
    "q236_feature_hashing" -> ((s, d) => {
      val h = md5(col("tok"))
      val dim = (ascii(substring(h, 1, 1)) * 49 +
        ascii(substring(h, 2, 1)) * 7 + ascii(substring(h, 3, 1))) % 64
      parallelized(Tables(s, d).documents)
        .select(col("doc_id"), explode(tokens).as("tok"))
        .select(col("doc_id"), dim.cast("long").as("dim"))
        .groupBy("doc_id", "dim").agg(count(lit(1)).as("cnt"))
    }),

    // Inverted-index conjunctive search: the posting-list shape of
    // every full-text engine as one relational pass — postings are
    // restricted to the query terms BEFORE the shuffle (map-side
    // selectivity: only (doc_id, term) pairs for the 3 query terms
    // ever move), the AND is a count-distinct-terms gate, and the
    // per-doc occurrence total is the tf evidence a ranker would
    // consume. At 100 TB the shuffle is bounded by the query
    // terms' posting lists, never the corpus.
    "q254_conjunctive_search" -> ((s, d) => {
      val terms = Seq("spark", "vector", "dup")
      val posts = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), explode(tokens).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("occ"))
      posts.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("occ")).as("n_occ"))
        .filter(col("n_terms") === lit(terms.size))
        .select(col("doc_id"), col("n_occ"))
    }),

    // Prefix top-k completion build — the autocomplete index: for
    // every 1..3-char prefix of every corpus token (len >= 3), the
    // highest-frequency completion (count desc, token asc). One
    // (prefix, token) aggregate + a per-prefix rank window —
    // thousands of independent prefix partitions at any vocabulary
    // size, and the output is bounded by |prefixes|, not corpus.
    "q281_prefix_topk" -> ((s, d) => {
      val toks = parallelized(Tables(s, d).documents)
        .select(explode(tokens).as("tok"))
        .filter(length(col("tok")) >= 3)
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val prefixed = toks.select(explode(expr(
        "transform(sequence(1, 3), i -> substr(tok, 1, i))")).as("prefix"),
        col("tok"), col("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("prefix"))
        .orderBy(col("cnt").desc, col("tok"))
      prefixed.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("prefix"), col("tok").as("completion"), col("cnt"))
    }),

    // N-gram novelty scoring against a reference corpus — q259 asks
    // "is this doc a duplicate?", this asks "how much of it is NEW?":
    // per delta doc (doc_id % 10 = 0), the share of its distinct
    // 8-gram fingerprints absent from the base snapshot's gram set.
    // The novelty fraction drives dedup-aware mixing (upweight novel
    // crawl, downweight boilerplate). Grams are md5 of the joined
    // 8-token window (engine-reproducible, unlike seeded xxhash
    // shingles); only 16-byte digests shuffle, and the base side is
    // a distinct-projection — no text ever moves. The LEFT join's
    // null-hit count is the novelty tally.
    "q271_novelty_score" -> ((s, d) => {
      val docs = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 8)
      // 8-gram keys in ONE native pass (ShingleHashes64): the
      // interpreted transform/slice/md5 lambda was the corpus-pass
      // cost. Keys only drive the distinct + anti-hit grouping (never
      // surface); space-join over space-free tokens is injective per
      // fixed window, so hash keys group identically to md5 strings.
      // Per-doc distinct here equals the consumers' downstream
      // distincts (both sides dedup before use).
      val grams = docs.select(col("doc_id"),
        explode(org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.expressions.ShingleHashes64(
            org.apache.spark.sql.GraftColumnBridge.expression(col("text")),
            8))).as("g"))
      val base = grams.filter(col("doc_id") % 10 =!= 0)
        .select(col("g")).distinct().withColumn("hit", lit(1))
      grams.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("g")).distinct()
        .join(base, Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_novel"))
    }),

    // Positional phrase search — q254's conjunctive index upgraded
    // with positions: postings become (doc_id, term, pos) and the
    // phrase "fast table" is the pos₂ = pos₁ + 1 adjacency join
    // between the two terms' lists. Postings are restricted to the
    // query terms BEFORE any shuffle (map-side isin), the join is
    // doc-keyed with the adjacency as a residual predicate, and the
    // per-doc match count is the ranker evidence. Shuffle volume is
    // the two posting lists — never the corpus — at any scale.
    "q264_phrase_search" -> ((s, d) => {
      val posts = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "tok")))
        .filter(col("tok").isin("fast", "table"))
      val a = posts.filter(col("tok") === "fast")
        .select(col("doc_id"), col("pos").as("p1"))
      val b = posts.filter(col("tok") === "table")
        .select(col("doc_id"), col("pos").as("p2"))
      a.join(b, Seq("doc_id"))
        .filter(col("p2") === col("p1") + 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_phrase"))
    }),

    // Unicode NFC normalization (native NfcNormalize codegen
    // expression): composed and decomposed forms of the same visible
    // text — planted here as "café" in both encodings by doc parity
    // — collapse to one canonical string, the pass exact dedup and
    // token counting need on any multilingual corpus. Oracle:
    // DuckDB's nfc_normalize over the identically planted input;
    // both engines implement standard Unicode NFC, so the outputs
    // hash-match.
    "q228_unicode_normalize" -> ((s, d) => {
      import org.apache.spark.sql.GraftColumnBridge
      def nfc(c: org.apache.spark.sql.Column) =
        GraftColumnBridge.column(graft.functions.expressions.NfcNormalize(
          GraftColumnBridge.expression(c)))
      // composed U+00E9 vs decomposed e + combining acute U+0301 -
      // byte-distinct, visually identical
      val marker = when(col("doc_id") % 2 === 0, lit("caf\u00e9"))
        .otherwise(lit("cafe\u0301"))
      Tables(s, d).documents
        .select(col("doc_id"),
          nfc(concat(marker, lit("-"), col("source"))).as("norm"))
    }),

    // parse_url component extraction (q180 normalizes by regex; this
    // is the STRUCTURED accessor a crawl pipeline should prefer):
    // HOST / PATH / QUERY plus a single query parameter, over
    // deterministically planted URLs — the oracle rebuilds each
    // component from the construction rule.
    "q226_parse_url" -> ((s, d) => {
      Tables(s, d).documents
        .withColumn("u", concat(lit("https://site"),
          (col("doc_id") % 50).cast("string"), lit(".example.org/p/"),
          (col("doc_id") % 100).cast("string"), lit("?utm=feed&page="),
          (col("doc_id") % 7).cast("string"), lit("#frag")))
        .select(col("doc_id"),
          expr("parse_url(u, 'HOST')").as("host"),
          expr("parse_url(u, 'PATH')").as("path"),
          expr("parse_url(u, 'QUERY')").as("query"),
          expr("parse_url(u, 'QUERY', 'page')").as("page"))
    }),

    // Array set algebra between adjacent documents: token-SET
    // intersect / union / except sizes (the building blocks q35's
    // Jaccard core evaluates natively) exposed as the plain
    // array_intersect / array_union / array_except surface. Sets
    // are array_distinct + array_sort'd first, sizes are exact
    // ints; the pairing is a narrow id-shift self-join.
    "q210_array_setops" -> ((s, d) => {
      val t = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), array_sort(array_distinct(tokens)).as("ts"))
      val a = t.select(col("doc_id").as("a_id"), col("ts").as("sa"))
      val b = t.select((col("doc_id") - 1).as("a_id"), col("ts").as("sb"))
      a.join(b, "a_id")
        .select(col("a_id"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_common"),
          size(array_union(col("sa"), col("sb"))).cast("long").as("n_union"),
          size(array_except(col("sa"), col("sb"))).cast("long").as("n_only_a"))
    }),

    // Gopher-style repetition filter (Rae et al. 2021 §A1.1): the
    // fraction of a document occupied by its most frequent 2-gram,
    // and the mass of repeated 2-grams, both as EXACT integers —
    // verdicts by cross-multiplication, no division anywhere. Scale
    // shape: the (doc, bigram) partial counts are map-side combined;
    // at 100 TB this is the tf shuffle (q115's accepted shape),
    // bounded by distinct (doc, bigram) pairs, with the per-doc
    // reduce a fixed 4-number state.
    "q245_repetition_filter" -> ((s, d) => {
      val docs = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val bg = docs.select(col("doc_id"), explode(
        expr("zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("bg"))
      bg.groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_bigrams"),
          count(lit(1)).cast("long").as("n_distinct"),
          max(col("c")).cast("long").as("top_count"))
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
          col("top_count"),
          // Gopher: top-2gram fraction > 0.20 → drop; repeated-2gram
          // mass (occurrences beyond first) > 0.40 → drop
          (col("top_count") * 5 <= col("n_bigrams") &&
            (col("n_bigrams") - col("n_distinct")) * 5 <= col("n_bigrams") * 2)
            .as("keep"))
    }),

    // Bigram language-model scoring (the KenLM-perplexity proxy of a
    // CCNet-style quality pipeline) in EXACT integer arithmetic: the
    // corpus LM is c(a,b) / c(a,·); each document scores the SUM over
    // its bigram occurrences of floor(1e6 · c(a,b) / c(a,·)) — a
    // deterministic scaled log-free fluency proxy (higher = the
    // corpus predicts the doc's transitions better). Scale shape:
    // counts are map-side-combined aggregates; occurrences join the
    // model BY KEY (bigram / prefix), never broadcastless-cartesian;
    // at trillion-token scale the 1e6 scaling needs DECIMAL — noted,
    // not needed at int64 until c(a,b) > 9.2e12.
    "q246_bigram_lm_score" -> ((s, d) => {
      val docs = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val occ = docs.select(col("doc_id"), explode(
        expr("zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a AS a, concat(a, ' ', b) AS bg))")).as("o"))
        .select(col("doc_id"), col("o.a").as("a"), col("o.bg").as("bg"))
      val cAb = occ.groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      val cA = occ.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
      occ.join(cAb, "bg").join(cA, "a")
        .withColumn("p6", expr("(1000000 * c_ab) div c_a"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          sum(col("p6")).cast("long").as("score6"))
    }),

    // BM25 document ranking (Okapi) for a fixed OR-term query — the
    // retrieval scorer next to q115's tf-idf lift. k1 = 6/5 and
    // b = 3/4 are exact rationals, so the whole score is fixed-point
    // integer arithmetic (the log-free odds IDF
    // (N − df + ½)/(df + ½), doubled to clear halves — log is libm-
    // divergent across engines, and the odds form is monotone in it):
    //   r_milli        = 1000·dl·N div L            (dl/avgdl, ‰)
    //   idf_milli      = (2N − 2df + 1)·1000 div (2df + 1)
    //   tfpart_micro   = 44·10⁶·tf div (20000·tf + 6000 + 18·r_milli)
    //   score_nano     = Σ_terms idf_milli · tfpart_micro
    // Each floor-division is DEFINED semantics (both engines truncate
    // identically on positives), so the score hash-matches — no float
    // BM25 ever would. Scale shape: the posting explode is term-
    // filtered BEFORE its shuffle (3 query terms, narrow filter on
    // the exploded stream); df/totals are term-/1-row broadcast
    // frames; the global top-10 is TakeOrderedAndProject, never a
    // full sort. At trillion-token L the 1000·dl·N numerator needs
    // DECIMAL — noted; int64-safe past sf1000 here.
    "q388_bm25_rank" -> ((s, d) => {
      val qTerms = Seq("dup", "vector", "spark")
      val base = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), tokens.as("toks"))
      val dl = base.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"))
      val tot = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_len"))
      val tf = base.select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(tot)) // 1 row
        .withColumn("r_milli", expr("(1000 * dl * n_docs) div total_len"))
        .withColumn("idf_milli",
          expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
        .withColumn("tfpart_micro",
          expr("(44000000 * tf) div (20000 * tf + 6000 + 18 * r_milli)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_terms"),
          sum(expr("CAST(idf_milli AS DECIMAL(38,0)) * tfpart_micro"))
            .as("s9"))
      scored.orderBy(col("s9").desc, col("doc_id")).limit(10)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("s9").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("n_terms"),
          col("s9").cast("decimal(38,0)").cast("string").as("score_nano"),
          col("rk"))
    }),

    // Context-length truncation audit — the capacity-planning readout
    // a tokenize-and-truncate training pipeline needs BEFORE it picks
    // a sequence length: for each candidate context limit, how many
    // documents truncate, how many tokens fall off, and the exact
    // permille of corpus tokens kept. ONE corpus pass computes token
    // counts; a broadcast 4-row limit spine fans each doc to its 4
    // verdicts (bounded ×4, never a per-limit rescan); integer-only
    // output. At 100 TB this is the difference between auditing four
    // sequence lengths in one job and four.
    "q411_truncation_audit" -> ((s, d) => {
      val toks = Tables(s, d).documents
        .select(col("doc_id"), size(split(col("text"), " ")).as("tk"))
      val lims = s.range(1).select(
        explode(array(lit(16), lit(32), lit(64), lit(96))).as("lim"))
      toks.crossJoin(broadcast(lims))
        .groupBy(col("lim"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("tk") > col("lim"), 1L).otherwise(0L))
            .cast("long").as("n_truncated"),
          sum(greatest(col("tk") - col("lim"), lit(0)))
            .cast("long").as("tokens_lost"),
          sum(least(col("tk"), col("lim"))).cast("long").as("tokens_kept"))
        .withColumn("kept_permille",
          expr("(tokens_kept * 1000) div (tokens_kept + tokens_lost)"))
        .withColumn("lim", col("lim").cast("long"))
    }),

    // Multi-needle SUBSTRING blocklist screen — the safety-filter
    // audit a curation pipeline runs before release: for each
    // blocked term, how many documents contain it and how often in
    // total. Needles here derive deterministically from the corpus
    // (top-5 tokens of length ≥ 4 by (count desc, token asc) — a
    // stand-in for the externally-supplied blocklist). Occurrence
    // counting is the pure-builtin identity
    // (len(text) − len(replace(text, needle, ''))) / len(needle) —
    // exact, codegen'd, non-overlapping (both engines' replace
    // semantics). Scale shape: the needle list broadcasts (M rows),
    // the corpus streams through ONCE per the M-way nested-loop
    // expansion with all M compares inside codegen — at blocklists
    // beyond a few hundred terms the upgrade path is an automaton
    // expression (Aho–Corasick), same join shape.
    "q422_blocklist_screen" -> ((s, d) => {
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val needles = docs
        .select(explode(split(col("text"), " ")).as("needle"))
        .filter(length(col("needle")) >= 4)
        .groupBy(col("needle")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("needle"))
        .limit(5)
        .select(col("needle"))
      val total = docs.agg(count(lit(1)).as("n_docs_total"))
      docs.crossJoin(broadcast(needles))
        .select(col("doc_id"), col("needle"),
          expr("(length(text) - length(replace(text, needle, ''))) div " +
            "length(needle)").cast("long").as("occ"))
        .groupBy(col("needle"))
        .agg(sum(when(col("occ") > 0, 1L).otherwise(0L))
          .cast("long").as("n_docs_hit"),
          sum(col("occ")).cast("long").as("total_occurrences"))
        .crossJoin(broadcast(total))
        .withColumn("hit_permille",
          expr("(n_docs_hit * 1000) div n_docs_total"))
        .drop("n_docs_total")
    }),

    // Curation dedup with KEEP-BEST survivorship — the q68 keep-one
    // decision upgraded from "min id" to "best QUALITY": exact
    // token-Jaccard near-dup pairs (the q35 AllPairs machinery) →
    // connected components → per cluster keep the LONGEST member
    // (n_chars, tie → min doc_id; length as the quality stand-in a
    // real pipeline would replace with q33's score). Emits one row
    // per cluster with the kept member and the discard count — the
    // curation ledger. CC shuffles (id, label) pairs only; the
    // argmax is one max-struct aggregate, never a window over the
    // corpus.
    "q439_curation_dedup" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val sets = docs.select(col("doc_id").as("id"),
        array_sort(transform(array_distinct(tokens), t => xxhash64(t))).as("ts"))
      val pairs = Dedup.jaccardPairs(sets, threshold = 0.9)
        .select("a_id", "b_id")
      val clusters = Dedup.duplicateClusters(pairs, docs.select(col("doc_id")))
      clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).cast("long").as("cluster_size"),
          max(struct(col("n_chars").as("nc"),
            (-col("doc_id")).as("nid"))).as("b"))
        .select(col("cluster_id"), (-col("b.nid")).as("kept_doc_id"),
          col("b.nc").cast("long").as("kept_chars"), col("cluster_size"),
          (col("cluster_size") - 1).cast("long").as("n_discarded"))
    }),

    // Contamination-AWARE train/test split — q73's md5 split made
    // leak-safe: after the deterministic split, any train document
    // sharing a word 3-gram with ANY test document is quarantined
    // from training (the Lee/Brown-style decontamination every eval
    // pipeline owes its numbers to). Shape: per-doc distinct 3-grams
    // once; the test side's gram set is small (≈12% of docs) and
    // drives a semi-join against the train side — the q407
    // broadcast-eval asymmetry; per-lang attrition is the readout.
    "q440_decontaminated_split" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val tagged = docs.withColumn("is_test",
        substring(md5(concat(lit("dsplit"), col("doc_id").cast("string"))),
          1, 1).isin("0", "1"))
      val g = TextOps.parallelized(tagged)
        .select(col("doc_id"), col("is_test"), explode(expr(
          "CASE WHEN size(split(text, ' ')) >= 3 THEN " +
            "transform(sequence(1, size(split(text, ' ')) - 2), i -> " +
            "concat_ws(' ', element_at(split(text, ' '), i), " +
            "element_at(split(text, ' '), i + 1), " +
            "element_at(split(text, ' '), i + 2))) " +
            "ELSE array() END")).as("g3"))
        .distinct()
      val testGrams = g.filter(col("is_test")).select(col("g3")).distinct()
      val contaminated = g.filter(!col("is_test"))
        .join(testGrams, Seq("g3"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("contam", lit(true))
      tagged.filter(!col("is_test"))
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_train"),
          sum(when(col("contam"), 1L).otherwise(0L)).cast("long")
            .as("n_contaminated"),
          sum(when(col("contam").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_clean"),
          sum(when(col("contam").isNull, col("n_chars")).otherwise(0L))
            .cast("long").as("clean_chars"))
    }),

    // Reciprocal-rank fusion (RRF) — the hybrid-search combiner every
    // production retrieval stack runs (Cormack/Clarke/Buettcher, the
    // BM25+dense recipe): THREE ranked lists for the same query —
    // q388's integer BM25, a coverage list (#distinct query terms,
    // then total tf), and a static doc prior (n_chars, the stand-in
    // for a quality/freshness signal over the matched candidates) —
    // each cut to its top-20 by TakeOrdered, then fused by
    // score = Σ 1000000 div (60 + rank_i) over the lists a doc
    // appears in (missing → 0, standard RRF). Every rank rides a
    // deterministic total order and every division is positive-int
    // floor, so the fused ranking hash-matches where float fusion
    // never would. Scale shape: corpus work is q388's (term-filtered
    // posting explode, broadcast df/len stats); fusion itself touches
    // only the ≤60-row union of the lists, and the per-list rank
    // windows run over ≤20 rows post-limit.
    "q445_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val qTerms = Seq("dup", "vector", "spark")
      val base = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), col("n_chars"), tokens.as("toks"))
      val dl = base.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"))
      val tot = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_len"))
      val tf = base.select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val bm = tf
        .join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(tot)) // 1 row
        .withColumn("r_milli", expr("(1000 * dl * n_docs) div total_len"))
        .withColumn("idf_milli",
          expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
        .withColumn("tfpart_micro",
          expr("(44000000 * tf) div (20000 * tf + 6000 + 18 * r_milli)"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("CAST(idf_milli AS DECIMAL(38,0)) * tfpart_micro"))
          .as("s9"),
          countDistinct(col("term")).as("nt"), sum(col("tf")).as("tft"))
        // candidate-bounded (docs matching >=1 term) and referenced
        // by all three lists — materialize once so the corpus BM25
        // pass never re-runs per list
        .localCheckpoint()
      val l1 = bm.orderBy(col("s9").desc, col("doc_id")).limit(20)
        .withColumn("rk1", row_number().over(
          Window.orderBy(col("s9").desc, col("doc_id"))))
        .select(col("doc_id"), col("rk1"))
      val l2 = bm.orderBy(col("nt").desc, col("tft").desc, col("doc_id"))
        .limit(20)
        .withColumn("rk2", row_number().over(
          Window.orderBy(col("nt").desc, col("tft").desc, col("doc_id"))))
        .select(col("doc_id"), col("rk2"))
      val l3 = bm.select(col("doc_id"))
        .join(base.select(col("doc_id"), col("n_chars")), "doc_id")
        .orderBy(col("n_chars").desc, col("doc_id")).limit(20)
        .withColumn("rk3", row_number().over(
          Window.orderBy(col("n_chars").desc, col("doc_id"))))
        .select(col("doc_id"), col("rk3"))
      val fused = l1.join(l2, Seq("doc_id"), "full")
        .join(l3, Seq("doc_id"), "full")
        .withColumn("rrf_ppm", expr(
          "coalesce(1000000 div (60 + rk1), 0)" +
            " + coalesce(1000000 div (60 + rk2), 0)" +
            " + coalesce(1000000 div (60 + rk3), 0)").cast("long"))
      fused.orderBy(col("rrf_ppm").desc, col("doc_id")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rrf_ppm").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"),
          coalesce(col("rk1"), lit(0)).cast("long").as("rk1"),
          coalesce(col("rk2"), lit(0)).cast("long").as("rk2"),
          coalesce(col("rk3"), lit(0)).cast("long").as("rk3"),
          col("rrf_ppm"), col("rk"))
    }),

    // Pseudo-relevance-feedback query expansion (Rocchio/RM1 family)
    // — the classic two-pass retrieval loop: a tf-ranked first pass
    // for the seed term picks the top-5 feedback docs; their most
    // frequent content tokens (length ≥ 4, seed excluded, top-3 by
    // count desc / term asc) become the expanded query; the second
    // pass scores every doc by (#matched expanded terms, total tf).
    // Integer counts and deterministic tie-breaks end to end. Scale
    // shape: both posting passes filter BEFORE their shuffles (the
    // first on the seed term, the second on the ≤4-term broadcast
    // query set); the feedback-doc set is a 5-row broadcast; the
    // top-10 is TakeOrdered.
    "q447_prf_expansion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seed = "vector"
      val base = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), tokens.as("toks"))
      val occ = base.select(col("doc_id"), explode(col("toks")).as("term"))
      val fb = occ.filter(col("term") === seed)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("doc_id")).limit(5)
        .select(col("doc_id"))
      val expTerms = occ.join(broadcast(fb), "doc_id")
        .filter(length(col("term")) >= 4 && col("term") =!= seed)
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("term")).limit(3)
        .select(col("term"))
      val qset = expTerms.unionByName(
        s.range(1).select(lit(seed).as("term")))
      val scored = occ.join(broadcast(qset), "term")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("term")).cast("long").as("n_matched"),
          count(lit(1)).cast("long").as("tf_total"))
      scored.orderBy(col("n_matched").desc, col("tf_total").desc,
        col("doc_id")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_matched").desc, col("tf_total").desc,
            col("doc_id"))).cast("long"))
    }),

    // Label-propagation COMMUNITY DETECTION (synchronous LPA,
    // Raghavan et al.) over the token co-occurrence graph — the
    // community structure q67's connected components cannot see (CC
    // merges everything reachable; LPA's weighted majority vote
    // splits a connected graph into dense neighborhoods — topic-ish
    // clusters here). Graph: adjacent-token bigrams with count ≥ 3,
    // symmetrized and weight-summed; labels start as the node itself;
    // each round every node adopts the label with the largest
    // incident weight (tie → lexicographically smallest), THREE
    // synchronous rounds unrolled (fixed rounds keep it oracle-
    // replayable; convergence detection is q67's loud-fail pattern).
    // Scale shape: rounds shuffle (node, label) pairs against the
    // edge list only — never documents; the vote argmax is a
    // node-keyed window over the vocab-bounded candidate frame.
    "q448_label_propagation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), tokens.as("ws"))
      val pairs = t.select(explode(
        expr("zip_with(slice(ws, 1, size(ws) - 1)," +
          " slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a AS a, b AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
      // the edge list is vocab²-bounded and every round references
      // it — materialize ONCE (eager localCheckpoint, the q67/q131
      // iterative discipline) so the corpus explode never re-runs;
      // per-round checkpoints truncate the join lineage the same way
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"),
        col("c"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst"),
          col("c")))
        .groupBy(col("src"), col("dst")).agg(sum(col("c")).as("w"))
        .localCheckpoint()
      def round(labels: DataFrame): DataFrame = {
        val votes = edges
          .join(labels.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src"), col("label")).agg(sum(col("w")).as("sw"))
        votes.withColumn("rk", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("sw").desc, col("label"))))
          .filter(col("rk") === 1)
          .select(col("src").as("node"), col("label"))
          .localCheckpoint()
      }
      val l0 = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      val l3 = round(round(round(l0)))
      val sizes = l3.groupBy(col("label"))
        .agg(count(lit(1)).cast("long").as("community_size"))
      l3.join(sizes, "label").select(col("node"), col("label"),
        col("community_size"))
    }),

    // RAKE keyword extraction (Rose et al.) — the unsupervised
    // keyword scorer next to tf-idf (q115) and BM25 (q388): text
    // splits into candidate PHRASES at stopword boundaries; within
    // phrases each word accumulates freq (+1 per occurrence) and
    // degree (+phrase length per occurrence, self included); the
    // RAKE score degree/freq is emitted in exact permille
    // (1000·Σdeg div Σfreq — words in long phrases win). Top-20
    // words with freq ≥ 3 by (score desc, word). Scale shape: the
    // phrase split is one narrow pass (stopwords → '|' marker, split,
    // explode); scoring is a word-keyed aggregate; the top-20 is
    // TakeOrdered.
    "q450_rake_keywords" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val stopList = stopwords.map(w => s"'$w'").mkString(", ")
      val phrases = parallelized(Tables(s, d).documents)
        .select(explode(split(expr(
          s"array_join(transform(split(text, ' '), " +
            s"t -> CASE WHEN t IN ($stopList) THEN '|' ELSE t END), ' ')"),
          "\\s*\\|\\s*")).as("ph"))
        .filter(col("ph") =!= "")
        .select(split(col("ph"), " ").as("pw"))
      val contrib = phrases
        .select(size(col("pw")).as("plen"), explode(col("pw")).as("word"))
      val scored = contrib.groupBy(col("word"))
        .agg(count(lit(1)).cast("long").as("freq"),
          sum(col("plen")).cast("long").as("degree"))
        .filter(col("freq") >= 3)
        .withColumn("score_pm", expr("(1000 * degree) div freq"))
      scored.orderBy(col("score_pm").desc, col("word")).limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score_pm").desc, col("word"))).cast("long"))
    }),

    // TRENDING top-k diff — the week-over-week leaderboard churn
    // readout (new entrants, dropouts, rank moves) every trending/
    // monitoring surface renders: token top-20 by frequency in each
    // corpus snapshot (doc_id parity stands in for the two time
    // windows), full-outer-joined into a per-token status
    // (new / dropped / up / down / flat). Ranks ride deterministic
    // (count desc, token) orders; absent ranks emit 0. Scale shape:
    // each snapshot's top-20 is TakeOrdered off one token-keyed
    // count; the diff join touches ≤40 rows.
    "q459_trending_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // ONE corpus pass to (snapshot, token) counts — vocab-bounded,
      // materialized so neither snapshot's top-20 re-explodes
      val cnt = parallelized(Tables(s, d).documents)
        .select((col("doc_id") % 2 === 0).as("snap1"),
          explode(tokens).as("tok"))
        .groupBy(col("snap1"), col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      def top(side: Boolean) = cnt.filter(col("snap1") === side)
        .orderBy(col("c").desc, col("tok")).limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("c").desc, col("tok"))))
      val t1 = top(true).select(col("tok"), col("rk").as("rk1"))
      val t2 = top(false).select(col("tok"), col("rk").as("rk2"))
      t1.join(t2, Seq("tok"), "full")
        .select(col("tok"),
          coalesce(col("rk1"), lit(0)).cast("long").as("rk1"),
          coalesce(col("rk2"), lit(0)).cast("long").as("rk2"),
          when(col("rk1").isNull, "new")
            .when(col("rk2").isNull, "dropped")
            .when(col("rk2") < col("rk1"), "up")
            .when(col("rk2") > col("rk1"), "down")
            .otherwise("flat").as("status"))
    }),

    // FAIRNESS audit of a selection rule (disparate impact / the
    // EEOC four-fifths rule) — the release gate a curation filter
    // must pass before its output ships: the rule here is the
    // corpus's own median-length cut (rank-exact global median of
    // n_chars — selection rules correlate with language, which is
    // the point), and per language the audit reports the selection
    // rate plus the disparate-impact ratio against the
    // BEST-selected group, rate_l / rate_ref as the exact integer
    // cross-multiplication 1000·sel_l·n_ref div (n_l·sel_ref), with
    // the <800‰ four-fifths flag. Scale shape: one pass to per-
    // (lang, n_chars) counts; the median walks the support grid; the
    // audit folds the language-bounded frame.
    "q460_fairness_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val grid = Tables(s, d).documents
        .groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // support-bounded, read three times
      val tot = grid.agg(sum(col("c")).as("n"))
      val wCum = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = grid.groupBy(col("n_chars")).agg(sum(col("c")).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .crossJoin(broadcast(tot))
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("n_chars")).as("med"))
      val byLang = grid.crossJoin(broadcast(med)) // 1 row
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("n_docs"),
          sum(when(col("n_chars") >= col("med"), col("c"))
            .otherwise(0L)).as("n_selected"))
        .withColumn("sel_permille",
          expr("(1000 * n_selected) div n_docs"))
      val ref = byLang
        .orderBy(col("sel_permille").desc, col("lang")).limit(1)
        .select(col("n_docs").as("n_ref"),
          col("n_selected").as("sel_ref"))
      byLang.crossJoin(broadcast(ref)) // 1 row
        .select(col("lang"), col("n_docs").cast("long").as("n_docs"),
          col("n_selected").cast("long").as("n_selected"),
          col("sel_permille").cast("long").as("sel_permille"),
          expr("(1000 * n_selected * n_ref) div (n_docs * sel_ref)")
            .cast("long").as("di_permille"))
        .withColumn("fails_four_fifths", col("di_permille") < 800)
    }),

    // RELIABILITY diagram (calibration curve) for the q34 language-
    // ID scorer — the eval readout that decides whether a
    // classifier's confidence MEANS anything: per document, the
    // 'en'-evidence share p̂ = 1000·en_markers div (all_markers + 1)
    // (the +1 keeps marker-free docs defined); documents bucket by
    // p̂ div 100, and each bucket reports its mean stated confidence
    // vs the observed 'en' rate in permille plus the signed gap —
    // a calibrated scorer hugs the diagonal. One corpus pass
    // (marker counts are codegen'd array filters), bucket-bounded
    // output.
    "q461_reliability_diagram" -> ((s, d) => {
      val en = markerCount(langMarkers.head._2)
      val all = langMarkers.map(lm => markerCount(lm._2))
        .reduce(_ + _)
      val base = Tables(s, d).documents
        .select(col("lang"), en.as("en_m"), all.as("all_m"))
        .select(col("lang"),
          expr("(1000 * en_m) div (all_m + 1)").as("phat"))
      base.withColumn("bucket", expr("phat div 100"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("phat")).as("sp"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"))
        .select(col("bucket").cast("long").as("bucket"), col("n"),
          expr("sp div n").cast("long").as("mean_confidence_permille"),
          expr("(1000 * pos) div n").cast("long")
            .as("observed_en_permille"),
          expr("sp div n - (1000 * pos) div n").cast("long")
            .as("gap_permille"))
    }),

    // ZIPF conformity audit — the corpus-health screen that flags
    // synthetic, templated or spam-heavy text before it trains
    // anything: natural language keeps rank·frequency roughly
    // constant across the head of the vocabulary, so per top-100
    // token the audit emits rank·freq normalized by the rank-1
    // frequency in exact permille plus the absolute deviation from
    // the ideal 1000‰. One token-count aggregate, top-100 via
    // TakeOrdered, rank window over the 100-row frame, 1-row max
    // broadcast.
    "q465_zipf_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = parallelized(Tables(s, d).documents)
        .select(explode(tokens).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // vocab-bounded, read by top + max
      val top = cnt.orderBy(col("c").desc, col("tok")).limit(100)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("c").desc, col("tok"))).cast("long"))
      val f1 = cnt.agg(max(col("c")).as("f1"))
      top.crossJoin(broadcast(f1)) // 1 row
        .select(col("rk"), col("tok"), col("c").cast("long").as("freq"),
          expr("(1000 * rk * c) div f1").cast("long").as("rf_permille"),
          abs(expr("(1000 * rk * c) div f1") - 1000).cast("long")
            .as("zipf_dev_permille"))
    }),

    // HEAPS'-law vocabulary GROWTH curve — the saturation readout
    // that tells a crawl whether more data still buys new types:
    // docs order by doc_id into deciles; each token charges its
    // FIRST decile (min doc rank — one vocab-bounded argmin);
    // per decile the audit reports new types, cumulative vocabulary
    // and cumulative token occurrences (the (N, V) pairs Heaps' law
    // fits). One corpus pass to (doc, token) grain; the doc rank
    // rides GroupedRank's two-phase range exchange (P parallel
    // sorts — NEVER an unpartitioned window over the doc grain, the
    // r11 finding); the cumulative walk is 10 rows.
    "q466_heaps_curve" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nDocs = Tables(s, d).documents.agg(count(lit(1)).as("nd"))
      val ranks = graft.operators.GroupedRank.withGlobalRank(
          Tables(s, d).documents.select(col("doc_id")),
          Seq(col("doc_id")), "drk1")
        .withColumn("drk", col("drk1") - 1)
        .crossJoin(broadcast(nDocs)) // 1 row
        .withColumn("decile", expr("(drk * 10) div nd + 1"))
        .select(col("doc_id"), col("decile"))
        .localCheckpoint() // doc grain, joined twice
      val occ = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), explode(tokens).as("tok"))
        .join(ranks, "doc_id")
        .localCheckpoint() // (doc, token) grain, folded twice
      val newTypes = occ.groupBy(col("tok"))
        .agg(min(col("decile")).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("new_types"))
      val toks = occ.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_tokens"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks.join(newTypes, Seq("decile"), "left")
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .withColumn("vocab_cum", sum(col("new_types")).over(wCum))
        .withColumn("tokens_cum", sum(col("n_tokens")).over(wCum))
        .select(col("decile").cast("long").as("decile"),
          col("new_types").cast("long").as("new_types"),
          col("vocab_cum").cast("long").as("vocab_cum"),
          col("tokens_cum").cast("long").as("tokens_cum"))
    }),

    // GOPHER-style quality RULE PACK (Rae et al. 2021, Table A1 —
    // the MassiveText filter battery, adapted to this single-space
    // ASCII corpus: the line/bullet rules are vacuous here, the
    // word-shape rules are not): per document, word count, mean and
    // max word length (mean via Σlen = n_chars − n_tokens + 1, the
    // single-space identity — no per-token fold), numeric-token and
    // non-alphabetic-token shares, duplicate-token share, stopword
    // count, and the composite pass flag a curation pipeline keys
    // on. All shares exact integral permille; ONE narrow corpus
    // pass, no shuffle at all (the plan is scan → project).
    "q473_gopher_quality" -> ((s, d) => {
      val n = size(tokens).cast("long")
      parallelized(Tables(s, d).documents).select(
          col("doc_id"),
          n.as("n_tokens"),
          (length(col("text")).cast("long") - n + 1).as("sum_len"),
          array_max(transform(tokens, t => length(t))).cast("long")
            .as("max_wordlen"),
          size(filter(tokens, t => t.rlike("^[0-9]+$"))).cast("long")
            .as("n_numeric"),
          size(filter(tokens, t => !t.rlike("^[A-Za-z]+$"))).cast("long")
            .as("n_nonalpha"),
          size(array_distinct(tokens)).cast("long").as("n_distinct"),
          markerCount(stopwords).as("n_stopwords"))
        .select(col("doc_id"), col("n_tokens"),
          expr("(1000 * sum_len) div n_tokens").as("mean_wordlen_milli"),
          col("max_wordlen"),
          expr("(1000 * n_numeric) div n_tokens").as("numeric_permille"),
          expr("(1000 * n_nonalpha) div n_tokens").as("nonalpha_permille"),
          expr("(1000 * (n_tokens - n_distinct)) div n_tokens")
            .as("dup_token_permille"),
          col("n_stopwords"))
        .withColumn("gopher_pass",
          col("n_tokens") >= 50 && col("n_tokens") <= 100000 &&
            col("mean_wordlen_milli") >= 3000 &&
            col("mean_wordlen_milli") <= 10000 &&
            col("nonalpha_permille") <= 200 &&
            col("dup_token_permille") <= 300 &&
            col("n_stopwords") >= 2)
    }),

    // TOP-n-GRAM character concentration (the other Gopher
    // repetition rule, beside q475's run detector): per document,
    // the 3-gram covering the most characters (count × gram length,
    // deterministic (count desc, gram) argmax) and its share of the
    // document in exact permille — templated/boilerplate text
    // concentrates its mass in one phrase. Guarded for <3-token
    // docs (the q440 descending-sequence ANSI trap). One corpus
    // pass; the count and argmax are doc-keyed.
    "q474_top_ngram_chars" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val grams = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          tokens.as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), col("n_chars"),
          explode(expr("transform(sequence(1, size(ws) - 2), i -> " +
            "concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), " +
            "element_at(ws, i + 2)))")).as("gram"))
      val cnt = grams
        .groupBy(col("doc_id"), col("n_chars"), col("gram"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("c").desc, col("gram"))
      cnt.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("gram").as("top_gram"),
          col("c").cast("long").as("n_occurrences"),
          expr("(1000 * c * length(gram)) div n_chars")
            .as("top_gram_chars_permille"))
        .withColumn("repetitive", col("top_gram_chars_permille") >= 200)
    }),

    // LONGEST SAME-TOKEN RUN — the degenerate-generation detector
    // ("the the the …" loops that survive every length filter):
    // islands-and-gaps over each document's token sequence (pos −
    // per-(doc, token) rank is constant exactly on a consecutive
    // run), longest run per doc with a deterministic (run desc,
    // token, start) argmax. One corpus pass; both windows are
    // doc-keyed (never unpartitioned).
    "q475_token_runs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = parallelized(Tables(s, d).documents)
        .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "tok")))
      val wTok = Window.partitionBy(col("doc_id"), col("tok"))
        .orderBy(col("pos"))
      val runs = toks
        .withColumn("grp", col("pos") - row_number().over(wTok))
        .groupBy(col("doc_id"), col("tok"), col("grp"))
        .agg(count(lit(1)).as("run"), min(col("pos")).as("start_pos"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("run").desc, col("tok"), col("start_pos"))
      runs.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("tok").as("run_token"),
          col("run").cast("long").as("max_run"),
          col("start_pos").cast("long").as("start_pos"))
        .withColumn("degenerate", col("max_run") >= 3)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q322_source_similarity" ->
      """WITH c AS (
           SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         cnt AS (SELECT source, tok, count(*)::BIGINT AS n
                 FROM c GROUP BY 1, 2),
         t AS (SELECT source, sum(n)::BIGINT AS tot FROM cnt GROUP BY 1),
         sh AS (SELECT cnt.source, cnt.tok, (cnt.n * 1000) // t.tot AS pm
                FROM cnt JOIN t USING (source))
         SELECT a.source AS sa, b.source AS sb,
                sum(least(a.pm, b.pm))::BIGINT AS overlap_pm
         FROM sh a JOIN sh b ON b.tok = a.tok AND a.source < b.source
         GROUP BY 1, 2""",
    "q327_vocab_truncate" ->
      """WITH tk AS (
           SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         v AS (SELECT tok FROM (
                 SELECT tok, row_number() OVER (
                   ORDER BY count(*) DESC, tok) AS rk
                 FROM tk GROUP BY tok)
               WHERE rk <= 16),
         j AS (SELECT tk.source, tk.tok, v.tok IS NOT NULL AS keep
               FROM tk LEFT JOIN v ON v.tok = tk.tok)
         SELECT source, count(*)::BIGINT AS n_tokens,
                ((sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000)
                  // count(*))::BIGINT AS covered_pm,
                count(DISTINCT CASE WHEN NOT keep THEN tok END)::BIGINT
                  AS n_unk_types
         FROM j GROUP BY 1""",
    "q314_vocab_drift" ->
      """WITH o AS (
           SELECT doc_id % 2 = 0 AS is_a, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         c AS (SELECT tok,
                 (count(*) FILTER (is_a))::BIGINT AS na,
                 (count(*) FILTER (NOT is_a))::BIGINT AS nb
               FROM o GROUP BY 1),
         t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb FROM c)
         SELECT tok, na, nb,
                ((na * 1000) // ta)::BIGINT AS share_a_pm,
                ((nb * 1000) // tb)::BIGINT AS share_b_pm,
                abs((na * 1000) // ta - (nb * 1000) // tb)::BIGINT AS drift_pm
         FROM c, t
         ORDER BY drift_pm DESC, tok LIMIT 20""",
    "q317_span_corruption" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS ws,
                  (len(string_split(text, ' ')) + 2) // 3 AS nspans
           FROM documents
           WHERE len(string_split(text, ' ')) >= 1),
         sp AS (
           SELECT doc_id, ws, nspans, unnest(range(nspans)) AS sidx
           FROM t),
         fl AS (
           SELECT doc_id, ws, nspans, sidx,
                  CASE WHEN substring(md5(doc_id::VARCHAR || ':' ||
                         sidx::VARCHAR), 1, 1) IN ('0', '1', '2')
                       THEN 1 ELSE 0 END AS f
           FROM sp),
         cu AS (
           SELECT doc_id, ws, nspans, sidx, f,
                  coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY sidx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum
           FROM fl),
         pieces AS (
           SELECT doc_id, nspans, sidx, f,
                  CASE WHEN f = 1
                       THEN ['<X_' || cum::VARCHAR || '>']
                       ELSE ws[sidx * 3 + 1 : sidx * 3 + 3] END AS cp,
                  CASE WHEN f = 1
                       THEN ['<X_' || cum::VARCHAR || '>'] ||
                            ws[sidx * 3 + 1 : sidx * 3 + 3]
                       ELSE []::VARCHAR[] END AS tp
           FROM cu)
         SELECT doc_id, nspans::BIGINT AS n_spans, sum(f)::BIGINT AS n_masked,
                array_to_string(flatten(list(cp ORDER BY sidx)), ' ')
                  AS corrupted,
                coalesce(array_to_string(flatten(list(tp ORDER BY sidx)), ' '),
                  '') AS target
         FROM pieces GROUP BY doc_id, nspans""",
    "q245_repetition_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         o AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
                FROM o a JOIN o b
                  ON b.doc_id = a.doc_id AND b.ord = a.ord + 1),
         c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
         SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
                count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS top_count,
                (max(c) * 5 <= sum(c)
                 AND (sum(c) - count(*)) * 5 <= sum(c) * 2) AS keep
         FROM c GROUP BY 1""",
    "q246_bigram_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         o AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         occ AS (SELECT a.doc_id, a.tok AS a, a.tok || ' ' || b.tok AS bg
                 FROM o a JOIN o b
                   ON b.doc_id = a.doc_id AND b.ord = a.ord + 1),
         cab AS (SELECT bg, count(*) AS c_ab FROM occ GROUP BY 1),
         ca AS (SELECT a, count(*) AS c_a FROM occ GROUP BY 1)
         SELECT occ.doc_id, count(*)::BIGINT AS n_bigrams,
                sum((1000000 * cab.c_ab) // ca.c_a)::BIGINT AS score6
         FROM occ JOIN cab USING (bg) JOIN ca USING (a)
         GROUP BY 1""",
    // q235_deflate_ratio: zlib output is implementation-specific →
    // rows-only check (TextOpsSpec pins the semantics).
    "q254_conjunctive_search" ->
      """WITH tf AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         p AS (
           SELECT doc_id, tok, count(*) AS occ FROM tf
           WHERE tok IN ('spark', 'vector', 'dup') GROUP BY 1, 2)
         SELECT doc_id, sum(occ)::BIGINT AS n_occ
         FROM p GROUP BY 1 HAVING count(*) = 3""",
    "q236_feature_hashing" ->
      """WITH tf AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents)
         SELECT doc_id,
                ((ascii(substr(md5(tok), 1, 1)) * 49
                  + ascii(substr(md5(tok), 2, 1)) * 7
                  + ascii(substr(md5(tok), 3, 1))) % 64)::BIGINT AS dim,
                count(*)::BIGINT AS cnt
         FROM tf GROUP BY 1, 2""",
    "q228_unicode_normalize" ->
      """SELECT doc_id, 'caf' || chr(233) || '-' || source AS norm
         FROM documents""",
    "q226_parse_url" ->
      """SELECT doc_id,
                'site' || (doc_id % 50) || '.example.org' AS host,
                '/p/' || (doc_id % 100) AS path,
                'utm=feed&page=' || (doc_id % 7) AS query,
                (doc_id % 7)::VARCHAR AS page
         FROM documents""",
    "q210_array_setops" ->
      """WITH t AS (
           SELECT doc_id,
                  list_sort(list_distinct(string_split(text, ' '))) AS ts
           FROM documents)
         SELECT a.doc_id AS a_id,
                len(list_intersect(a.ts, b.ts))::BIGINT AS n_common,
                len(list_distinct(list_concat(a.ts, b.ts)))::BIGINT AS n_union,
                len(list_filter(a.ts, x -> NOT list_contains(b.ts, x)))::BIGINT
                  AS n_only_a
         FROM t a JOIN t b ON b.doc_id = a.doc_id + 1""",
    "q199_regex_all" ->
      """SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS m
         FROM documents""",
    "q200_oov_rate" ->
      """WITH tf AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         v AS (
           SELECT tok FROM (
             SELECT tok, count(*) AS c FROM tf GROUP BY 1
             ORDER BY c DESC, tok LIMIT 20))
         SELECT doc_id, count(*)::BIGINT AS n_tok,
                sum(CASE WHEN tok NOT IN (SELECT tok FROM v)
                         THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                sum(CASE WHEN tok NOT IN (SELECT tok FROM v)
                         THEN 1 ELSE 0 END) * 1.0 / count(*) AS oov_rate
         FROM tf GROUP BY doc_id""",
    "q190_fuzzy_match" ->
      """WITH toks AS (
           SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents),
         vocab AS (SELECT w FROM toks WHERE length(w) >= 3),
         typos AS (
           SELECT DISTINCT concat(substr(w, 1, p - 1), substr(w, p + 1)) AS typo
           FROM (SELECT w,
                        (ascii(substr(md5(w), 1, 1)) % length(w)) + 1 AS p
                 FROM toks
                 WHERE length(w) >= 4 AND substr(md5(w), 2, 1) <= '7') t)
         SELECT t.typo AS typo, v.w AS vocab_token,
                levenshtein(t.typo, v.w)::BIGINT AS dist
         FROM typos t JOIN vocab v ON levenshtein(t.typo, v.w) <= 1""",
    "q180_url_normalize" ->
      """WITH r AS (
           SELECT (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://Site' ELSE 'https://site' END)
                  || (doc_id % 50)::VARCHAR
                  || (CASE WHEN doc_id % 2 = 0 THEN '.Example.ORG' ELSE '.example.org' END)
                  || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
                  || '/p/' || (doc_id % 100)::VARCHAR
                  || (CASE WHEN doc_id % 2 = 1 THEN '/?utm_source=feed#frag' ELSE '/' END)
                  AS raw
           FROM documents),
         n AS (
           SELECT 'https://'
                  || regexp_replace(lower(regexp_extract(raw, '^[A-Za-z]+://([^/]+)', 1)),
                                    ':443$', '')
                  || regexp_replace(regexp_extract(raw, '^[A-Za-z]+://[^/]+([^?#]*)', 1),
                                    '/$', '') AS url_norm
           FROM r)
         SELECT url_norm, count(*) AS n_docs FROM n GROUP BY 1""",
    "q183_domain_cap" ->
      """SELECT doc_id, domain, rk FROM (
           SELECT doc_id,
                  'site' || (doc_id % 50)::VARCHAR || '.example.org' AS domain,
                  row_number() OVER (
                    PARTITION BY 'site' || (doc_id % 50)::VARCHAR || '.example.org'
                    ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT AS rk
           FROM documents)
         WHERE rk <= 5""",
    "q178_array_algebra" ->
      """SELECT doc_id,
                len(list_filter(string_split(text, ' '),
                    t -> len(t) >= 5))::BIGINT AS n_long,
                list_aggregate(list_transform(string_split(text, ' '),
                    t -> len(t)), 'sum')::BIGINT AS total_chars,
                (len(list_filter(string_split(text, ' '),
                    t -> t = 'the')) > 0) AS has_the
         FROM documents""",
    "q301_url_frontier" ->
      """WITH p AS (
           SELECT doc_id,
                  text || ' see https://site' || (doc_id % 50)::VARCHAR ||
                  '.example.org/p/' || doc_id::VARCHAR ||
                  ' and http://mirror' || (doc_id % 7)::VARCHAR ||
                  '.example.net/x' AS planted
           FROM documents),
         u AS (
           SELECT doc_id,
                  unnest(regexp_extract_all(planted,
                    'https?://[a-z0-9.-]+\.example\.(?:org|net)/[A-Za-z0-9/._-]*')) AS url
           FROM p)
         SELECT url, min(doc_id) AS first_doc, count(*)::BIGINT AS n_refs
         FROM u GROUP BY 1""",
    "q166_url_extract" ->
      """WITH p AS (
           SELECT doc_id,
                  text || ' see https://site' || (doc_id % 50)::VARCHAR ||
                  '.example.org/p/' || doc_id::VARCHAR ||
                  ' and http://mirror' || (doc_id % 7)::VARCHAR ||
                  '.example.net/x' AS planted
           FROM documents),
         u AS (
           SELECT doc_id,
                  unnest(regexp_extract_all(planted,
                    'https?://[a-z0-9.-]+\.example\.(?:org|net)/[A-Za-z0-9/._-]*')) AS url
           FROM p)
         SELECT regexp_extract(url, 'https?://([a-z0-9.-]+)/', 1) AS domain,
                count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
         FROM u GROUP BY 1""",
    "q30_token_count" ->
      "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents",
    "q31_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp FROM documents",
    "q32_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "q281_prefix_topk" ->
      """WITH tk AS (
           SELECT tok, count(*)::BIGINT AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE length(tok) >= 3 GROUP BY 1),
         pf AS (
           SELECT substr(tok, 1, i) AS prefix, tok, cnt
           FROM tk, unnest(generate_series(1, 3)) AS s(i)),
         r AS (SELECT prefix, tok, cnt,
                 row_number() OVER (PARTITION BY prefix
                   ORDER BY cnt DESC, tok) AS rk
               FROM pf)
         SELECT prefix, tok AS completion, cnt FROM r WHERE rk = 1""",
    "q271_novelty_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 8),
         g AS (SELECT doc_id,
                      md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS g
               FROM t, unnest(generate_series(1, len(ws) - 7)) AS s(i)),
         base AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 <> 0),
         delta AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 10 = 0)
         SELECT d.doc_id, count(*)::BIGINT AS n_grams,
                (count(*) FILTER (b.g IS NULL))::BIGINT AS n_novel
         FROM delta d LEFT JOIN base b ON b.g = d.g
         GROUP BY 1""",
    "q264_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         o AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t)
         SELECT a.doc_id, count(*)::BIGINT AS n_phrase
         FROM o a JOIN o b
           ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
         WHERE a.tok = 'fast' AND b.tok = 'table'
         GROUP BY 1""",
    "q259_incremental_dedup" ->
      """WITH base AS (
           SELECT DISTINCT md5(text) AS fp FROM documents
           WHERE doc_id % 10 <> 0),
         delta AS (
           SELECT md5(text) AS fp, min(doc_id) AS doc_id,
                  count(*)::BIGINT AS n_delta_copies
           FROM documents WHERE doc_id % 10 = 0 GROUP BY 1)
         SELECT d.doc_id, d.fp, d.n_delta_copies
         FROM delta d LEFT JOIN base b ON b.fp = d.fp
         WHERE b.fp IS NULL""",
    "q33_quality" ->
      """SELECT doc_id,
                length(text)::BIGINT AS n_chars,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                (length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')))::BIGINT AS n_punct,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and', 'to')))::BIGINT AS n_stopwords,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
                  / len(string_split(text, ' '))::DOUBLE AS stopword_ratio
         FROM documents""",
    "q34_lang_id" ->
      """WITH c AS (
           SELECT doc_id,
                  len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of')))::BIGINT AS c_en,
                  len(list_filter(string_split(text, ' '), t -> t IN ('el','la','los','que')))::BIGINT AS c_es,
                  len(list_filter(string_split(text, ' '), t -> t IN ('der','die','und','ist')))::BIGINT AS c_de,
                  len(list_filter(string_split(text, ' '), t -> t IN ('le','les','des','est')))::BIGINT AS c_fr,
                  len(list_filter(string_split(text, ' '), t -> t IN ('de','shi','bu','le')))::BIGINT AS c_zh
           FROM documents)
         SELECT c_en, c_es, c_de, c_fr, c_zh,
                CASE WHEN c_zh > greatest(c_en, c_es, c_de, c_fr) THEN 'zh'
                     WHEN c_fr > greatest(c_en, c_es, c_de) THEN 'fr'
                     WHEN c_de > greatest(c_en, c_es) THEN 'de'
                     WHEN c_es > c_en THEN 'es'
                     ELSE 'en' END AS pred_lang,
                doc_id
         FROM c""",
    "q331_langid_confusion" ->
      """WITH c AS (
           SELECT lang,
                  len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of')))::BIGINT AS c_en,
                  len(list_filter(string_split(text, ' '), t -> t IN ('el','la','los','que')))::BIGINT AS c_es,
                  len(list_filter(string_split(text, ' '), t -> t IN ('der','die','und','ist')))::BIGINT AS c_de,
                  len(list_filter(string_split(text, ' '), t -> t IN ('le','les','des','est')))::BIGINT AS c_fr,
                  len(list_filter(string_split(text, ' '), t -> t IN ('de','shi','bu','le')))::BIGINT AS c_zh
           FROM documents),
         p AS (SELECT lang,
                 CASE WHEN c_zh > greatest(c_en, c_es, c_de, c_fr) THEN 'zh'
                      WHEN c_fr > greatest(c_en, c_es, c_de) THEN 'fr'
                      WHEN c_de > greatest(c_en, c_es) THEN 'de'
                      WHEN c_es > c_en THEN 'es'
                      ELSE 'en' END AS pred_lang
               FROM c),
         m AS (SELECT lang, pred_lang, count(*)::BIGINT AS n
               FROM p GROUP BY 1, 2),
         t AS (SELECT lang, sum(n)::BIGINT AS t FROM m GROUP BY 1)
         SELECT m.lang, m.pred_lang, m.n,
                ((m.n * 1000) // t.t)::BIGINT AS share_pm
         FROM m JOIN t USING (lang)""",
    "q376_cohen_kappa" ->
      """WITH c AS (
           SELECT lang,
                  len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of')))::BIGINT AS c_en,
                  len(list_filter(string_split(text, ' '), t -> t IN ('el','la','los','que')))::BIGINT AS c_es,
                  len(list_filter(string_split(text, ' '), t -> t IN ('der','die','und','ist')))::BIGINT AS c_de,
                  len(list_filter(string_split(text, ' '), t -> t IN ('le','les','des','est')))::BIGINT AS c_fr,
                  len(list_filter(string_split(text, ' '), t -> t IN ('de','shi','bu','le')))::BIGINT AS c_zh
           FROM documents),
         p AS (SELECT lang,
                 CASE WHEN c_zh > greatest(c_en, c_es, c_de, c_fr) THEN 'zh'
                      WHEN c_fr > greatest(c_en, c_es, c_de) THEN 'fr'
                      WHEN c_de > greatest(c_en, c_es) THEN 'de'
                      WHEN c_es > c_en THEN 'es'
                      ELSE 'en' END AS pred_lang
               FROM c),
         cell AS (SELECT lang, pred_lang, count(*)::BIGINT AS nn
                  FROM p GROUP BY 1, 2),
         r AS (SELECT lang AS cls, sum(nn)::BIGINT AS r FROM cell GROUP BY 1),
         cc AS (SELECT pred_lang AS cls, sum(nn)::BIGINT AS c
                FROM cell GROUP BY 1),
         t AS (SELECT sum(nn)::BIGINT AS n,
                      coalesce(sum(CASE WHEN lang = pred_lang THEN nn END),
                               0)::BIGINT AS a
               FROM cell),
         s AS (SELECT coalesce(sum(r.r::HUGEINT * cc.c), 0) AS s
               FROM r JOIN cc USING (cls))
         SELECT t.n AS n_docs, t.a AS n_agree,
                (t.a * 1000 // t.n)::BIGINT AS po_permille,
                (s.s * 1000 // (t.n::HUGEINT * t.n))::BIGINT AS pe_permille,
                CASE WHEN t.n::HUGEINT * t.n - s.s = 0 THEN NULL
                     ELSE ((t.n::HUGEINT * t.a - s.s) * 1000
                            // (t.n::HUGEINT * t.n - s.s))::BIGINT
                END AS kappa_permille
         FROM t CROSS JOIN s""",
    "q39_bpe_tokens" ->
      """SELECT doc_id,
                len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS n_bpe_tokens
         FROM documents""",
    "q61_token_freq" ->
      """SELECT token, count(*) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY 1""",
    "q83_bigram_counts" ->
      """WITH t AS (
           SELECT string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         b AS (
           SELECT unnest([array_to_string(toks[i:i+1], ' ')
                          FOR i IN range(1, len(toks))]) AS bigram
           FROM t),
         c AS (SELECT bigram, count(*) AS freq FROM b GROUP BY 1)
         SELECT bigram, freq FROM c
         QUALIFY row_number() OVER (ORDER BY freq DESC, bigram) <= 50""",
    "q84_repetition" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, toks,
                  [array_to_string(toks[i:i+1], ' ')
                   FOR i IN range(1, len(toks))] AS bgs
           FROM t)
         SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                CASE WHEN len(toks) >= 2
                     THEN len(list_distinct(bgs))::DOUBLE / len(bgs)::DOUBLE
                     ELSE 1.0 END AS distinct_bigram_ratio,
                CASE WHEN len(toks) >= 2
                     THEN len(list_distinct(bgs))::DOUBLE / len(bgs)::DOUBLE
                     ELSE 1.0 END < 0.5 AS repetitive
         FROM g""",
    "q92_rare_bigrams" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         b AS (
           SELECT doc_id,
                  unnest([array_to_string(toks[i:i+1], ' ')
                          FOR i IN range(1, len(toks))]) AS bigram
           FROM t),
         c AS (SELECT bigram, count(*) AS freq FROM b GROUP BY 1)
         SELECT doc_id, count(*) AS n_bigrams,
                sum(CASE WHEN freq <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare,
                sum(CASE WHEN freq <= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE
                  AS rare_rate
         FROM b JOIN c USING (bigram)
         GROUP BY 1""",
    "q82_vocab_topk" ->
      """WITH c AS (
           SELECT token, count(*) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
           GROUP BY 1)
         SELECT token, freq,
                (row_number() OVER (ORDER BY freq DESC, token) - 1)::BIGINT AS token_id
         FROM c QUALIFY row_number() OVER (ORDER BY freq DESC, token) <= 20""",
    "q46_normalize" ->
      """SELECT doc_id,
                trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS norm_text
         FROM documents""",
    "q35_token_jaccard" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, c, sa.n AS na, sb.n AS nb,
                c::DOUBLE / (sa.n + sb.n - c)::DOUBLE AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = a_id
         JOIN sizes sb ON sb.doc_id = b_id
         WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9""",
    "q385_containment_join" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, c, sa.n AS na, sb.n AS nb,
                (c * 1000 // sa.n)::BIGINT AS containment_pm
         FROM inter
         JOIN sizes sa ON sa.doc_id = a_id
         JOIN sizes sb ON sb.doc_id = b_id
         WHERE c * 50 >= sa.n * 49""",
    "q69_contamination" ->
      """WITH t AS (
           SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         g0 AS (
           SELECT doc_id, source,
                  CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                       ELSE [array_to_string(toks[i:i+2], ' ')
                             FOR i IN range(1, len(toks) - 1)] END AS gs
           FROM t),
         grams AS (
           SELECT DISTINCT doc_id, source, g
           FROM (SELECT doc_id, source, unnest(gs) AS g FROM g0)),
         nsrc AS (SELECT g, count(DISTINCT source) AS ns FROM grams GROUP BY 1)
         SELECT gr.doc_id, gr.source,
                count(*) AS n_ngrams,
                sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_foreign,
                sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) > 0 AS contaminated
         FROM grams gr JOIN nsrc ON gr.g = nsrc.g
         GROUP BY 1, 2""",
    "q115_tfidf" ->
      """WITH occ AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM occ GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, token, tf, df,
                  (tf * n_docs)::DOUBLE / df::DOUBLE AS score
           FROM tf JOIN dfreq USING (token), n)
         SELECT doc_id, token, tf, df, score, rk FROM (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, token) AS rk
           FROM scored)
         WHERE rk <= 3""",
    "q119_span_dedup" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         e AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 20),
         gr AS (
           SELECT doc_id,
                  unnest([md5(array_to_string(toks[i:i+19], ' '))
                          FOR i IN range(1, len(toks) - 18)]) AS g
           FROM e),
         sh AS (
           SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
                          FROM gr GROUP BY 1) WHERE nd >= 2),
         ns AS (SELECT doc_id, count(*) AS n_spans FROM gr GROUP BY 1),
         nsh AS (
           SELECT doc_id, count(*) AS n_shared FROM gr
           WHERE g IN (SELECT g FROM sh) GROUP BY 1)
         SELECT t.doc_id,
                coalesce(ns.n_spans, 0)::BIGINT AS n_spans,
                coalesce(nsh.n_shared, 0)::BIGINT AS n_shared,
                coalesce(nsh.n_shared, 0) > 0 AS flagged
         FROM t LEFT JOIN ns USING (doc_id) LEFT JOIN nsh USING (doc_id)""",
    "q157_span_removal" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         e AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 20),
         gr AS (
           SELECT doc_id,
                  unnest(range(1, len(toks) - 18)) AS i,
                  unnest([md5(array_to_string(toks[j:j+19], ' '))
                          FOR j IN range(1, len(toks) - 18)]) AS g
           FROM e),
         own AS (
           SELECT g, min(doc_id) AS owner
           FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         rem AS (
           SELECT gr.doc_id, unnest(range(gr.i, gr.i + 20)) AS p
           FROM gr JOIN own ON gr.g = own.g AND gr.doc_id <> own.owner),
         rc AS (
           SELECT doc_id, count(DISTINCT p) AS n_removed FROM rem GROUP BY 1)
         SELECT t.doc_id,
                len(t.toks)::BIGINT AS n_tokens,
                coalesce(rc.n_removed, 0)::BIGINT AS n_removed,
                (len(t.toks) - coalesce(rc.n_removed, 0))::BIGINT AS n_kept
         FROM t LEFT JOIN rc USING (doc_id)""",
    "q479_span_excise" ->
      """WITH t AS (
           SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
         e AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 20),
         gr AS (
           SELECT doc_id,
                  unnest(range(1, len(toks) - 18)) AS i,
                  unnest([md5(array_to_string(toks[j:j+19], ' '))
                          FOR j IN range(1, len(toks) - 18)]) AS g
           FROM e),
         own AS (
           SELECT g, min(doc_id) AS owner
           FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         rem AS (
           SELECT DISTINCT doc_id, p FROM (
             SELECT gr.doc_id, unnest(range(gr.i, gr.i + 20)) AS p
             FROM gr JOIN own ON gr.g = own.g AND gr.doc_id <> own.owner)),
         pos AS (
           SELECT doc_id, generate_subscripts(toks, 1) AS p,
                  unnest(toks) AS tok
           FROM t),
         kept AS (
           SELECT pos.doc_id,
                  string_agg(pos.tok, ' ' ORDER BY pos.p) AS text_clean
           FROM pos LEFT JOIN rem
             ON pos.doc_id = rem.doc_id AND pos.p = rem.p
           WHERE rem.p IS NULL GROUP BY pos.doc_id),
         rc AS (SELECT doc_id, count(*) AS n_removed FROM rem GROUP BY 1)
         SELECT t.doc_id,
                CASE WHEN rc.n_removed IS NULL THEN t.text
                     ELSE coalesce(k.text_clean, '') END AS text_clean,
                len(t.toks)::BIGINT AS n_tokens,
                coalesce(rc.n_removed, 0)::BIGINT AS n_removed
         FROM t LEFT JOIN rc USING (doc_id)
         LEFT JOIN kept k USING (doc_id)""",
    "q122_dataset_card" ->
      """SELECT source, count(*) AS n_docs,
                sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
                sum(len(string_split(text, ' ')))::DOUBLE / count(*)::DOUBLE
                  AS avg_tokens,
                count(DISTINCT lang)::BIGINT AS n_langs,
                count(DISTINCT md5(text))::BIGINT AS n_unique,
                (count(*) - count(DISTINCT md5(text)))::DOUBLE
                  / count(*)::DOUBLE AS dup_rate
         FROM documents GROUP BY 1""",
    "q124_pmi_bigrams" ->
      """WITH t AS (
           SELECT string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         p AS (
           SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
                          FOR i IN range(1, len(toks))], recursive := true)
           FROM t),
         bi AS (SELECT w1, w2, count(*) AS c_xy FROM p
                GROUP BY 1, 2 HAVING count(*) >= 5),
         occ AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         uni AS (SELECT tok, count(*) AS c FROM occ GROUP BY 1),
         n AS (SELECT count(*) AS n_tok FROM occ)
         SELECT w1, w2, c_xy,
                (c_xy * n_tok)::DOUBLE / (u1.c * u2.c)::DOUBLE AS lift
         FROM bi JOIN uni u1 ON bi.w1 = u1.tok
                 JOIN uni u2 ON bi.w2 = u2.tok, n
         QUALIFY row_number() OVER (
           ORDER BY (c_xy * n_tok)::DOUBLE / (u1.c * u2.c)::DOUBLE DESC,
                    w1, w2) <= 50""",
    "q388_bm25_rank" ->
      """WITH base AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM base),
         tot AS (SELECT count(*)::BIGINT AS n_docs,
                        sum(dl)::BIGINT AS total_len FROM dl),
         occ AS (SELECT doc_id, unnest(toks) AS term FROM base),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM occ
                WHERE term IN ('dup', 'vector', 'spark') GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         s AS (SELECT tf.doc_id,
                      ((2 * tot.n_docs - 2 * dfreq.df + 1) * 1000)
                        // (2 * dfreq.df + 1) AS idf_milli,
                      (44000000 * tf.tf)
                        // (20000 * tf.tf + 6000
                            + 18 * ((1000 * dl.dl * tot.n_docs)
                                     // tot.total_len)) AS tfpart_micro
               FROM tf JOIN dfreq USING (term)
                       JOIN dl ON dl.doc_id = tf.doc_id, tot),
         sc AS (SELECT doc_id, count(*)::BIGINT AS n_terms,
                       sum(idf_milli::HUGEINT * tfpart_micro) AS s9
                FROM s GROUP BY 1)
         SELECT doc_id, n_terms, s9::VARCHAR AS score_nano,
                row_number() OVER (ORDER BY s9 DESC, doc_id)::BIGINT AS rk
         FROM sc QUALIFY rk <= 10""",
    "q411_truncation_audit" ->
      """WITH t AS (SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS tk
              FROM documents),
         g AS (SELECT lim, count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN tk > lim THEN 1 ELSE 0 END)::BIGINT
                   AS n_truncated,
                 sum(greatest(tk - lim, 0))::BIGINT AS tokens_lost,
                 sum(least(tk, lim))::BIGINT AS tokens_kept
               FROM t CROSS JOIN (SELECT unnest([16, 32, 64, 96]) AS lim)
               GROUP BY 1)
         SELECT lim::BIGINT AS lim, n_docs, n_truncated, tokens_lost,
                tokens_kept,
                (tokens_kept * 1000) // (tokens_kept + tokens_lost)
                  AS kept_permille
         FROM g""",
    "q422_blocklist_screen" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS needle
             FROM documents),
         needles AS (
           SELECT needle FROM tk WHERE length(needle) >= 4
           GROUP BY 1 ORDER BY count(*) DESC, needle LIMIT 5),
         occ AS (
           SELECT n.needle,
                  (length(d.text) - length(replace(d.text, n.needle, '')))
                    // length(n.needle) AS occ
           FROM documents d CROSS JOIN needles n),
         tot AS (SELECT count(*)::BIGINT AS n FROM documents)
         SELECT occ.needle,
                sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END)::BIGINT
                  AS n_docs_hit,
                sum(occ)::BIGINT AS total_occurrences,
                ((sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) * 1000)
                  // max(tot.n))::BIGINT AS hit_permille
         FROM occ, tot GROUP BY 1""",
    "q439_curation_dedup" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (SELECT a_id AS s, b_id AS d FROM prs
                   UNION SELECT b_id, a_id FROM prs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM documents
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         clu AS (SELECT s AS doc_id, min(d) AS cluster_id
                 FROM reach GROUP BY 1),
         mem AS (SELECT c.cluster_id, d.doc_id, d.n_chars
                 FROM documents d JOIN clu c USING (doc_id)),
         best AS (SELECT cluster_id, doc_id AS kept_doc_id,
                         n_chars AS kept_chars,
                         row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) AS rk
                  FROM mem),
         sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                FROM mem GROUP BY 1)
         SELECT b.cluster_id, b.kept_doc_id,
                b.kept_chars::BIGINT AS kept_chars, sz.cluster_size,
                (sz.cluster_size - 1)::BIGINT AS n_discarded
         FROM best b JOIN sz USING (cluster_id) WHERE b.rk = 1""",
    "q440_decontaminated_split" ->
      """WITH t AS (
           SELECT doc_id, lang, n_chars,
                  substr(md5('dsplit' || doc_id::VARCHAR), 1, 1)
                    IN ('0', '1') AS is_test,
                  string_split(text, ' ') AS ws
           FROM documents),
         u AS (SELECT doc_id, is_test, unnest(ws) AS tokk,
                      generate_subscripts(ws, 1) AS ord FROM t),
         g AS (SELECT DISTINCT a.doc_id, a.is_test,
                      a.tokk || ' ' || b.tokk || ' ' || c.tokk AS g3
               FROM u a
               JOIN u b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
               JOIN u c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2),
         tg AS (SELECT DISTINCT g3 FROM g WHERE is_test),
         cont AS (SELECT DISTINCT g.doc_id
                  FROM g JOIN tg USING (g3) WHERE NOT g.is_test)
         SELECT t.lang, count(*)::BIGINT AS n_train,
                sum(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0
                    END)::BIGINT AS n_contaminated,
                sum(CASE WHEN cont.doc_id IS NULL THEN 1 ELSE 0
                    END)::BIGINT AS n_clean,
                sum(CASE WHEN cont.doc_id IS NULL THEN t.n_chars ELSE 0
                    END)::BIGINT AS clean_chars
         FROM t LEFT JOIN cont ON cont.doc_id = t.doc_id
         WHERE NOT t.is_test GROUP BY 1""",
    "q445_rrf_fusion" ->
      """WITH base AS (
           SELECT doc_id, n_chars, string_split(text, ' ') AS toks
           FROM documents),
         dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM base),
         tot AS (SELECT count(*)::BIGINT AS n_docs,
                        sum(dl)::BIGINT AS total_len FROM dl),
         occ AS (SELECT doc_id, unnest(toks) AS term FROM base),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM occ
                WHERE term IN ('dup', 'vector', 'spark') GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         s AS (SELECT tf.doc_id, tf.tf,
                      ((2 * tot.n_docs - 2 * dfreq.df + 1) * 1000)
                        // (2 * dfreq.df + 1) AS idf_milli,
                      (44000000 * tf.tf)
                        // (20000 * tf.tf + 6000
                            + 18 * ((1000 * dl.dl * tot.n_docs)
                                     // tot.total_len)) AS tfpart_micro
               FROM tf JOIN dfreq USING (term)
                       JOIN dl ON dl.doc_id = tf.doc_id, tot),
         bm AS (SELECT doc_id, sum(idf_milli::HUGEINT * tfpart_micro) AS s9,
                       count(*)::BIGINT AS nt, sum(tf)::BIGINT AS tft
                FROM s GROUP BY 1),
         l1 AS (SELECT doc_id,
                       row_number() OVER (ORDER BY s9 DESC, doc_id) AS rk1
                FROM bm QUALIFY rk1 <= 20),
         l2 AS (SELECT doc_id, row_number() OVER (
                  ORDER BY nt DESC, tft DESC, doc_id) AS rk2
                FROM bm QUALIFY rk2 <= 20),
         l3 AS (SELECT bm.doc_id, row_number() OVER (
                  ORDER BY base.n_chars DESC, bm.doc_id) AS rk3
                FROM bm JOIN base USING (doc_id) QUALIFY rk3 <= 20),
         f AS (SELECT coalesce(l1.doc_id, l2.doc_id, l3.doc_id) AS doc_id,
                      l1.rk1, l2.rk2, l3.rk3,
                      (coalesce(1000000 // (60 + l1.rk1), 0)
                        + coalesce(1000000 // (60 + l2.rk2), 0)
                        + coalesce(1000000 // (60 + l3.rk3), 0))::BIGINT
                        AS rrf_ppm
               FROM l1
               FULL JOIN l2 ON l2.doc_id = l1.doc_id
               FULL JOIN l3 ON l3.doc_id = coalesce(l1.doc_id, l2.doc_id))
         SELECT doc_id, coalesce(rk1, 0)::BIGINT AS rk1,
                coalesce(rk2, 0)::BIGINT AS rk2,
                coalesce(rk3, 0)::BIGINT AS rk3, rrf_ppm,
                row_number() OVER (ORDER BY rrf_ppm DESC, doc_id)::BIGINT
                  AS rk
         FROM f QUALIFY rk <= 10""",
    "q447_prf_expansion" ->
      """WITH base AS MATERIALIZED (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         fb AS MATERIALIZED (
           SELECT doc_id FROM base WHERE term = 'vector'
           GROUP BY 1 ORDER BY count(*) DESC, doc_id LIMIT 5),
         ex AS MATERIALIZED (
           SELECT term FROM base JOIN fb USING (doc_id)
           WHERE length(term) >= 4 AND term <> 'vector'
           GROUP BY 1 ORDER BY count(*) DESC, term LIMIT 3),
         qs AS (SELECT term FROM ex UNION ALL SELECT 'vector' AS term),
         sc AS (SELECT doc_id,
                       count(DISTINCT term)::BIGINT AS n_matched,
                       count(*)::BIGINT AS tf_total
                FROM base JOIN qs USING (term) GROUP BY 1)
         SELECT doc_id, n_matched, tf_total,
                row_number() OVER (ORDER BY n_matched DESC, tf_total DESC,
                                   doc_id)::BIGINT AS rk
         FROM sc QUALIFY rk <= 10""",
    "q448_label_propagation" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         p AS (SELECT unnest([{'a': toks[i], 'b': toks[i+1]}
                              FOR i IN range(1, len(toks))],
                             recursive := true)
               FROM t),
         bg AS (SELECT a, b, count(*)::BIGINT AS c FROM p
                WHERE a <> b GROUP BY 1, 2 HAVING count(*) >= 3),
         e AS MATERIALIZED (
           SELECT src, dst, sum(c)::BIGINT AS w FROM (
             SELECT a AS src, b AS dst, c FROM bg
             UNION ALL SELECT b AS src, a AS dst, c FROM bg)
           GROUP BY 1, 2),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         l1 AS MATERIALIZED (
           SELECT src AS node, label FROM (
             SELECT e.src, l0.label, sum(e.w) AS sw,
                    row_number() OVER (PARTITION BY e.src
                      ORDER BY sum(e.w) DESC, l0.label) AS rk
             FROM e JOIN l0 ON l0.node = e.dst GROUP BY 1, 2)
           WHERE rk = 1),
         l2 AS MATERIALIZED (
           SELECT src AS node, label FROM (
             SELECT e.src, l1.label, sum(e.w) AS sw,
                    row_number() OVER (PARTITION BY e.src
                      ORDER BY sum(e.w) DESC, l1.label) AS rk
             FROM e JOIN l1 ON l1.node = e.dst GROUP BY 1, 2)
           WHERE rk = 1),
         l3 AS MATERIALIZED (
           SELECT src AS node, label FROM (
             SELECT e.src, l2.label, sum(e.w) AS sw,
                    row_number() OVER (PARTITION BY e.src
                      ORDER BY sum(e.w) DESC, l2.label) AS rk
             FROM e JOIN l2 ON l2.node = e.dst GROUP BY 1, 2)
           WHERE rk = 1),
         sz AS (SELECT label, count(*)::BIGINT AS community_size
                FROM l3 GROUP BY 1)
         SELECT l3.node, l3.label, sz.community_size
         FROM l3 JOIN sz USING (label)""",
    "q450_rake_keywords" ->
      """WITH ph AS (
           SELECT unnest(string_split_regex(array_to_string(
                    list_transform(string_split(text, ' '),
                      t -> CASE WHEN t IN ('the', 'a', 'of', 'and', 'to')
                           THEN '|' ELSE t END), ' '),
                    '\s*\|\s*')) AS ph
           FROM documents),
         pw AS (SELECT string_split(ph, ' ') AS pw FROM ph WHERE ph <> ''),
         c AS (SELECT len(pw)::BIGINT AS plen, unnest(pw) AS word FROM pw),
         sc AS (SELECT word, count(*)::BIGINT AS freq,
                       sum(plen)::BIGINT AS degree
                FROM c GROUP BY 1 HAVING count(*) >= 3)
         SELECT word, freq, degree,
                ((1000 * degree) // freq)::BIGINT AS score_pm,
                row_number() OVER (
                  ORDER BY (1000 * degree) // freq DESC, word)::BIGINT AS rk
         FROM sc QUALIFY rk <= 20""",
    "q459_trending_topk" ->
      """WITH occ AS (SELECT doc_id % 2 = 0 AS snap1,
                             unnest(string_split(text, ' ')) AS tok
                      FROM documents),
         t1 AS (SELECT tok, row_number() OVER (
                  ORDER BY count(*) DESC, tok) AS rk1
                FROM occ WHERE snap1 GROUP BY tok QUALIFY rk1 <= 20),
         t2 AS (SELECT tok, row_number() OVER (
                  ORDER BY count(*) DESC, tok) AS rk2
                FROM occ WHERE NOT snap1 GROUP BY tok QUALIFY rk2 <= 20)
         SELECT coalesce(t1.tok, t2.tok) AS tok,
                coalesce(rk1, 0)::BIGINT AS rk1,
                coalesce(rk2, 0)::BIGINT AS rk2,
                CASE WHEN rk1 IS NULL THEN 'new'
                     WHEN rk2 IS NULL THEN 'dropped'
                     WHEN rk2 < rk1 THEN 'up'
                     WHEN rk2 > rk1 THEN 'down'
                     ELSE 'flat' END AS status
         FROM t1 FULL JOIN t2 ON t2.tok = t1.tok""",
    "q460_fairness_audit" ->
      """WITH g AS (SELECT lang, n_chars, count(*)::BIGINT AS c
                    FROM documents GROUP BY 1, 2),
         tot AS (SELECT sum(c)::BIGINT AS n FROM g),
         mg AS (SELECT n_chars, sum(c)::BIGINT AS c FROM g GROUP BY 1),
         mc AS (SELECT n_chars,
                       sum(c) OVER (ORDER BY n_chars)::BIGINT AS cum
                FROM mg),
         med AS (SELECT min(n_chars) AS med FROM mc, tot
                 WHERE cum >= (n + 1) // 2),
         bl AS (SELECT lang, sum(c)::BIGINT AS n_docs,
                       sum(CASE WHEN n_chars >= med.med THEN c ELSE 0
                           END)::BIGINT AS n_selected
                FROM g, med GROUP BY 1),
         bl2 AS (SELECT lang, n_docs, n_selected,
                        (1000 * n_selected) // n_docs AS sel_permille
                 FROM bl),
         ref AS (SELECT n_docs AS n_ref, n_selected AS sel_ref FROM bl2
                 ORDER BY sel_permille DESC, lang LIMIT 1)
         SELECT lang, n_docs, n_selected,
                sel_permille::BIGINT AS sel_permille,
                ((1000 * n_selected * n_ref)
                  // (n_docs * sel_ref))::BIGINT AS di_permille,
                ((1000 * n_selected * n_ref)
                  // (n_docs * sel_ref)) < 800 AS fails_four_fifths
         FROM bl2, ref""",
    "q461_reliability_diagram" ->
      """WITH b AS (SELECT lang,
                len(list_filter(string_split(text, ' '),
                  t -> t IN ('the', 'a', 'and', 'of')))::BIGINT AS en_m,
                (len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'and', 'of')))
                 + len(list_filter(string_split(text, ' '),
                     t -> t IN ('el', 'la', 'los', 'que')))
                 + len(list_filter(string_split(text, ' '),
                     t -> t IN ('der', 'die', 'und', 'ist')))
                 + len(list_filter(string_split(text, ' '),
                     t -> t IN ('le', 'les', 'des', 'est')))
                 + len(list_filter(string_split(text, ' '),
                     t -> t IN ('de', 'shi', 'bu', 'le'))))::BIGINT
                  AS all_m
              FROM documents),
         p AS (SELECT lang, (1000 * en_m) // (all_m + 1) AS phat FROM b),
         g AS (SELECT phat // 100 AS bucket, count(*)::BIGINT AS n,
                      sum(phat)::BIGINT AS sp,
                      sum(CASE WHEN lang = 'en' THEN 1 ELSE 0
                          END)::BIGINT AS pos
               FROM p GROUP BY 1)
         SELECT bucket::BIGINT AS bucket, n,
                (sp // n)::BIGINT AS mean_confidence_permille,
                ((1000 * pos) // n)::BIGINT AS observed_en_permille,
                (sp // n - (1000 * pos) // n)::BIGINT AS gap_permille
         FROM g""",
    "q465_zipf_audit" ->
      """WITH c AS (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         cnt AS (SELECT tok, count(*)::BIGINT AS c FROM c GROUP BY 1),
         f1 AS (SELECT max(c)::BIGINT AS f1 FROM cnt),
         top AS (SELECT tok, c, row_number() OVER (
                   ORDER BY c DESC, tok)::BIGINT AS rk
                 FROM cnt QUALIFY rk <= 100)
         SELECT top.rk, top.tok, top.c AS freq,
                ((1000 * top.rk * top.c) // f1.f1)::BIGINT
                  AS rf_permille,
                abs((1000 * top.rk * top.c) // f1.f1 - 1000)::BIGINT
                  AS zipf_dev_permille
         FROM top, f1""",
    "q466_heaps_curve" ->
      """WITH nd AS (SELECT count(*)::BIGINT AS nd FROM documents),
         r AS (SELECT doc_id,
                      (row_number() OVER (ORDER BY doc_id) - 1) AS drk
               FROM documents),
         dec AS (SELECT r.doc_id, (r.drk * 10) // nd.nd + 1 AS decile
                 FROM r, nd),
         occ AS (SELECT d.doc_id, dec.decile,
                        unnest(string_split(d.text, ' ')) AS tok
                 FROM documents d JOIN dec ON dec.doc_id = d.doc_id),
         nt AS (SELECT decile, count(*)::BIGINT AS new_types FROM (
                  SELECT tok, min(decile) AS decile FROM occ GROUP BY 1)
                GROUP BY 1),
         tk AS (SELECT decile, count(*)::BIGINT AS n_tokens FROM occ
                GROUP BY 1)
         SELECT tk.decile::BIGINT AS decile,
                coalesce(nt.new_types, 0)::BIGINT AS new_types,
                sum(coalesce(nt.new_types, 0))
                  OVER (ORDER BY tk.decile)::BIGINT AS vocab_cum,
                sum(tk.n_tokens)
                  OVER (ORDER BY tk.decile)::BIGINT AS tokens_cum
         FROM tk LEFT JOIN nt USING (decile)""",
    "q473_gopher_quality" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS ws,
                  length(text)::BIGINT AS nc
           FROM documents),
         m AS (
           SELECT doc_id,
                  len(ws)::BIGINT AS n_tokens,
                  (nc - len(ws) + 1)::BIGINT AS sum_len,
                  list_max(list_transform(ws, w -> length(w)))::BIGINT AS max_wordlen,
                  len(list_filter(ws, w -> regexp_matches(w, '^[0-9]+$')))::BIGINT AS n_numeric,
                  len(list_filter(ws, w -> NOT regexp_matches(w, '^[A-Za-z]+$')))::BIGINT AS n_nonalpha,
                  len(list_distinct(ws))::BIGINT AS n_distinct,
                  len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to')))::BIGINT AS n_stopwords
           FROM t),
         r AS (
           SELECT doc_id, n_tokens,
                  (1000 * sum_len) // n_tokens AS mean_wordlen_milli,
                  max_wordlen,
                  (1000 * n_numeric) // n_tokens AS numeric_permille,
                  (1000 * n_nonalpha) // n_tokens AS nonalpha_permille,
                  (1000 * (n_tokens - n_distinct)) // n_tokens AS dup_token_permille,
                  n_stopwords
           FROM m)
         SELECT *,
                (n_tokens BETWEEN 50 AND 100000
                 AND mean_wordlen_milli BETWEEN 3000 AND 10000
                 AND nonalpha_permille <= 200
                 AND dup_token_permille <= 300
                 AND n_stopwords >= 2) AS gopher_pass
         FROM r""",
    "q474_top_ngram_chars" ->
      """WITH t AS (
           SELECT doc_id, n_chars::BIGINT AS n_chars,
                  string_split(text, ' ') AS ws
           FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         g AS (
           SELECT doc_id, n_chars,
                  unnest(list_transform(range(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS gram
           FROM t),
         c AS (SELECT doc_id, n_chars, gram, count(*)::BIGINT AS c
               FROM g GROUP BY 1, 2, 3),
         r AS (SELECT *, row_number() OVER (
                 PARTITION BY doc_id ORDER BY c DESC, gram) AS rk
               FROM c)
         SELECT doc_id, gram AS top_gram, c AS n_occurrences,
                (1000 * c * length(gram)) // n_chars AS top_gram_chars_permille,
                ((1000 * c * length(gram)) // n_chars >= 200) AS repetitive
         FROM r WHERE rk = 1""",
    "q475_token_runs" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         p AS (
           SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos,
                  unnest(ws) AS tok
           FROM t),
         r AS (
           SELECT doc_id, tok, pos,
                  pos - row_number() OVER (
                    PARTITION BY doc_id, tok ORDER BY pos) AS grp
           FROM p),
         runs AS (
           SELECT doc_id, tok, grp, count(*)::BIGINT AS run,
                  min(pos)::BIGINT AS start_pos
           FROM r GROUP BY 1, 2, 3),
         top AS (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY run DESC, tok, start_pos) AS rk
           FROM runs)
         SELECT doc_id, tok AS run_token, run AS max_run, start_pos,
                (run >= 3) AS degenerate
         FROM top WHERE rk = 1"""
  )
}
