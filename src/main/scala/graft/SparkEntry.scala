package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by module:
  *  - queries.Relational:    SURVEY §2 relational inventory (q01–q29, q49,
  *                           q53–q58, q60, q63–q66, q85, q86, q89–q91,
  *                           q93, q96–q100, q102, q103, q105, q107–q109,
  *                           q112–q114)
  *  - queries.TextOps:       text analysis, exact dedup, contamination,
  *                           LM counts/scoring (q30–q35, q39, q46, q61,
  *                           q69, q82–q84, q92)
  *  - queries.DedupOps:      near-dup + clustering (q36–q38, q43, q48,
  *                           q59, q67, q68, q70)
  *  - queries.VectorOps:     similarity search + quantization (q40–q42,
  *                           q44, q71, q78, q95, q101)
  *  - queries.MultimodalOps: binary-column plumbing (q45, q47, q62)
  *  - queries.StreamOps:     streaming + stateful (q50–q52, q79, q81,
  *                           q94, q104, q111)
  *  - queries.CorpusOps:     training-corpus prep + KV serving (q72–q77:
  *                           chunking, split, mixing, shuffle shards,
  *                           PII, JSONL; q80 kv round-trip; q106 packing)
  *  - queries.SourceOps:     format round-trips + layout (q87 ORC,
  *                           q88 CSV, q110 partitioned write)
  *  - queries.ScaleOps:      scale-shape operators (q116 bloom join,
  *                           q117 heavy hitters, q118 trailing
  *                           distinct, q120 RTBF purge, q121
  *                           distributed-quantile outliers, q123
  *                           interval overlap, q125 z-order, q126
  *                           equi-depth, q127 band join, q129
  *                           PageRank, q130 weighted median)
  *  - queries.EtlOps:        ETL/analytics breadth (q131 BFS, q132
  *                           attribution, q133 baskets, q134 C4
  *                           rules, q135 decorrelated EXISTS, q136
  *                           gap fill, q137 snapshot diff, q138 map
  *                           ops, q139 unpivot, q140 runs, q142
  *                           decimal, q147 corrupt records, q148
  *                           variant, q149 running distinct, q150
  *                           DPP, q152 expectations, q153 spikes,
  *                           q155 observe)
  *  - TextOps additions:     q115 tf-idf, q119 span detection, q122
  *                           dataset card, q124 PMI, q141 BPE, q157
  *                           span removal; CorpusOps additions: q151
  *                           negatives, q156 length batching;
  *                           StreamOps additions: q128/q143/q144/
  *                           q145/q146/q154
  *  - queries.LakeOps:       lake maintenance (q162 job-bookmark
  *                           incremental ingest, q163 schema
  *                           evolution, q164 compaction);
  *                           Relational additions: q158/q159 set-op
  *                           ALL, q160 recursive CTE, q161 posexplode
  *  - round-5 additions:     ScaleOps q186/q187 bitmap distinct +
  *                           overlap, q191 theta sketches, q192
  *                           approx_top_k, q206 optimizer-rule
  *                           bitmap rewrite, q213 native topk_agg;
  *                           Relational q188/q189 listagg + ordered-
  *                           set aggs, q197/q198 explode_outer +
  *                           try_*, q208/q209/q211 range frame,
  *                           FILTER clause, struct surgery; TextOps
  *                           q190 fuzzy match, q199/q200 regex-all +
  *                           OOV, q210 array set ops; EtlOps
  *                           q193/q194 EWMA + anomaly, q202-q204
  *                           IVM, exact regression, forward as-of,
  *                           q212 map rewrite; VectorOps q196
  *                           semantic contamination, q205 ANN
  *                           recall; CorpusOps q201 curriculum;
  *                           StreamOps q195 right-outer join,
  *                           q207/q214 TWS List/Map state, q220
  *                           dynamic-gap sessions; late round-5:
  *                           q215-q219 SQL gate, quota sample,
  *                           winsorize, discrete quantiles, ntile
  *                           shards; q221/q222 first-touch + ratio
  *                           shares; q223 parquet blooms; q224-q226
  *                           variant/xpath/parse_url; q227/q228 LSH
  *                           sweep + NFC normalize; q229-q232 drift
  *                           report, group split, grouped quantiles,
  *                           next-event pairs
  *  - round-6 additions:     q245-q255 (Gopher repetition, bigram LM,
  *                           CUBE, SCD2, MERGE, CDC, triangles, PQ
  *                           ANN, bucketed join, inverted index,
  *                           DSIR); q256-q269: temperature mixing,
  *                           k-core peel, Pareto skyline, incremental
  *                           dedup, sequence match, CUSUM, RI audit,
  *                           min-max scale, phrase search, golden
  *                           record, item co-occurrence, TWAP, MAD
  *                           outliers, hierarchy share; q270-q284:
  *                           skew/preflight profilers, novelty, OHLC,
  *                           fingerprints, histograms, grain audit,
  *                           file plan, MoM/YoY, bounce, prefix
  *                           top-k, purity, overlap, intervals;
  *                           q280 native as-of exec; q285-q308:
  *                           grouping sets, cluster sizes, orphan
  *                           quarantine, transitions, time-to-event,
  *                           hard negatives, window funnel, SCD2
  *                           as-of, budget allocation, quality keep,
  *                           rank normalize, temporal split, parity
  *                           audit, OTHER bucket, first digit,
  *                           release v2, URL frontier, IVM audit,
  *                           LATERAL/scalar subqueries, NOT IN trap,
  *                           local-time rollup, log2 histogram, ID
  *                           gaps
  *  - round-7 additions:     q312 basket co-occurrence top-k (bounded
  *                           heap, no window sort), q313 decile
  *                           assignment (two-phase rank), q315
  *                           nearest-event bidirectional as-of
  *                           (chained native walks), q314 vocab
  *                           drift, q316 interleaved stream order,
  *                           q317 T5 span corruption, q318 class
  *                           weights, q319 FD audit, q320 session
  *                           paths, q321 stream-static enrichment
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's
    * genre-KPI aggregate (SURVEY §2.5 A2) over the star schema.
    * Driver smoke-checks rows>0.
    *
    * The driver may call this on an untuned session, so set the
    * nanos-parquet conf here (runtime-settable SQLConf) and probe the
    * events source — the one input whose read fails without it —
    * before returning the KPI frame. Every source the engine ships is
    * then exercised end-to-end from a bare SparkSession.
    */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sf = "/root/testdata/sf0.001"
    // events readability probe (TIMESTAMP(NANOS) parquet → µs
    // timestamps): cheap at sf0.001, and a loud failure here beats a
    // silent gap in flagship coverage
    require(Tables(spark, sf).events.limit(1).count() == 1,
      "events source unreadable")
    queries("q11_genre_kpis")(spark, sf)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.DedupOps.queries ++
      graft.queries.VectorOps.queries ++
      graft.queries.MultimodalOps.queries ++
      graft.queries.StreamOps.queries ++
      graft.queries.CorpusOps.queries ++
      graft.queries.SourceOps.queries ++
      graft.queries.ScaleOps.queries ++
      graft.queries.EtlOps.queries ++
      graft.queries.LakeOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for the approximate /
    * signature-based ops (driver records rows-only checks there).
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.TextOps.oracleSql ++
      graft.queries.DedupOps.oracleSql ++
      graft.queries.VectorOps.oracleSql ++
      graft.queries.MultimodalOps.oracleSql ++
      graft.queries.StreamOps.oracleSql ++
      graft.queries.CorpusOps.oracleSql ++
      graft.queries.SourceOps.oracleSql ++
      graft.queries.ScaleOps.oracleSql ++
      graft.queries.EtlOps.oracleSql ++
      graft.queries.LakeOps.oracleSql
}
