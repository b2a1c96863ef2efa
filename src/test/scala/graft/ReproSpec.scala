package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run-to-run reproducibility: every family's representative query,
  * executed twice in one session, must produce IDENTICAL result
  * sets — the property the whole DuckDB-oracle discipline rests on.
  * Guards against nondeterminism regressions (unseeded hashes,
  * order-dependent float accumulation, tie-break-free windows,
  * first-wins dedup picks) that a single oracle run can miss.
  */
class ReproSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Canonical multiset fingerprint of a result. */
  private def fingerprint(name: String): (Long, Seq[String]) = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(v => if (v == null) "␀" else v.toString).mkString("|"))
      .sorted.toSeq
    (rows.length.toLong, rows)
  }

  // one representative per operator family, weighted toward the ops
  // with the most nondeterminism surface (windows, sampling, hashing,
  // clustering, streaming drains, quantiles, iterative loops)
  private val representatives = Seq(
    "q07_dedup_keyed",      // dedup pick
    "q12_top_songs",        // window + rank tie-break
    "q29_percentile",       // float discipline
    "q35_token_jaccard",    // posting-list join + rational output
    "q36_minhash_lsh",      // seeded LSH
    "q44_ann_ivf",          // sampled k-means
    "q60_stratified_sample",// hash-ranked sampling
    "q67_dup_clusters",     // iterative connected components
    "q75_shuffle_shard",    // global permutation
    "q106_sequence_pack",   // two-phase prefix sum
    "q117_heavy_hitters",   // Misra-Gries partition summaries
    "q121_gap_outliers",    // distributed quantiles (range exchange)
    "q126_equidepth_hist",  // octile boundaries
    "q129_pagerank_tokens", // iterative integer fixed point
    "q141_bpe_train",       // iterative argmax + fold
    "q151_negative_sampling", // hash-ranked bounded pool
    "q50_stream_hourly",    // streaming drain through the upsert sink
    "q154_stream_full_join",// watermark eviction horizons (both sides)
    "q157_span_removal",    // position-union removal accounting
    // round-5 additions
    "q160_recursive_cte",   // UnionLoop recursion depth/termination
    "q162_bookmark_ingest", // ledger state across two staged runs
    "q167_bpe_encode",      // native merge-fold application
    "q169_cms_freq",        // seeded CMS estimates
    "q171_global_rank",     // range-partition + prefix offsets
    // round-6 additions
    "q201_curriculum",      // repartitionByRange sampling determinism
    "q206_bitmap_rewrite",  // optimizer-rule rewrite on a scoped session
    "q213_topk_agg",        // imperative heap merge across partitions
    "q216_quota_sample",    // largest-remainder allocation + md5 ranks
    "q227_lsh_sweep",       // checkpointed signature reuse across configs
    "q233_semantic_keep_central", // CC clusters + integer centrality argmin
    // round-7 additions
    "q252_pq_ann",          // trained PQ codebooks + ADC shortlist
    "q255_importance_select", // decimal cross-mult feature votes + top-k
    "q256_temperature_mix", // sqrt-derived integer keep thresholds
    "q257_kcore_peel",      // 5-round iterative peel over checkpoints
    "q261_cusum_changepoint", // windowed argmax under dev/day tie-break
    "q266_item_cooccurrence", // pair self-join + per-item rank windows
    "q273_table_fingerprint", // order-independent checksum sums
    "q280_asof_native",     // custom exec merge walk (partition order)
    // round-6 tail + round-7 additions
    "q293_budget_allocation", // range-exchange prefix sums + collected offsets
    "q306_id_gaps",         // boundary-stitched distributed lag
    "q309_identity_stitch", // CC over planted device links
    "q311_modality_pack",   // GroupedRank two-phase per-modality rank
    "q312_cooccur_topk",    // basket sets + bounded-heap top-k packing
    "q315_asof_nearest",    // chained bidirectional native as-of walks
    "q316_interleave_stream", // double two-phase rank (per-source + global)
    "q317_span_corruption", // md5 span masks + per-row prefix sums
    // round-8 additions
    "q319_fd_audit",        // distinct-pair shuffles + 1-row verdict union
    "q320_session_paths",   // session ids + collect_list prefix + TakeOrdered
    "q321_stream_static_enrich", // stream-static drain (q50's repro harness shape)
    "q322_source_similarity", // token-histogram intersection pair join
    "q323_ooo_audit",       // per-user running-max lateness histogram
    "q324_session_concurrency", // range-exchange global running sum
    "q326_incremental_agg", // stored base + delta partial-agg merge
    "q327_vocab_truncate",  // TakeOrdered vocab + broadcast coverage join
    "q328_k_anonymity",     // k-fan-out over the QI group-size frame
    "q329_lang_source_matrix", // broadcast margins + integer-permille deviation
    "q330_rate_audit",      // user-keyed value-RANGE burst window
    "q331_langid_confusion", // marker-vote argmax + broadcast row totals
    // round-9 additions
    "q332_scd2_build",      // lag collapse + lead close windows
    "q334_cdc_merge",       // max(struct) latest pick + full-outer merge
    "q336_retention_matrix", // (user, week)-distinct + broadcast sizes
    "q337_gap_sweep",       // user-keyed lag + 4-way fan-out
    "q339_winsorize",       // two-phase global rank + fence frame
    "q341_locf_resample",   // max(struct) pick + fill-group LOCF
    "q342_last_touch",      // native as-of walk + recency cutoff
    "q343_mad_outliers",    // double rank pick (median + MAD fences)
    "q344_seasonal_backtest", // count-table lag-7 self-join MAPE
    "q345_ab_ztest",        // md5 arms + decimal cross-mult verdict
    "q346_topk_ties",       // dense_rank WITH-TIES group limit
    "q347_compaction_plan", // withRunningTotal cumulative bin pack
    "q349_kwic",            // broadcast term + per-doc context slices
    "q350_bounce_report",   // session entry/exit min/max struct picks
    "q351_jsonl_roundtrip", // partitioned JSONL write + schema'd read
    "q353_user_accumulation", // withRunningTotal day-grain cumsum
    "q354_interval_coalesce", // rows-to-previous running-max islands
    "q355_mmr_rerank",      // collected-matrix greedy re-rank
    "q356_rfm_segments",    // triple GroupedRank quintile cuts
    "q357_reactivation",    // user-keyed lag gap histogram
    "q358_pareto_curve",    // desc rank + withRunningTotal deciles
    "q359_user_cap",        // md5 fairness rank + cap filter
    "q360_schema_evolution", // two-generation mergeSchema read-back
    "q361_weighted_median", // global cumsum − broadcast flag offsets
    "q362_time_to_convert", // min-aggregate funnel latency histogram
    "q363_snapshot_read",   // manifest-pinned file-set union read
    // round-10 additions
    "q364_compaction_commit", // replace commit + pre/post parity join
    "q365_delete_commit",   // COW delete, affected-member rewrite only
    "q366_stratified_sample", // md5 survival filter + lang aggregate
    "q367_idempotent_ingest", // anti-join-gated append, no-op redelivery
    "q368_repetition_score", // per-doc 3-gram dup permille lambdas
    "q369_cohort_ltv",      // cohort-keyed cumulative revenue permille
    "q370_stats_pruned_read", // manifest stats skip + filtered union
    "q371_phrase_search",   // derived top bigram + positional postings
    "q372_linear_attribution", // window join + integer credit split
    "q373_version_diff",    // two pinned-version full-outer diffs
    "q374_upsert_commit",   // COW MERGE, affected-member rewrite only
    "q375_stream_cdc_ingest", // foreachBatch CDC drain, ledgered commits
    "q376_cohen_kappa",     // exact-integer chance-corrected agreement
    "q377_spearman",        // doubled-midrank exact rank correlation
    "q378_mann_whitney",    // doubled-midrank exact U + AUC permille
    "q379_partition_pruned_read", // part_lang tag skip + filtered union
    "q380_wilcoxon",        // paired signed-rank, doubled midranks
    "q381_ivm_changefeed",  // diffBoth deltas vs direct recompute
    "q382_bloom_pruned_read", // bloom sidecar point-lookup skipping
    "q383_cdc_chunk_dedup", // content-defined boundaries + digests
    "q384_t_closeness",     // L1 distribution drift per quasi-group
    "q385_containment_join", // asymmetric exact containment pairs
    "q386_rank_anova",      // per-group midrank deviation permille
    "q387_kendall_stats",   // grid-collapsed concordance counts
    "q388_bm25_rank",       // fixed-point BM25 + TakeOrdered top-10
    "q389_chi2_independence", // cell-grain grid + decimal contributions
    "q390_mcnemar",         // paired purchase-propensity discordance
    "q391_apriori_triples", // closure-pruned basket triple counts
    "q392_mor_delete",      // equality-delete file + anti-join read
    "q393_delete_compaction", // delete-debt fold + pinned-debt parity
    "q394_entity_resolution", // name collapse + CC + survivorship
    "q395_seq_support",     // windowed greedy subsequence counting
    "q396_kaplan_meier",    // packed-step prefix-product survival
    "q397_anova_stats",     // decimal sufficient statistics + permille
    "q398_weighted_sample", // md5-div-weight bottom-k per source
    "q399_wap_publish",     // audit-gated atomic ref swing read
    "q400_linreg_stats",    // decimal OLS sufficient statistics
    "q401_price_volume_bridge", // brand-year frames + floored identity
    "q402_decay_attribution", // power-of-two weights + floored credits
    "q403_kanon_generalize", // two-round cell-grid coarsening ladder
    "q404_bellman_ford",    // 4-round weighted relax + per-node min
    "q405_stream_mor_deletes", // streamed delete files + readMor drain
    "q406_incremental_dedup", // cross-side AllPairs delta-vs-base join
    "q407_exact_contamination", // broadcast eval side × streamed corpus cosine
    "q408_partition_evolution", // untagged gen-1 + lang-tagged gen-2 pruning
    "q409_metadata_count",  // manifest-only COUNT(*), zero data IO
    "q410_ivm_min_deletes", // dirty-group-only MIN recompute
    "q411_truncation_audit", // 4-limit context-length loss readout
    "q412_cross_table_txn", // atomic multi-table pins vs torn heads
    "q413_branch_merge",    // three-way diff merge, git key semantics
    "q414_coverage_select", // 8-round greedy submodular vocab cover
    "q415_indexed_dedup",   // persisted prefix index, delta-only shingling
    "q416_spatial_join",    // 9-cell grid bucketing, exact int distance
    "q417_spatial_clusters", // DBSCAN(eps,minPts=2) = grid pairs + CC
    "q418_evolving_maintenance", // mergeSchema read × per-schema COW rewrites
    "q419_join_ivm_txn",    // two-sided join delta over O(delta) member reads
    // round-11 additions
    "q420_ivfpq_ann",       // trained coarse centroids + residual codebooks
    "q421_stream_auto_compact", // mid-stream debt-triggered compaction
    "q422_blocklist_screen", // corpus-derived needles + replace counting
    "q423_clustered_commit", // morton octile write + 2-D stats pruning
    "q424_permutation_test", // md5 relabelings + decimal cross-mult
    "q425_incremental_index", // delta-only postings maintenance
    "q426_theil_sen",       // pairwise slope median, double-order pick
    "q427_rollback_restore", // metadata-only restore + resumed ingest
    "q428_quarantine_ingest", // txn-atomic valid/quarantine routing
    "q429_mann_kendall",    // integer trend test, tie-corrected
    "q430_incremental_er",  // cross-side blocked candidates vs master
    "q431_metadata_minmax", // manifest-only extrema fold
    "q432_conjunctive_search", // rarest-first AND retrieval
    "q433_fano_burstiness", // exact variance-to-mean permille
    "q434_l_diversity",     // sensitive-attribute distinct audit
    "q435_layout_audit",    // manifest-only layout health fold
    "q436_out_of_order_audit", // arrival-order running-max lateness
    "q437_knn_graph",       // IVF-candidate neighbor graph build
    "q438_graph_ann",       // fixed-hop greedy beam walk
    "q439_curation_dedup",  // jaccard clusters + keep-best survivorship
    "q440_decontaminated_split", // 3-gram leak quarantine after md5 split
    "q441_bh_fdr",          // per-type permutation tests + BH walk
    "q442_version_timeline", // metadata growth curve across versions
    "q443_markov_transitions", // user-keyed lag pairs + smoothed permille
    "q444_session_paths",   // per-session opening trigram top-10
    "q445_rrf_fusion",      // three TakeOrdered lists fused by integer RRF
    "q446_acf_daily",       // scaled-integer lag-k autocorrelation
    "q447_prf_expansion",   // two-pass feedback retrieval
    "q448_label_propagation", // 3 synchronous weighted-majority rounds
    "q449_policy_replay",   // modal-type policy replayed on the log
    "q450_rake_keywords",   // stopword-split phrases, degree/freq permille
    "q451_rendezvous_reshard", // HRW vs mod movement on a 16->20 regrow
    "q452_hits_scores",     // two exact un-normalized HITS iterations
    "q453_ks_drift",        // cross-multiplied two-sample KS statistic
    "q454_cuped_lift",      // exact-rational CUPED adjustment
    "q455_groupkfold_audit", // md5-fold assignment + stratification dev
    "q456_fertility_audit", // fixed-stride subword fertility per lang
    "q457_conformal_coverage", // rank-exact split-conformal quantile
    "q458_quantile_normalize", // decile rank mapping across dists
    "q459_trending_topk",   // top-20 leaderboard churn between snapshots
    "q460_fairness_audit",  // four-fifths disparate-impact screen
    "q461_reliability_diagram", // confidence-bucket calibration curve
    "q462_covariate_matching", // nearest-covariate ATT vs naive gap
    "q463_bootstrap_ci",    // hash-seeded day-block bootstrap band
    "q464_leadlag_ccf",     // signed squared cross-correlation by lag
    "q465_zipf_audit",      // rank x freq conformity on the vocab head
    "q466_heaps_curve",     // per-decile new types + cumulative vocab
    "q467_dispersion_index", // integral Fano factor per event type
    "q468_mix_decomposition", // per-segment mix/rate/interaction split
    "q469_srm_check",       // integral chi-square on the md5 arms
    "q470_simpson_detector", // segment-vs-pooled sign reversals
    "q471_perceptual_neardup", // dHash Hamming pairs incl. planted twins
    "q472_knn_graph_delta", // delta fold == frozen-centroid rebuild
    "q473_gopher_quality",  // per-doc rule pack + composite pass flag
    "q474_top_ngram_chars", // top-3-gram char concentration argmax
    "q475_token_runs",      // longest same-token run (islands walk)
    "q476_incremental_clusters", // contraction fold == from-scratch CC
    "q477_multiprobe_lsh",  // margin-ordered probe fan-out, exact rerank
    "q478_stream_clusters", // streaming contraction fold, full oracle
    "q479_span_excise",     // cleaned corpus after repeated-span removal
    "q480_lsh_indexed_dedup", // persisted LSH bucket-index probe
    "q481_perceptual_incremental", // stored-Hamming-index media probe
    "q482_stream_clusters_compact", // drain + in-stream state compaction
    "q483_graph_ann_stored", // persisted graph index: fold + stored walk
    "q484_incremental_fold_stored", // fold vs a process-cached stored base
    "q485_ivfpq_stored",    // persisted IVF-PQ: append + stored serving
    "q486_signlsh_stored",  // persisted sign-LSH: append + stored probe
    "q487_cluster_lookup_stored", // secondary-index cluster membership
    "q488_cluster_delete_fold", // deletion fold == from-scratch on rest
    "q489_graph_ann_delete", // tombstone + excise + stored walk
    "q490_stream_cdc_clusters" // streaming add/delete drain, full oracle
  )

  representatives.foreach { name =>
    test(s"$name is bitwise run-to-run reproducible") {
      val a = fingerprint(name)
      val b = fingerprint(name)
      assert(a._1 == b._1, s"row counts differ: ${a._1} vs ${b._1}")
      assert(a._2 == b._2, {
        val diff = a._2.zip(b._2).find { case (x, y) => x != y }
        s"first differing row: $diff"
      })
    }
  }
}
