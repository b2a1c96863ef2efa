package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver contract — entry() returns rows; every declared
  * query has either an oracle or is an intentional rows-only op;
  * every oracle key has a query.
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry runs on an untuned session — it sets the events nanos conf itself") {
    // simulate the driver's bare session: same context, conf
    // explicitly missing the nanos setting
    val bare = spark.newSession()
    bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    assert(SparkEntry.entry(bare).count() > 0)
    assert(bare.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("oracleSql keys ⊆ queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("the full query inventory count matches the documented board") {
    // r9 verdict polish item: only the rows-only subset was pinned,
    // so a silently DROPPED oracled query would not have failed the
    // suite. Keep in sync with CLAUDE.md's inventory note — a new
    // query bumps this in the SAME commit.
    assert(SparkEntry.queries.size == 490,
      s"query inventory drifted: ${SparkEntry.queries.size} (expected 490)")
  }

  test("rows-only queries are exactly the approximate / non-SQL-expressible ops") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this count in sync with CLAUDE.md's inventory note
    assert(rowsOnly.size == 30, s"rows-only count drifted: ${rowsOnly.size}")
    assert(rowsOnly == Set("q36_minhash_lsh", "q37_simhash",
      "q38_ngram_jaccard", "q42_ann_lsh", "q43_winnow_fp", "q44_ann_ivf",
      "q48_source_signatures", "q59_corpus_clean",
      // LSH-indexed incremental dedup: candidates follow the minhash
      // band curve (approximate); DedupSpec A/Bs the probe against
      // the union self-join's cross pairs through a parquet round trip
      "q480_lsh_indexed_dedup",
      // deterministic but an iterative stateful fold — no SQL oracle;
      // BpeTrainSpec proves train AND encode against a reference
      // implementation
      "q141_bpe_train", "q167_bpe_encode",
      // sketch estimates are engine-specific; ScaleOpsSpec pins the
      // ±5% envelope and union-consistency
      "q168_hll_sketch",
      // CMS point estimates aren't SQL-expressible; ScaleOpsSpec pins
      // est >= exact and the overshoot envelope
      "q169_cms_freq",
      // GK quantile summaries pick engine-specific ranks; ScaleOpsSpec
      // pins the rank-error envelope vs exact quantiles
      "q175_approx_quantile",
      // frequent-items sketch (exact at gate scales, approximate by
      // contract); ScaleOpsSpec A/Bs counts against the exact agg
      "q192_approx_topk",
      // recall of an approximate index has no SQL oracle;
      // SimilaritySpec pins the corpus-level floor
      "q205_ann_recall",
      // LSH sweep candidate counts are hash-seed-specific; DedupSpec
      // pins recall monotonicity + the 16-band floor
      "q227_lsh_sweep",
      // zlib byte counts are implementation-specific;
      // GraftFunctionsSpec pins determinism + the compression order
      "q235_deflate_ratio",
      // PQ codebooks summarize the corpus (trained, approximate);
      // SimilaritySpec pins determinism + the recall floor
      "q252_pq_ann",
      // IVF-PQ composed ANN: coarse centroids + residual codebooks
      // are both trained artifacts; IvfPqSpec pins determinism, the
      // recall floor, and probed-lists-only candidate IO
      "q420_ivfpq_ann",
      // the PERSISTED IVF-PQ index serves the same approximate
      // ranking from storage; IvfPqSpec pins stored ≡ in-memory,
      // append ≡ full re-encode, and probed-lists-only FILE IO
      "q485_ivfpq_stored",
      // graph ANN: the k-NN graph is IVF-candidate-restricted and
      // the beam walk greedy — GraphAnnSpec pins determinism, degree
      // bounds, and recall floors
      "q437_knn_graph", "q438_graph_ann",
      // multi-probe LSH inherits q42's bucketed approximation;
      // MultiProbeSpec pins determinism, recall(multi) > recall(1),
      // and candidate IO == probed buckets exactly
      "q477_multiprobe_lsh",
      // the PERSISTED sign-LSH index serves the same approximate
      // probe from storage; MultiProbeSpec pins stored ≡ in-memory,
      // append visibility, and probed-buckets-only file IO
      "q486_signlsh_stored",
      // delta fold inherits q437's IVF approximation; GraphAnnSpec
      // pins frozen-rebuild equality, delta-shaped candidate IO,
      // determinism, and the fresh-rebuild recall floor
      "q472_knn_graph_delta",
      // the PERSISTED graph index serves the same approximate walk
      // from storage; GraphAnnSpec pins stored ≡ in-memory walk
      // equality, fold ≡ knnGraphDelta, touched-bucket-only rewrite,
      // and the recall floor
      "q483_graph_ann_stored",
      // DELETION from the stored graph index (r16): tombstone append
      // + filtered serving + excision — same walk approximation;
      // GraphAnnSpec pins tombstones-never-surface, excise ≡
      // frozen-quantizer rebuild on the remaining corpus, entry
      // repair, and clean re-arrival after excision
      "q489_graph_ann_delete",
      // perceptual dHash summarizes payloads (approximate by
      // construction); PerceptualDedupSpec pins planted recall,
      // brute-force equality and layout determinism
      "q471_perceptual_neardup",
      // the incremental twin probes a stored Hamming index — same
      // dHash approximation; DedupSpec pins probe ≡ brute-force
      // cross join through a parquet round trip
      "q481_perceptual_incremental"))
  }

  /** ONE shared pass over the full inventory at sf0.001: per-query
    * failures (empty result / wide decimal / exception) AND the
    * unpartitioned-window tripwire data. A QueryExecutionListener
    * watches EVERY execution the query triggers — including eager
    * localCheckpoint materializations, which hide their plans from
    * the final DataFrame (the r11 lesson: three single-partition
    * windows landed while the suite's own stderr warned about them).
    * The async listener bus is flushed between queries so hits
    * attribute to the query that ran them.
    */
  private lazy val inventoryRun
      : (Seq[String], Map[String, Seq[String]]) = {
    import org.apache.spark.sql.GraftTestBridge
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        GraftTestBridge.unpartitionedWindows(qe.executedPlan)
          .foreach(hits.add)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    // Legitimately empty at tiny scale, and oracled (the gate
    // compares empty == empty): q17 anti join (full referential
    // integrity), q55 except (at sf0.001's ~30-user pool every
    // viewer also purchased), q159 except-all (every open-order
    // custkey multiplicity is covered by the big-order multiset;
    // 14 survivors appear at sf0.01).
    val mayBeEmpty = Set("q17_anti_join", "q55_except", "q159_except_all")
    val winHits = scala.collection.mutable.Map[String, Seq[String]]()
    spark.listenerManager.register(listener)
    val failures = try {
      SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try {
          GraftTestBridge.flushListenerBus(spark.sparkContext)
          hits.clear()
          val df = fn(spark, "/root/testdata/sf0.001")
          val n = df.count()
          GraftTestBridge.flushListenerBus(spark.sparkContext)
          val h = Iterator.continually(hits.poll()).takeWhile(_ != null).toSeq
          if (h.nonEmpty) winHits(name) = h
          // Hash-stability gate (r5 lesson — q142/q173/q203/q208/q242):
          // an oracled query may not emit DecimalType wider than
          // precision 18. DuckDB's fetchdf coerces wide DECIMAL (and
          // windowed-sum HUGEINT) to float64, so the driver's canonical
          // cell strings can never match Spark's exact Decimal — such
          // columns must be emitted as STRING (or rescaled into int64).
          val wideDec: Seq[String] =
            if (!SparkEntry.oracleSql.contains(name)) Nil
            else df.schema.fields.toSeq.collect {
              case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
                && f.dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType].precision > 18 =>
                s"$name.${f.name}: ${f.dataType.simpleString} is hash-unstable (emit STRING)"
            }
          val empty = if (n > 0 || mayBeEmpty(name)) Nil else Seq(s"$name: empty")
          wideDec ++ empty
        } catch { case e: Throwable => Seq(s"$name: ${e.getMessage}") }
      }
    } finally spark.listenerManager.unregister(listener)
    (failures, winHits.toMap)
  }

  test("every query runs non-empty on sf0.001") {
    assert(inventoryRun._1.isEmpty, inventoryRun._1.mkString("; "))
  }

  /** Queries ALLOWED to execute unpartitioned WindowExec nodes, each
    * with the max count observed and the bounded-grain justification.
    * Everything here folds a frame that is value-support-bounded,
    * calendar-bounded, vocabulary-top-k-bounded, or post-limit — the
    * shapes where "move all data to a single partition" moves a
    * bounded grid, not the corpus. A NEW query that plans a
    * single-partition window fails this test until it either
    * repartitions (GroupedRank / keyed windows) or earns a justified
    * entry here (the r11 verdict item 4 tripwire).
    */
  private val unpartitionedWindowAllowlist: Map[String, Int] = Map(
    // ≤P-row per-partition offset frames (DistributedQuantile's
    // two-phase rank: the window orders partition ids, never rows)
    "q121_gap_outliers" -> 1,
    "q126_equidepth_hist" -> 1,
    "q217_winsorize" -> 1,
    "q229_drift_report" -> 1,
    "q361_weighted_median" -> 1, // |flags| = 3-row grid
    // shard-count-bounded packing offsets
    "q106_sequence_pack" -> 1,
    // per-day stats grid (calendar-bounded) picking the DPP rewrite
    "q150_dpp" -> 1,
    // iterative month loop: one calendar-month-ordered row_number per
    // peel × checkpoint actions (81 executions at sf0.001, all over
    // the ≤|months| frame)
    "q160_recursive_cte" -> 81,
    // source-bounded largest-remainder walk (|sources| rows)
    "q216_quota_sample" -> 1,
    // odate-grain suffix-min sweep: the frame is the per-day Pareto
    // candidate grid (calendar-bounded)
    "q258_pareto_skyline" -> 1,
    // C(31,2)-row slope pair grid median
    "q426_theil_sen" -> 1,
    // query-term-vocabulary window (3 terms)
    "q432_conjunctive_search" -> 1,
    // m-row Benjamini-Hochberg walk (m = |event types|)
    "q441_bh_fdr" -> 1,
    // three post-limit top-20 rank windows (≤60 rows total)
    "q445_rrf_fusion" -> 3,
    // cents-support cumulative grids (the q453/q457 discipline)
    "q453_ks_drift" -> 1,
    "q458_quantile_normalize" -> 2,
    // n_chars-support grids per language audit
    "q460_fairness_audit" -> 2,
    // mp-support median grid + the two cov-support matching walks
    // (the r11 item-1 rewrite: value-bounded, never user-grain)
    "q462_covariate_matching" -> 3,
    // day-grain (calendar-bounded) bootstrap rank spine
    "q463_bootstrap_ci" -> 1)

  test("unpartitioned windows run only on justified bounded-grain frames") {
    val hits = inventoryRun._2
    val violations = hits.toSeq.sortBy(_._1).flatMap { case (name, h) =>
      unpartitionedWindowAllowlist.get(name) match {
        case Some(max) if h.size <= max => Nil
        case Some(max) =>
          Seq(s"$name: ${h.size} unpartitioned windows (allowlist max $max):\n    " +
            h.mkString("\n    "))
        case None =>
          Seq(s"$name: ${h.size} UNLISTED unpartitioned window(s):\n    " +
            h.mkString("\n    "))
      }
    }
    assert(violations.isEmpty,
      "unpartitioned WindowExec outside the justified allowlist —\n" +
        violations.mkString("\n"))
  }
}
