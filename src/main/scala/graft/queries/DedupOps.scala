package graft.queries

import graft.operators.{CorpusPipeline, Dedup}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query bindings for the near-dup suite. Most are approximate /
  * signature-based algorithms with no SQL formulation — the driver
  * records rows-only checks; exactness is covered by DedupSpec
  * (planted-duplicate fixtures) and the SQL-oracled exact variants
  * (q32_exact_dedup, q35_token_jaccard, and q67_dup_clusters, whose
  * DuckDB oracle rebuilds the connected components with a recursive
  * transitive-closure CTE).
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

    // INCREMENTAL ingestion dedup — the daily-batch shape: the delta
    // (every 5th doc stands in for today's crawl) checks against the
    // standing base for exact 3-gram Jaccard ≥ 0.5 WITHOUT the
    // base×base self-join a full q38 run would re-pay; cross-side
    // AllPairs prefix filtering keeps it exact (Dedup
    // .crossJaccardPairs — spec-A/B'd against the union self-join
    // restricted to cross pairs).
    "q406_incremental_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables(s, d).documents
      Dedup.crossJaccardPairs(
          docs.filter(col("doc_id") % 5 === 4),
          docs.filter(col("doc_id") % 5 =!= 4),
          "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select(col("a_id").as("delta_id"), col("b_id").as("base_id"))
    }),

    // INCREMENTAL duplicate clustering (the delta discipline applied
    // to the CLUSTER ASSIGNMENT itself — the artifact q406's pair
    // probe feeds): day-1 clusters the base (doc_id % 5 != 4) from
    // its own exact-Jaccard pairs; day-2 the delta batch arrives —
    // cross pairs probe the base via AllPairs prefixes (the q406
    // machinery: base×base never re-pairs), delta-internal pairs
    // self-join the batch alone, and incrementalClusters folds both
    // into the STORED labels by contraction: CC runs over the
    // touched labels only (one node per affected component),
    // untouched rows survive verbatim through a broadcast anti join,
    // merged sizes fold stored sizes. The fold is DEFINED to equal a
    // from-scratch run — so the q67 oracle applies verbatim and the
    // driver hash-pins an incremental operator against DuckDB's
    // recursive transitive closure.
    "q476_incremental_clusters" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, d).documents
      def sets(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id").as("id"),
          array_sort(transform(array_distinct(split(col("text"), " ")),
            t => xxhash64(t))).as("ts"))
          .withColumn("n", size(col("ts")))
          // each frame feeds TWO pair passes (base: the day-1 build +
          // the cross probe; delta: the cross probe + its self-join) —
          // materialize once so tokenize+hash never re-runs. At sf0.1
          // the query's ~15 s is the serial ACTION chain (two full
          // clustering pipelines, each CC round checkpointing), not
          // shingling — this keeps the scan count honest, it is not
          // the wall-clock lever
          .localCheckpoint()
      val base = docs.filter(col("doc_id") % 5 =!= 4)
      val delta = docs.filter(col("doc_id") % 5 === 4)
      val baseSets = sets(base)
      val deltaSets = sets(delta)
      val baseLabels = Dedup.duplicateClusters(
        Dedup.jaccardPairs(baseSets.select(col("id"), col("ts")),
          threshold = 0.9).select("a_id", "b_id"),
        base.select("doc_id")).localCheckpoint()
      val cross = Dedup.crossJaccardPairsPre(deltaSets, baseSets,
        threshold = 0.9)
      val inner = Dedup.jaccardPairs(deltaSets.select(col("id"), col("ts")),
          threshold = 0.9)
        .select("a_id", "b_id")
      Dedup.incrementalClusters(baseLabels, delta.select("doc_id"),
        cross.unionByName(inner))
    }),

    // STREAMING incremental clustering — the q476 contraction fold
    // driven end-to-end by Structured Streaming: three "daily" batch
    // files (doc_id % 3, mtime-ordered) drain through foreachBatch;
    // batch 0 bootstraps a from-scratch clustering, each later batch
    // probes the PERSISTED prefix index (crossJaccardPairsPre's
    // basePrefixes — base×base never re-pairs, and the standing
    // corpus is never re-materialized: sets/prefixes are append-only
    // Manifest tables, labels a keyed COW upsert of changed rows,
    // the member tags the exactly-once ledger — r12 verdict item 1).
    // The fold is bit-identical to from-scratch at every step
    // (inductively), so the drained stream's final assignment
    // hash-pins against the q67 recursive-CTE oracle VERBATIM — a
    // streaming operator under a full SQL oracle.
    "q478_stream_clusters" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val feed = freshScratch("q478feed", d)
      val ckpt = freshScratch("q478ckpt", d)
      val state = freshScratch("q478state", d)
      (0 until 3).foreach { b =>
        graft.streaming.LakeIngest.stageBatchFile(feed, s"day$b.parquet",
          1000L * (b + 1), docs.filter(col("doc_id") % 3 === b))
      }
      graft.streaming.StreamingClusters.docFeedToClusters(s, feed, ckpt,
        state)
    }),

    // STREAMING incremental clustering WITH in-stream state
    // maintenance — q478 plus the q421 auto-compaction knob applied
    // to the state tables: whenever the sets table reaches 2 members,
    // the drain folds sets + prefix members into one (commitReplace,
    // layout-only, old files retained for pinned readers) BEFORE the
    // next batch lands — the file-count bound a 10⁴-batch drain
    // needs. Compaction changes no row, so the SAME recursive-CTE
    // oracle pins this drain verbatim: a streaming operator with
    // mid-stream storage maintenance under a full SQL oracle.
    "q482_stream_clusters_compact" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val feed = freshScratch("q482feed", d)
      val ckpt = freshScratch("q482ckpt", d)
      val state = freshScratch("q482state", d)
      (0 until 3).foreach { b =>
        graft.streaming.LakeIngest.stageBatchFile(feed, s"day$b.parquet",
          1000L * (b + 1), docs.filter(col("doc_id") % 3 === b))
      }
      val out = graft.streaming.StreamingClusters.docFeedToClusters(
        s, feed, ckpt, state, compactStateEvery = Some(2))
      // the knob must have engaged: 3 appends compacted down to ≤ 2
      // live members PER BUCKET GROUP — the file count a pruned
      // probe opens per bucket, the debt measure under the bucketed
      // layout (loud — a silently-disengaged knob would make this
      // row identical to q478)
      val setsRoot = s"$state/sets"
      val n = graft.operators.Manifest.memberPartitions(setsRoot,
          graft.operators.Manifest.currentVersion(setsRoot))
        .groupBy(_._2).valuesIterator.map(_.size).max
      require(n <= 2,
        s"q482: auto-compaction did not engage (a sets bucket holds $n members)")
      out
    }),

    // The incremental FOLD benched against a PERSISTED base (r13
    // verdict item 4): q476 is the ORACLE GATE for the contraction
    // fold, but ~15 s of its ~17 s at sf0.1 is the two in-query
    // from-scratch clustering pipelines that build its base fixture —
    // so the bench artifact tracked a fixture build, not the
    // operator. Here the base state (sets + key-bucketed prefixes +
    // labels — the q478 state shape) builds ONCE PER PROCESS into
    // Manifest tables (`cachedScratch`: later calls see the `_built`
    // marker and skip), and each run pays only what a daily drain
    // repeats per batch: delta shingling, the bucket-PRUNED stored
    // prefix-index probe, the delta self-join, contraction CC, and
    // the label fold. Fold ≡ from-scratch (the q476 argument), so
    // the same recursive-CTE oracle hash-pins the full assignment.
    "q484_incremental_fold_stored" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, d).documents
      val tau = 0.9; val kb = 16
      def sets(df: DataFrame) =
        df.select(col("doc_id").as("id"),
          array_sort(transform(array_distinct(split(col("text"), " ")),
            tk => xxhash64(tk))).as("ts"))
          .withColumn("n", size(col("ts")))
      val root = cachedScratch("q484", d) { r =>
        val base = docs.filter(col("doc_id") % 5 =!= 4)
        val bs = sets(base).localCheckpoint() // feeds pairs + 2 commits
        // the sets table lands id-BUCKETED like the prefixes (r14
        // verdict items 1+3): the fold's verify leg reads it pruned
        // to the candidates' id buckets
        graft.operators.BucketedIndex.commitBucketed(bs, s"$r/sets",
          "base", Seq("id"), kb)
        graft.operators.BucketedIndex.commitBucketed(
          Dedup.jaccardPrefixes(bs, tau), s"$r/prefixes", "base",
          Seq("t"), kb)
        graft.operators.Manifest.commitAdd(
          Dedup.duplicateClusters(
            Dedup.jaccardPairs(bs.select(col("id"), col("ts")), tau)
              .select("a_id", "b_id"),
            base.select("doc_id")),
          s"$r/labels", "base")
        ()
      }
      // per-run work from here on: the delta batch alone (its sets
      // feed the pruning keys AND both probe legs — materialize once).
      val delta = docs.filter(col("doc_id") % 5 === 4)
      val ds = sets(delta).localCheckpoint()
      // The two pair sources are independent until the union, and
      // each materializes eagerly inside its builder (candidate
      // checkpoint / rep persist), so build them on concurrent driver
      // threads (guide §2.6) — the fold's wall-clock pays
      // max(cross, inner) instead of their sum.
      // (cross is checkpointed INSIDE its thread so the pruned verify
      // leg — otherwise lazy — also overlaps the inner build, instead
      // of running serially inside the fold's pair materialization)
      val (cross, inner) = graft.util.Par.both(
        Dedup.crossJaccardPairsStored(s, ds, s"$root/sets",
          graft.operators.Manifest.currentVersion(s"$root/sets"), tau,
          Dedup.prunedBasePrefixes(s, s"$root/prefixes",
            graft.operators.Manifest.currentVersion(s"$root/prefixes"),
            ds, tau, kb), kb).localCheckpoint(),
        Dedup.jaccardPairs(ds.select(col("id"), col("ts")), tau)
          .select("a_id", "b_id"))
      Dedup.incrementalClusters(
        graft.operators.Manifest.read(s, s"$root/labels",
          graft.operators.Manifest.currentVersion(s"$root/labels")),
        delta.select("doc_id"), cross.unionByName(inner))
    }),

    // CLUSTER-GRAIN serving from the STORED label table (r14 verdict
    // item 2's machinery as a first-class query): the q67 clustering
    // persists doc_id-BUCKETED plus its cluster_id-keyed SECONDARY
    // INDEX (LabelStore), both built once per process; the query
    // answers "which duplicate clusters does today's batch touch, and
    // what is their FULL membership" with THREE pruned hops — the
    // batch ids' label buckets, the touched clusters' index buckets,
    // then only the primary buckets the index entries name
    // (LabelStoreSpec pins the file counts) — never a full label
    // scan. Pruning is a superset read + exact semi joins, so the
    // recursive-CTE oracle pins the result verbatim.
    "q487_cluster_lookup_stored" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val kb = 16
      val root = cachedScratch("q487", d) { r =>
        graft.operators.BucketedIndex.commitBucketed(
          tokenJaccardClusters(s, d), s"$r/labels", "base",
          Seq("doc_id"), kb)
        graft.operators.LabelStore.ensureSecondary(s, s"$r/labels",
          s"$r/labels_clx", kb)
      }
      val labT = s"$root/labels"; val clxT = s"$root/labels_clx"
      val lv = graft.operators.Manifest.currentVersion(labT)
      val cv = graft.operators.Manifest.currentVersion(clxT)
      val batch = Tables(s, d).documents
        .filter(col("doc_id") % 97 === 0).select(col("doc_id"))
      // the touched clusters: batch-bounded, feeds the index probe's
      // bucket collects AND the final semi join — materialize once
      val cids = graft.operators.LabelStore.byDocIds(s, labT, lv, batch, kb)
        .join(broadcast(batch), Seq("doc_id"), "left_semi")
        .select(col("cluster_id")).distinct().localCheckpoint()
      graft.operators.LabelStore.byClusterIds(s, labT, lv, clxT, cv,
          cids, kb)
        .join(broadcast(cids), Seq("cluster_id"), "left_semi")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // DELETION from the drained clustering state (r16 — the
    // retraction leg of the lifecycle): the corpus drains once
    // (foldBatch bootstrap = the q67 from-scratch clustering,
    // persisted as the q478 state shape), then every doc_id % 7 == 3
    // is DELETED — label rows, sets rows and prefix rows physically
    // leave their key buckets (BucketedIndex COW deletes, touched
    // buckets only), and the touched components' REMAINING members
    // re-cluster from scratch within the component (shrinks, SPLITS
    // and whole-cluster removals all occur here). Pair existence
    // depends only on the two docs' sets, so no pair outside the
    // touched components can change — the post-delete state equals
    // from-scratch clustering of (corpus − victims), and the q67
    // recursive-CTE oracle restricted to the remaining documents
    // hash-pins a DELETION operator verbatim. StreamingClustersSpec
    // additionally pins the split case, physical removal, clean
    // re-adds, and the crash-window retries.
    "q488_cluster_delete_fold" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val state = freshScratch("q488state", d)
      graft.streaming.StreamingClusters.foldBatch(s, docs, state, "b0",
        threshold = 0.9)
      graft.streaming.StreamingClusters.deleteDocs(s,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
        state, "del1", threshold = 0.9)
      graft.operators.Manifest.read(s, s"$state/labels",
        graft.operators.Manifest.currentVersion(s"$state/labels"))
    }),

    // STREAMING CDC clustering drain (r16 — q478 composed with q488):
    // the feed carries (op, doc_id, text) rows, documents JOIN (I)
    // and LEAVE (D) the corpus in-stream — four daily batch files:
    // adds, adds, a DELETE batch retracting every 7th-ish doc drained
    // so far, adds. Within a batch inserts fold first, deletes second,
    // each half with its own durable ledger (crash replays exactly
    // the unapplied half). Fold ≡ from-scratch (contraction) and
    // delete ≡ from-scratch on the remainder (component-bounded
    // recompute), inductively: the drained assignment equals ONE
    // from-scratch clustering of the SURVIVING documents — a
    // streaming add/delete pipeline under a full SQL oracle.
    "q490_stream_cdc_clusters" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit}
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val feed = freshScratch("q490feed", d)
      val ckpt = freshScratch("q490ckpt", d)
      val state = freshScratch("q490state", d)
      def stamp(op: String, df: DataFrame) =
        df.select(lit(op).as("op"), col("doc_id"), col("text"))
      val batches = Seq(
        stamp("I", docs.filter(col("doc_id") % 3 === 0)),
        stamp("I", docs.filter(col("doc_id") % 3 === 1)),
        stamp("D", docs.filter(col("doc_id") % 3 =!= 2 &&
          col("doc_id") % 7 === 3)),
        stamp("I", docs.filter(col("doc_id") % 3 === 2)))
      batches.zipWithIndex.foreach { case (b, i) =>
        graft.streaming.LakeIngest.stageBatchFile(feed, s"day$i.parquet",
          1000L * (i + 1), b)
      }
      graft.streaming.StreamingClusters.docFeedToClustersCdc(s, feed,
        ckpt, state)
    }),

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
    }),

    // Duplicate clustering: token-Jaccard pairs (exact, the q35
    // join) → connected components → (doc_id, cluster_id = min id in
    // component, cluster_size). The step that turns pair lists into
    // keep/drop decisions. Oracled: DuckDB computes the same
    // components with a recursive transitive-closure CTE.
    "q67_dup_clusters" -> ((s, d) => tokenJaccardClusters(s, d)),

    // The dedup DECISION: keep one representative per cluster (the
    // min-id member, deterministic) — the retained corpus a training
    // pipeline actually ships, with the cluster size it absorbed.
    "q68_dedup_keep" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      tokenJaccardClusters(s, d)
        .filter(col("doc_id") === col("cluster_id"))
        .join(Tables(s, d).documents.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"), col("cluster_size"))
    }),

    // Same contract as q67, computed by the O(log n)-round
    // star-rewriting algorithm instead of min-propagation — the two
    // share one DuckDB oracle, so this row proves star ≡ propagation
    // on the real corpus, not just the spec fixtures.
    "q70_dup_clusters_star" -> ((s, d) => tokenJaccardClusters(s, d, star = true)),

    // Quality-aware dedup keep — q68 keeps the MIN-ID representative;
    // production dedup keeps the BEST copy: per q67 cluster, the
    // member with the most tokens (the q33 length signal), doc_id
    // tie-break. One rank window over the cluster assignment joined
    // to a row-local quality score — the "which duplicate survives"
    // policy upgraded without touching the clustering.
    "q294_quality_keep" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val quality = Tables(s, d).documents.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      tokenJaccardClusters(s, d)
        .join(quality, "doc_id")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("n_tokens"))
    }),

    // Cluster-size distribution — the release-note view of q67's
    // clustering: how many duplicate clusters exist at each size
    // (size 1 = unique docs). One row per cluster (the min-id rep
    // q68 keeps) then a tiny size histogram; the report a dedup
    // rollout quotes ("N pairs, M triples collapsed").
    "q286_cluster_sizes" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, count, lit}
      tokenJaccardClusters(s, d)
        .filter(col("doc_id") === col("cluster_id"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    }),

    // LSH parameter-sweep harness: the (bands × rows) tuning run an
    // operator rollout does BEFORE committing a config. One planted
    // near-duplicate per eligible doc (first token dropped), ONE
    // shingle+signature pass (persisted / checkpointed), then each
    // banding config generates its candidate set and is scored
    // against the known plants: candidates, hits, recall. The
    // driver-side loop is over 3 CONFIGS, never over data. Candidate
    // counts are hash-seed-specific → rows-only gate; DedupSpec pins
    // recall monotonicity in band count and the 16-band floor.
    "q227_lsh_sweep" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val toks = split(col("text"), " ")
      val base = Tables(s, d).documents.filter(size(toks) >= 20)
        .select(col("doc_id").cast("long").as("id"), col("text"))
      val twins = base.select((col("id") + 10000000L).as("id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val all = base.unionByName(twins)
        .repartition(s.sparkContext.defaultParallelism)
      val shingled = all.select(col("id"),
        array_sort(Dedup.shingleHashes(col("text"), 3)).as("sh"))
      val sig = shingled
        .withColumn("mh", Dedup.minHashSignature(col("sh"), 32))
        .select("id", "mh").localCheckpoint()
      val nTruth = base.count()
      val rows = Seq(4, 8, 16).map { bands =>
        val rpb = 32 / bands
        val banded = sig.select(col("id"),
          posexplode(array((0 until bands).map { b =>
            xxhash64((0 until rpb).map(r =>
              element_at(col("mh"), b * rpb + r + 1)): _*)
          }: _*)).as(Seq("band", "bucket")))
        val a = banded.select(col("band"), col("bucket"), col("id").as("a_id"))
        val bb = banded.select(col("band"), col("bucket"), col("id").as("b_id"))
        val cand = a.join(bb, Seq("band", "bucket"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct().localCheckpoint()
        val nCand = cand.count()
        val nHits = cand.filter(col("b_id") === col("a_id") + 10000000L).count()
        (bands.toLong, rpb.toLong, nCand, nHits, nTruth,
          nHits.toDouble / nTruth.toDouble)
      }
      import s.implicits._
      rows.toDF("bands", "rows_per_band", "n_candidates", "n_hits",
        "n_truth", "recall")
    }),

    // Incremental dedup against a PERSISTED prefix index — the
    // production form of q406: the standing corpus' shingle sets and
    // AllPairs prefix rows are built ONCE and stored as Manifest
    // tables (base commit, then day-1's append), so the day-2 probe
    // pays shingling for its own batch alone and reads the index
    // from parquet — at 100 TB the daily cost drops from
    // O(corpus shingling) to O(batch) + an index scan. The index is
    // written KEY-BUCKETED on the prefix element t (r13 verdict item
    // 1), so the probe's scan opens only the delta's bucket members —
    // index read IO follows the batch's key set, not the standing
    // index (BucketedIndexSpec pins the file counts; pruning keeps a
    // candidate superset, so exactness is untouched). Exactness
    // preserved (Dedup.crossJaccardPairsPre — spec-A/B'd against the
    // direct computation through a parquet round-trip); PlanSpec
    // pins that the probe scans documents ONCE (the delta).
    "q415_indexed_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val root = freshScratch("q415", d)
      val setsT = s"$root/sets"; val prefT = s"$root/prefixes"
      val t = 0.4; val kb = 16
      val docs = Tables(s, d).documents
      // the sets table lands id-BUCKETED (r14 verdict item 1) so the
      // verify leg's payload re-join can read the CANDIDATES' id
      // buckets instead of scanning the standing corpus
      val bs = Dedup.jaccardSets(
        docs.filter(col("doc_id") % 7 >= 1 && col("doc_id") % 7 <= 3),
        "doc_id", "text", 3)
      graft.operators.BucketedIndex.commitBucketed(bs, setsT, "base",
        Seq("id"), kb)
      graft.operators.BucketedIndex.commitBucketed(
        Dedup.jaccardPrefixes(bs, t), prefT, "base", Seq("t"), kb)
      val d1 = Dedup.jaccardSets(
        docs.filter(col("doc_id") % 7 >= 4), "doc_id", "text", 3)
      graft.operators.BucketedIndex.commitBucketed(d1, setsT, "day1",
        Seq("id"), kb)
      graft.operators.BucketedIndex.commitBucketed(
        Dedup.jaccardPrefixes(d1, t), prefT, "day1", Seq("t"), kb)
      // batch-sized; feeds the pruning keys AND both probe legs —
      // materialize once
      val ds = Dedup.jaccardSets(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", 3)
        .localCheckpoint()
      val pv = graft.operators.Manifest.currentVersion(prefT)
      val sv = graft.operators.Manifest.currentVersion(setsT)
      Dedup.crossJaccardPairsStored(s, ds, setsT, sv, t,
          Dedup.prunedBasePrefixes(s, prefT, pv, ds, t, kb), kb)
        .select(col("a_id").as("delta_id"), col("b_id").as("base_id"))
    }),

    // Incremental dedup against a PERSISTED LSH BUCKET index — the
    // APPROXIMATE twin of q415's exact prefix index, and the 100 TB
    // path for LOW thresholds: the exact AllPairs prefix grows as τ
    // drops (τ→0 indexes whole documents), while the LSH index is
    // O(bands) longs per doc at ANY threshold, recall following the
    // band curve. The standing corpus commits its shingle sets and
    // band-bucket rows once (Manifest tables, base + day-1 appends);
    // the day-2 batch pays its own shingling + signatures, joins its
    // bucket rows against the STORED index, and exact-verifies
    // candidates at Jaccard ≥ 0.4 — identical candidates to running
    // q36's self-join over base ∪ delta and keeping cross pairs
    // (signatures are per-doc; DedupSpec A/Bs the equality through
    // a parquet round trip). Approximate (LSH) → rows-only gate.
    "q480_lsh_indexed_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val root = freshScratch("q480", d)
      val setsT = s"$root/sets"; val bktT = s"$root/buckets"
      val kb = 16
      val docs = Tables(s, d).documents
      def sets(f: org.apache.spark.sql.Column) =
        Dedup.jaccardSets(docs.filter(f), "doc_id", "text", 2)
      // the sets table lands id-BUCKETED so the disjointness proof
      // below probes only the delta's id buckets (r13 verdict item 5
      // — the foldBatch guard pattern applied to the standalone probe)
      val b0 = sets(col("doc_id") % 5 <= 1)
      graft.operators.BucketedIndex.commitBucketed(b0, setsT, "base",
        Seq("id"), kb)
      graft.operators.BucketedIndex.commitBucketed(
        Dedup.lshBucketIndex(b0).buckets, bktT, "base",
        Seq("band", "bucket"), kb)
      val b1 = sets(col("doc_id") % 5 === 2 || col("doc_id") % 5 === 3)
      graft.operators.BucketedIndex.commitBucketed(b1, setsT, "day1",
        Seq("id"), kb)
      graft.operators.BucketedIndex.commitBucketed(
        Dedup.lshBucketIndex(b1).buckets, bktT, "day1",
        Seq("band", "bucket"), kb)
      // batch-sized; feeds the bucket leg, the verify leg AND the
      // disjointness proof — materialize once (the q476 lesson)
      val ds = sets(col("doc_id") % 5 === 4).localCheckpoint()
      // disjointness proven at delta-bucket cost through the shared
      // id-grain guard (StoredIndex.requireNewIds): the probe opens
      // only the delta's id bucket members of the stored sets, never
      // the whole base side
      val sv = graft.operators.Manifest.currentVersion(setsT)
      graft.operators.StoredIndex.requireNewIds(s, setsT,
        ds.select(col("id")), kb, "q480")
      // reconstruction states the build parameters NEXT TO the stored
      // frame — the probe derives its own banding from them. The
      // stored index is read PRUNED to the delta's (band, bucket)
      // key buckets (r13 verdict item 1), and the exact-verify leg
      // reads base payloads PRUNED to the candidates' id buckets
      // (r14 verdict item 1): both the probe's and the verify's file
      // IO follow the batch, never the standing index/corpus.
      val bv = graft.operators.Manifest.currentVersion(bktT)
      Dedup.crossMinHashLshStored(s, ds, setsT, sv, threshold = 0.4,
          Dedup.LshBucketIndex(
            Dedup.prunedLshBuckets(s, bktT, bv, ds,
              numPerm = 32, bands = 8, seed = 42L, numBuckets = kb),
            numPerm = 32, bands = 8, seed = 42L),
          setsNumBuckets = kb)
        .select(col("a_id").as("delta_id"), col("b_id").as("base_id"))
    })
  )

  /** PID-scoped scratch (the EtlOps.freshScratch pattern): content-
    * addressed by input dir, wiped per run so verify/bench re-runs
    * start clean.
    */
  private def freshScratch(tag: String, d: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-" + Integer.toHexString(d.hashCode) +
        "-p" + ProcessHandle.current().pid())
    graft.util.Fs.deleteRecursively(p)
    p.toString
  }

  /** PROCESS-cached scratch (r13 verdict item 4's build-once shape):
    * pid + input-dir addressed like [[freshScratch]], but the state
    * builds ONCE per process — the `_built` marker records a
    * completed build; a missing marker wipes any partial state (a
    * crashed earlier build) and rebuilds. Bench samples and repeated
    * in-process calls hence pay only the per-run fold, the way a
    * standing production base amortizes across daily batches.
    */
  private def cachedScratch(tag: String, d: String)(
      build: String => Unit): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-" + Integer.toHexString(d.hashCode) +
        "-p" + ProcessHandle.current().pid())
    val marker = p.resolve("_built")
    if (!java.nio.file.Files.exists(marker)) {
      graft.util.Fs.deleteRecursively(p)
      build(p.toString)
      java.nio.file.Files.createFile(marker)
      ()
    }
    p.toString
  }

  /** Shared by q67/q68/q70: hashed token sets → exact Jaccard ≥ 0.9
    * pairs → connected components (one definition, so the queries
    * and their common oracle CTE prefix cannot diverge).
    * `star` picks the star-rewriting clustering over min-propagation;
    * both produce the identical (doc_id, cluster_id, cluster_size).
    */
  private def tokenJaccardClusters(
      s: SparkSession, d: String, star: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = Tables(s, d).documents
    val sets = docs.select(col("doc_id").as("id"),
      array_sort(transform(array_distinct(split(col("text"), " ")),
        t => xxhash64(t))).as("ts"))
    val pairs = Dedup.jaccardPairs(sets, threshold = 0.9).select("a_id", "b_id")
    if (star) Dedup.duplicateClustersStar(pairs, docs.select("doc_id"))
    else Dedup.duplicateClusters(pairs, docs.select("doc_id"))
  }

  /** One oracle text for both clustering algorithms (q67 min-
    * propagation, q70 star-rewriting): the output contract is
    * identical by design.
    */
  private val clustersOracle: String =
    """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM documents
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
         FROM reach GROUP BY s"""

  def oracleSql: Map[String, String] = Map(
    "q294_quality_keep" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM documents
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         cl AS (
           SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
           FROM reach GROUP BY s),
         q AS (SELECT doc_id,
                      len(string_split(text, ' '))::BIGINT AS n_tokens
               FROM documents),
         r AS (SELECT cl.doc_id, cl.cluster_id, cl.cluster_size, q.n_tokens,
                 row_number() OVER (PARTITION BY cl.cluster_id
                   ORDER BY q.n_tokens DESC, cl.doc_id) AS rk
               FROM cl JOIN q USING (doc_id))
         SELECT doc_id, cluster_id, cluster_size, n_tokens
         FROM r WHERE rk = 1""",
    "q286_cluster_sizes" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM documents
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         cl AS (
           SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
           FROM reach GROUP BY s)
         SELECT cluster_size, count(*)::BIGINT AS n_clusters
         FROM cl WHERE doc_id = cluster_id GROUP BY 1""",
    "q67_dup_clusters" -> clustersOracle,
    "q70_dup_clusters_star" -> clustersOracle,

    // q487: the q67 clustering restricted to clusters containing a
    // batch doc (doc_id % 97 = 0) — full membership of each
    "q487_cluster_lookup_stored" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM documents
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         labs AS (
           SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
           FROM reach GROUP BY s),
         hit AS (
           SELECT DISTINCT cluster_id FROM labs WHERE doc_id % 97 = 0)
         SELECT l.doc_id, l.cluster_id, l.cluster_size
         FROM labs l JOIN hit h ON l.cluster_id = h.cluster_id""",
    // the incremental fold is DEFINED to equal the from-scratch run,
    // so the same recursive-CTE oracle pins all four (q478 is the
    // STREAMING drive of the same fold)
    "q476_incremental_clusters" -> clustersOracle,
    "q478_stream_clusters" -> clustersOracle,
    // mid-stream compaction is layout-only — same oracle verbatim
    "q482_stream_clusters_compact" -> clustersOracle,
    // the stored-base fold ≡ from-scratch (q476's argument over the
    // persisted q478 state shape) — same oracle verbatim
    "q484_incremental_fold_stored" -> clustersOracle,
    // q488: the DELETION fold ≡ from-scratch on the remaining corpus
    // (component-bounded recompute — see the query comment), so the
    // same CTE restricted to the surviving documents pins it
    "q488_cluster_delete_fold" ->
      """WITH RECURSIVE keep AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
         tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM keep),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM keep
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
         FROM reach GROUP BY s""",
    // q490: the streaming CDC drain ≡ from-scratch on the SURVIVORS
    // (every doc except the day-2 retraction batch: drained-so-far
    // docs with doc_id % 7 = 3 — the day-3 adds arrive after the
    // delete and stay)
    "q490_stream_cdc_clusters" ->
      """WITH RECURSIVE keep AS (
           SELECT doc_id, text FROM documents
           WHERE NOT (doc_id % 3 <> 2 AND doc_id % 7 = 3)),
         tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM keep),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM keep
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
         FROM reach GROUP BY s""",
    "q68_dedup_keep" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
           WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.9),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT doc_id AS s, doc_id AS d FROM documents
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         lab AS (
           SELECT s AS doc_id, min(d) AS cluster_id, count(*) AS cluster_size
           FROM reach GROUP BY s)
         SELECT l.doc_id, doc.source, l.cluster_size
         FROM lab l JOIN documents doc ON doc.doc_id = l.doc_id
         WHERE l.doc_id = l.cluster_id""",
    "q406_incremental_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws,
                doc_id % 5 = 4 AS is_delta FROM documents),
         g AS (SELECT doc_id, is_delta,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE [array_to_string(ws[i:i+2], ' ')
                            FOR i IN range(1, len(ws) - 1)] END AS gs
               FROM t),
         tok AS (SELECT doc_id, is_delta,
                        unnest(list_distinct(gs)) AS tk FROM g),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (SELECT a.doc_id AS delta_id, b.doc_id AS base_id,
                          count(*) AS c
                   FROM tok a JOIN tok b ON a.tk = b.tk
                   WHERE a.is_delta AND NOT b.is_delta
                   GROUP BY 1, 2)
         SELECT delta_id, base_id FROM inter
         JOIN sizes sa ON sa.doc_id = delta_id
         JOIN sizes sb ON sb.doc_id = base_id
         WHERE c * 2 >= (sa.n + sb.n - c)""",
    "q415_indexed_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws,
                doc_id % 7 = 0 AS is_delta FROM documents),
         g AS (SELECT doc_id, is_delta,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE [array_to_string(ws[i:i+2], ' ')
                            FOR i IN range(1, len(ws) - 1)] END AS gs
               FROM t),
         tok AS (SELECT doc_id, is_delta,
                        unnest(list_distinct(gs)) AS tk FROM g),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         inter AS (SELECT a.doc_id AS delta_id, b.doc_id AS base_id,
                          count(*) AS c
                   FROM tok a JOIN tok b ON a.tk = b.tk
                   WHERE a.is_delta AND NOT b.is_delta
                   GROUP BY 1, 2)
         SELECT delta_id, base_id FROM inter
         JOIN sizes sa ON sa.doc_id = delta_id
         JOIN sizes sb ON sb.doc_id = base_id
         WHERE c * 5 >= 2 * (sa.n + sb.n - c)"""
  )
}
