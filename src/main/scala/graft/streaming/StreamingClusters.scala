package graft.streaming

import graft.operators.{BucketedIndex, Dedup, LabelStore, Manifest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING incremental duplicate clustering — the q476 contraction
  * fold driven by a Structured Streaming corpus feed, with the
  * standing state PERSISTED as three [[Manifest]] tables (the q375
  * recipe, r12 verdict item 1):
  *
  *   - `<state>/sets`     — (id, ts, n) shingle-set rows, appended
  *     per batch KEY-BUCKETED ON id (append-only: batch k+1 never
  *     rewrites or re-materializes batch k's sets) — the id buckets
  *     are what lets the per-batch disjointness guard probe only the
  *     delta's id buckets instead of scanning the standing corpus;
  *   - `<state>/prefixes` — the AllPairs prefix index rows at the
  *     drain's threshold, appended per batch KEY-BUCKETED ON the
  *     prefix element `t` — so each micro-batch probe reads the
  *     STORED index ([[Dedup.crossJaccardPairsPre]]'s
  *     `basePrefixes`, the q415 persisted-index discipline) PRUNED
  *     to its own prefix keys' bucket members
  *     ([[Dedup.prunedBasePrefixes]], r13 verdict item 1): index
  *     read IO follows the batch's key set, never the index size;
  *   - `<state>/labels`   — (doc_id, cluster_id, cluster_size),
  *     KEY-BUCKETED ON doc_id and advanced by the LAYOUT-PRESERVING
  *     keyed COW upsert of ONLY the fold's changed rows
  *     ([[BucketedIndex.upsertBucketed]] over
  *     [[Dedup.incrementalClustersDeltaBy]]'s output — r14): only
  *     the buckets the changed doc_ids hash into rewrite (each
  *     folding to one member, so the table never exceeds one member
  *     per bucket — no compaction debt), untouched buckets' members
  *     stay verbatim on storage, and — unlike the previous
  *     [[Manifest.upsert]] path — no full-table probe pass runs to
  *     FIND affected members: the touched set comes from hashing the
  *     changed keys, metadata-scale. A labels table written by a
  *     pre-bucketing drain fails the fold loudly with the remedy
  *     (rewrite via commitBucketed); state dirs are otherwise
  *     layout-compatible across resumes.
  *   - `<state>/labels_clx` — the cluster_id-keyed SECONDARY INDEX
  *     over the labels table ([[graft.operators.LabelStore]], r15):
  *     (cluster_id → occupied doc_id buckets), itself bucketed on
  *     cluster_id and COW-advanced from the fold's changed rows
  *     (complete per touched cluster because components only merge).
  *     It commits BEFORE the labels (index-ahead crash states are
  *     safe supersets; see LabelStore's crash-order contract). A
  *     state that predates it bootstraps the index from one full
  *     label scan, then stays pruned.
  *
  * Per-batch COMPUTE *and READ IO* are therefore delta-shaped end to
  * end: shingling O(batch); the probe shuffles the BATCH's prefix
  * rows against the bucket-pruned stored-index scan; the disjointness
  * guard probes only the delta's id buckets (the
  * [[Dedup.incrementalClustersDeltaBy]] label-scan guard is skipped —
  * this guard subsumes it, see foldBatch); the verify leg reads base
  * payloads PRUNED to the materialized CANDIDATES' id buckets
  * ([[Dedup.crossJaccardPairsStored]] — r14 verdict item 1);
  * contraction CC is touched-component-sized; every label-table
  * touch reads only the relevant bucket members — the id-keyed
  * lookup leg through the endpoints' doc_id buckets, the
  * cluster-grain size/relabel legs through the secondary index's two
  * pruned hops; and the only frames ever `localCheckpoint`-
  * materialized are batch-sized or touched-bounded
  * (StreamingClustersSpec pins this). The residual unit of read IO
  * is the BUCKET FILE: a fold pays O(touched buckets × table /
  * numBuckets) bytes, so the layout constant `IndexBuckets` is what
  * sizes per-fold IO at scale (a 100 TB deployment raises it so
  * bucket members stay batch-comparable; the tags make the layout
  * self-describing, so re-bucketing is one commitBucketed rewrite).
  *
  * Exactly-once + RESTARTABILITY: `foreachBatch` is at-least-once,
  * and each batch's labels commit writes a durable per-batch REF on
  * the labels table — the ledger that makes redelivery a no-op (a
  * ref, not a member-name tag, because later batches' COW rewrites
  * replace the members an earlier batch published; the name tag
  * remains the crash-window fallback — see `labelsApplied`). Because
  * the ledger and the state live in the same durable tables, a kill
  * + restart
  * with the same checkpoint/state dirs resumes mid-stream: committed
  * batches skip, the next batch folds onto the PERSISTED labels —
  * bit-identical to an uninterrupted drain (spec-pinned). Commit
  * order makes the crash windows safe: sets and prefixes land first
  * (idempotently — an orphan data dir from a crash between write and
  * publish is GC'd on retry), labels last. A crash after the
  * sets/prefix commit but before the labels commit re-runs the fold
  * with the batch's own rows already in the stored tables — the fold
  * anti-joins its own ids out of the base side (broadcast,
  * batch-sized), so the retry is BIT-IDENTICAL to the clean path:
  * no self pairs, no duplicated batch-internal candidates, and an
  * armed candidate tripwire sees clean-path counts (it can never
  * wedge the drain on an inflated retry).
  *
  * The fold is bit-identical to a from-scratch run at every step
  * (the q476 contraction argument, applied inductively over
  * batches), so the DRAINED stream's final assignment equals one
  * from-scratch clustering of everything that arrived — which is why
  * q478 can hash-pin a STREAMING operator against the q67 recursive-
  * CTE oracle verbatim.
  *
  * `maxCandidateFactor` (optional) arms [[Dedup.crossJaccardPairsPre]]'s
  * candidate tripwire per batch: a low-τ misconfiguration fails the
  * drain loudly instead of exploding one micro-batch into a
  * corpus-sized candidate join (r12 verdict item 7).
  */
object StreamingClusters {

  private[streaming] def tokenSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => xxhash64(t))).as("ts"))
      .withColumn("n", size(col("ts")))

  /** Bucket count of the key-bucketed state layouts (prefixes on
    * `t`, sets on `id`). Constant across the drain; a resumed state
    * written under a different value degrades to conservative
    * (unpruned) reads, never wrong pruning — the `kbn` tag rule.
    */
  private[streaming] val IndexBuckets = 16

  /** Idempotent append of one batch's member to an append-only state
    * table: a no-op when the tag is already a member (redelivery); a
    * data dir orphaned by a crash between parquet write and manifest
    * publish is unreferenced (the tag is absent) and GC'd before the
    * retry — the [[Manifest.applyCdcBatch]] recovery discipline.
    */
  private def appendOnce(df: DataFrame, root: String, tag: String): Unit =
    if (!Manifest.tagApplied(root, tag)) {
      graft.util.Fs.deleteRecursively(
        java.nio.file.Paths.get(root, "files", s"$tag-data"))
      Manifest.commitAdd(df, root, s"$tag-data")
      ()
    }

  /** [[appendOnce]]'s key-bucketed twin — the shared
    * [[graft.operators.StoredIndex.appendOnce]] skeleton under this
    * drain's `-data` tag convention and bucket constant. Crash
    * recovery (orphan staging / partially-moved bucket dirs) is
    * [[BucketedIndex.commitBucketed]]'s own.
    */
  private[streaming] def appendBucketedOnce(
      df: DataFrame, root: String, tag: String, keyCols: Seq[String]): Unit =
    if (!Manifest.tagApplied(root, tag)) {
      graft.operators.StoredIndex.appendOnce(df, root, s"$tag-data",
        keyCols, IndexBuckets)
      ()
    }

  /** Has batch `tag` committed its labels? The durable ledger is a
    * REF per applied batch (refs are never rewritten), because member
    * NAMES alone cannot ledger a COW table: batch k+1's upsert
    * rewrites the members batch k published, erasing k's name tags.
    * The member-name check remains as the crash-window fallback: a
    * crash between the upsert and the ref write retries while this
    * batch is still the frontier — no later batch has rewritten its
    * members yet — so the tag is visible and the ref heals.
    */
  private def labelsApplied(labRoot: String, tag: String): Boolean =
    Manifest.refVersion(labRoot, tag).isDefined ||
      (Manifest.tagApplied(labRoot, tag) && {
        Manifest.setRef(labRoot, tag, Manifest.currentVersion(labRoot))
        true
      })

  /** The build threshold is PART OF THE STATE (the LshBucketIndex
    * lesson applied to the drain): the stored AllPairs prefix index
    * only serves probes at its own threshold, and the fold's
    * from-scratch-equality argument needs ONE τ across every batch —
    * a resume under a different value would silently misprobe and
    * diverge. First fold records it; every later fold (and resume)
    * must match or fails loudly.
    */
  private def checkThreshold(stateDir: String, threshold: Double): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    val p = java.nio.file.Paths.get(stateDir, "threshold")
    val repr = threshold.toString
    if (java.nio.file.Files.exists(p)) {
      val stored = new String(java.nio.file.Files.readAllBytes(p), UTF_8).trim
      require(stored == repr,
        s"StreamingClusters: state at $stateDir was built at threshold " +
          s"$stored but this drain runs at $repr — the stored prefix " +
          "index and the cluster semantics are only valid at the build " +
          s"threshold; resume with $stored or start a fresh state dir")
    } else {
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = p.getParent.resolve(".threshold.tmp")
      java.nio.file.Files.write(tmp, repr.getBytes(UTF_8))
      try java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, p,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    }
  }

  /** Fold ONE batch of (doc_id, text) documents into the persisted
    * state under `stateDir`, committing under `tag` — exposed as the
    * unit StreamingClustersSpec drives directly (materialization and
    * candidate-IO pins, crash-window re-entry). Idempotent: a tag
    * already in the labels ledger returns without reading the batch.
    */
  def foldBatch(
      spark: SparkSession,
      docs: DataFrame,
      stateDir: String,
      tag: String,
      threshold: Double,
      maxCandidateFactor: Option[Double] = None): Unit = {
    val setsRoot = s"$stateDir/sets"
    val prefRoot = s"$stateDir/prefixes"
    val labRoot = s"$stateDir/labels"
    val clxRoot = s"$stateDir/labels_clx"
    checkThreshold(stateDir, threshold)
    if (labelsApplied(labRoot, tag)) return
    // the batch's sets — the fold's ONLY corpus-text scan, and the
    // only input-sized materialization (batch-sized by definition)
    val bSets = tokenSets(docs).localCheckpoint()
    val bIds = bSets.select(col("id").as("doc_id"))
    val inner = Dedup.jaccardPairs(
        bSets.select(col("id"), col("ts")), threshold)
      .select(col("a_id"), col("b_id"))
    val bootstrap = Manifest.currentVersion(labRoot) == 0
    val changed =
      if (bootstrap) {
        // bootstrap: the first batch clusters from scratch (the batch
        // IS the corpus, so this too is batch-sized)
        Dedup.duplicateClusters(inner, bIds)
      } else {
        val ownIds = bSets.select(col("id"))
        // DELTA-SHAPED disjointness guard (r13 verdict item 5 /
        // advice item 2 — replaces incrementalClustersDelta's
        // O(corpus) label-table scan per batch): every id in the
        // labels table arrived through some batch's sets commit
        // (sets commit FIRST — commit order below), and a batch id
        // may legally sit in the stored sets only via THIS tag's own
        // crash-window member (a compaction can only fold members of
        // batches whose labels already landed — those redeliveries
        // exit at the ledger and never reach here). So probing the
        // OTHER tags' sets members, pruned to the delta's id
        // buckets, proves label disjointness at delta-bucket cost.
        val sv = Manifest.currentVersion(setsRoot)
        val otherMembers = BucketedIndex.prunedMemberPaths(setsRoot, sv,
            bSets.select(col("id")), Seq("id"), IndexBuckets)
          .filterNot(p => java.nio.file.Paths.get(p)
            .getFileName.toString.startsWith(s"$tag-data"))
        if (otherMembers.nonEmpty)
          require(spark.read.parquet(otherMembers: _*).select(col("id"))
              .join(broadcast(ownIds.distinct()), Seq("id"), "left_semi")
              .isEmpty,
            s"StreamingClusters.foldBatch($tag): batch ids overlap ids " +
              "already drained by earlier batches — the feed must carry " +
              "each doc_id once; duplicate arrivals would corrupt the " +
              "label table silently")
        // the stored prefix index is read PRUNED to the batch's own
        // prefix-key buckets — the scan opens the delta's bucket
        // members, never the standing index (pruning keeps a
        // candidate superset; the verify leg keeps exactness).
        // Crash-window hygiene rides the SAME anti-join: if a prior
        // attempt committed this batch's sets/prefixes before dying,
        // the stored tables already CONTAIN the batch — excluding the
        // batch's own ids at the PREFIX level means no candidate ever
        // names an own id as its base endpoint, so the retry's fold
        // is BIT-IDENTICAL to the clean path (no self pairs, no
        // duplicated batch-internal candidates, and an armed
        // maxCandidateFactor sees clean-path candidate counts); the
        // verify leg's inner b_id join can never resurrect an
        // excluded id. On the clean path the anti-join matches
        // nothing and costs one broadcast probe.
        val basePref = Dedup.prunedBasePrefixes(spark, prefRoot,
            Manifest.currentVersion(prefRoot), bSets, threshold,
            IndexBuckets)
          .join(broadcast(ownIds), Seq("id"), "left_anti")
        // the verify leg is CANDIDATE-BOUNDED (r14 verdict item 1):
        // the candidate pairs materialize delta-bounded, and the base
        // payload re-join reads the id-bucketed stored sets PRUNED to
        // the candidates' base-id buckets — the fold's last
        // corpus-proportional sets read is gone
        val cross = Dedup.crossJaccardPairsStored(spark, bSets, setsRoot,
          sv, threshold, basePref, IndexBuckets,
          maxCandidateFactor = maxCandidateFactor)
        // the label table is served PRUNED (r14 verdict item 2): the
        // id-keyed lookup leg reads the endpoints' doc_id buckets,
        // and the cluster-grain legs (old sizes, relabel) go through
        // the cluster_id-keyed SECONDARY INDEX — two pruned hops, so
        // per-fold label IO follows the touched components, never the
        // corpus. A legacy state (labels without the index) bootstraps
        // the index from one full scan here, then stays pruned.
        LabelStore.ensureSecondary(spark, labRoot, clxRoot, IndexBuckets)
        val lv = Manifest.currentVersion(labRoot)
        val cxv = Manifest.currentVersion(clxRoot)
        // assumeDisjoint: proven above at delta-bucket cost
        Dedup.incrementalClustersDeltaBy(
            ids => LabelStore.byDocIds(spark, labRoot, lv, ids,
              IndexBuckets),
            cids => LabelStore.byClusterIds(spark, labRoot, lv, clxRoot,
              cxv, cids, IndexBuckets),
            bIds, cross.unionByName(inner), assumeDisjoint = true)
          .changed
      }
    // changed is touched-bounded; materialize once — the upsert below
    // runs several actions over it (uniqueness probe, member semi-join)
    val changedM = changed.localCheckpoint()
    // commit order: append-only state first (idempotent, and a
    // premature sets/prefix commit is harmless — see class doc),
    // the labels ledger LAST
    appendBucketedOnce(bSets, setsRoot, tag, Seq("id"))
    appendBucketedOnce(Dedup.jaccardPrefixes(bSets, threshold), prefRoot,
      tag, Seq("t"))
    // the first labels commit CREATES the table (the upsert requires
    // an initialized bucketed layout); later batches COW-upsert only
    // changed rows through the layout-preserving bucketed path. The
    // SECONDARY INDEX commits FIRST — index-ahead crash states are
    // safe (components only merge, so a surviving cluster's new
    // entry set covers every bucket its current rows occupy; extra
    // entries only widen a pruned read), labels-ahead states would
    // let a probe miss relabeled rows (the LabelStore crash-order
    // contract). The per-batch ref on the LABELS table is the
    // durable ledger entry (see labelsApplied); the clx tag check is
    // the crash-window skip within this batch's frontier.
    if (bootstrap) {
      appendBucketedOnce(LabelStore.clusterEntries(changedM, IndexBuckets),
        clxRoot, tag, Seq("cluster_id"))
      appendBucketedOnce(changedM, labRoot, tag, Seq("doc_id"))
    } else {
      if (!Manifest.tagApplied(clxRoot, tag)) {
        BucketedIndex.upsertBucketed(
          LabelStore.clusterEntries(changedM, IndexBuckets), clxRoot, tag,
          Seq("cluster_id"), IndexBuckets)
        ()
      }
      BucketedIndex.upsertBucketed(changedM, labRoot, tag,
        Seq("doc_id"), IndexBuckets)
      ()
    }
    Manifest.setRef(labRoot, tag, Manifest.currentVersion(labRoot))
  }

  /** SMALL-FILE COMPACTION of the standing state — the maintenance
    * call a long drain needs: the sets and prefix tables gain one
    * appended member PER OCCUPIED KEY BUCKET PER BATCH by design
    * (append-only keeps per-batch commit cost delta-sized), so after
    * 10⁴ batches every bucket holds 10⁴ small files. This folds
    * members via [[Manifest.compactTiered]] — SIZE-TIERED and
    * LAYOUT-PRESERVING (r13 verdict item 2): members group by their
    * bucket tags (pruned probes keep working verbatim across a
    * compaction), and within a group only members at or below
    * `maxTierRows` fold into one, so rewrite IO per engagement is
    * bounded by the folded small tier, never the standing state —
    * a settled mega-member is never rewritten again. The default
    * threshold folds every sized member (the small-state regime);
    * long drains pass a tier bound so compaction cost stays
    * O(tier), the amortized-O(state/k) full rewrite the r13 verdict
    * flagged. Pure LAYOUT change (exact union preserved; spec pins
    * drain-equality across a mid-stream compaction), atomic, and
    * pinned readers keep the old files. Crash-safe on redelivery:
    * a published `$tag-compacted` member skips (the ledger), a
    * crashed attempt's orphan dirs are GC'd by compactTiered before
    * the retry (r13 advice item 1). Labels need no call here — the
    * COW upsert already bounds that table's member count by
    * rewriting.
    */
  def compactState(
      spark: SparkSession,
      stateDir: String,
      tag: String,
      maxTierRows: Long = Long.MaxValue): Unit =
    Seq(s"$stateDir/sets", s"$stateDir/prefixes").foreach { root =>
      if (Manifest.currentVersion(root) > 0 &&
          !Manifest.tagApplied(root, tag)) {
        Manifest.compactTiered(spark, root, s"$tag-compacted", maxTierRows)
        ()
      }
    }

  /** Drain every (doc_id, text) file in `feedDir` (one micro-batch
    * per file, mtime order) and return the final cluster assignment
    * (doc_id, cluster_id, cluster_size) over everything drained —
    * read back from the persisted labels table, so a prior
    * partially-drained run with the same dirs resumes instead of
    * restarting.
    */
  def docFeedToClusters(
      spark: SparkSession,
      feedDir: String,
      checkpointDir: String,
      stateDir: String,
      threshold: Double = 0.9,
      maxCandidateFactor: Option[Double] = None,
      compactStateEvery: Option[Int] = None): DataFrame = {
    // IN-STREAM state maintenance (the q421 MOR-debt knob applied to
    // state LAYOUT): whenever the sets table's member count reaches
    // the knob, fold the per-batch members into one before the next
    // batch lands. Naturally idempotent across redelivery: a
    // compacted table has 1 member < k, so the retry skips. k ≥ 2 —
    // compacting every batch would make ingestion pay a full-state
    // rewrite per batch (the COW price append-only exists to avoid).
    compactStateEvery.foreach(k => require(k >= 2,
      s"docFeedToClusters: compactStateEvery=$k must be >= 2"))
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(spark, batch, stateDir, s"b$batchId", threshold,
          maxCandidateFactor)
        compactStateEvery.foreach { k =>
          val setsRoot = s"$stateDir/sets"
          val v = Manifest.currentVersion(setsRoot)
          // the debt measure under the bucketed layout is members
          // PER TAG GROUP (files a pruned probe opens per bucket),
          // not the total member count — which scales with the
          // bucket count by design
          val maxPerGroup = if (v == 0) 0
            else Manifest.memberPartitions(setsRoot, v)
              .groupBy(_._2).valuesIterator.map(_.size).max
          if (maxPerGroup >= k)
            compactState(spark, stateDir, s"cmp-b$batchId")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val labRoot = s"$stateDir/labels"
    val v = Manifest.currentVersion(labRoot)
    if (v == 0)
      throw new IllegalStateException(
        "docFeedToClusters: the feed drained zero batches")
    Manifest.read(spark, labRoot, v)
  }
}
