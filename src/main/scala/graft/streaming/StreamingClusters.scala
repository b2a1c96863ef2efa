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
  * guard probes the LABELS table pruned to the delta's doc_id buckets
  * (the [[Dedup.incrementalClustersDeltaBy]] label-scan guard made
  * delta-shaped — and, reading no sets members at all, invariant
  * under sets-table maintenance renames, see foldBatch); the verify
  * leg reads base
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
    *
    * `alreadyPresent` (lazy; evaluated only when the name ledger says
    * "not applied") is the CONTENT-based fallback of the redelivery
    * check (r15 advice item 1): sets-table maintenance — compaction,
    * rebucket — renames members, erasing the name tag a crash-window
    * retry checks, so a maintenance pass landing inside the
    * sets-committed/labels-pending window would make the retry append
    * the batch's rows a SECOND time. The caller passes a pruned probe
    * for the batch's own rows; content found → the commit already
    * landed (commits are atomic — partial presence is impossible) →
    * skip.
    */
  private[streaming] def appendBucketedOnce(
      df: DataFrame, root: String, tag: String, keyCols: Seq[String],
      alreadyPresent: => Boolean = false): Unit =
    if (!Manifest.tagApplied(root, tag) && !alreadyPresent) {
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
    // the batch-internal pair source builds eagerly (rep persist +
    // candidate checkpoint inside jaccardPairs); deferred so the
    // non-bootstrap fold can overlap it with the independent stored
    // cross probe on a second driver thread (guide §2.6)
    def innerPairs() = Dedup.jaccardPairs(
        bSets.select(col("id"), col("ts")), threshold)
      .select(col("a_id"), col("b_id"))
    val bootstrap = Manifest.currentVersion(labRoot) == 0
    val changed =
      if (bootstrap) {
        // bootstrap: the first batch clusters from scratch (the batch
        // IS the corpus, so this too is batch-sized)
        Dedup.duplicateClusters(innerPairs(), bIds)
      } else {
        val ownIds = bSets.select(col("id"))
        // DELTA-SHAPED disjointness guard (r13 verdict item 5 /
        // advice item 2, re-based in r16 on the LABELS table — r15
        // advice item 1): every id drained by an earlier batch has a
        // labels row (the labels commit IS the batch ledger — commit
        // order below), and THIS tag's own crash-window rows live
        // only in sets/prefixes, never labels. So probing the labels
        // table pruned to the delta's doc_id buckets proves
        // disjointness at delta-bucket cost WITHOUT any own-member
        // exclusion — the previous probe excluded this tag's sets
        // members BY NAME, which sets-table maintenance (compaction,
        // rebucket) silently breaks: both rename members, so a
        // rebucket landing inside the sets-committed/labels-pending
        // crash window turned the retry's own rows into a permanent
        // false 'duplicate arrivals' wedge. The labels probe is
        // invariant under sets-table layout changes by construction.
        val lvGuard = Manifest.currentVersion(labRoot)
        require(LabelStore.byDocIds(spark, labRoot, lvGuard, ownIds,
              IndexBuckets)
            .select(col("doc_id").as("id"))
            .join(broadcast(ownIds.distinct()), Seq("id"), "left_semi")
            .isEmpty,
          s"StreamingClusters.foldBatch($tag): batch ids overlap ids " +
            "already drained by earlier batches — the feed must carry " +
            "each doc_id once; duplicate arrivals would corrupt the " +
            "label table silently")
        val sv = Manifest.currentVersion(setsRoot)
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
        // corpus-proportional sets read is gone. Built concurrently
        // with the independent batch-internal self-join (§2.6).
        // (cross checkpoints INSIDE its thread so the pruned verify
        // leg also overlaps the inner build — see q484)
        val (cross, inner) = graft.util.Par.both(
          Dedup.crossJaccardPairsStored(spark, bSets, setsRoot,
            sv, threshold, basePref, IndexBuckets,
            maxCandidateFactor = maxCandidateFactor).localCheckpoint(),
          innerPairs())
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
    // the labels ledger LAST. The content probes are the
    // maintenance-renamed crash-window fallback (see
    // appendBucketedOnce): the disjointness guard above proved the
    // batch's ids absent from every EARLIER batch (labels), so own
    // ids found in a stored table here can only be this tag's own
    // already-committed rows under a renamed member — skip, don't
    // duplicate. Each probe is pruned to the batch's own key buckets.
    def ownRowsIn(root: String, keyRows: DataFrame, keyCols: Seq[String],
        idCol: String): Boolean = {
      val v = Manifest.currentVersion(root)
      val own = bSets.select(col("id"))
      v > 0 && !BucketedIndex.prunedRead(spark, root, v, keyRows, keyCols,
          IndexBuckets)
        .select(col(idCol).as("id"))
        .join(broadcast(own.distinct()), Seq("id"), "left_semi").isEmpty
    }
    val bPref = Dedup.jaccardPrefixes(bSets, threshold)
    appendBucketedOnce(bSets, setsRoot, tag, Seq("id"),
      alreadyPresent =
        ownRowsIn(setsRoot, bSets.select(col("id")), Seq("id"), "id"))
    appendBucketedOnce(bPref, prefRoot, tag, Seq("t"),
      alreadyPresent =
        ownRowsIn(prefRoot, bPref.select(col("t")), Seq("t"), "id"))
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

  /** DELETE a batch of documents from the drained state — the
    * retraction leg of the lifecycle (r16): a 100 TB corpus does not
    * only grow; takedowns and PII erasure must REMOVE documents from
    * the standing clustering, physically and at delta cost. The fold
    * is component-bounded:
    *
    *  1. the victims' label rows resolve through the pruned id-keyed
    *     leg (their doc_id buckets only);
    *  2. the touched clusters' FULL membership resolves through the
    *     cluster-id secondary index (two pruned hops — [[LabelStore]]);
    *  3. the REMAINING members of those clusters re-cluster FROM
    *     SCRATCH within the components (their stored sets read pruned
    *     to their id buckets; [[Dedup.jaccardPairs]] over
    *     touched-component rows only): removing a doc can SPLIT a
    *     cluster, and pair existence depends only on the two docs'
    *     sets, so no pair outside the touched components can change —
    *     the recompute is exactly the from-scratch assignment
    *     restricted to the touched components. The post-delete state
    *     therefore equals a from-scratch drain of (corpus − victims),
    *     which is why q488 hash-pins this operator against the q67
    *     recursive-CTE oracle on the remaining documents;
    *  4. the victims' sets and prefix rows COW-DELETE from their key
    *     buckets ([[BucketedIndex.deleteBucketed]] — prefix keys
    *     derive from the victims' STORED sets, read before the sets
    *     delete), so a later batch re-adding a deleted doc_id is a
    *     clean arrival: the disjointness guard, the prefix probe, and
    *     the verify leg see no trace of the victim.
    *
    * Commit order and crash windows: prefixes delete first (their
    * keys need the victims' sets rows — a retry after the sets delete
    * finds no victim sets, hence no prefix keys, hence correctly
    * re-deletes nothing), then sets, then the secondary index gains
    * the NEW assignment's entries (ADD-only: deleting dissolved
    * cluster ids from the index BEFORE the labels commit would break
    * the index-ahead crash contract — a retry probing the old ids
    * would miss the still-unrelabeled rows; dissolved-id entries stay
    * as the documented bounded garbage, exactly like merge-away
    * staleness), then the labels advance in ONE atomic
    * delete+upsert ([[BucketedIndex.upsertDeleteBucketed]] — no
    * window where a remaining member references a deleted cluster
    * id), then the per-batch ref lands (the same durable ledger as
    * [[foldBatch]]). A batch whose victims are ALL already absent
    * from the labels is treated as an applied delete and heals the
    * ledger (the post-commit/pre-ref crash window is
    * indistinguishable from it; commits are atomic, so partial
    * application is impossible) — a PARTIAL overlap fails loudly
    * (a mis-routed feed, or a delete racing an unfinished fold's
    * crash window; retry the fold first). Serialize deletes with
    * folds in one drain, like every state mutation here.
    *
    * Maintenance interplay: the COW deletes require the sets/prefix
    * tables FULLY at the drain's modulus — a table rebucketed to a
    * foreign modulus refuses loudly with the remedy (rebucket back
    * to [[IndexBuckets]]), the conservative direction.
    */
  def deleteDocs(
      spark: SparkSession,
      victims0: DataFrame,
      stateDir: String,
      tag: String,
      threshold: Double): Unit = {
    val setsRoot = s"$stateDir/sets"
    val prefRoot = s"$stateDir/prefixes"
    val labRoot = s"$stateDir/labels"
    val clxRoot = s"$stateDir/labels_clx"
    checkThreshold(stateDir, threshold)
    if (labelsApplied(labRoot, tag)) return
    val lv = Manifest.currentVersion(labRoot)
    require(lv > 0,
      s"StreamingClusters.deleteDocs($tag): $stateDir has no drained " +
        "labels — nothing to delete from")
    // batch-sized; feeds every guard, prune and anti-join below
    val victims = victims0
      .select(col(victims0.columns.head).as("doc_id")).distinct()
      .localCheckpoint()
    val nV = victims.count()
    if (nV == 0) { Manifest.setRef(labRoot, tag, lv); return }
    val vLabs = LabelStore.byDocIds(spark, labRoot, lv, victims,
        IndexBuckets)
      .join(broadcast(victims), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val nL = vLabs.count()
    if (nL == 0) {
      // fully-applied delete whose ref write crashed (or a redelivery
      // after maintenance renamed the labels members): heal and exit
      Manifest.setRef(labRoot, tag, lv)
      return
    }
    require(nL == nV,
      s"StreamingClusters.deleteDocs($tag): ${nV - nL} of $nV victim " +
        "doc_ids are not in the drained state — a partial overlap is " +
        "never a crash window (commits are atomic); check the feed, or " +
        "retry an unfinished fold before deleting its docs")
    // victims' stored sets (pruned to their id buckets) — the prefix
    // delete's keys; empty on a post-sets-delete crash retry
    val sv = Manifest.currentVersion(setsRoot)
    val vIds = victims.select(col("doc_id").as("id"))
    val vSets = BucketedIndex.prunedRead(spark, setsRoot, sv, vIds,
        Seq("id"), IndexBuckets)
      .join(broadcast(vIds), Seq("id"), "left_semi")
      .localCheckpoint()
    // the touched components' remaining members and their sets —
    // touched-bounded throughout
    LabelStore.ensureSecondary(spark, labRoot, clxRoot, IndexBuckets)
    val cxv = Manifest.currentVersion(clxRoot)
    val cids = vLabs.select(col("cluster_id")).distinct().localCheckpoint()
    val remaining = LabelStore.byClusterIds(spark, labRoot, lv, clxRoot,
        cxv, cids, IndexBuckets)
      .join(broadcast(cids), Seq("cluster_id"), "left_semi")
      .select(col("doc_id"))
      .join(broadcast(victims), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val remIds = remaining.select(col("doc_id").as("id"))
    val remSets = BucketedIndex.prunedRead(spark, setsRoot, sv, remIds,
        Seq("id"), IndexBuckets)
      .join(broadcast(remIds), Seq("id"), "left_semi")
      .localCheckpoint()
    // from-scratch re-clustering WITHIN the touched components (see
    // class doc for why no outside pair can change)
    val newRows = Dedup.duplicateClusters(
        Dedup.jaccardPairs(remSets.select(col("id"), col("ts")), threshold)
          .select("a_id", "b_id"),
        remaining)
      .localCheckpoint()
    // commit order per the scaladoc: prefixes, sets, clx (add-only),
    // labels (atomic delete+upsert), ref
    // each COW delete skips when its tag already owns head members (a
    // crash-window redelivery — re-adopting the same member names
    // would collide); a retry after maintenance RENAMED them re-runs
    // harmlessly (the victims' rows are gone, so the rewrite adopts
    // fresh names or nothing)
    val vPref = Dedup.jaccardPrefixes(vSets, threshold)
      .select(col("t"), col("id"))
    if (!Manifest.tagApplied(prefRoot, s"$tag-dpref")) {
      BucketedIndex.deleteBucketed(vPref, prefRoot, s"$tag-dpref",
        Seq("t"), IndexBuckets, Seq("t", "id"))
      ()
    }
    if (!Manifest.tagApplied(setsRoot, s"$tag-dsets")) {
      BucketedIndex.deleteBucketed(vIds, setsRoot, s"$tag-dsets",
        Seq("id"), IndexBuckets, Seq("id"))
      ()
    }
    if (!Manifest.tagApplied(clxRoot, tag)) {
      // ADD-only at the ENTRY-ROW grain: the new assignment's entries
      // UNION the touched clusters' existing ones. A cluster-grain
      // replace would be wrong here — unlike a fold (where clusters
      // only merge, so the new entry set is a superset), a deletion
      // SHRINKS and SPLITS clusters: replacing cluster c's entry with
      // its post-split bucket set while the labels still hold
      // pre-split rows (the clx-committed/labels-pending crash
      // window) would make the retry's byClusterIds(c) miss the
      // split-off members entirely. Old entries go stale only after
      // the labels land — then they are the documented harmless
      // garbage.
      val oldEntries = BucketedIndex.prunedRead(spark, clxRoot, cxv,
          cids, Seq("cluster_id"), IndexBuckets)
        .join(broadcast(cids), Seq("cluster_id"), "left_semi")
        .select(col("cluster_id"), col("kb"))
      BucketedIndex.upsertBucketed(
        LabelStore.clusterEntries(newRows, IndexBuckets)
          .unionByName(oldEntries).distinct(),
        clxRoot, tag, Seq("cluster_id"), IndexBuckets)
      ()
    }
    BucketedIndex.upsertDeleteBucketed(newRows, victims, labRoot, tag,
      Seq("doc_id"), IndexBuckets)
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

  /** [[docFeedToClusters]]'s CDC twin (r16): the feed carries
    * `(op, doc_id, text)` rows — `I` documents JOIN the corpus,
    * `D` documents LEAVE it (text ignorable for deletes) — so one
    * drain maintains the clustering of a corpus that both grows and
    * retracts. Within a micro-batch the inserts fold FIRST
    * ([[foldBatch]], tag `b<id>`), then the deletes
    * ([[deleteDocs]], tag `b<id>-del`) — a deterministic order with
    * a durable ledger PER HALF, so a crash between the two replays
    * exactly the unapplied half and the drained state is
    * bit-identical to an uninterrupted run. Both halves are
    * from-scratch-equal by construction (the contraction argument
    * for folds, the component-bounded recompute for deletes), so the
    * final assignment equals one from-scratch clustering of the
    * SURVIVING documents — which is why q490 hash-pins a streaming
    * add/delete drain against the q67 recursive-CTE oracle
    * restricted to the survivors.
    */
  def docFeedToClustersCdc(
      spark: SparkSession,
      feedDir: String,
      checkpointDir: String,
      stateDir: String,
      threshold: Double = 0.9,
      maxCandidateFactor: Option[Double] = None,
      compactStateEvery: Option[Int] = None): DataFrame = {
    compactStateEvery.foreach(k => require(k >= 2,
      s"docFeedToClustersCdc: compactStateEvery=$k must be >= 2"))
    val schema = spark.read.parquet(feedDir).schema
    require(Seq("op", "doc_id", "text").forall(schema.fieldNames.contains),
      s"docFeedToClustersCdc: the feed must carry (op, doc_id, text), " +
        s"got (${schema.fieldNames.mkString(", ")})")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch splits into two frames — persist, or the split
        // re-reads the file per action (the foreachBatch recompute
        // rule)
        val b = batch.persist()
        try {
          val bad = b.filter(!col("op").isin("I", "D"))
          require(bad.isEmpty,
            s"docFeedToClustersCdc(b$batchId): ops must be I or D")
          val adds = b.filter(col("op") === "I")
            .select(col("doc_id"), col("text"))
          val dels = b.filter(col("op") === "D").select(col("doc_id"))
          if (!adds.isEmpty)
            foldBatch(spark, adds, stateDir, s"b$batchId", threshold,
              maxCandidateFactor)
          if (!dels.isEmpty)
            deleteDocs(spark, dels, stateDir, s"b$batchId-del", threshold)
        } finally { b.unpersist(); () }
        compactStateEvery.foreach { k =>
          val setsRoot = s"$stateDir/sets"
          val v = Manifest.currentVersion(setsRoot)
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
        "docFeedToClustersCdc: the feed drained zero batches")
    Manifest.read(spark, labRoot, v)
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
