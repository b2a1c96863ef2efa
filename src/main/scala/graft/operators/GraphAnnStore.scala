package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED graph-ANN index (r13 verdict item 3) — the storage leg
  * of the q437/q438/q472 graph family, completing the stored-index
  * discipline the other fingerprint families already follow (AllPairs
  * prefixes q415, LSH band-buckets q480, Hamming chunks q481): the
  * k-NN graph, its coarse quantizer, and the per-list entry nodes
  * COMMIT as [[Manifest]] tables once; a serving probe walks the
  * graph FROM STORAGE (no rebuild, no retrain, no corpus pass beyond
  * scoring); daily arrivals fold through the stored table at
  * touched-bucket COW cost.
  *
  * Layout under `root`:
  *   - `<root>/edges` — (src, dst, rank), KEY-BUCKETED on `src`
  *     ([[BucketedIndex.commitBucketed]]). Each beam-search hop reads
  *     ONLY its frontier's bucket members
  *     ([[BucketedIndex.prunedRead]]) — serving IO follows the WALK
  *     (beam · hops · degree nodes), never the graph size; the delta
  *     fold rewrites only the buckets its changed sources hash into
  *     ([[BucketedIndex.upsertBucketed]] — untouched members
  *     verbatim).
  *   - `<root>/centroids` — (list_id, centroid, entry_id): the
  *     nlist-row coarse quantizer (bounded; collected at [[load]])
  *     PLUS each list's entry node — the min-id member at build time,
  *     coalesced to the global min for build-empty lists so every
  *     entry is total. Storing the quantizer is what makes the probe
  *     rebuild-free: build, fold, and search must share ONE quantizer
  *     (the q438 lesson), and a serving retrain would both cost a
  *     corpus pass and silently diverge if the corpus grew since the
  *     build. Folds deliberately do NOT move entries: the build's
  *     entry stays a valid graph node, and a stable entry keeps the
  *     walk deterministic across index versions.
  *
  * The handle states (k, nlist, nprobe, numBuckets) at reconstruction
  * — the [[Dedup.LshBucketIndex]] contract applied to the graph
  * family — and [[load]] sanity-probes them against the stored
  * tables: the centroid count must equal `nlist` exactly, and one
  * member's ranks must fit `k` (a bounded single-member probe, the
  * crossHammingPairs64 discipline — a sanity screen, not a proof).
  */
object GraphAnnStore {

  /** Default bucket count of the edges layout. */
  val EdgeBuckets = 16

  /** A reconstructed stored-index handle: the pinned edges snapshot,
    * the collected quantizer + entry nodes, and the parameters the
    * caller stated (which [[load]] screened against the storage).
    * `version` pins the edges snapshot the serving walk reads — a
    * concurrent fold advances the table without moving a live handle.
    */
  final case class StoredGraphAnn(
      edges: DataFrame,
      cents: Array[Array[Float]],
      entries: Seq[(Long, Long)], // (ivf_list, entry node id)
      tombs: DataFrame, // (id) — pinned tombstone snapshot, often empty
      k: Int,
      nlist: Int,
      nprobe: Int,
      numBuckets: Int,
      root: String,
      version: Int)

  /** Build the k-NN graph of `emb` under a freshly trained quantizer
    * and COMMIT the whole index under `root` (edges bucketed on src;
    * centroids + entry nodes as one bounded table). One graph build,
    * two commits; returns nothing — reconstruct with [[load]].
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      numBuckets: Int = EdgeBuckets): Unit = {
    val spark = emb.sparkSession
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, nlist)
    require(cents.nonEmpty, "GraphAnnStore.build: empty corpus")
    require(nprobe >= 1 && nprobe <= cents.length,
      s"GraphAnnStore.build: nprobe=$nprobe out of range [1, ${cents.length}]")
    val graph = GraphAnn.knnGraphWithCentroids(
      emb, idCol, vecCol, k, cents, nprobe)
    BucketedIndex.commitBucketed(graph, s"$root/edges", "base",
      Seq("src"), numBuckets)
    // per-list entry = the min-id member (the q438 per-query entry
    // rule, committed so serving never re-scans the corpus for it);
    // a build-empty list falls back to the global min id — total,
    // deterministic, and still a graph node
    val listMin = Similarity.ivfIndex(emb, vecCol, cents)
      .groupBy(col("ivf_list")).agg(min(col(idCol)).as("mn"))
      .select(col("ivf_list").cast("long"), col("mn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fallback = listMin.values.min
    import spark.implicits._
    val centRows = cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toSeq, listMin.getOrElse(i.toLong, fallback))
    }.toSeq
    Manifest.commitAdd(centRows.toDF("list_id", "centroid", "entry_id"),
      s"$root/centroids", "base")
    ()
  }

  /** Reconstruct the handle from storage, screening the stated
    * parameters against the stored tables (see class doc). The edges
    * frame is the pinned current-version snapshot.
    */
  def load(
      spark: SparkSession,
      root: String,
      k: Int,
      nlist: Int,
      nprobe: Int,
      numBuckets: Int = EdgeBuckets): StoredGraphAnn = {
    val centRoot = s"$root/centroids"
    val edgeRoot = s"$root/edges"
    val cv = StoredIndex.liveVersion(centRoot, "GraphAnnStore.load",
      "build()")
    val centRows = Manifest.read(spark, centRoot, cv)
      .orderBy(col("list_id")).collect()
    require(centRows.length == nlist,
      s"GraphAnnStore.load: stored quantizer has ${centRows.length} " +
        s"centroids but the handle states nlist=$nlist — the index was " +
        "built under different parameters; state the build's values")
    require(centRows.map(_.getLong(0)).toSeq == (0L until nlist.toLong),
      "GraphAnnStore.load: centroid list_ids must be exactly 0..nlist-1")
    val cents = centRows.map(_.getSeq[Float](1).toArray)
    require(nprobe >= 1 && nprobe <= nlist,
      s"GraphAnnStore.load: nprobe=$nprobe out of range [1, $nlist]")
    val entries = centRows.map(r => (r.getLong(0), r.getLong(2))).toSeq
    val ev = StoredIndex.liveVersion(edgeRoot, "GraphAnnStore.load",
      "build()")
    // bounded reconstruction sanity probe: ONE member's ranks must
    // fit the stated k (bucket members are non-empty by construction)
    val mm = StoredIndex.sampleMember(spark, edgeRoot, ev)
      .agg(max(col("rank")).as("mx"), min(col("rank")).as("mn")).collect()(0)
    require(mm.getLong(0) <= k && mm.getLong(1) >= 1L,
      s"GraphAnnStore.load: stored ranks [${mm.getLong(1)}, ${mm.getLong(0)}] " +
        s"do not fit the stated k=$k — the index was built under " +
        "different parameters; state the build's values")
    val tsRoot = s"$root/tombstones"
    val tv = Manifest.currentVersion(tsRoot)
    // an EXCISED table's current version has zero members (the clear
    // is a COW delete of every row) — Manifest.read refuses those, so
    // the empty-tombstone fallback covers both "never deleted" and
    // "excised clean"
    val tombs =
      if (tv > 0 && Manifest.members(tsRoot, tv).nonEmpty)
        Manifest.read(spark, tsRoot, tv)
      else Manifest.read(spark, edgeRoot, ev)
        .select(org.apache.spark.sql.functions.col("src").as("id")).limit(0)
    StoredGraphAnn(Manifest.read(spark, edgeRoot, ev), cents, entries,
      tombs, k, nlist, nprobe, numBuckets, root, ev)
  }

  /** Fold a batch of NEW vectors through the STORED graph — the q472
    * delta fold writing through storage: the changed rows (affected
    * base sources' re-ranked lists + the delta sources' own lists,
    * computed under the STORED quantizer against the STORED edges —
    * [[GraphAnn.knnGraphDeltaChanged]], so the in-memory fold and
    * this one share a single definition) COW-upsert into the edges
    * table at touched-bucket IO; untouched sources' members never
    * rewrite. The folded table equals [[GraphAnn.knnGraphDelta]]'s
    * in-memory output row for row (GraphAnnSpec pins it), which
    * itself equals a frozen-quantizer rebuild of base ∪ delta — and
    * here the frozen quantizer IS the stored one, no retrain anywhere.
    *
    * Preconditions (the knnGraphDelta contract): `baseEmb` is exactly
    * the corpus the stored graph covers, `deltaEmb` ids are new —
    * the latter ENFORCED here at pruned-scan cost (r14 verdict item
    * 5: every node owns a src-keyed edge list, so the src-bucketed
    * edges table doubles as the id-membership ledger —
    * [[StoredIndex.requireNewIds]] probes the delta ids' src
    * buckets at the CURRENT head). `nameTag` is the redelivery
    * ledger ([[Manifest.tagApplied]] on the edges table — an applied
    * tag returns without computing, so a redelivery never reaches
    * the guard). Returns the edges version after the fold; reload
    * the handle to serve from it.
    */
  def foldDelta(
      idx: StoredGraphAnn,
      baseEmb: DataFrame,
      deltaEmb: DataFrame,
      idCol: String,
      vecCol: String,
      nameTag: String): Int = {
    val edgeRoot = s"${idx.root}/edges"
    if (Manifest.tagApplied(edgeRoot, nameTag))
      Manifest.currentVersion(edgeRoot)
    else {
      // the handle must pin the CURRENT head (r15 advice item 4):
      // unlike PqStore/SignLshStore, whose append content is
      // delta-only and handle-independent, this fold's merged rows
      // are computed from the handle's pinned idx.edges — two
      // sequential folds reusing one loaded handle would pass the
      // id-disjointness guard, yet the second COW would overwrite
      // the first fold's merged top-k rows for shared touched base
      // sources. Cheap and loud, mirroring the r14 'sequential
      // appends must see each other' fix.
      val headV = Manifest.currentVersion(edgeRoot)
      require(idx.version == headV,
        s"GraphAnnStore.foldDelta($nameTag): the handle pins edges " +
          s"v${idx.version} but the table is at v$headV — the merge " +
          "would be computed from a stale snapshot and overwrite the " +
          "intervening fold's rows for shared touched sources; reload " +
          "the handle and re-fold")
      StoredIndex.requireNewIds(deltaEmb.sparkSession, edgeRoot,
        deltaEmb.select(col(idCol)), idx.numBuckets,
        s"GraphAnnStore.foldDelta($nameTag)", keyCol = "src")
      val (changed, _) = GraphAnn.knnGraphDeltaChanged(idx.edges,
        baseEmb, deltaEmb, idCol, vecCol, idx.k, idx.cents, idx.nprobe)
      BucketedIndex.upsertBucketed(changed, edgeRoot, nameTag,
        Seq("src"), idx.numBuckets)
    }
  }

  /** TOMBSTONE a batch of ids — the deletion leg of the stored index
    * (r16): an ANN graph cannot delete a node at delta cost, because
    * the edges POINTING AT it live in arbitrary src buckets (finding
    * them is inherently a full-index scan). The production answer is
    * the tombstone ledger: per-delete cost is ONE id-bucketed append
    * (`<root>/tombstones`), serving keeps walking THROUGH tombstoned
    * nodes (removing routing nodes would degrade every traversal)
    * but never SURFACES them ([[GraphAnn.beamSearchEdges]]'s
    * `exclude` filter), and [[excise]] amortizes the physical removal
    * over many deletes. Victims must be live graph nodes: absent ids
    * refuse (probed at the edges table's current head, pruned to the
    * victims' src buckets — the id-ledger role of the src bucketing),
    * and an already-tombstoned id refuses (a delete feed must carry
    * each id once between excisions). One table, one commit — no
    * crash window; `nameTag` is the redelivery ledger. Returns the
    * tombstones version. Reload the handle to serve the new snapshot.
    */
  def deleteDelta(
      idx: StoredGraphAnn,
      victimIds: DataFrame,
      nameTag: String): Int = {
    val spark = victimIds.sparkSession
    val tsRoot = s"${idx.root}/tombstones"
    val edgeRoot = s"${idx.root}/edges"
    if (Manifest.tagApplied(tsRoot, nameTag)) Manifest.currentVersion(tsRoot)
    else {
      val vict = victimIds
        .select(col(victimIds.columns.head).as("id")).distinct()
        .localCheckpoint()
      val nV = vict.count()
      val ev = Manifest.currentVersion(edgeRoot)
      val present = BucketedIndex.prunedRead(spark, edgeRoot, ev,
          vict.select(col("id").as("src")), Seq("src"), idx.numBuckets)
        .select(col("src").as("id")).distinct()
        .join(broadcast(vict), Seq("id"), "left_semi").count()
      require(present == nV,
        s"GraphAnnStore.deleteDelta($nameTag): ${nV - present} of $nV " +
          "victim ids have no edge list in the stored graph — they were " +
          "never added, were already excised, or the feed is mis-routed")
      val tv = Manifest.currentVersion(tsRoot)
      if (tv > 0 && Manifest.members(tsRoot, tv).nonEmpty)
        require(BucketedIndex.prunedRead(spark, tsRoot, tv, vict,
              Seq("id"), idx.numBuckets)
            .join(broadcast(vict), Seq("id"), "left_semi").isEmpty,
          s"GraphAnnStore.deleteDelta($nameTag): victim ids are already " +
            "tombstoned — the delete feed must carry each id once " +
            "between excisions")
      StoredIndex.appendOnce(vict, tsRoot, nameTag, Seq("id"),
        idx.numBuckets)
    }
  }

  /** EXCISE the tombstoned nodes physically — the amortized
    * maintenance call of the tombstone design: ONE narrow full-index
    * scan finds the affected sources (every src holding an edge to a
    * tombstoned dst — the cost that cannot be delta-shaped, paid once
    * per excision instead of per delete), their lists RECOMPUTE from
    * scratch against the remaining corpus under the STORED quantizer
    * ([[GraphAnn.knnListsFor]] — one definition with the build), and
    * the edges table advances in ONE atomic delete+upsert: victims'
    * own src rows leave, affected sources' lists are replaced,
    * untouched members survive verbatim. The excised table equals a
    * frozen-quantizer rebuild over the remaining corpus ROW FOR ROW
    * (GraphAnnSpec pins it): an unaffected source's top-k cannot
    * contain a victim (it would be affected), and dropping
    * never-top-k candidates changes nothing.
    *
    * Entry repair precedes the edge rewrite: a list whose stored
    * entry node is tombstoned gets the min remaining member of that
    * list (global-min fallback), committed FIRST — the new entry is a
    * valid node in the old graph too, so every crash window serves.
    * Tombstones clear LAST (they are excise's ledger for the retry
    * windows); after the clear, excised ids are clean re-arrivals for
    * [[foldDelta]]. `emb` is the corpus table — it may still carry
    * the victims (they are anti-joined here) or already lack them.
    * Returns the edges version.
    */
  def excise(
      idx: StoredGraphAnn,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nameTag: String): Int = {
    val spark = emb.sparkSession
    val edgeRoot = s"${idx.root}/edges"
    val tsRoot = s"${idx.root}/tombstones"
    val centRoot = s"${idx.root}/centroids"
    val tv = Manifest.currentVersion(tsRoot)
    if (tv == 0 || Manifest.members(tsRoot, tv).isEmpty)
      return Manifest.currentVersion(edgeRoot)
    val tombs = Manifest.read(spark, tsRoot, tv).localCheckpoint()
    if (tombs.isEmpty) return Manifest.currentVersion(edgeRoot)
    val remaining = emb
      .join(broadcast(tombs.select(col("id").as(idCol))), Seq(idCol),
        "left_anti")
    // 1. entry repair — idempotent by DETECTION against the CURRENT
    //    stored table (not the handle: a crash-window retry must see
    //    the original attempt's repair and skip): a list whose stored
    //    entry is tombstoned gets the min remaining member (global-min
    //    fallback). One bounded isin probe (entry ids are ≤ nlist).
    val cv = Manifest.currentVersion(centRoot)
    val centRows0 = Manifest.read(spark, centRoot, cv)
      .orderBy(col("list_id")).collect()
    val entryIds = centRows0.map(_.getLong(2)).distinct.toSeq
    val deadEntryIds = tombs.filter(col("id").isin(entryIds: _*))
      .collect().map(_.getLong(0)).toSet
    val deadLists = centRows0.collect {
      case r if deadEntryIds.contains(r.getLong(2)) => r.getLong(0)
    }.toSet
    if (deadLists.nonEmpty) {
      val listMin = Similarity.ivfIndex(remaining, vecCol, idx.cents)
        .filter(col("ivf_list").isin(deadLists.toSeq: _*))
        .groupBy(col("ivf_list")).agg(min(col(idCol)).as("mn"))
        .select(col("ivf_list").cast("long"), col("mn"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      lazy val fallback = {
        val r = remaining.agg(min(col(idCol))).collect()(0)
        require(!r.isNullAt(0),
          "GraphAnnStore.excise: the delete set empties the corpus — " +
            "drop the index and rebuild instead")
        r.getLong(0)
      }
      import spark.implicits._
      val centRows = centRows0.map { r =>
        val list = r.getLong(0)
        val entry =
          if (deadLists.contains(list)) listMin.getOrElse(list, fallback)
          else r.getLong(2)
        (list, r.getSeq[Float](1), entry)
      }.toSeq
      Manifest.recoverTag(centRoot, s"$nameTag-entries")
      Manifest.commitReplace(
        centRows.toDF("list_id", "centroid", "entry_id"), centRoot,
        Manifest.members(centRoot, cv), s"$nameTag-entries")
      ()
    }
    // 2. the edge rewrite (its tag is the recompute's ledger)
    if (!Manifest.tagApplied(edgeRoot, nameTag)) {
      val headV = Manifest.currentVersion(edgeRoot)
      require(idx.version == headV,
        s"GraphAnnStore.excise($nameTag): the handle pins edges " +
          s"v${idx.version} but the table is at v$headV — reload the " +
          "handle and re-excise")
      val vict = tombs.select(col("id").as("src"))
      // the one full-index scan: narrow (src, dst), broadcast probe
      val affected = idx.edges
        .join(broadcast(tombs.select(col("id").as("dst"))), Seq("dst"),
          "left_semi")
        .select(col("src")).distinct()
        .join(broadcast(vict), Seq("src"), "left_anti")
        .localCheckpoint()
      val newLists = GraphAnn.knnListsFor(
        remaining.join(affected.select(col("src").as(idCol)), Seq(idCol),
          "left_semi"),
        remaining, idCol, vecCol, idx.k, idx.cents, idx.nprobe)
      BucketedIndex.upsertDeleteBucketed(newLists, vict, edgeRoot,
        nameTag, Seq("src"), idx.numBuckets)
      ()
    }
    // 3. clear the tombstone ledger LAST (idempotent COW delete)
    BucketedIndex.deleteBucketed(tombs, tsRoot, s"$nameTag-clear",
      Seq("id"), idx.numBuckets, Seq("id"))
    Manifest.currentVersion(edgeRoot)
  }

  /** Greedy beam search served ENTIRELY from the stored index: the
    * quantizer and entry nodes come from the handle (no retrain, no
    * corpus aggregate), and each hop's edge read opens only the
    * frontier's bucket members — per-hop IO is the walk's, never the
    * graph's. `emb` supplies the vectors scoring joins against (the
    * corpus table itself, not index state). Same walk core as the
    * in-memory [[GraphAnn.beamSearchWithCentroids]]
    * ([[GraphAnn.beamSearchEdges]]), so the two cannot diverge.
    * TOMBSTONED ids (the handle's pinned snapshot) route but never
    * surface — see [[deleteDelta]].
    */
  def beamSearchStored(
      spark: SparkSession,
      idx: StoredGraphAnn,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      beam: Int,
      hops: Int,
      kOut: Int): DataFrame = {
    import spark.implicits._
    val entryDf = idx.entries.toDF("ivf_list", "node")
    GraphAnn.beamSearchEdges(
      frontier => BucketedIndex.prunedRead(spark, s"${idx.root}/edges",
        idx.version, frontier.select(col("node").as("src")), Seq("src"),
        idx.numBuckets),
      emb, idCol, vecCol, queryIds, beam, hops, kOut, idx.cents,
      listEntries = Some(entryDf), exclude = Some(idx.tombs))
  }
}
