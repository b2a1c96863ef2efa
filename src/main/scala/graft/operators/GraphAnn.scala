package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN — the navigable-neighbor-graph family (NSW/HNSW,
  * Malkov & Yashunin 2016) re-expressed as BATCH dataflow: an
  * offline k-NN GRAPH over the corpus, then greedy BEAM SEARCH that
  * walks it toward each query. The trade vs IVF-PQ (the repo's other
  * scale path): graph search touches O(beam · hops · degree)
  * candidates per query — independent of list sizes — at the cost of
  * an offline graph build; it is the serving shape when queries are
  * many and latency-bound.
  *
  * Both stages are deterministic end to end (the oracle discipline):
  * the graph build scores exact cosine over IVF-restricted
  * candidates with (sim desc, id) tie-breaks; search expands from a
  * per-query entry node (the min-id member of the query's nearest
  * coarse list) with the same ordering; hop count is
  * a fixed bound (a data-dependent convergence loop would be
  * partition-order-sensitive through checkpoint timing — fixed
  * rounds are the q129/q131 iterative discipline).
  *
  * Scale notes:
  *  - build candidates are the IVF probe join (n·nprobe/nlist of the
  *    pair space, never n²), shuffling (id, list) keys + vectors
  *    once; per-source top-k is a key-partitioned window;
  *  - search keeps the QUERY side broadcast (queries are few — the
  *    serving asymmetry) and the graph sharded by src; each hop is
  *    one frontier⋈graph equi-join + one per-query window over
  *    ≤ beam·degree rows; visited-set dedup is exact (groupBy max);
  *  - approximate by construction (IVF candidate misses + greedy
  *    walk) → rows-only driver gates; GraphAnnSpec pins determinism
  *    and recall floors vs exact cosine.
  */
object GraphAnn {

  /** Directed k-NN graph: for every vector, its `k` most-cosine-
    * similar neighbors among IVF-candidate peers (same probed
    * lists). Output: (src, dst, rank) — rank 1 = nearest.
    */
  def knnGraph(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, nlist)
    require(cents.nonEmpty, "knnGraph: no centroids (empty corpus?)")
    knnGraphWithCentroids(emb, idCol, vecCol, k, cents, nprobe)
  }

  /** [[knnGraph]] under a CALLER-SUPPLIED coarse quantizer — the
    * build core, split out so incremental maintenance (and its spec)
    * can rebuild under the BASE corpus's frozen centroids.
    */
  def knnGraphWithCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: Array[Array[Float]],
      nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= cents.length,
      s"knnGraph: nprobe=$nprobe out of range [1, ${cents.length}]")
    // EVERY vector is a source (the offline-build shape, unlike
    // ivfPqTopK's few-query serving)
    knnListsFor(emb, emb, idCol, vecCol, k, cents, nprobe)
  }

  /** The from-scratch top-`k` lists of a SUBSET of sources against a
    * caller-supplied member corpus, under a caller-supplied quantizer
    * — the build rule factored out so EXCISION
    * ([[GraphAnnStore.excise]] recomputing only the affected sources
    * against the post-delete corpus) shares one definition with the
    * full build: a source's rows here equal its
    * [[knnGraphWithCentroids]] rows over the same member corpus, by
    * construction. No broadcast anywhere — the probe fan-out and the
    * candidate join are plain shuffled equi-joins.
    */
  private[operators] def knnListsFor(
      srcEmb: DataFrame,
      memberEmb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: Array[Array[Float]],
      nprobe: Int): DataFrame = {
    val indexed = Similarity.ivfIndex(memberEmb, vecCol, cents)
      .select(col(idCol).as("dst"), col("ivf_list"),
        col(vecCol).as("dv"))
    val probes = ivfProbes(srcEmb, idCol, vecCol, cents, nprobe)
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst"))
    probes.join(indexed, Seq("ivf_list"))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", Vec.cosine(col("sv"), col("dv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("rank"))
  }

  /** (src, sv, ivf_list) — each vector fanned to its `nprobe` best
    * coarse lists (one narrow codegen projection + bounded explode,
    * the q44 assignment shape).
    */
  private[operators] def ivfProbes(
      emb: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], nprobe: Int): DataFrame =
    emb.select(col(idCol).as("src"), col(vecCol).as("sv"))
      .withColumn("__probe", explode(slice(reverse(array_sort(
        Similarity.centroidScores(col("sv"), cents))), 1, nprobe)))
      .select(col("src"), col("sv"), (-col("__probe.ni")).as("ivf_list"))

  /** Incremental k-NN-graph MAINTENANCE — corpora grow daily, and a
    * from-scratch rebuild re-pairs base×base every day (`q437`'s
    * build is O(n²/nlist·nprobe)). `knnGraphDelta` folds a delta
    * batch in with delta-shaped work only (the q406/q415
    * delta-vs-base discipline applied to the ANN graph):
    *
    *   - the coarse quantizer is the BASE build's (retrained
    *     deterministically from `baseEmb` — identical inputs give
    *     identical centroids, so this IS the base graph's quantizer);
    *   - DELTA sources draw candidates from base+delta members of
    *     their probed lists — the from-scratch rule, delta-sized;
    *   - affected BASE sources merge their STORED top-k edges with
    *     ONLY the delta vectors that landed in their probed lists
    *     and re-take top-k. base×base pairs NEVER re-form: merging a
    *     stored top-k with the delta candidates is EXACT, because
    *     any true top-k element over (base ∪ delta) candidates is
    *     either a delta candidate or already inside the stored top-k
    *     (stored edges are the top-k of the base candidates).
    *   - untouched base sources (no delta vector in any probed list)
    *     keep their rows VERBATIM — an anti-join, no re-rank.
    *
    * Hence the fold equals a frozen-centroid rebuild over
    * base ∪ delta bit for bit (GraphAnnSpec pins the equality), at
    * O(|delta| · list-size) pair work instead of O(|base|²/nlist).
    * Requires base and delta id sets disjoint (delta ids are new
    * arrivals). Stored-edge similarities are recomputed from the
    * vectors (edge-bounded joins — O(n·k) rows, never pairs);
    * [[Vec.cosine]] is deterministic, so recomputed sims equal the
    * build-time sims exactly and the (sim desc, dst) tie order is
    * preserved.
    */
  def knnGraphDelta(
      baseGraph: DataFrame, // (src, dst, rank) from the base build
      baseEmb: DataFrame,
      deltaEmb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = Similarity.kmeansCentroids(baseEmb, idCol, vecCol, nlist)
    require(cents.nonEmpty, "knnGraphDelta: empty base corpus")
    require(nprobe >= 1 && nprobe <= cents.length,
      s"knnGraphDelta: nprobe=$nprobe out of range [1, ${cents.length}]")
    val (changed, affectedSrcs) = knnGraphDeltaChanged(baseGraph,
      baseEmb, deltaEmb, idCol, vecCol, k, cents, nprobe)
    baseGraph
      .join(affectedSrcs, Seq("src"), "left_anti")
      .select(col("src"), col("dst"), col("rank"))
      .unionByName(changed)
  }

  /** The CHANGED rows of [[knnGraphDelta]]'s fold — affected base
    * sources' re-ranked lists plus the delta sources' own lists —
    * along with the affected-source frame, under a CALLER-SUPPLIED
    * quantizer. This is the write set a fold-through-STORAGE needs
    * ([[GraphAnnStore.foldDelta]]'s COW upsert replaces exactly these
    * sources' rows; untouched sources never leave their stored
    * members), split out so the in-memory fold and the stored fold
    * share one definition and cannot diverge.
    */
  private[operators] def knnGraphDeltaChanged(
      baseGraph: DataFrame,
      baseEmb: DataFrame,
      deltaEmb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: Array[Array[Float]],
      nprobe: Int): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst"))
    // delta sources: the full from-scratch rule against base+delta
    // members of the probed lists (delta-sized pair work)
    val allIndexed = Similarity.ivfIndex(
        baseEmb.unionByName(deltaEmb), vecCol, cents)
      .select(col(idCol).as("dst"), col("ivf_list"), col(vecCol).as("dv"))
    val deltaEdges = ivfProbes(deltaEmb, idCol, vecCol, cents, nprobe)
      .join(allIndexed, Seq("ivf_list"))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", Vec.cosine(col("sv"), col("dv")))
      .select(col("src"), col("dst"), col("sim"))
    // base sources: NEW candidates are base-probe × delta-member
    // pairs only (the structural base×base guarantee — the join's
    // dst side derives from deltaEmb alone)
    val newCands = knnGraphDeltaCandidates(baseEmb, deltaEmb, idCol,
      vecCol, cents, nprobe)
    // stored edges, sims recomputed from the vectors (edge-bounded)
    val bv = baseEmb.select(col(idCol), col(vecCol))
    val stored = baseGraph
      .join(bv.select(col(idCol).as("src"), col(vecCol).as("sv")), Seq("src"))
      .join(bv.select(col(idCol).as("dst"), col(vecCol).as("dv")), Seq("dst"))
      .withColumn("sim", Vec.cosine(col("sv"), col("dv")))
      .select(col("src"), col("dst"), col("sim"))
    val affectedSrcs = newCands.select(col("src")).distinct()
    val affected = stored.join(affectedSrcs, Seq("src"), "left_semi")
      .unionByName(newCands.select(col("src"), col("dst"), col("sim")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("rank"))
    val deltaRanked = deltaEdges
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("rank"))
    (affected.unionByName(deltaRanked), affectedSrcs)
  }

  /** The base-side NEW candidate frame of [[knnGraphDelta]]:
    * (src, dst, sim) where src is a base vector, dst a DELTA vector
    * sharing a probed list. Exposed (the ivfPqCandidates pattern) so
    * GraphAnnSpec can pin "base×base never re-forms" structurally —
    * every dst here is a delta id, and the count equals the
    * base-probe ⋈ delta-list join size.
    */
  def knnGraphDeltaCandidates(
      baseEmb: DataFrame,
      deltaEmb: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Float]],
      nprobe: Int): DataFrame = {
    val deltaIndexed = Similarity.ivfIndex(deltaEmb, vecCol, cents)
      .select(col(idCol).as("dst"), col("ivf_list"), col(vecCol).as("dv"))
    ivfProbes(baseEmb, idCol, vecCol, cents, nprobe)
      .join(deltaIndexed, Seq("ivf_list"))
      .withColumn("sim", Vec.cosine(col("sv"), col("dv")))
      .select(col("src"), col("dst"), col("sim"))
  }

  /** Greedy beam search over a [[knnGraph]]: start every query at a
    * PER-QUERY entry node — the min-id member of the query's nearest
    * coarse-centroid list (r12 verdict item 4; the quantizer is
    * retrained deterministically from `emb`, i.e. the build's own) —
    * expand the frontier's out-edges `hops` times keeping the `beam`
    * best-scoring visited nodes per query, return the final
    * top-`kOut`. Scores are exact cosine against the query vector;
    * ties break on id everywhere. A fixed global entry biases recall
    * against queries far from it (every walk pays the full traversal
    * distance and can stall in the entry's neighborhood); entering
    * from the query's own coarse cell starts the walk hops closer —
    * one bounded `ivfProbes` projection + a broadcast join against
    * the nlist-sized list-minimum table, no extra shuffle.
    */
  def beamSearch(
      graph: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame, // single column `query_id`
      beam: Int,
      hops: Int,
      kOut: Int,
      nlist: Int = 16): DataFrame = {
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, nlist)
    require(cents.nonEmpty,
      "beamSearch: empty corpus — no entry node to start the walk from")
    beamSearchWithCentroids(graph, emb, idCol, vecCol, queryIds,
      beam, hops, kOut, cents)
  }

  /** [[beamSearch]] under a CALLER-SUPPLIED coarse quantizer — the
    * serving form (reuse the build's centroids instead of retraining
    * per call; the knnGraphWithCentroids split, applied to search).
    */
  def beamSearchWithCentroids(
      graph: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      beam: Int,
      hops: Int,
      kOut: Int,
      cents: Array[Array[Float]]): DataFrame =
    beamSearchEdges(_ => graph, emb, idCol, vecCol, queryIds, beam,
      hops, kOut, cents)

  /** The walk core under a caller-supplied EDGE SOURCE — `edgesFor`
    * maps each hop's frontier (query_id, node, sim rows) to the edge
    * rows (src, dst, rank) that hop may traverse. The in-memory form
    * passes a constant graph; the STORED form
    * ([[GraphAnnStore.beamSearchStored]]) reads only the frontier's
    * bucket members per hop, so serving IO follows the walk. Any
    * SUPERSET of the frontier's out-edges is correct (extra rows are
    * harmless — the hop equi-joins on the frontier's nodes), which is
    * exactly the bucket-pruning contract.
    *
    * `listEntries` (optional): the per-coarse-list entry node
    * (ivf_list, node) — stored indexes pass their committed entry
    * table so serving pays ZERO corpus passes beyond scoring; when
    * absent, entries compute from `emb` (the min-id member per list,
    * one corpus aggregate).
    *
    * `exclude` (optional): node ids (one column) never to SURFACE as
    * results — the TOMBSTONE filter of a deletion-aware stored index
    * ([[GraphAnnStore.deleteDelta]]): tombstoned nodes still ROUTE
    * (they stay in the beam and expand — removing them from the walk
    * would change every traversal and degrade recall until excision),
    * but the final ranking anti-joins them out, so a deleted id is
    * never returned. With heavy tombstone load fewer than `kOut`
    * survivors may remain in the beam — raise `beam`, or excise.
    */
  private[operators] def beamSearchEdges(
      edgesFor: DataFrame => DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      beam: Int,
      hops: Int,
      kOut: Int,
      cents: Array[Array[Float]],
      listEntries: Option[DataFrame] = None,
      exclude: Option[DataFrame] = None): DataFrame = {
    require(beam >= kOut, s"beamSearch: beam=$beam must be >= kOut=$kOut")
    require(hops >= 1, s"beamSearch: hops=$hops")
    require(cents.nonEmpty,
      "beamSearch: no centroids — an empty quantizer would silently " +
        "return zero rows for every query")
    val vecs = emb.select(col(idCol).as("node"), col(vecCol).as("nv"))
    val queries = emb.join(queryIds, emb(idCol) === queryIds("query_id"))
      .select(col("query_id"), col(vecCol).as("qv"))
      .localCheckpoint() // broadcast side, scored against every visit
    require(!queries.isEmpty, // cheap: the frame just materialized
      "beamSearch: no query vectors — queryIds must exist in emb " +
        "(a silent empty result would read as 'no neighbors')")
    // per-query entry: the min-id member of the query's nearest
    // coarse list. Queries are corpus vectors (the join above), so
    // each query's nearest list holds at least the query itself —
    // never empty. listMin is nlist-sized; broadcast. The probe runs
    // over the already-materialized queries frame — no second
    // corpus-join.
    val listMin = listEntries.getOrElse(
      Similarity.ivfIndex(emb, vecCol, cents)
        .groupBy(col("ivf_list")).agg(min(col(idCol)).as("node")))
    val entries = ivfProbes(queries, "query_id", "qv", cents, nprobe = 1)
      .select(col("src").as("query_id"), col("ivf_list"))
      .join(broadcast(listMin), Seq("ivf_list"))
      .select(col("query_id"), col("node"))
    val wBeam = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("node"))
    def scored(nodes: DataFrame): DataFrame =
      nodes.join(vecs, Seq("node"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("sim", Vec.cosine(col("qv"), col("nv")))
        .select(col("query_id"), col("node"), col("sim"))
    var visited = scored(entries).localCheckpoint()
    var frontier = visited
    for (_ <- 1 to hops) {
      val expanded = frontier
        .join(edgesFor(frontier).withColumnRenamed("src", "node"), Seq("node"))
        .select(col("query_id"), col("dst").as("node"))
        // drop already-visited nodes before scoring (exact dedup)
        .join(visited.select(col("query_id"), col("node")),
          Seq("query_id", "node"), "left_anti")
        .distinct()
      val newlyScored = scored(expanded)
      visited = visited.unionByName(newlyScored)
        .withColumn("rk", row_number().over(wBeam))
        .filter(col("rk") <= beam)
        .drop("rk")
        .localCheckpoint()
      // the next frontier is the CURRENT beam (greedy best-first in
      // batch form: every beam member expands — a wider exploration
      // than scalar HNSW's single-best walk, natural in dataflow)
      frontier = visited
    }
    val surfaced = exclude.fold(visited)(ex =>
      visited.join(broadcast(ex.select(col(ex.columns.head).as("node"))
        .distinct()), Seq("node"), "left_anti"))
    surfaced
      .filter(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(wBeam).cast("long"))
      .filter(col("rank") <= kOut)
      .select(col("query_id"), col("node").as("neighbor_id"), col("rank"))
  }
}
