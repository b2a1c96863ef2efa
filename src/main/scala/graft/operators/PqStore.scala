package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF-PQ index — the storage leg of the q420 composed-ANN
  * family, completing the stored-index discipline across every index
  * family the engine ships (AllPairs prefixes q415, LSH buckets q480,
  * Hamming chunks q481, graph edges q483): the trained artifacts
  * (coarse centroids + residual codebook) and the 4-bit codes COMMIT
  * as [[Manifest]] tables once; serving reads storage alone (no
  * retrain, no re-encode); daily arrivals APPEND their own codes —
  * the cheapest fold of all the families, because codes are a pure
  * per-row function of the frozen artifacts (no stored row is ever
  * affected by an arrival, unlike the graph's re-ranked lists).
  *
  * Layout under `root`:
  *   - `<root>/codes` — (id, ivf_list, code), KEY-BUCKETED on
  *     `ivf_list` ([[BucketedIndex.commitBucketed]]): a query scores
  *     codes from its `nprobe` probed lists only, and the bucketed
  *     layout makes that CANDIDATE bound an IO bound too — the scan
  *     opens only the probed lists' bucket members
  *     ([[BucketedIndex.prunedRead]]), never the other
  *     `nlist − nprobe` lists' files. Delta batches append one
  *     member per occupied bucket ([[Manifest.compactTiered]] is the
  *     long-drain maintenance, layout-preserving).
  *   - `<root>/centroids` — (list_id, centroid): the nlist-row coarse
  *     quantizer (bounded; collected at [[load]]).
  *   - `<root>/codebook`  — (pos, value): the flattened residual
  *     codebook on the exact integer grid (m·ksub·dsub longs,
  *     bounded; collected at [[load]]) — integers round-trip parquet
  *     exactly, so the reconstructed model scores bit-identically.
  *   - `<root>/members`   — (id), KEY-BUCKETED on `id`: the
  *     membership ledger [[appendDelta]]'s id-grain new-arrival
  *     guard probes at pruned-scan cost
  *     ([[StoredIndex.requireNewIds]], r14 verdict item 5).
  *
  * The handle states (nlist, nprobe, m, ksub, numBuckets) at
  * reconstruction (the [[Dedup.LshBucketIndex]] contract) and
  * [[load]] screens them against storage: centroid count == nlist,
  * codebook length == m·ksub·(dim/m), dim % m == 0 — all loud.
  */
object PqStore {

  /** Default bucket count of the codes layout. */
  val ListBuckets = 16

  /** A reconstructed stored-index handle; `version` pins the codes
    * snapshot a serving call reads — a concurrent append advances
    * the table without moving a live handle.
    */
  final case class StoredIvfPq(
      codes: DataFrame,
      cents: Array[Array[Float]],
      model: Pq.Model,
      nlist: Int,
      nprobe: Int,
      numBuckets: Int,
      root: String,
      version: Int)

  /** Train the coarse quantizer + residual codebook on `emb`, encode
    * it, and COMMIT the whole index under `root`. One corpus encode
    * pass, three commits; reconstruct with [[load]].
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      nlist: Int = 16,
      m: Int = 16,
      ksub: Int = 16,
      sampleN: Int = 2048,
      numBuckets: Int = ListBuckets): Unit = {
    val spark = emb.sparkSession
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, nlist)
    require(cents.nonEmpty, "PqStore.build: empty corpus")
    val model = Pq.trainResidualModel(emb, idCol, vecCol, cents, m, ksub,
      sampleN)
    // one encode pass feeds the codes AND members commits
    val coded = Pq.encodeResiduals(emb, idCol, vecCol, cents, model)
      .withColumnRenamed(idCol, "id").localCheckpoint()
    BucketedIndex.commitBucketed(coded, s"$root/codes", "base",
      Seq("ivf_list"), numBuckets)
    // the id-bucketed MEMBERS ledger (ids only — the q480 sets shape):
    // what lets appendDelta prove id-grain disjointness at pruned-scan
    // cost instead of only catching same-vector redeliveries
    BucketedIndex.commitBucketed(coded.select(col("id")),
      s"$root/members", "base", Seq("id"), numBuckets)
    import spark.implicits._
    Manifest.commitAdd(
      cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
        .toDF("list_id", "centroid"),
      s"$root/centroids", "base")
    // (m, ksub) ride as manifest partition tags on the codebook
    // member: the flat length alone cannot distinguish e.g.
    // (m=16, ksub=16, dsub=4) from (m=8, ksub=16, dsub=8) — both are
    // 1024 longs — and a mis-stated m would re-slice the codebook
    // silently
    Manifest.commitAdd(
      model.codebook.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
        .toDF("pos", "value"),
      s"$root/codebook", "base",
      partition = Map("m" -> m.toString, "ksub" -> ksub.toString))
    ()
  }

  /** Reconstruct the handle from storage, screening the stated
    * parameters (see class doc). The codes frame is the pinned
    * current-version snapshot.
    */
  def load(
      spark: SparkSession,
      root: String,
      nlist: Int,
      nprobe: Int,
      m: Int,
      ksub: Int,
      numBuckets: Int = ListBuckets): StoredIvfPq = {
    val centRoot = s"$root/centroids"
    val cbRoot = s"$root/codebook"
    val codeRoot = s"$root/codes"
    val cv = StoredIndex.liveVersion(centRoot, "PqStore.load", "build()")
    val centRows = Manifest.read(spark, centRoot, cv)
      .orderBy(col("list_id")).collect()
    require(centRows.length == nlist,
      s"PqStore.load: stored quantizer has ${centRows.length} centroids " +
        s"but the handle states nlist=$nlist — state the build's values")
    val cents = centRows.map(_.getSeq[Float](1).toArray)
    val dim = cents.head.length
    require(dim % m == 0,
      s"PqStore.load: stored dim $dim not divisible by the stated m=$m")
    require(nprobe >= 1 && nprobe <= nlist,
      s"PqStore.load: nprobe=$nprobe out of range [1, $nlist]")
    val dsub = dim / m
    val bv = StoredIndex.liveVersion(cbRoot, "PqStore.load", "build()")
    val cbTags = Manifest.memberPartitions(cbRoot, bv).head._2
    require(cbTags.get("m").contains(m.toString) &&
      cbTags.get("ksub").contains(ksub.toString),
      s"PqStore.load: stored codebook was built at (m=${cbTags.get("m")
        .getOrElse("?")}, ksub=${cbTags.get("ksub").getOrElse("?")}) but " +
        s"the handle states (m=$m, ksub=$ksub) — the flat codebook would " +
        "re-slice silently; state the build's values")
    val cb = Manifest.read(spark, cbRoot, bv)
      .orderBy(col("pos")).collect().map(_.getLong(1))
    require(cb.length == m * ksub * dsub,
      s"PqStore.load: stored codebook has ${cb.length} entries but the " +
        s"stated (m=$m, ksub=$ksub, dim=$dim) needs ${m * ksub * dsub} — " +
        "state the build's values")
    val kv = StoredIndex.liveVersion(codeRoot, "PqStore.load", "build()")
    StoredIvfPq(Manifest.read(spark, codeRoot, kv), cents,
      Pq.Model(cb, m, ksub, dsub), nlist, nprobe, numBuckets, root, kv)
  }

  /** APPEND a batch of NEW vectors to the stored index: the batch
    * encodes under the STORED artifacts (one narrow codegen pass over
    * the batch alone — codes are a pure per-row function, so the
    * appended rows equal what a full rebuild under the same
    * artifacts would produce) and lands as one bucketed commit. No
    * stored row is read, touched, or re-ranked — the fold is pure
    * delta IO, the append-only best case of the stored-index family.
    *
    * New-arrival guard ([[StoredIndex.requireNewIds]]): the id-grain
    * probe against the id-bucketed MEMBERS ledger, at the CURRENT
    * head (r14 advice item 3 — sequential appends reusing one loaded
    * handle see each other) — it catches an id reused for a
    * DIFFERENT vector too, which the previous own-list-bucket probe
    * could not (r14 verdict item 5: the families now agree on what
    * they refuse). `nameTag` is the redelivery ledger
    * ([[Manifest.tagApplied]] on the members table — the LAST table
    * committed, so a crash between the codes and members commits
    * retries idempotently). Returns the codes version after the
    * append.
    */
  def appendDelta(
      idx: StoredIvfPq,
      deltaEmb: DataFrame,
      idCol: String,
      vecCol: String,
      nameTag: String): Int = {
    val codeRoot = s"${idx.root}/codes"
    val memRoot = s"${idx.root}/members"
    if (Manifest.tagApplied(memRoot, nameTag))
      Manifest.currentVersion(codeRoot)
    else {
      val spark = deltaEmb.sparkSession
      // batch-sized; feeds the guards AND the commits — materialize once
      val coded = Pq.encodeResiduals(deltaEmb, idCol, vecCol, idx.cents,
        idx.model).withColumnRenamed(idCol, "id").localCheckpoint()
      // OWN crash window (codes committed under this tag, members
      // not): skip both guards — the crashed attempt passed them
      // before its codes landed; the retry only completes the ledger
      if (!Manifest.tagApplied(codeRoot, nameTag)) {
        StoredIndex.requireNewIds(spark, memRoot, coded.select(col("id")),
          idx.numBuckets, s"PqStore.appendDelta($nameTag)")
        // second screen (r15 advice item 2): ANOTHER tag's crash
        // window — its codes landed, its members didn't, so the
        // members probe above is blind; the delta's own ivf_list
        // buckets of the codes table expose the half-appended ids at
        // pruned-scan cost
        StoredIndex.requireAbsentByContent(spark, codeRoot,
          coded.select(col("ivf_list"), col("id")), Seq("ivf_list"), "id",
          idx.numBuckets, s"PqStore.appendDelta($nameTag)")
      }
      StoredIndex.appendOnce(coded, codeRoot, nameTag, Seq("ivf_list"),
        idx.numBuckets)
      StoredIndex.appendOnce(coded.select(col("id")), memRoot, nameTag,
        Seq("id"), idx.numBuckets)
      Manifest.currentVersion(codeRoot)
    }
  }

  /** DELETE a batch of vectors from the stored index — the
    * retraction leg (r16), at pruned COW cost: the victims ENCODE
    * under the stored artifacts (codes are a pure per-row function,
    * so each victim's row sits in exactly the bucket its re-derived
    * `ivf_list` names), the codes table COW-deletes those buckets'
    * victim rows ([[BucketedIndex.deleteBucketed]] — untouched
    * buckets verbatim), and the members ledger drops the ids. The
    * caller passes the victims' VECTORS (`deltaEmb`-shaped — the
    * corpus rows being retracted): id-only deletion would need an
    * id→list lookup the id-only members schema cannot serve, and a
    * retraction flow owns the rows it retracts. A vector that does
    * not match the stored one is LOUD (the routing check below finds
    * the victim's stored row outside its re-derived bucket), never a
    * silent residue.
    *
    * Order + crash windows: codes delete FIRST, members LAST (the
    * redelivery ledger — [[Manifest.tagApplied]] on members, same as
    * the append side); a retry between the two finds the ids still in
    * members (the presence guard passes), re-deletes nothing from
    * codes (idempotent), and completes the ledger. A batch whose ids
    * are ALL already gone from members is an applied delete whose
    * ledger member emptied — it returns quietly; a PARTIAL overlap is
    * loud. After the delete, the ids are clean re-arrivals for
    * [[appendDelta]]. Returns the codes version.
    */
  def deleteDelta(
      idx: StoredIvfPq,
      victimEmb: DataFrame,
      idCol: String,
      vecCol: String,
      nameTag: String): Int = {
    val codeRoot = s"${idx.root}/codes"
    val memRoot = s"${idx.root}/members"
    if (Manifest.tagApplied(memRoot, nameTag))
      Manifest.currentVersion(codeRoot)
    else {
      val spark = victimEmb.sparkSession
      val coded = Pq.encodeResiduals(victimEmb, idCol, vecCol, idx.cents,
          idx.model).withColumnRenamed(idCol, "id")
        .select(col("id"), col("ivf_list")).localCheckpoint()
      val vIds = coded.select(col("id")).distinct()
      val nV = vIds.count()
      val mv = StoredIndex.liveVersion(memRoot,
        s"PqStore.deleteDelta($nameTag)", "build()")
      val present = BucketedIndex.prunedRead(spark, memRoot, mv, vIds,
          Seq("id"), idx.numBuckets)
        .select(col("id")).distinct()
        .join(broadcast(vIds), Seq("id"), "left_semi").count()
      if (present == 0) return Manifest.currentVersion(codeRoot)
      require(present == nV,
        s"PqStore.deleteDelta($nameTag): ${nV - present} of $nV victim " +
          "ids are not in the stored index — a partial overlap is never " +
          "a crash window (commits are atomic); check the feed")
      // OWN crash window (codes delete landed, members delete did
      // not): skip the routing check + codes delete, just complete
      // the ledger — the routing check would otherwise read the
      // already-deleted rows as "mis-routed" and wedge the retry
      if (!Manifest.tagApplied(codeRoot, nameTag)) {
        // routing check: every victim's STORED code row must sit
        // inside the buckets its re-derived list names — a victim
        // delivered with a DIFFERENT vector than at insert would
        // route elsewhere and leave its real row as silent residue
        val cv = Manifest.currentVersion(codeRoot)
        val inBuckets = BucketedIndex.prunedRead(spark, codeRoot, cv,
            coded.select(col("ivf_list")), Seq("ivf_list"),
            idx.numBuckets)
          .select(col("id")).distinct()
          .join(broadcast(vIds), Seq("id"), "left_semi").count()
        require(inBuckets == nV,
          s"PqStore.deleteDelta($nameTag): ${nV - inBuckets} of $nV " +
            "victim rows are outside their re-derived ivf_list buckets " +
            "— the delivered vectors differ from the stored ones; " +
            "retract with the vectors that were appended")
        BucketedIndex.deleteBucketed(coded, codeRoot, nameTag,
          Seq("ivf_list"), idx.numBuckets, Seq("id"))
        ()
      }
      BucketedIndex.deleteBucketed(vIds, memRoot, nameTag,
        Seq("id"), idx.numBuckets, Seq("id"))
      Manifest.currentVersion(codeRoot)
    }
  }

  /** IVF-PQ top-k served ENTIRELY from the stored index: artifacts
    * come from the handle (no retrain, no corpus encode), and the
    * candidate scan opens only the probed lists' bucket members —
    * candidate IO ∝ probed lists holds at the FILE level, not just
    * the row level. `emb` supplies the float vectors the exact
    * re-rank (and the query side) joins against — the corpus table,
    * not index state. Same serving core as the in-memory
    * [[Pq.ivfPqTopK]] ([[Pq.ivfPqServe]]), so the two cannot diverge.
    */
  def topKStored(
      spark: SparkSession,
      idx: StoredIvfPq,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      k: Int,
      rerank: Int = 32): DataFrame =
    Pq.ivfPqServe(
      probes => BucketedIndex.prunedRead(spark, s"${idx.root}/codes",
          idx.version, probes.select(col("ivf_list")), Seq("ivf_list"),
          idx.numBuckets)
        .withColumnRenamed("id", idCol),
      emb, idCol, vecCol, queryIds, idx.cents, idx.model, idx.nprobe,
      k, rerank)
}
