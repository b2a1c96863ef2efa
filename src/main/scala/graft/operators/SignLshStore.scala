package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED sign-LSH ANN index — the storage leg of the q42/q477
  * hyperplane-bucket family, the last ANN family still serving from
  * an in-query index build (prefixes q415, LSH dedup buckets q480,
  * Hamming chunks q481, graph edges q483, IVF-PQ codes q485 all have
  * theirs): the corpus's bucket assignments COMMIT once as a Manifest
  * table KEY-BUCKETED on `bucket`, a multi-probe query reads ONLY its
  * probed buckets' members, and daily arrivals APPEND their own
  * bucket rows — pure batch IO, no stored row touched (bucket
  * assignment is a per-row function of the frozen planes, the PqStore
  * append argument).
  *
  * The hyperplanes themselves need no table: they are a pure function
  * of (numPlanes, dim, seed) ([[Vec.deterministicPlanes]]), so the
  * handle's stated parameters ARE the quantizer — [[load]]
  * reconstructs them and sanity-screens the stored buckets against
  * `2^numPlanes` (one bounded member probe; a mis-stated plane count
  * that survives the range screen still yields a correct-but-
  * low-recall probe, never a wrong result — candidates are exact-
  * cosine verified).
  *
  * Layout under `root`:
  *   - `<root>/buckets` — (nid, bucket), bucketed on `bucket`. The
  *     index stores NO vectors (the corpus table keeps those — an
  *     index that duplicated the float payload would double storage);
  *     serving joins the pruned candidate ids back to `emb` for
  *     scoring, a candidate-bounded broadcast-hash probe of the
  *     corpus scan.
  *   - `<root>/members` — (id), bucketed on `id`: the membership
  *     ledger [[appendDelta]]'s id-grain new-arrival guard probes at
  *     pruned-scan cost ([[StoredIndex.requireNewIds]], r14 verdict
  *     item 5 — an id reused for a DIFFERENT vector hashes to another
  *     LSH bucket and slipped the previous own-bucket probe).
  */
object SignLshStore {

  /** Default bucket-file count of the layout (hash buckets of the
    * LSH bucket key — distinct from the 2^planes LSH bucket space).
    */
  val FileBuckets = 16

  /** A reconstructed stored-index handle; `version` pins the buckets
    * snapshot a serving call reads.
    */
  final case class StoredSignLsh(
      buckets: DataFrame,
      planes: Array[Array[Double]],
      numPlanes: Int,
      dim: Int,
      seed: Long,
      numBuckets: Int,
      root: String,
      version: Int)

  /** Assign every vector of `emb` its sign-LSH bucket under the
    * (numPlanes, dim, seed) plane family and COMMIT the assignment
    * under `root`. One narrow corpus pass, one bucketed commit.
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      numPlanes: Int,
      dim: Int,
      seed: Long = 42L,
      numBuckets: Int = FileBuckets): Unit = {
    val planes = Vec.deterministicPlanes(numPlanes, dim, seed)
    BucketedIndex.commitBucketed(
      emb.select(col(idCol).as("nid"),
        Vec.lshBucket(col(vecCol), planes).as("bucket")),
      s"$root/buckets", "base", Seq("bucket"), numBuckets)
    BucketedIndex.commitBucketed(emb.select(col(idCol).as("id")),
      s"$root/members", "base", Seq("id"), numBuckets)
    ()
  }

  /** Reconstruct the handle from storage under the stated parameters
    * (which ARE the quantizer — see class doc), sanity-screening the
    * stored bucket range against `2^numPlanes`.
    */
  def load(
      spark: SparkSession,
      root: String,
      numPlanes: Int,
      dim: Int,
      seed: Long = 42L,
      numBuckets: Int = FileBuckets): StoredSignLsh = {
    require(numPlanes >= 1 && numPlanes <= 62,
      s"SignLshStore.load: numPlanes=$numPlanes out of range [1, 62]")
    val bktRoot = s"$root/buckets"
    val v = StoredIndex.liveVersion(bktRoot, "SignLshStore.load", "build()")
    val planes = Vec.deterministicPlanes(numPlanes, dim, seed)
    // bounded reconstruction probe: ONE member's buckets must fit the
    // stated plane count's bucket space
    val m0 = Manifest.members(bktRoot, v).head
    val mm = spark.read.parquet(m0)
      .agg(max(col("bucket")).as("mx"), min(col("bucket")).as("mn"))
      .collect()(0)
    require(mm.getLong(1) >= 0L && mm.getLong(0) < (1L << numPlanes),
      s"SignLshStore.load: stored buckets [${mm.getLong(1)}, " +
        s"${mm.getLong(0)}] do not fit numPlanes=$numPlanes " +
        s"(bucket space [0, ${1L << numPlanes})) — state the build's values")
    StoredSignLsh(Manifest.read(spark, bktRoot, v), planes, numPlanes,
      dim, seed, numBuckets, root, v)
  }

  /** APPEND a batch of NEW vectors: the batch's bucket rows compute
    * under the STORED plane family (one narrow pass over the batch)
    * and land as one bucketed commit — no stored row read or touched.
    * The new-arrival guard is the id-grain probe against the
    * id-bucketed MEMBERS ledger at the CURRENT head
    * ([[StoredIndex.requireNewIds]] — r14 advice item 3 + verdict
    * item 5): it catches redeliveries AND ids reused for different
    * vectors, at pruned-scan cost. `nameTag` is the redelivery
    * ledger ([[Manifest.tagApplied]] on the members table — the LAST
    * table committed, so a crash between the bucket and members
    * commits retries idempotently). Returns the new buckets version.
    */
  def appendDelta(
      idx: StoredSignLsh,
      deltaEmb: DataFrame,
      idCol: String,
      vecCol: String,
      nameTag: String): Int = {
    val bktRoot = s"${idx.root}/buckets"
    val memRoot = s"${idx.root}/members"
    if (Manifest.tagApplied(memRoot, nameTag))
      Manifest.currentVersion(bktRoot)
    else {
      val spark = deltaEmb.sparkSession
      // batch-sized; feeds the guards AND the commits — materialize once
      val rows = deltaEmb.select(col(idCol).as("nid"),
          Vec.lshBucket(col(vecCol), idx.planes).as("bucket"))
        .localCheckpoint()
      // OWN crash window (buckets committed under this tag, members
      // not): skip both guards — the crashed attempt passed them; the
      // retry only completes the ledger
      if (!Manifest.tagApplied(bktRoot, nameTag)) {
        StoredIndex.requireNewIds(spark, memRoot, rows.select(col("nid")),
          idx.numBuckets, s"SignLshStore.appendDelta($nameTag)")
        // second screen (r15 advice item 2): ANOTHER tag's crash
        // window — its bucket rows landed, its members didn't; the
        // delta's own LSH buckets expose the half-appended ids at
        // pruned-scan cost
        StoredIndex.requireAbsentByContent(spark, bktRoot,
          rows.select(col("bucket"), col("nid")), Seq("bucket"), "nid",
          idx.numBuckets, s"SignLshStore.appendDelta($nameTag)")
      }
      StoredIndex.appendOnce(rows, bktRoot, nameTag, Seq("bucket"),
        idx.numBuckets)
      StoredIndex.appendOnce(rows.select(col("nid").as("id")), memRoot,
        nameTag, Seq("id"), idx.numBuckets)
      Manifest.currentVersion(bktRoot)
    }
  }

  /** DELETE a batch of vectors from the stored index — the
    * [[PqStore.deleteDelta]] twin: victims re-derive their LSH bucket
    * under the stored plane family (a pure per-row function, so each
    * victim's stored row sits exactly in the bucket re-derived here),
    * the buckets table COW-deletes those buckets' victim rows, the
    * members ledger drops the ids. Same guards, order, and crash
    * discipline as the PqStore leg: presence (pruned members probe;
    * all-absent returns quietly as an applied delete, partial is
    * loud), a routing check that makes a changed-vector delivery LOUD
    * instead of silent residue (skipped inside this tag's own
    * codes-deleted/members-pending crash window), members commit
    * LAST as the redelivery ledger. Returns the buckets version.
    */
  def deleteDelta(
      idx: StoredSignLsh,
      victimEmb: DataFrame,
      idCol: String,
      vecCol: String,
      nameTag: String): Int = {
    val bktRoot = s"${idx.root}/buckets"
    val memRoot = s"${idx.root}/members"
    if (Manifest.tagApplied(memRoot, nameTag))
      Manifest.currentVersion(bktRoot)
    else {
      val spark = victimEmb.sparkSession
      val rows = victimEmb.select(col(idCol).as("nid"),
          Vec.lshBucket(col(vecCol), idx.planes).as("bucket"))
        .localCheckpoint()
      val vIds = rows.select(col("nid")).distinct()
      val nV = vIds.count()
      val mv = StoredIndex.liveVersion(memRoot,
        s"SignLshStore.deleteDelta($nameTag)", "build()")
      val present = BucketedIndex.prunedRead(spark, memRoot, mv,
          vIds.select(col("nid").as("id")), Seq("id"), idx.numBuckets)
        .select(col("id").as("nid")).distinct()
        .join(broadcast(vIds), Seq("nid"), "left_semi").count()
      if (present == 0) return Manifest.currentVersion(bktRoot)
      require(present == nV,
        s"SignLshStore.deleteDelta($nameTag): ${nV - present} of $nV " +
          "victim ids are not in the stored index — a partial overlap " +
          "is never a crash window (commits are atomic); check the feed")
      if (!Manifest.tagApplied(bktRoot, nameTag)) {
        val bv = Manifest.currentVersion(bktRoot)
        val inBuckets = BucketedIndex.prunedRead(spark, bktRoot, bv,
            rows.select(col("bucket")), Seq("bucket"), idx.numBuckets)
          .select(col("nid")).distinct()
          .join(broadcast(vIds), Seq("nid"), "left_semi").count()
        require(inBuckets == nV,
          s"SignLshStore.deleteDelta($nameTag): ${nV - inBuckets} of " +
            s"$nV victim rows are outside their re-derived LSH buckets " +
            "— the delivered vectors differ from the stored ones; " +
            "retract with the vectors that were appended")
        BucketedIndex.deleteBucketed(rows, bktRoot, nameTag,
          Seq("bucket"), idx.numBuckets, Seq("nid"))
        ()
      }
      BucketedIndex.deleteBucketed(vIds.select(col("nid").as("id")),
        memRoot, nameTag, Seq("id"), idx.numBuckets, Seq("id"))
      Manifest.currentVersion(bktRoot)
    }
  }

  /** Multi-probe top-k served from the STORED index: the plane family
    * comes from the handle, the probed buckets' member files are the
    * only index IO ([[BucketedIndex.prunedRead]] — candidate IO ∝
    * probed buckets now holds at the FILE level), and candidate ids
    * join back to `emb` for exact-cosine scoring (candidate-bounded —
    * the pruned side broadcasts, the corpus streams once). Same probe
    * fan-out and ranking core as the in-memory
    * [[Similarity.multiProbeTopK]] ([[Similarity.multiProbeTopKFrom]]),
    * so the two cannot diverge.
    */
  def topKStored(
      spark: SparkSession,
      idx: StoredSignLsh,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      nProbes: Int,
      k: Int): DataFrame = {
    val vecs = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    Similarity.multiProbeTopKFrom(
      probes => BucketedIndex.prunedRead(spark, s"${idx.root}/buckets",
          idx.version, probes.select(col("bucket")), Seq("bucket"),
          idx.numBuckets)
        .join(vecs, Seq("nid")),
      emb, idCol, vecCol, queryIds, idx.planes, nProbes, k)
  }
}
