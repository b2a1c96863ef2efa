package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the cluster-label secondary index (r14 verdict item 2 —
  * the labels half of delta-shaped per-fold IO):
  *  - byDocIds / byClusterIds return supersets whose exact-filtered
  *    content equals the full-scan legs (pruning is never the
  *    semantics);
  *  - the FILE-IO claims: an id probe opens the ids' buckets, a
  *    cluster probe opens its clx buckets plus only the primary
  *    buckets its entries name — both fewer than the table holds;
  *  - incrementalClustersDeltaBy under stored pruned closures is
  *    BIT-IDENTICAL to the in-memory fold (the A/B that lets q478's
  *    recursive-CTE oracle keep pinning the drain);
  *  - crash order: an index-AHEAD state (clx committed, labels not
  *    yet) still answers correctly — and entries of merged-away
  *    clusters are harmless garbage;
  *  - a legacy state bootstraps the index once via ensureSecondary.
  */
class LabelStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 8

  /** 120 docs in 40 clusters of 3 (cluster id = min member). */
  private def labels(): DataFrame =
    (0L until 120L).map(i => (i, i - i % 3, 3L))
      .toDF("doc_id", "cluster_id", "cluster_size")

  private def fp(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_id", "cluster_id", "cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def freshStore(tag: String): (String, String) = {
    val root = TestSpark.tmpDir(tag).toString
    val (lab, clx) = (s"$root/labels", s"$root/labels_clx")
    BucketedIndex.commitBucketed(labels(), lab, "base", Seq("doc_id"), N)
    BucketedIndex.commitBucketed(LabelStore.clusterEntries(labels(), N),
      clx, "base", Seq("cluster_id"), N)
    (lab, clx)
  }

  test("byDocIds / byClusterIds: exact-filtered supersets equal the full scans; file IO is pruned") {
    val (lab, clx) = freshStore("lstore-prune")
    val lv = Manifest.currentVersion(lab)
    val cv = Manifest.currentVersion(clx)
    val full = labels()

    // id leg: a 2-id probe reads its buckets only
    val ids = Seq(7L, 8L).toDF("id")
    val got = LabelStore.byDocIds(spark, lab, lv, ids, N)
      .join(broadcast(ids.withColumnRenamed("id", "doc_id")), Seq("doc_id"))
    val want = full.filter(col("doc_id").isin(7L, 8L))
    assert(fp(got) == fp(want) && fp(want).size == 2)
    val idPaths = BucketedIndex.prunedMemberPaths(lab, lv,
      ids.withColumnRenamed("id", "doc_id"), Seq("doc_id"), N)
    assert(idPaths.size < Manifest.members(lab, lv).size,
      s"a 2-id probe opened ${idPaths.size} of " +
        s"${Manifest.members(lab, lv).size} label members — no pruning")

    // cluster leg: a 1-cluster probe reads its clx bucket, then only
    // the primary buckets its 3 members occupy
    val cids = Seq(21L).toDF("cid")
    val gotC = LabelStore.byClusterIds(spark, lab, lv, clx, cv, cids, N)
      .filter(col("cluster_id") === 21L)
    assert(fp(gotC) == fp(full.filter(col("cluster_id") === 21L)) &&
      fp(gotC).size == 3)
    val clxPaths = BucketedIndex.prunedMemberPaths(clx, cv,
      cids.withColumnRenamed("cid", "cluster_id"), Seq("cluster_id"), N)
    assert(clxPaths.size == 1,
      s"a 1-cluster entry probe opened ${clxPaths.size} clx members")
    // the primary hop's bucket set is exactly the members' buckets
    val memberKbs = BucketedIndex.bucketsOf(
      full.filter(col("cluster_id") === 21L).select("doc_id"),
      Seq("doc_id"), N)
    assert(memberKbs.size <= 3)
    val primPaths = BucketedIndex.prunedMemberPathsByBuckets(lab, lv,
      memberKbs, Seq("doc_id"), N)
    assert(primPaths.size < Manifest.members(lab, lv).size,
      s"a 3-member cluster probe opened ${primPaths.size} label members")
  }

  test("incrementalClustersDeltaBy under stored pruned closures ≡ the in-memory fold") {
    val (lab, clx) = freshStore("lstore-fold")
    val lv = Manifest.currentVersion(lab)
    val cv = Manifest.currentVersion(clx)
    val base = labels()
    // delta: 4 new docs; edges merge two base clusters (0 and 3) via
    // doc 200, attach doc 201 to cluster 30's member 31, leave
    // 202/203 as an isolated delta pair
    val dIds = Seq(200L, 201L, 202L, 203L).toDF("id")
    val pairs = Seq((200L, 1L), (200L, 4L), (201L, 31L), (202L, 203L))
      .toDF("a", "b")
    val inMem = Dedup.incrementalClustersDelta(base, dIds, pairs)
    val stored = Dedup.incrementalClustersDeltaBy(
      ids => LabelStore.byDocIds(spark, lab, lv, ids, N),
      cids => LabelStore.byClusterIds(spark, lab, lv, clx, cv, cids, N),
      dIds, pairs)
    assert(fp(stored.changed) == fp(inMem.changed),
      "stored fold's changed rows diverged from the in-memory fold")
    assert(stored.touched.collect().map(_.getLong(0)).toSet ==
      inMem.touched.collect().map(_.getLong(0)).toSet)
    // the composed full assignment agrees too (and the guard works
    // through the pruned closure)
    val full = Dedup.incrementalClusters(base, dIds, pairs)
    val composedStored = fp(base
      .join(broadcast(stored.touched.select(col("id").as("cluster_id"))),
        Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id", "cluster_size")
      .unionByName(stored.changed))
    assert(composedStored == fp(full))
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalClustersDeltaBy(
        ids => LabelStore.byDocIds(spark, lab, lv, ids, N),
        cids => LabelStore.byClusterIds(spark, lab, lv, clx, cv, cids, N),
        Seq(7L).toDF("id"), Seq((7L, 8L)).toDF("a", "b"))
    }
    assert(e.getMessage.contains("NEW arrivals"), e.getMessage)
  }

  test("index-AHEAD crash state answers correctly; merged-away entries are harmless") {
    val (lab, clx) = freshStore("lstore-crash")
    val base = labels()
    val dIds = Seq(200L).toDF("id")
    val pairs = Seq((200L, 1L), (200L, 4L)).toDF("a", "b")
    val delta = Dedup.incrementalClustersDelta(base, dIds, pairs)
    val changed = delta.changed.localCheckpoint()
    // the crash: clx upserted, labels NOT (foldBatch's commit order)
    BucketedIndex.upsertBucketed(LabelStore.clusterEntries(changed, N),
      clx, "day1", Seq("cluster_id"), N)
    val lv = Manifest.currentVersion(lab) // still the base labels
    val cv = Manifest.currentVersion(clx) // already advanced
    // every CURRENT cluster still resolves all its rows through the
    // ahead index (supersets only widen)
    val allCids = base.select(col("cluster_id")).distinct()
    val got = LabelStore.byClusterIds(spark, lab, lv, clx, cv, allCids, N)
      .join(broadcast(allCids), Seq("cluster_id"), "left_semi")
    assert(fp(got) == fp(base), "index-ahead state lost label rows")
    // finish the fold; the merged-away cluster (3) keeps a stale clx
    // entry — probing the CURRENT labels is unaffected
    BucketedIndex.upsertBucketed(changed, lab, "day1", Seq("doc_id"), N)
    val lv2 = Manifest.currentVersion(lab)
    val cv2 = Manifest.currentVersion(clx)
    val cur = Manifest.read(spark, lab, lv2)
    val curCids = cur.select(col("cluster_id")).distinct()
    val got2 = LabelStore.byClusterIds(spark, lab, lv2, clx, cv2, curCids, N)
      .join(broadcast(curCids), Seq("cluster_id"), "left_semi")
    assert(fp(got2) == fp(cur),
      "post-fold cluster probe diverged from the stored labels")
  }

  test("ensureSecondary bootstraps a legacy state once, then stays a no-op") {
    val root = TestSpark.tmpDir("lstore-legacy").toString
    val (lab, clx) = (s"$root/labels", s"$root/labels_clx")
    BucketedIndex.commitBucketed(labels(), lab, "base", Seq("doc_id"), N)
    assert(Manifest.currentVersion(clx) == 0)
    LabelStore.ensureSecondary(spark, lab, clx, N)
    val cv = Manifest.currentVersion(clx)
    assert(cv > 0, "legacy bootstrap must create the index")
    LabelStore.ensureSecondary(spark, lab, clx, N)
    assert(Manifest.currentVersion(clx) == cv, "re-run must be a no-op")
    val cids = Seq(9L).toDF("cid")
    val got = LabelStore.byClusterIds(spark, lab,
      Manifest.currentVersion(lab), clx, cv, cids, N)
      .filter(col("cluster_id") === 9L)
    assert(fp(got) == fp(labels().filter(col("cluster_id") === 9L)))
  }
}
