package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pruned access to a PERSISTED cluster-label table — the labels half
  * of the delta-shaped-IO contract (r14 verdict item 2). The label
  * table itself is doc_id-BUCKETED ([[BucketedIndex]]), which serves
  * the fold's ID-keyed leg (labels of candidate edge endpoints) from
  * the endpoints' bucket members alone — but the RELABEL leg (all
  * members of a touched component) and the size fold are
  * CLUSTER-grain access against a doc_id-bucketed table, inherently a
  * full scan without more structure. The missing structure is a
  * SECONDARY INDEX: a second bucketed table mapping
  *
  *   `cluster_id → the set of primary (doc_id) buckets holding its rows`
  *
  * itself KEY-BUCKETED on `cluster_id`, so a cluster-grain probe is
  * two pruned hops: read the touched clusters' index entries (pruned
  * to their cluster-id buckets), collect the primary buckets they
  * name (bounded ≤ numBuckets), and read ONLY those label members
  * ([[BucketedIndex.prunedReadByBuckets]]). Per-fold label IO is then
  * O(touched clusters' buckets × table/numBuckets) instead of
  * O(table) — delta-shaped once `numBuckets` is sized to the table
  * (the Hive-bucketing constant: at 100 TB a label table carries
  * 10⁴–10⁶ buckets, so each hop opens a handful of small files).
  *
  * MAINTENANCE stays delta-bounded because connected components only
  * MERGE (the contraction argument): a fold's changed rows contain
  * EVERY row of every surviving touched cluster, so
  * [[clusterEntries]] over the changed rows is the complete new entry
  * set for exactly the clusters it names, and one keyed COW upsert
  * advances the index. Two safety properties follow from merge-only
  * monotonicity and are load-bearing:
  *
  *  - STALE ENTRIES ARE HARMLESS: an old label that merged away keeps
  *    its index entry, but no future fold ever probes it (touched
  *    sets come from CURRENT labels, and a dead label is never
  *    current again) — bounded garbage, not a correctness issue.
  *  - CRASH ORDER: the index commits BEFORE the labels (see
  *    [[graft.streaming.StreamingClusters.foldBatch]]). An
  *    index-ahead state is safe — a surviving cluster's post-fold
  *    row set is a SUPERSET of its pre-fold rows, so its new entry
  *    set covers every bucket its current rows occupy, and extra
  *    buckets only widen the pruned read. A labels-ahead state would
  *    be WRONG (a probe could miss buckets holding relabeled rows),
  *    which is why the order is part of the contract.
  *
  * A legacy state (labels table without the index) degrades loudly
  * at [[ensureSecondary]]: the index bootstraps from ONE full label
  * scan, after which every fold is pruned.
  */
object LabelStore {

  /** The secondary-index entry rows of a label frame: one
    * (cluster_id, kb) row per primary bucket a cluster's rows occupy.
    * `kb` is the [[BucketedIndex.bucketOf]] value of `doc_id` under
    * the PRIMARY table's layout.
    */
  def clusterEntries(labels: DataFrame, numBuckets: Int): DataFrame =
    labels.select(col("cluster_id"),
      BucketedIndex.bucketOf(numBuckets, col("doc_id")).as("kb"))
      .distinct()

  /** Bootstrap the secondary index of an EXISTING labels table that
    * predates it (one full label scan, once per state); a no-op when
    * the index is already initialized or the labels table is empty.
    */
  def ensureSecondary(
      spark: SparkSession,
      labRoot: String,
      clxRoot: String,
      numBuckets: Int): Unit =
    if (Manifest.currentVersion(clxRoot) == 0 &&
        Manifest.currentVersion(labRoot) > 0) {
      BucketedIndex.commitBucketed(
        clusterEntries(Manifest.read(spark, labRoot,
          Manifest.currentVersion(labRoot)), numBuckets),
        clxRoot, "bootstrap-clx", Seq("cluster_id"), numBuckets)
      ()
    }

  /** A SUPERSET of the label rows whose `doc_id` is in `ids` (one
    * column, any name): the pruned primary read on the ids' buckets.
    * Consumers apply the exact key match downstream.
    */
  def byDocIds(
      spark: SparkSession,
      labRoot: String,
      version: Int,
      ids: DataFrame,
      numBuckets: Int): DataFrame =
    BucketedIndex.prunedRead(spark, labRoot, version,
      ids.select(col(ids.columns.head).as("doc_id")), Seq("doc_id"),
      numBuckets)

  /** A SUPERSET of the label rows whose `cluster_id` is in `cids`
    * (one column, any name): the two-hop secondary-index read — index
    * entries pruned to the clusters' buckets and exact-filtered, then
    * the primary members of the buckets those entries name. The
    * bucket collect is bounded ≤ `numBuckets`, metadata-scale.
    */
  def byClusterIds(
      spark: SparkSession,
      labRoot: String,
      labVersion: Int,
      clxRoot: String,
      clxVersion: Int,
      cids: DataFrame,
      numBuckets: Int): DataFrame = {
    val want = cids.select(col(cids.columns.head).as("cluster_id"))
    val entries = BucketedIndex.prunedRead(spark, clxRoot, clxVersion,
        want, Seq("cluster_id"), numBuckets)
      .join(broadcast(want.distinct()), Seq("cluster_id"), "left_semi")
    val kbs = entries.select(col("kb")).distinct()
      .collect().map(_.getLong(0).toString).toSet
    BucketedIndex.prunedReadByBuckets(spark, labRoot, labVersion, kbs,
      Seq("doc_id"), numBuckets)
  }
}
