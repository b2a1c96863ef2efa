package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared skeleton of every PERSISTED probe index (r14 verdict
  * item "a shared stored-index core"): [[GraphAnnStore]], [[PqStore]],
  * [[SignLshStore]], the q480/q481 handle wiring and the streaming
  * drain all repeat the same four moves — require-initialized loads,
  * tag-ledgered idempotent appends, an id-grain new-arrival guard,
  * and pruned serving reads. Each store keeps its own parameters and
  * layout (they genuinely differ); what lives here is the part whose
  * DRIFT between five copies would be the next bug source.
  *
  * The id-grain guard ([[requireNewIds]]) is the alignment fix for
  * the r14 finding that the families differed in what they caught:
  * the Jaccard/Hamming/graph families enforce id-grain disjointness,
  * but PqStore/SignLshStore's append guards probed only the delta's
  * OWN key buckets — an id redelivered with a DIFFERENT vector hashes
  * elsewhere and slipped through. Every append-guarded store now
  * keeps an id-BUCKETED `members` table (ids only — the q480 sets
  * shape) and probes it at the CURRENT head (not the handle's pinned
  * version — r14 advice item 3: two sequential appends reusing one
  * loaded handle must see each other), at pruned-scan cost.
  */
object StoredIndex {

  /** The current version of a table that MUST be initialized — the
    * load-screen opener every store repeats. `what` names the table,
    * `remedy` the call that creates it.
    */
  def liveVersion(root: String, what: String, remedy: String): Int = {
    val v = Manifest.currentVersion(root)
    require(v > 0, s"$what: $root is uninitialized — $remedy first")
    v
  }

  /** One member's frame of `version` — the bounded reconstruction
    * sanity probe (a screen, not a proof): stores validate stated
    * parameters against a single member's stats instead of scanning
    * the table.
    */
  def sampleMember(spark: SparkSession, root: String, version: Int): DataFrame =
    spark.read.parquet(Manifest.members(root, version).head)

  /** Idempotent KEY-BUCKETED append: a no-op when `tag` is already a
    * member name (redelivery — [[Manifest.tagApplied]] is the
    * ledger); a crashed attempt's orphan staging/bucket dirs are GC'd
    * by [[BucketedIndex.commitBucketed]] before the retry. Returns
    * the table's (possibly unchanged) current version.
    */
  def appendOnce(
      df: DataFrame,
      root: String,
      tag: String,
      keyCols: Seq[String],
      numBuckets: Int): Int =
    if (Manifest.tagApplied(root, tag)) Manifest.currentVersion(root)
    else BucketedIndex.commitBucketed(df, root, tag, keyCols, numBuckets)

  /** The ID-GRAIN new-arrival guard: fail loudly when any `deltaIds`
    * id (one column, any name) is already in the id-bucketed members
    * table under `memRoot` — probed against the CURRENT head, pruned
    * to the delta's id buckets. This catches BOTH redeliveries and an
    * id reused with different content (the case a content-keyed bucket
    * probe misses). An uninitialized members table fails with the
    * rebuild remedy: a store built before the members layout cannot
    * prove id-grain disjointness at pruned cost.
    */
  def requireNewIds(
      spark: SparkSession,
      memRoot: String,
      deltaIds: DataFrame,
      numBuckets: Int,
      context: String,
      keyCol: String = "id"): Unit = {
    val mv = liveVersion(memRoot, context,
      "rebuild the index under the members layout (build() commits it)")
    val ids = deltaIds.select(col(deltaIds.columns.head).as(keyCol))
    require(BucketedIndex.prunedRead(spark, memRoot, mv, ids, Seq(keyCol),
          numBuckets)
        .select(col(keyCol))
        .join(broadcast(ids.distinct()), Seq(keyCol), "left_semi").isEmpty,
      s"$context: batch ids already present in the stored index — the " +
        "feed must carry each id once (an id reused for different " +
        "content is an upsert, out of the append contract)")
  }
}
