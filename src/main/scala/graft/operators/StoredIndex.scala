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

  /** The CONTENT-table second screen of a two-table append's crash
    * window (r15 advice item 2): stores that commit a content table
    * BEFORE the members ledger ([[PqStore]] codes, [[SignLshStore]]
    * buckets) have a window where [[requireNewIds]] — which probes
    * members only — is blind to the half-appended ids, so the same
    * ids redelivered under a DIFFERENT tag would pass the guard and
    * land duplicate content rows permanently. The half-appended rows
    * sit in the delta's OWN content buckets (content keys are a pure
    * per-row function of the frozen artifacts, so a redelivered row
    * re-derives the SAME key), so one pruned probe of those buckets
    * catches them at delta-bucket cost. `deltaRows` carries the
    * delta's content-key columns (`keyCols`, the table's bucketing)
    * plus its id column `idCol`. A same-id row whose CONTENT changed
    * between the two deliveries hashes elsewhere and still slips —
    * an upsert misdelivered into a crash window, doubly outside the
    * append contract. Callers skip this screen when the content
    * table already carries their OWN tag (their own crash window —
    * the retry just completes the members commit).
    */
  def requireAbsentByContent(
      spark: SparkSession,
      root: String,
      deltaRows: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      numBuckets: Int,
      context: String): Unit = {
    val v = Manifest.currentVersion(root)
    if (v > 0) {
      val ids = deltaRows.select(col(idCol))
      require(BucketedIndex.prunedRead(spark, root, v,
            deltaRows.select(keyCols.map(deltaRows(_)): _*), keyCols,
            numBuckets)
          .select(col(idCol))
          .join(broadcast(ids.distinct()), Seq(idCol), "left_semi").isEmpty,
        s"$context: batch ids already present in the stored content " +
          "table but absent from the members ledger — a crash between " +
          "another tag's content and members commits left a half-applied " +
          "append; redeliver under the ORIGINAL tag to complete it " +
          "(this tag would land the content rows twice)")
    }
  }
}
