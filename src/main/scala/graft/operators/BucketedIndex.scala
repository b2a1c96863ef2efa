package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KEY-BUCKETED storage layout for persisted probe indexes — the
  * storage leg the incremental dedup/ANN family was missing (r13
  * verdict item 1): the repo's stored index tables (AllPairs
  * prefixes keyed by `t`, LSH buckets keyed by `(band, bucket)`,
  * Hamming chunks keyed by `(chunk, ckey)`) were written as one
  * member per commit, so every daily probe read the WHOLE index —
  * O(index) read IO per batch, O(batches · index) cumulative over a
  * drain, exactly the growth shape the compute side was reworked to
  * avoid.
  *
  * The fix is the Hive-bucketing idea applied at the [[Manifest]]
  * member grain:
  *
  *  - WRITE: [[commitBucketed]] hashes the join key into
  *    `numBuckets` buckets (`pmod(xxhash64(keys…), n)`) and lands
  *    each bucket as its OWN member file, tagged `part_kb:<b>` /
  *    `part_kbn:<n>` in the manifest line — ONE data pass
  *    (`partitionBy` staging + dir adoption, never a per-bucket
  *    rescan), ONE atomic commit.
  *  - READ: [[prunedRead]] hashes the DELTA's keys under the same
  *    function (a bounded ≤ numBuckets distinct-bucket collect) and
  *    unions ONLY members whose `kb` tag is in the delta's bucket
  *    set. A probe's index scan therefore follows the DELTA's key
  *    set, not the index size; at 100 TB a small batch's daily probe
  *    opens a handful of bucket files instead of the standing index.
  *
  * Correctness is layout-independent: pruning keeps every member
  * that COULD hold a delta key's bucket (same hash, same modulus —
  * no false negatives by construction), members without the tags or
  * written under a DIFFERENT `kbn` are conservatively kept (mixed
  * layouts and legacy states stay correct, just unpruned), and the
  * downstream equi-join still applies the exact key match to the
  * pruned union — pruning is an optimization, never the semantics
  * (the [[Manifest.prunedMembers]] rule). Maintenance preserves the
  * layout: [[Manifest.compactTiered]] groups by the tag set, so
  * compaction folds WITHIN buckets and the pruning survives.
  *
  * Key-column ORDER is part of the layout contract (the hash is over
  * the column tuple): writers record the column list as a `kc` tag
  * next to `kb`/`kbn`, readers state the same `keyCols` sequence,
  * and a `kbn` OR `kc` mismatch degrades to conservative reads
  * rather than wrong pruning — while [[upsertBucketed]] REFUSES a
  * mismatched `kc` loudly (a COW under different key columns than
  * the build would hash survivors elsewhere and leave stale rows in
  * untouched buckets silently; the PqStore codebook-tag lesson).
  * Members written before the tag existed carry no `kc` and are
  * accepted as-is (their callers owned the key mapping), documented
  * legacy behavior.
  */
object BucketedIndex {

  private def kcTag(keyCols: Seq[String]): String = keyCols.mkString(",")

  /** The ONE bucketed data pass every write-side op shares: hash
    * `df`'s key tuple into `__kb`, stage via `partitionBy`, rename
    * each bucket dir to `<nameTag>-b<bucket>` under `root/files`, and
    * return the adopted (name, tags) list for the caller's single
    * atomic commit. Empty buckets are simply absent (no empty
    * members).
    */
  private def stageAndAdopt(
      df: DataFrame,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int): Seq[(String, Map[String, String])] = {
    val staging = Paths.get(root, "files", s"$nameTag-staging")
    df.withColumn("__kb", bucketOf(numBuckets, keyCols.map(col): _*))
      .write.partitionBy("__kb").parquet(staging.toString)
    val adopted = graft.util.Fs.listChildren(staging)(
      _.filter(_.getFileName.toString.startsWith("__kb=")).toVector)
      .sortBy(_.getFileName.toString)
      .map { p =>
        val b = p.getFileName.toString.stripPrefix("__kb=")
        val name = s"$nameTag-b$b"
        Files.move(p, Paths.get(root, "files", name))
        (name, Map("kb" -> b, "kbn" -> numBuckets.toString,
          "kc" -> kcTag(keyCols)))
      }
    graft.util.Fs.deleteRecursively(staging)
    adopted
  }

  /** The bucket of a key tuple: `pmod(xxhash64(keys…), numBuckets)`
    * — deterministic across runs, partitionings, and engines that
    * share the xxhash64 seed.
    */
  def bucketOf(numBuckets: Int, keys: Column*): Column =
    pmod(xxhash64(keys: _*), lit(numBuckets.toLong))

  /** Commit `df` under `root` as one member PER KEY BUCKET, named
    * `<nameTag>-b<bucket>` and tagged for [[prunedRead]]. One data
    * pass: the bucketed split is a `partitionBy` staging write, the
    * bucket dirs rename into `root/files`, and ONE
    * [[Manifest.commitAdopt]] publishes them all atomically. Empty
    * buckets are simply absent (no empty members). Crash-safe the
    * [[Manifest.applyCdcBatch]] way: unreferenced `<nameTag>-` dirs
    * from an earlier crashed attempt are GC'd before writing, so a
    * redelivered commit retries cleanly ([[Manifest.tagApplied]] is
    * the caller's redelivery ledger — member names carry the tag).
    * Returns the new version.
    */
  def commitBucketed(
      df: DataFrame,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int): Int = {
    require(numBuckets >= 1, s"BucketedIndex: numBuckets=$numBuckets")
    require(keyCols.nonEmpty, "BucketedIndex: keyCols required")
    require(!df.columns.contains("__kb"),
      "BucketedIndex: input must not carry a __kb column")
    Manifest.recoverTag(root, nameTag)
    Manifest.commitAdopt(df.sparkSession, root,
      stageAndAdopt(df, root, nameTag, keyCols, numBuckets))
  }

  /** Keyed COW UPSERT that PRESERVES the bucketed layout — the write
    * leg an incrementally-MAINTAINED index table needs:
    * [[Manifest.upsert]]'s rewritten members carry no `kb`/`kbn`
    * tags, so one plain upsert would silently degrade every later
    * probe of this table to a conservative full scan. Key grain,
    * multi-row keys supported: every stored row whose `keyCols`
    * tuple appears in `updates` is replaced by the update's rows for
    * that tuple (delete-then-insert at the KEY grain — an updated
    * graph source swaps its whole adjacency list), untouched keys
    * survive.
    *
    * Physical shape: only the buckets the update keys hash into are
    * rewritten — each touched bucket's members fold into ONE new
    * member carrying the same tags (a bonus within-bucket
    * compaction), untouched buckets' members pass through VERBATIM
    * (same paths, same stats lines), and everything publishes as one
    * atomic version ([[Manifest.commitAdoptReplace]]). Rewrite IO is
    * bounded by the TOUCHED BUCKETS, never the table — the COW cost
    * a daily index fold repeats at 100 TB.
    *
    * Requires a FULLY bucketed table under exactly this layout: a
    * mixed layout (untagged or foreign-modulus members) cannot be
    * COW-rewritten at bucket grain without scanning every member, so
    * it fails loudly with the remedy instead of quietly paying
    * O(table). Crash-safe on retry: unreferenced `<nameTag>-` dirs
    * from a crashed attempt are GC'd before writing
    * ([[Manifest.recoverTag]]); `nameTag` is the caller's redelivery
    * ledger ([[Manifest.tagApplied]] — new members carry the tag).
    * Returns the new version.
    */
  def upsertBucketed(
      updates: DataFrame,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int): Int = {
    require(!updates.columns.contains("__kb"),
      "BucketedIndex: updates must not carry a __kb column")
    val upKeys = updates.select(keyCols.map(updates(_)): _*).distinct()
    cowBucketed(updates.sparkSession, root, nameTag, keyCols, numBuckets,
      touchedKeys = upKeys,
      // survivors (stored rows whose key is NOT updated; members hold
      // only their own bucket's rows, so every survivor re-hashes into
      // a touched bucket) plus the update rows
      replacement = rows => rows.join(upKeys, keyCols, "left_anti")
        .unionByName(updates))
  }

  /** [[upsertBucketed]] PLUS a keyed DELETE in the same atomic
    * version — the label-fold shape a DELETION batch needs
    * (r16: [[graft.streaming.StreamingClusters.deleteDocs]]): the
    * victims' rows leave, the relabeled survivors' rows land, and a
    * reader sees the whole transition or none of it — two separate
    * commits would expose a window where remaining members still
    * reference a cluster id whose doc row is already gone. Every
    * stored row whose `keyCols` tuple appears in `deleteKeys` is
    * dropped; `updates` keys are replaced as in [[upsertBucketed]]
    * (a key in both is simply replaced). Same layout requirements,
    * same touched-bucket-bounded IO (touched = the union of both key
    * sets' buckets), same premise, same crash discipline.
    */
  def upsertDeleteBucketed(
      updates: DataFrame,
      deleteKeys: DataFrame,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int): Int = {
    require(!updates.columns.contains("__kb"),
      "BucketedIndex: updates must not carry a __kb column")
    require(keyCols.forall(deleteKeys.columns.contains),
      s"BucketedIndex.upsertDeleteBucketed: deleteKeys " +
        s"(${deleteKeys.columns.mkString(",")}) must carry the key " +
        s"columns (${keyCols.mkString(",")})")
    val gone = updates.select(keyCols.map(updates(_)): _*)
      .unionByName(deleteKeys.select(keyCols.map(deleteKeys(_)): _*))
      .distinct()
    cowBucketed(updates.sparkSession, root, nameTag, keyCols, numBuckets,
      touchedKeys = gone,
      replacement = rows => rows.join(gone, keyCols, "left_anti")
        .unionByName(updates))
  }

  /** Keyed COW DELETE at the MATCH grain, layout-preserving — the
    * physical-removal leg of the stored-index lifecycle (r16): every
    * stored row IN THE VICTIMS' KEY BUCKETS whose `matchCols` tuple
    * appears in `victims` is dropped; everything else survives —
    * untouched buckets' members verbatim, touched buckets folded to
    * one rewritten member (or to ABSENCE when a bucket empties).
    * `victims` must carry `keyCols` (they route the rewrite to the
    * victims' buckets) AND `matchCols` (the row-identity anti-join —
    * a finer grain than the bucketing is fine: the prefix table
    * deletes (t, id) rows from `t`-keyed buckets, the codes table
    * deletes by `id` inside `ivf_list` buckets). NOTE the bucket
    * scope: a matching row OUTSIDE the victims' key buckets is NOT
    * deleted — when `matchCols` don't determine `keyCols`, the caller
    * owns proving the victims' stated keys are the stored ones
    * ([[PqStore.deleteDelta]]'s routing check is the pattern). Same
    * layout requirements, touched-bucket-bounded IO, premise, and
    * crash discipline as [[upsertBucketed]]. A victim matching
    * nothing deletes nothing — idempotent on a crash-window retry
    * (deletion ledgers are the caller's, same as upserts).
    */
  def deleteBucketed(
      victims: DataFrame,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int,
      matchCols: Seq[String]): Int = {
    require(matchCols.nonEmpty &&
      (keyCols ++ matchCols).forall(victims.columns.contains),
      s"BucketedIndex.deleteBucketed: victims " +
        s"(${victims.columns.mkString(",")}) must carry the key columns " +
        s"(${keyCols.mkString(",")}) and the match columns " +
        s"(${matchCols.mkString(",")})")
    val vm = victims.select(matchCols.map(victims(_)): _*).distinct()
    cowBucketed(victims.sparkSession, root, nameTag, keyCols, numBuckets,
      touchedKeys = victims.select(keyCols.map(victims(_)): _*),
      replacement = rows => rows.join(vm, matchCols, "left_anti"))
  }

  /** The shared COW rewrite core ([[upsertBucketed]] /
    * [[upsertDeleteBucketed]] / [[deleteBucketed]]): validate the
    * fully-bucketed layout, derive the touched buckets from
    * `touchedKeys` (a bounded ≤ numBuckets distinct collect,
    * metadata-scale), rewrite exactly those buckets' rows through
    * `replacement` in ONE staged `partitionBy` pass, and publish
    * atomically under the head premise (re-validated inside the CAS
    * retry — see [[upsertPremise]]).
    */
  private def cowBucketed(
      spark: SparkSession,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int,
      touchedKeys: DataFrame,
      replacement: DataFrame => DataFrame): Int = {
    require(numBuckets >= 1, s"BucketedIndex: numBuckets=$numBuckets")
    require(keyCols.nonEmpty, "BucketedIndex: keyCols required")
    val v = Manifest.currentVersion(root)
    require(v > 0, s"BucketedIndex.upsertBucketed: $root is uninitialized " +
      "— commitBucketed a base layout first")
    val members = Manifest.memberPartitions(root, v)
    val bad = members.filterNot { case (_, tags) =>
      tags.get("kbn").contains(numBuckets.toString) && tags.contains("kb")
    }
    require(bad.isEmpty,
      s"BucketedIndex.upsertBucketed: $root v$v holds members outside " +
        s"the (${keyCols.mkString(",")}, $numBuckets) bucketing " +
        s"(${bad.map(_._1).mkString(", ")}) — a bucket-grain COW cannot " +
        "bound its rewrite on a mixed layout; rewrite the table with " +
        "commitBucketed first")
    // the key COLUMNS are part of the layout, not just the modulus: a
    // COW stated under different keys would hash survivors elsewhere
    // and never delete updated keys from non-touched buckets — stale
    // duplicates plus false-negative pruning, both silent. Members
    // written before the kc tag existed are accepted (legacy).
    val badKc = members.filter { case (_, tags) =>
      tags.get("kc").exists(_ != kcTag(keyCols))
    }
    require(badKc.isEmpty,
      s"BucketedIndex.upsertBucketed: $root v$v was bucketed on key " +
        s"columns (${badKc.flatMap(_._2.get("kc")).distinct.mkString("; ")}) " +
        s"but this upsert states (${kcTag(keyCols)}) — a COW under " +
        "different key columns corrupts the table silently; state the " +
        "build's key columns or rewrite with commitBucketed")
    Manifest.recoverTag(root, nameTag)
    // the touched buckets: where the rewrite's keys hash
    val kbs = bucketsOf(touchedKeys, keyCols, numBuckets)
    val touched = members.collect {
      case (p, tags) if kbs.contains(tags("kb")) => p
    }
    val touchedRows =
      if (touched.isEmpty) Manifest.read(spark, root, v).limit(0)
      else spark.read.parquet(touched: _*)
    // the touched buckets' new content in ONE staged partitionBy
    // pass, adopted per bucket (the commitBucketed write shape)
    val adopted = stageAndAdopt(replacement(touchedRows), root, nameTag,
      keyCols, numBuckets)
    // publish premise, re-validated INSIDE the CAS retry: the rewrite
    // above was computed against v's members, so a CONCURRENT commit
    // that landed a member in a touched bucket between the snapshot
    // and the publish would leave that member's affected-key rows
    // unfolded — silent stale rows the slot-level CAS cannot see (it
    // only re-validates that replaced members still exist). Mirror
    // compactTiered: every head member carrying a touched kb must be
    // one this commit replaces, or the premise died.
    Manifest.commitAdoptReplace(spark, root, adopted, touched,
      premise = upsertPremise(root, nameTag, kbs, numBuckets,
        kcTag(keyCols), members.map(_._1).toSet, touched.toSet))
  }

  /** The head premise a COW upsert publishes under (re-validated
    * inside the CAS retry — see [[upsertBucketed]]): every member
    * the head GAINED since this upsert's snapshot must (a) be fully
    * self-describing under exactly this upsert's layout — an
    * untagged, foreign-modulus, or foreign-/missing-`kc` newcomer
    * can hold updated keys in ANY bucket, voiding the merge just
    * like a touched-bucket addition (r15 advice item 3: the
    * snapshot's mixed-layout check cannot see concurrent arrivals) —
    * and (b) not carry a TOUCHED bucket's `kb` (a conforming
    * newcomer's rows hash only into its own bucket, so an untouched-
    * bucket newcomer is genuinely safe). Snapshot members are exempt
    * from (a): they already passed the pre-merge layout checks,
    * including the documented legacy tolerance for kc-untagged
    * members, and the touched ones are all in `replaced`. Exposed at
    * object scope so the spec can pin the race window directly (a
    * deterministic interleaving of two writers is not constructible
    * in-process).
    */
  private[operators] def upsertPremise(
      root: String,
      nameTag: String,
      kbs: Set[String],
      numBuckets: Int,
      kc: String,
      snapshot: Set[String],
      replaced: Set[String]): Seq[(String, Map[String, String])] => Unit =
    head => {
      val gained = head.filterNot(m => snapshot.contains(m._1))
      val mixed = gained.collect {
        case (p, tags) if !(tags.contains("kb") &&
          tags.get("kbn").contains(numBuckets.toString) &&
          tags.get("kc").contains(kc)) => p
      }
      if (mixed.nonEmpty)
        // IllegalState, not ConcurrentModification: the PREMISE died,
        // not the slot — commitWithRetry must propagate, not respin
        throw new IllegalStateException(
          s"BucketedIndex.upsertBucketed($nameTag): $root gained members " +
            s"outside the ($kc, $numBuckets) bucketing since this " +
            s"upsert's snapshot (${mixed.mkString(", ")}) — a COW premise " +
            "is only valid over a fully self-describing layout; re-run " +
            "the upsert against the new head")
      val foreign = head.collect {
        case (p, tags) if kbs.contains(tags.getOrElse("kb", "")) &&
          !replaced.contains(p) => p
      }
      if (foreign.nonEmpty)
        throw new IllegalStateException(
          s"BucketedIndex.upsertBucketed($nameTag): touched buckets of " +
            s"$root gained members since this upsert's snapshot " +
            s"(${foreign.mkString(", ")}) — the merge no longer covers " +
            "them; re-run the upsert against the new head")
    }

  /** REBUCKET the whole table under a new modulus (or new key
    * columns) in ONE atomic version — the layout-maintenance op the
    * bucket-count constant needs at scale: per-probe IO is
    * O(touched buckets × table / numBuckets), so a table that
    * outgrew its build-time modulus re-buckets once instead of
    * paying ever-fatter bucket files on every probe. One staged
    * `partitionBy` data pass over the current snapshot; every
    * current member (bucketed, legacy-untagged, foreign-modulus —
    * rebucketing is how mixed layouts HEAL) is replaced by the new
    * bucket members; pinned readers keep the old files (the
    * commitReplace retention rule). Probes against the old version
    * stay correct throughout; probes against the new version prune
    * under the new modulus immediately (the `kbn`/`kc` tags make the
    * layout self-describing, so readers need no coordination).
    * Crash-safe on retry ([[Manifest.recoverTag]]; `nameTag` is the
    * redelivery ledger via [[Manifest.tagApplied]]). Returns the new
    * version.
    */
  def rebucket(
      spark: SparkSession,
      root: String,
      nameTag: String,
      keyCols: Seq[String],
      numBuckets: Int): Int = {
    require(numBuckets >= 1, s"BucketedIndex: numBuckets=$numBuckets")
    require(keyCols.nonEmpty, "BucketedIndex: keyCols required")
    if (Manifest.tagApplied(root, nameTag)) return Manifest.currentVersion(root)
    val v = Manifest.currentVersion(root)
    require(v > 0, s"BucketedIndex.rebucket: $root is uninitialized")
    val replaced = Manifest.members(root, v)
    Manifest.recoverTag(root, nameTag)
    val adopted = stageAndAdopt(Manifest.read(spark, root, v), root,
      nameTag, keyCols, numBuckets)
    // premise: the snapshot this rewrite read must still BE the head
    // (any concurrent commit's rows would be silently dropped by the
    // full replace) — commitAdoptReplace's replaced-must-exist check
    // covers removals; this covers additions
    Manifest.commitAdoptReplace(spark, root, adopted, replaced,
      premise = head => {
        val extra = head.map(_._1).filterNot(replaced.toSet)
        if (extra.nonEmpty)
          throw new IllegalStateException(
            s"BucketedIndex.rebucket($nameTag): $root gained members since " +
              s"this rewrite's snapshot (${extra.mkString(", ")}) — the " +
              "full replace would drop their rows; re-run against the new head")
      })
  }

  /** Member paths of `version` a probe with DELTA keys must read:
    * members whose `kb` tag is in the delta's bucket set, plus —
    * conservatively — every member without the tags or bucketed
    * under a different `kbn`. `deltaKeys` carries exactly `keyCols`
    * (same columns, same order as the write); the distinct-bucket
    * collect is bounded by `numBuckets`, metadata-scale.
    */
  def prunedMemberPaths(
      root: String,
      version: Int,
      deltaKeys: DataFrame,
      keyCols: Seq[String],
      numBuckets: Int): Seq[String] =
    prunedMemberPathsByBuckets(root, version,
      bucketsOf(deltaKeys, keyCols, numBuckets), keyCols, numBuckets)

  /** The delta's occupied bucket set under the layout's hash — a
    * bounded ≤ `numBuckets` distinct collect, metadata-scale.
    * `deltaKeys` carries exactly `keyCols` (same columns, same order
    * as the write).
    */
  def bucketsOf(
      deltaKeys: DataFrame,
      keyCols: Seq[String],
      numBuckets: Int): Set[String] =
    deltaKeys
      .select(bucketOf(numBuckets, keyCols.map(deltaKeys(_)): _*).as("__kb"))
      .distinct().collect().map(_.getLong(0).toString).toSet

  /** [[prunedMemberPaths]] from an ALREADY-COMPUTED bucket set — the
    * second hop of a secondary-index lookup ([[LabelStore]]), where
    * the bucket set comes from stored index entries rather than from
    * hashing delta keys. Same conservatism: members without the
    * layout tags, under a different modulus, or recorded under
    * different KEY COLUMNS (`kc` tag — a foreign key mapping's `kb`
    * values mean nothing here) are always read.
    */
  def prunedMemberPathsByBuckets(
      root: String,
      version: Int,
      kbs: Set[String],
      keyCols: Seq[String],
      numBuckets: Int): Seq[String] =
    Manifest.memberPartitions(root, version).filter { case (_, tags) =>
      (tags.get("kb"), tags.get("kbn")) match {
        case (Some(b), Some(n)) if n == numBuckets.toString &&
          tags.get("kc").forall(_ == kcTag(keyCols)) => kbs.contains(b)
        case _ => true // untagged / other bucketing / other keys → must read
      }
    }.map(_._1)

  /** The pruned snapshot a delta probe joins against: the union of
    * [[prunedMemberPaths]] — a SUPERSET of every index row whose key
    * matches a delta key, restricted to the delta's bucket files.
    * An empty path set (empty delta) returns the version's schema
    * with zero rows, so downstream joins stay resolvable.
    */
  def prunedRead(
      spark: SparkSession,
      root: String,
      version: Int,
      deltaKeys: DataFrame,
      keyCols: Seq[String],
      numBuckets: Int): DataFrame = {
    val paths = prunedMemberPaths(root, version, deltaKeys, keyCols, numBuckets)
    if (paths.isEmpty) Manifest.read(spark, root, version).limit(0)
    else spark.read.parquet(paths: _*)
  }

  /** [[prunedRead]] from an already-computed bucket set (see
    * [[prunedMemberPathsByBuckets]]). */
  def prunedReadByBuckets(
      spark: SparkSession,
      root: String,
      version: Int,
      kbs: Set[String],
      keyCols: Seq[String],
      numBuckets: Int): DataFrame = {
    val paths = prunedMemberPathsByBuckets(root, version, kbs, keyCols,
      numBuckets)
    if (paths.isEmpty) Manifest.read(spark, root, version).limit(0)
    else spark.read.parquet(paths: _*)
  }
}
