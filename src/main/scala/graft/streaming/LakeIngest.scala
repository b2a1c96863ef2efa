package graft.streaming

import graft.operators.Manifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC ingestion into a [[graft.operators.Manifest]] table
  * — the three legs (Structured Streaming, CDC MERGE, versioned
  * table format) wired end-to-end: a file-based change feed drains
  * through `foreachBatch`, each micro-batch applies as exactly ONE
  * atomic manifest commit (COW rewrite of the affected members plus
  * one appended member), and the member-name ledger makes redelivery
  * a no-op.
  *
  * Exactly-once without a transaction log sidecar: `foreachBatch` is
  * at-least-once, so each batch commits under the tag `b<batchId>`
  * and [[Manifest.tagApplied]] skips a batch whose tag is already in
  * the member list — the manifest itself is the ledger (the same
  * idea as Delta's `txn` action / Iceberg's snapshot `sequence`).
  * A crash BETWEEN data write and manifest publish leaves
  * unreferenced `b<id>-` dirs; `applyCdcBatch` garbage-collects
  * those before retrying, so every observable version is a complete
  * MERGE. Downstream readers pin versions and never see a torn
  * batch.
  *
  * Scale: per micro-batch cost is affected-files + batch-size (the
  * COW MERGE shape), state is zero (no watermarks — CDC feeds are
  * key-ordered by the upstream log, and within-batch collapse is the
  * caller's contract, as in [[graft.operators.Cdc]]).
  */
object LakeIngest {

  /** Stage `df` as ONE parquet file named `name` in `feedDir` with a
    * pinned mtime — the file source drains oldest-first, so staged
    * mtimes define the batch order (a test/fixture helper; real
    * deployments land feed files from the upstream log with natural
    * arrival times).
    */
  def stageBatchFile(
      feedDir: String,
      name: String,
      mtime: Long,
      df: DataFrame): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = s"$feedDir-stage-$name"
    // overwrite + clean up the stage dir afterwards: the stage path
    // is a SIBLING of feedDir, so a per-query scratch wipe doesn't
    // cover it — a second staging in the same process (ReproSpec
    // reruns, q478) must not trip PATH_ALREADY_EXISTS on leftovers
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    // Files.list / Files.walk hold a directory handle until closed —
    // unclosed they leak one fd per staging call across a long-lived
    // test JVM (r12 advice)
    var src: java.nio.file.Path = null
    scala.util.Using.resource(Files.list(Paths.get(tmp))) { stream =>
      val part = stream.iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) src = p
      }
    }
    Files.createDirectories(Paths.get(feedDir))
    val dst = Paths.get(feedDir, name)
    Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
    scala.util.Using.resource(Files.walk(Paths.get(tmp))) { stream =>
      val rest = stream.sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]()).iterator()
      while (rest.hasNext) Files.delete(rest.next())
    }
  }

  /** Drain every file currently in `feedDir` (one micro-batch per
    * feed file, in modification-time order — the upstream log's
    * delivery order) into the manifest table at `root`, committing
    * one version per non-no-op batch. Returns the final version.
    *
    * The feed schema is `keyCol`, `op` ∈ D/U/I, value columns; one
    * row per key PER FILE (the per-batch collapse contract).
    */
  def cdcFeedToManifest(
      spark: SparkSession,
      feedDir: String,
      checkpointDir: String,
      root: String,
      keyCol: String): Int = {
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch frames recompute per action; applyCdcBatch
        // runs several (uniqueness probe, snapshot semi-join, the
        // member rewrites) — persist once here
        val cached = batch.persist()
        try {
          val tag = s"b$batchId"
          // at-least-once delivery → ledger check makes it exactly-once
          if (!Manifest.tagApplied(root, tag)) {
            Manifest.applyCdcBatch(cached, root, keyCol, tag)
          }
          ()
        } finally { cached.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Manifest.currentVersion(root)
  }

  /** Drain a DELETE-KEY feed into merge-on-read delete files: each
    * non-empty micro-batch commits ONE equality-delete member
    * ([[Manifest.commitEqualityDelete]] — the key batch alone, no
    * data member probed or rewritten), named by the batch id so
    * at-least-once redelivery is a no-op (the same member-name
    * ledger [[cdcFeedToManifest]] uses). Readers following
    * [[Manifest.readMor]] see each delete as soon as its batch
    * commits; [[Manifest.compactDeletes]] settles the accumulated
    * debt offline. At 100 TB the streaming RTBF/CDC-delete queue
    * costs per key batch, never per table — the COW alternative
    * would rewrite affected members inside the micro-batch.
    */
  /** One auto-compaction decision of [[deleteFeedToMorAutoCompact]]:
    * the version the batch's delete commit produced, and — when the
    * debt threshold tripped — the version the mid-stream compaction
    * published.
    */
  final case class AutoCompactEvent(
      batchId: Long, deleteVersion: Int, compactedTo: Option[Int])

  /** [[deleteFeedToMor]] with MID-STREAM debt settlement — the full
    * streaming-maintenance loop (r10 verdict item 6): each micro-
    * batch commits its equality-delete file, and whenever the
    * accumulated MOR debt (count of live delete members) reaches
    * `maxDeleteDebt`, the drain triggers [[Manifest.compactDeletes]]
    * INSIDE the stream, folding the debt into rewritten data members
    * before the next batch lands. This is the knob production MOR
    * tables run on: unbounded debt makes every read pay the
    * anti-join stack; compacting every batch makes ingestion pay COW
    * prices — the threshold buys both cheap deletes and bounded read
    * amplification.
    *
    * Isolation across the boundary comes free from the manifest:
    * compaction ADDS a version (rewritten members + dropped delete
    * lines) and deletes nothing physical, so a reader pinned to any
    * pre-compaction version still resolves its exact member set —
    * `readMor` at that pin returns byte-identical rows before and
    * after the compaction commit (q421 emits both sides of that
    * equality; ManifestSpec pins it row-for-row).
    *
    * Returns the per-batch event log (driver-side, foreachBatch runs
    * on the driver) — metadata-sized, one row per feed file.
    */
  def deleteFeedToMorAutoCompact(
      spark: SparkSession,
      feedDir: String,
      checkpointDir: String,
      root: String,
      keyCol: String,
      maxDeleteDebt: Int): Seq[AutoCompactEvent] = {
    require(maxDeleteDebt >= 1,
      s"deleteFeedToMorAutoCompact: maxDeleteDebt=$maxDeleteDebt")
    val events = scala.collection.mutable.ArrayBuffer.empty[AutoCompactEvent]
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try {
          val tag = s"del-b$batchId"
          if (!Manifest.tagApplied(root, tag) &&
            cached.limit(1).count() > 0) {
            val dv = Manifest.commitEqualityDelete(
              cached.select(keyCol), root, s"$tag-keys", keyCol)
            val debt = Manifest.deleteMembers(root, dv).size
            val compacted =
              if (debt >= maxDeleteDebt)
                Some(Manifest.compactDeletes(spark, root, s"cmp-b$batchId"))
              else None
            events += AutoCompactEvent(batchId, dv, compacted)
          }
          ()
        } finally { cached.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    events.toSeq
  }

  def deleteFeedToMor(
      spark: SparkSession,
      feedDir: String,
      checkpointDir: String,
      root: String,
      keyCol: String): Int = {
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try {
          val tag = s"del-b$batchId"
          if (!Manifest.tagApplied(root, tag) &&
            cached.limit(1).count() > 0) {
            Manifest.commitEqualityDelete(
              cached.select(keyCol), root, s"$tag-keys", keyCol)
          }
          ()
        } finally { cached.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Manifest.currentVersion(root)
  }
}
