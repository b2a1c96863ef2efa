package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table ATOMIC transactions over [[Manifest]] tables — the
  * lakehouse leg single-table formats famously lack (Iceberg/Delta
  * commit one table at a time; a reader joining two tables can see
  * table A's new commit paired with table B's old one). A
  * transaction record pins a CONSISTENT set of (table root →
  * version) pairs and publishes with the same temp-file +
  * hard-link COMPARE-AND-SWAP slot claim as manifests, so readers
  * that resolve table versions THROUGH a transaction id can never
  * observe a torn cross-table state, and concurrent committers can
  * never silently overwrite each other's records, no matter how the
  * underlying per-table commits interleave with the read.
  *
  * Protocol (mirrors multi-table transaction coordinators layered on
  * snapshot tables): writers commit each table normally (those
  * versions are staged but invisible to txn readers), then publish
  * ONE txn record naming every table's version. A crash between
  * table commits leaks only unreferenced versions — vacuum-able,
  * never readable through the log. The log is metadata-sized: one
  * tiny file per transaction, consulted once per read.
  *
  * Scale: resolution cost is O(tables in the txn), independent of
  * data size; reads delegate to [[Manifest.read]]'s pinned snapshot
  * path, so all skipping/stat machinery still applies per table.
  */
object Txn {

  private def txnsDir(root: String): Path = Paths.get(root, "txns")

  private def txnPath(root: String, id: Int): Path =
    txnsDir(root).resolve(s"t$id.json")

  /** Latest published transaction id, 0 when none. */
  def current(root: String): Int = {
    val dir = txnsDir(root)
    if (!Files.isDirectory(dir)) 0
    else graft.util.Fs.listChildren(dir) { it =>
      var best = 0
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("t") && n.endsWith(".json"))
          try best = math.max(best, n.stripPrefix("t").stripSuffix(".json").toInt)
          catch { case _: NumberFormatException => }
      }
      best
    }
  }

  /** Publish `pins` (table root → manifest version) as the next
    * transaction. Every pinned version must already be published in
    * its table — a txn can never reference an unreadable snapshot.
    * Returns the new txn id.
    *
    * Slot claims are COMPARE-AND-SWAP, mirroring `Manifest.publish`:
    * the record is written to a writer-unique temp file and
    * hard-linked (`link(2)`, atomic-fail-if-exists) to the id slot —
    * a plain rename would silently REPLACE a concurrently published
    * record, losing that transaction (the exact lost-update class
    * the manifest CAS closes, in the component whose whole contract
    * is atomicity). Unlike a manifest commit, a txn record's CONTENT
    * is head-independent (it pins explicit versions, not a member
    * list computed against a head), so losing a slot race is retried
    * internally with the next free id — liveness for free, with a
    * loud ConcurrentModificationException only if contention outlasts
    * the attempt bound.
    */
  def commit(root: String, pins: Map[String, Int]): Int = {
    require(pins.nonEmpty, "Txn: empty transaction")
    pins.foreach { case (t, v) =>
      require(v >= 1 && Manifest.currentVersion(t) >= v,
        s"Txn: cannot pin unpublished version $v of $t")
    }
    val dir = txnsDir(root)
    Files.createDirectories(dir)
    val body = pins.toSeq.sortBy(_._1)
      .map { case (t, v) => s"""{"table":"$t","version":$v}""" }
      .mkString("\n")
    val tmp = dir.resolve(s".txn.tmp-${ProcessHandle.current().pid()}" +
      s"-${Thread.currentThread().getId}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try {
      var attempt = 0
      var claimed = -1
      while (claimed < 0) {
        val next = current(root) + 1
        try {
          try {
            Files.createLink(txnPath(root, next), tmp)
            claimed = next
          } catch {
            case _: UnsupportedOperationException =>
              // no hard links on this filesystem: rename fallback
              // (atomic visibility, WITHOUT the exclusive-claim race
              // guarantee; test filesystems are always POSIX)
              Files.move(tmp, txnPath(root, next),
                StandardCopyOption.ATOMIC_MOVE)
              claimed = next
          }
        } catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            attempt += 1
            if (attempt >= 10) throw new java.util.ConcurrentModificationException(
              s"Txn: could not claim a slot in $root after $attempt " +
                s"attempts (last contested: t$next) — contention outlasted " +
                "the retry bound")
        }
      }
      claimed
    } finally Files.deleteIfExists(tmp)
  }

  /** The (table root → version) pins of a published transaction. */
  def pins(root: String, id: Int): Map[String, Int] = {
    val p = txnPath(root, id)
    require(Files.exists(p), s"Txn: transaction $id not published in $root")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split('\n').filter(_.nonEmpty).map { line =>
        val t = {
          val k = """"table":""""
          val i = line.indexOf(k) + k.length
          line.substring(i, line.indexOf('"', i))
        }
        val v = {
          val k = """"version":"""
          val i = line.indexOf(k) + k.length
          line.substring(i, line.indexOf('}', i)).trim.toInt
        }
        t -> v
      }.toMap
  }

  /** Snapshot read of `table` AS OF transaction `id` — the only read
    * path that guarantees cross-table consistency with every other
    * table read through the same id.
    */
  def readAt(
      spark: SparkSession, root: String, id: Int, table: String): DataFrame = {
    val pin = pins(root, id).getOrElse(table,
      throw new IllegalArgumentException(
        s"Txn: transaction $id does not pin $table"))
    Manifest.read(spark, table, pin)
  }
}
