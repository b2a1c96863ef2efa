package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pinned table format — the reusable time-travel +
  * maintenance-with-isolation primitive grown out of q363's snapshot
  * read (round-9 verdict item 6). The missing lakehouse leg was not
  * time travel (q363 had that) but COMPACTION UNDER ISOLATION: a
  * maintenance rewrite must never disturb a reader pinned to an
  * older version.
  *
  * Layout under `root`:
  * {{{
  *   files/<name>/...parquet     data files — written once, NEVER
  *                               mutated or deleted by any commit
  *   manifests/v<N>.json         one JSON object per line:
  *                               {"path": "<files/... dir>"}
  * }}}
  *
  * Commit protocol (the Iceberg/Delta discipline at its smallest):
  *  1. write the NEW data files completely;
  *  2. render the next manifest to a temp file;
  *  3. publish with an ATOMIC rename to `v<N+1>.json`.
  * Manifests are immutable once published and data files are
  * append-only, so a reader that pinned version k sees exactly vk's
  * file set forever — a concurrent add or replace commit creates new
  * files and a new manifest but touches nothing vk references. No
  * directory listing on the read path: the manifest IS the file set,
  * so there are no torn reads from in-flight writes and the listing
  * cost of a 100 TB table is one bounded metadata fetch.
  *
  * `commitReplace` is the compaction op: it swaps a set of member
  * files for their rewritten union in ONE new version. The replaced
  * files stay on disk (pinned readers may still need them) — real
  * deployments garbage-collect them only after every pin older than
  * the replace has expired.
  */
object Manifest {

  private def manifestsDir(root: String): Path = Paths.get(root, "manifests")

  private def manifestPath(root: String, version: Int): Path =
    manifestsDir(root).resolve(s"v$version.json")

  /** Highest published version, 0 if the table has no commits. The
    * listing is manifest-count-sized (metadata, never data).
    */
  def currentVersion(root: String): Int = {
    val dir = manifestsDir(root)
    if (!Files.isDirectory(dir)) 0
    else {
      val vs = Files.list(dir).iterator()
      var best = 0
      while (vs.hasNext) {
        val n = vs.next().getFileName.toString
        if (n.startsWith("v") && n.endsWith(".json"))
          try best = math.max(best, n.stripPrefix("v").stripSuffix(".json").toInt)
          catch { case _: NumberFormatException => }
      }
      best
    }
  }

  /** Member file list of a published version — bounded, manifest-sized. */
  def members(root: String, version: Int): Seq[String] = {
    val p = manifestPath(root, version)
    require(Files.exists(p), s"Manifest: version $version not published under $root")
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(p, StandardCharsets.UTF_8)).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        // one {"path": "..."} object per line; extracted without a
        // JSON library dependency (the writer below is the only
        // producer, so the shape is fixed)
        val i = line.indexOf("\"path\":\"") + 8
        line.substring(i, line.indexOf('"', i))
      }
  }

  /** Pinned snapshot read: unions EXACTLY `version`'s files. */
  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    val ms = members(root, version)
    require(ms.nonEmpty, s"Manifest: version $version of $root is empty")
    spark.read.parquet(ms: _*)
  }

  /** Publish `paths` as the next version via temp-file + atomic
    * rename — a reader can never observe a half-written manifest.
    */
  private def publish(root: String, paths: Seq[String]): Int = {
    val dir = manifestsDir(root)
    Files.createDirectories(dir)
    val next = currentVersion(root) + 1
    val body = paths.map(p => s"""{"path":"$p"}""").mkString("\n")
    val tmp = dir.resolve(s".v$next.json.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try
      Files.move(tmp, manifestPath(root, next),
        StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        // non-POSIX fallback; still a rename, just without the
        // atomicity guarantee (test filesystems are always POSIX)
        Files.move(tmp, manifestPath(root, next),
          StandardCopyOption.REPLACE_EXISTING)
    }
    next
  }

  /** ADD commit: write `df` as a new member directory and publish
    * previous members + the new one. Returns the new version.
    */
  def commitAdd(df: DataFrame, root: String, name: String): Int = {
    val target = s"$root/files/$name"
    df.write.mode("errorifexists").parquet(target)
    val prev = currentVersion(root)
    val base = if (prev == 0) Seq.empty else members(root, prev)
    require(!base.contains(target),
      s"Manifest: $target is already a member of v$prev")
    publish(root, base :+ target)
  }

  /** REPLACE commit (compaction / rewrite): `df` must be the exact
    * rewritten union of `replaced` members; the new version drops
    * `replaced`, keeps every other member, and appends the rewrite.
    * The replaced files are NOT deleted — pinned readers own them
    * until their pins expire. Returns the new version.
    */
  def commitReplace(
      df: DataFrame,
      root: String,
      replaced: Seq[String],
      name: String): Int = {
    val prev = currentVersion(root)
    require(prev > 0, s"Manifest: cannot replace in an empty table $root")
    val base = members(root, prev)
    val missing = replaced.filterNot(base.contains)
    require(missing.isEmpty,
      s"Manifest: replace targets not in v$prev: ${missing.mkString(", ")}")
    require(replaced.nonEmpty, "Manifest: nothing to replace")
    val target = s"$root/files/$name"
    df.write.mode("errorifexists").parquet(target)
    publish(root, base.filterNot(replaced.contains) :+ target)
  }
}
