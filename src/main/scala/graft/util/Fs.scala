package graft.util

import java.nio.file.{Files, Path}

/** Closing wrappers for java.nio directory streams. `Files.list` /
  * `Files.walk` hold an OPEN DIRECTORY HANDLE until the stream is
  * closed; the iterate-and-forget idiom leaks one fd per call, and a
  * long-lived JVM (the single-JVM test suite, a streaming driver
  * calling `Manifest.currentVersion` per batch) accumulates them by
  * the thousand until GC finalizers run — the r13 hygiene sweep
  * generalizing the r12 stageBatchFile advice item.
  */
object Fs {

  /** Fold the direct children of `dir` through `f`; the underlying
    * stream closes before returning.
    */
  def listChildren[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      f(new Iterator[Path] {
        def hasNext: Boolean = it.hasNext
        def next(): Path = it.next()
      })
    } finally s.close()
  }

  /** Delete `p` recursively (children before parents — the
    * reverse-lexicographic order every call site hand-rolled); no-op
    * when absent. The walk is MATERIALIZED and its stream closed
    * before any deletion, so the directory handle never races its
    * own removal. Deletion is `deleteIfExists` per entry — the call
    * sites this replaced tolerated an entry vanishing between walk
    * and delete (a shutdown hook racing another JVM's scratch wipe),
    * and that race tolerance is part of the contract.
    */
  def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      val it = s.iterator()
      while (it.hasNext) buf += it.next()
    } finally s.close()
    buf.sorted(Ordering.comparatorToOrdering(
      java.util.Comparator.reverseOrder[Path]()))
      .foreach(Files.deleteIfExists(_))
  }
}
