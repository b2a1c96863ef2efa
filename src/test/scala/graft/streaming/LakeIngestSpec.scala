package graft.streaming

import graft.TestSpark
import graft.operators.Manifest
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end contract of the streaming CDC → manifest ingest:
  * one atomic commit per micro-batch in feed order, and redelivery
  * (a second drain over the same feed with a fresh checkpoint —
  * at-least-once's worst case) is a version no-op because the
  * manifest's member names are the batch ledger.
  */
class LakeIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stage(feedDir: String, name: String, mtime: Long,
      df: DataFrame): Unit =
    LakeIngest.stageBatchFile(feedDir, name, mtime, df)

  test("drains one commit per batch in feed order; redelivery is a no-op") {
    val root = TestSpark.tmpDir("lakeingest").toString
    val table = s"$root/table"; val feed = s"$root/feed"
    Manifest.commitAdd(
      (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      table, "base")

    // b0: update ids 0-4; b1: delete ids 0-1 (overwriting b0's update
    // — order matters), insert id 100
    stage(feed, "b0.parquet", 1000000L,
      (0 until 5).map(i => (i.toLong, "U", "u")).toDF("id", "op", "payload"))
    stage(feed, "b1.parquet", 2000000L,
      (Seq((0L, "D", "x"), (1L, "D", "x"), (100L, "I", "new")))
        .toDF("id", "op", "payload"))

    val v = LakeIngest.cdcFeedToManifest(
      spark, feed, s"$root/ckpt1", table, "id")
    assert(v == 3, s"one commit per batch over the base: expected v3, got v$v")

    val expected = ((2 until 5).map(i => (i.toLong, "u")) ++
      (5 until 20).map(i => (i.toLong, s"v$i")) :+ ((100L, "new"))).toSet
    assert(Manifest.read(spark, table, v)
      .as[(Long, String)].collect().toSet == expected)

    // redelivery: same feed, FRESH checkpoint → both batches re-fire,
    // the ledger skips both, nothing publishes
    val v2 = LakeIngest.cdcFeedToManifest(
      spark, feed, s"$root/ckpt2", table, "id")
    assert(v2 == 3, s"redelivered batches must not publish, got v$v2")
    assert(Manifest.read(spark, table, 3)
      .as[(Long, String)].collect().toSet == expected)

    // and a RESUMED checkpoint doesn't even re-fire the batches
    val v3 = LakeIngest.cdcFeedToManifest(
      spark, feed, s"$root/ckpt1", table, "id")
    assert(v3 == 3)
  }

  test("auto-compact settles MOR debt mid-stream; pinned readers are row-identical across the boundary") {
    val root = TestSpark.tmpDir("lakeautocompact").toString
    val table = s"$root/table"; val feed = s"$root/feed"
    Manifest.commitAdd(
      (0 until 15).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      table, "base-a")
    Manifest.commitAdd(
      (15 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      table, "base-b")

    stage(feed, "k0.parquet", 1000000L, Seq(0L, 20L).toDF("id"))
    stage(feed, "k1.parquet", 2000000L, Seq(1L, 21L).toDF("id"))
    stage(feed, "k2.parquet", 3000000L, Seq(2L, 22L).toDF("id"))

    val events = LakeIngest.deleteFeedToMorAutoCompact(
      spark, feed, s"$root/ckpt", table, "id", maxDeleteDebt = 2)
    // debt threshold 2 → the second delete commit trips compaction;
    // the third leaves one delete member outstanding
    assert(events.map(_.compactedTo.isDefined) == Seq(false, true, false),
      events.toString)
    val midPin = events(1).deleteVersion // deletes k0+k1, pre-compaction
    val compacted = events(1).compactedTo.get

    // ISOLATION across the boundary: the pinned pre-compaction MOR
    // read and the compacted read are the same rows, row for row —
    // compaction may rewrite members, never meanings
    def rows(v: Int): Set[(Long, String)] =
      Manifest.readMor(spark, table, v).as[(Long, String)].collect().toSet
    val mid = rows(midPin)
    assert(mid == rows(compacted),
      "pinned pre-compaction read diverged from the compacted snapshot")
    assert(mid == (0 until 30).map(i => (i.toLong, s"v$i")).toSet --
      Set((0L, "v0"), (1L, "v1"), (20L, "v20"), (21L, "v21")),
      s"mid-state rows wrong: $mid")

    // final state: k2's delete member is still outstanding MOR debt
    val head = Manifest.currentVersion(table)
    assert(Manifest.deleteMembers(table, head).size == 1)
    assert(rows(head) == (0 until 30).map(i => (i.toLong, s"v$i")).toSet --
      Set((0L, "v0"), (1L, "v1"), (2L, "v2"), (20L, "v20"), (21L, "v21"),
        (22L, "v22")))
  }
}
