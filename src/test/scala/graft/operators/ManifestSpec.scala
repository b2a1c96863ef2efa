package graft.operators

import java.nio.file.{Files, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract checks for the manifest table format, centered on the
  * property the operator exists for (r9 verdict item 6): a reader
  * pinned to an old version is UNAFFECTED by a concurrent replace
  * (compaction) commit — the rewrite adds files and a manifest,
  * touching nothing the pin references.
  */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-manifest-$tag")
    p.toString
  }

  private def frame(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")

  test("add commits accumulate: version k reads exactly commits 1..k") {
    val root = freshRoot("add")
    assert(Manifest.currentVersion(root) == 0)
    assert(Manifest.commitAdd(frame(0 until 10), root, "a") == 1)
    assert(Manifest.commitAdd(frame(10 until 25), root, "b") == 2)
    assert(Manifest.commitAdd(frame(25 until 30), root, "c") == 3)
    assert(Manifest.currentVersion(root) == 3)
    assert(Manifest.read(spark, root, 1).as[(Long, String)].collect().toSet
      == (0 until 10).map(i => (i.toLong, s"v$i")).toSet)
    assert(Manifest.read(spark, root, 2).count() == 25)
    assert(Manifest.read(spark, root, 3).count() == 30)
    assert(Manifest.members(root, 3).size == 3)
  }

  test("a pinned reader is unaffected by a concurrent replace commit") {
    val root = freshRoot("isolate")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    Manifest.commitAdd(frame(20 until 40), root, "c")
    val pin = 3
    val before = Manifest.read(spark, root, pin)
      .as[(Long, String)].collect().toSet
    val manifestBytes = Files.readAllBytes(
      Paths.get(root, "manifests", s"v$pin.json"))

    // compaction: rewrite a+b into one file, publish as replace
    val small = Seq(s"$root/files/a", s"$root/files/b")
    val v4 = Manifest.commitReplace(
      spark.read.parquet(small: _*), root, small, "ab")
    assert(v4 == 4)

    // the pin, materialized AFTER the rewrite, sees the OLD file set
    val after = Manifest.read(spark, root, pin)
      .as[(Long, String)].collect().toSet
    assert(after == before, "pinned read changed across a replace commit")
    // the pinned manifest is byte-identical (immutability, not luck)
    assert(java.util.Arrays.equals(manifestBytes,
      Files.readAllBytes(Paths.get(root, "manifests", s"v$pin.json"))))
    // replaced data files still exist — the pin owns them
    assert(Files.exists(Paths.get(root, "files", "a")))
    assert(Files.exists(Paths.get(root, "files", "b")))

    // the new version: same rows, fewer members, from the new file
    assert(Manifest.read(spark, root, v4)
      .as[(Long, String)].collect().toSet == before)
    assert(Manifest.members(root, v4).size == 2)
    val srcFiles = Manifest.read(spark, root, v4)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(srcFiles.forall(f => !f.contains("/files/a/") &&
      !f.contains("/files/b/")), srcFiles.mkString(", "))
  }

  test("replace validates its targets loudly") {
    val root = freshRoot("validate")
    intercept[IllegalArgumentException] {
      Manifest.commitReplace(frame(0 until 1), root, Seq("x"), "y")
    }
    Manifest.commitAdd(frame(0 until 5), root, "a")
    val e = intercept[IllegalArgumentException] {
      Manifest.commitReplace(frame(0 until 5), root,
        Seq(s"$root/files/nope"), "y")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    intercept[IllegalArgumentException] {
      Manifest.commitReplace(frame(0 until 5), root, Seq.empty, "y")
    }
  }

  test("a duplicate member name fails before publishing") {
    val root = freshRoot("dup")
    Manifest.commitAdd(frame(0 until 5), root, "a")
    intercept[Exception] { // parquet errorifexists refuses the write
      Manifest.commitAdd(frame(5 until 9), root, "a")
    }
    assert(Manifest.currentVersion(root) == 1, "failed add must not publish")
  }

  test("deleteWhere rewrites ONLY affected members and removes exactly the matches") {
    val root = freshRoot("delete")
    Manifest.commitAdd(frame(0 until 10), root, "a")   // ids 0-9
    Manifest.commitAdd(frame(10 until 20), root, "b")  // ids 10-19
    Manifest.commitAdd(frame(20 until 30), root, "c")  // ids 20-29
    // predicate hits members a and c, never b
    val v = Manifest.deleteWhere(spark, root,
      col("id") < 3 || col("id") >= 27, "del")
    assert(v == 4)
    val ms = Manifest.members(root, v)
    assert(ms.contains(s"$root/files/b"), "untouched member must survive")
    assert(!ms.contains(s"$root/files/a") && !ms.contains(s"$root/files/c"))
    assert(Manifest.read(spark, root, v).select("id").as[Long].collect().toSet
      == (3L until 27L).toSet)
    // pinned pre-delete version still reads everything
    assert(Manifest.read(spark, root, 3).count() == 30)
    // a no-match predicate publishes nothing
    assert(Manifest.deleteWhere(spark, root, col("id") === 999L, "del2") == v)
  }

  test("idempotentAppend lands each key once and no-ops on redelivery") {
    val root = freshRoot("idem")
    assert(Manifest.idempotentAppend(frame(0 until 10), root, "b0", "id") == 1)
    // overlapping batch: only 10-14 are new
    assert(Manifest.idempotentAppend(frame(5 until 15), root, "b1", "id") == 2)
    assert(Manifest.read(spark, root, 2).select("id").as[Long].collect().toSet
      == (0L until 15L).toSet)
    // full redelivery: no publish, version unchanged
    assert(Manifest.idempotentAppend(frame(0 until 15), root, "b2", "id") == 2)
    assert(Manifest.currentVersion(root) == 2)
  }

  test("stats pruning keeps exactly the intersecting members and survives later commits") {
    val root = freshRoot("stats")
    Manifest.commitAdd(frame(0 until 10), root, "a", Seq("id"))
    Manifest.commitAdd(frame(10 until 20), root, "b", Seq("id"))
    Manifest.commitAdd(frame(20 until 30), root, "c", Seq("id"))
    assert(Manifest.prunedMembers(root, 3, "id", 12, 14)
      == Seq(s"$root/files/b"))
    assert(Manifest.prunedMembers(root, 3, "id", 9, 10).toSet
      == Set(s"$root/files/a", s"$root/files/b")) // boundary inclusive
    assert(Manifest.prunedMembers(root, 3, "id", 100, 200).isEmpty)
    // an un-statted column prunes nothing (conservative)
    assert(Manifest.prunedMembers(root, 3, "payload", 0, 0).size == 3)
    // stats survive a later commit that keeps the member…
    Manifest.commitAdd(frame(30 until 35), root, "d") // no stats
    assert(Manifest.prunedMembers(root, 4, "id", 12, 14).toSet
      == Set(s"$root/files/b", s"$root/files/d")) // d: no stats → kept
    // …and a replace keeps the UNTOUCHED members' stats while the
    // rewrite itself is conservatively unpruned
    val v5 = Manifest.commitReplace(
      spark.read.parquet(s"$root/files/a"), root, Seq(s"$root/files/a"), "a2")
    assert(Manifest.prunedMembers(root, v5, "id", 12, 14).toSet
      == Set(s"$root/files/b", s"$root/files/d", s"$root/files/a2"))
  }

  test("diff classifies inserted/deleted/changed with null-safe compare") {
    val root = freshRoot("diff")
    val v1rows = Seq((1L, Option("x")), (2L, Option("y")),
      (3L, Option.empty[String]))
    Manifest.commitAdd(v1rows.toDF("id", "payload"), root, "a")
    // v2: id 2 changed, id 3 unchanged (null == null), id 4 inserted,
    // id 1 deleted
    val small = Seq(s"$root/files/a")
    val v2rows = Seq((2L, Option("Y")), (3L, Option.empty[String]),
      (4L, Option("z")))
    Manifest.commitReplace(v2rows.toDF("id", "payload"), root, small, "b")
    val got = Manifest.diff(spark, root, 1, 2, "id", Seq("payload"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, "deleted", Some("x")),   // FROM-side values for deletes
      (2L, "changed", Some("Y")),   // TO-side values for changes
      (4L, "inserted", Some("z"))), got.toString)
  }

  test("applyCdcBatch applies the full MERGE matrix in one atomic version") {
    val root = freshRoot("cdc")
    Manifest.commitAdd(frame(0 until 10), root, "a")   // ids 0-9
    Manifest.commitAdd(frame(10 until 20), root, "b")  // ids 10-19
    val changes = Seq(
      (1L, "D", "x"),      // matched D   → deleted
      (11L, "U", "upd"),   // matched U   → replaced
      (5L, "I", "re"),     // matched I   → treated as U (idempotent upsert)
      (50L, "I", "new"),   // orphan  I   → inserted
      (99L, "U", "x"),     // orphan  U   → no-op
      (98L, "D", "x")      // orphan  D   → no-op
    ).toDF("id", "op", "payload")
    val v = Manifest.applyCdcBatch(changes, root, "id", "t1")
    assert(v == 3)
    val expected = ((0 until 20).toSet - 1)
      .map(i => (i.toLong, s"v$i")) - ((5L, "v5")) - ((11L, "v11")) +
      ((5L, "re")) + ((11L, "upd")) + ((50L, "new"))
    assert(Manifest.read(spark, root, v)
      .as[(Long, String)].collect().toSet == expected)
    // both members held changed keys → both rewrote, one appended member
    assert(Manifest.members(root, v).toSet == Set(
      s"$root/files/t1-r0", s"$root/files/t1-r1", s"$root/files/t1-new"))
    // the pinned pre-MERGE version is untouched
    assert(Manifest.read(spark, root, 2).count() == 20)
    // ledger: the tag is applied; a verbatim re-apply is refused loudly
    assert(Manifest.tagApplied(root, "t1"))
    assert(!Manifest.tagApplied(root, "t2"))
    intercept[IllegalArgumentException] {
      Manifest.applyCdcBatch(changes, root, "id", "t1")
    }
  }

  test("applyCdcBatch rewrites ONLY members holding changed keys") {
    val root = freshRoot("cdc-cow")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    val changes = Seq((2L, "D", "x"), (3L, "U", "u3"))
      .toDF("id", "op", "payload")
    val v = Manifest.applyCdcBatch(changes, root, "id", "t1")
    val ms = Manifest.members(root, v)
    assert(ms.contains(s"$root/files/b"), "untouched member must survive")
    assert(!ms.contains(s"$root/files/a"))
    assert(Manifest.read(spark, root, v).count() == 19)
  }

  test("an all-orphan batch publishes nothing") {
    val root = freshRoot("cdc-noop")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    val orphans = Seq((50L, "U", "x"), (51L, "D", "x"))
      .toDF("id", "op", "payload")
    assert(Manifest.applyCdcBatch(orphans, root, "id", "t1") == 1)
    assert(Manifest.currentVersion(root) == 1)
    assert(!Manifest.tagApplied(root, "t1"))
  }

  test("applyCdcBatch enforces one change row per key loudly") {
    val root = freshRoot("cdc-dup")
    Manifest.commitAdd(frame(0 until 5), root, "a")
    val dup = Seq((1L, "U", "x"), (1L, "D", "y")).toDF("id", "op", "payload")
    val e = intercept[IllegalArgumentException] {
      Manifest.applyCdcBatch(dup, root, "id", "t1")
    }
    assert(e.getMessage.contains("collapse"), e.getMessage)
  }

  test("a crashed attempt's unreferenced tag dirs are recovered on retry") {
    val root = freshRoot("cdc-crash")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    // simulate a crash between data write and manifest publish:
    // the tag dir exists but no manifest references it
    val orphanDir = Paths.get(root, "files", "t1-new")
    Files.createDirectories(orphanDir)
    Files.write(orphanDir.resolve("stray.parquet"), Array[Byte](1, 2, 3))
    val changes = Seq((0L, "U", "u0"), (30L, "I", "new"))
      .toDF("id", "op", "payload")
    val v = Manifest.applyCdcBatch(changes, root, "id", "t1")
    assert(v == 2)
    assert(Manifest.read(spark, root, v)
      .as[(Long, String)].collect().toSet ==
      ((1 until 10).map(i => (i.toLong, s"v$i")).toSet
        + ((0L, "u0")) + ((30L, "new"))))
  }

  test("upsert replaces existing keys and inserts new ones") {
    val root = freshRoot("upsert")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    val v = Manifest.upsert(
      Seq((3L, "U3"), (42L, "U42")).toDF("id", "payload"),
      root, "id", "u1")
    assert(v == 2)
    assert(Manifest.read(spark, root, v)
      .as[(Long, String)].collect().toSet ==
      ((0 until 10).toSet - 3).map(i => (i.toLong, s"v$i"))
        + ((3L, "U3")) + ((42L, "U42")))
    // an op column in the updates is refused (that's applyCdcBatch's API)
    intercept[IllegalArgumentException] {
      Manifest.upsert(Seq((1L, "x", "U")).toDF("id", "payload", "op"),
        root, "id", "u2")
    }
  }

  test("partition tags prune by equality; untagged members are conservatively read") {
    val root = freshRoot("part")
    Manifest.commitAdd(frame(0 until 5), root, "pa",
      partition = Map("lang" -> "en"))
    Manifest.commitAdd(frame(5 until 9), root, "pb",
      partition = Map("lang" -> "de"))
    Manifest.commitAdd(frame(9 until 12), root, "pc") // untagged
    assert(Manifest.prunedMembersByPartition(root, 3, "lang", "de").toSet
      == Set(s"$root/files/pb", s"$root/files/pc"))
    assert(Manifest.prunedMembersByPartition(root, 3, "lang", "en").toSet
      == Set(s"$root/files/pa", s"$root/files/pc"))
    // an unknown key prunes nothing (every member lacks the tag)
    assert(Manifest.prunedMembersByPartition(root, 3, "nope", "x").size == 3)
    // partition tags coexist with min/max stats on the same member
    Manifest.commitAdd(frame(12 until 20), root, "pd",
      statsCols = Seq("id"), partition = Map("lang" -> "de"))
    assert(Manifest.prunedMembersByPartition(root, 4, "lang", "de").toSet
      == Set(s"$root/files/pb", s"$root/files/pc", s"$root/files/pd"))
    assert(Manifest.prunedMembers(root, 4, "id", 13, 14).toSet
      == Set(s"$root/files/pa", s"$root/files/pb", s"$root/files/pc",
        s"$root/files/pd")) // only pd has stats; others conservatively kept
  }

  test("diffBoth carries both row images — group moves are expressible") {
    val root = freshRoot("diffboth")
    Manifest.commitAdd(Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L))
      .toDF("id", "grp", "x"), root, "a")
    // v2: id 2 moves de→en with a new value, id 3 deleted, id 4 inserted
    Manifest.commitReplace(
      Seq((1L, "en", 10L), (2L, "en", 25L), (4L, "fr", 40L))
        .toDF("id", "grp", "x"),
      root, Seq(s"$root/files/a"), "b")
    val got = Manifest.diffBoth(spark, root, 1, 2, "id", Seq("grp", "x"))
      .as[(Long, String, Option[String], Option[Long],
        Option[String], Option[Long])].collect().toSet
    assert(got == Set(
      (2L, "changed", Some("de"), Some(20L), Some("en"), Some(25L)),
      (3L, "deleted", Some("en"), Some(30L), None, None),
      (4L, "inserted", None, None, Some("fr"), Some(40L))), got.toString)
    // the one-sided feed loses the old group — diffBoth is why IVM
    // under group moves needs both images
    val oneSided = Manifest.diff(spark, root, 1, 2, "id", Seq("grp", "x"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(oneSided.contains((2L, "changed", "en", 25L)))
  }

  test("bloom sidecars: no false negatives, real skipping, conservative fallbacks") {
    val root = freshRoot("bloom")
    // interleaved split: min/max stats are useless, blooms are not
    val all = (0 until 300).map(_.toLong)
    def part(r: Int) = all.filter(_ % 3 == r).map(i => (i, s"v$i"))
      .toDF("id", "payload")
    (0 until 3).foreach(r => Manifest.commitAdd(part(r), root, s"c$r",
      statsCols = Seq("id"), bloomCols = Seq("id")))
    // every member's [min,max] covers interior keys → stats keep all 3
    assert(Manifest.prunedMembers(root, 3, "id", 150, 150).size == 3)
    // no false negatives: every present key keeps its true member
    for (k <- 0L until 300L by 17L) {
      val pruned = Manifest.prunedMembersByKey(root, 3, "id", k)
      assert(pruned.contains(s"$root/files/c${k % 3}"),
        s"false negative for key $k")
    }
    // real skipping: across present keys, some prune below 3 members
    // (FP rate ~1%/member — deterministic build, so this is stable)
    val sizes = (0L until 300L by 7L).map(k =>
      Manifest.prunedMembersByKey(root, 3, "id", k).size)
    assert(sizes.exists(_ < 3), s"bloom pruning never skipped: $sizes")
    // absent keys mostly prune to zero members
    val absent = (10000L until 10050L).map(k =>
      Manifest.prunedMembersByKey(root, 3, "id", k).size)
    assert(absent.count(_ == 0) > 40, s"absent-key pruning weak: $absent")
    // un-bloomed column and lost sidecar are conservatively read
    assert(Manifest.prunedMembersByKey(root, 3, "payload", 1L).size == 3)
    Files.delete(Paths.get(root, "blooms", "c0-id.bloom"))
    val lost = Manifest.prunedMembersByKey(root, 3, "id", 0L)
    assert(lost.contains(s"$root/files/c0"), "lost sidecar must be kept")
  }

  test("vacuum GCs orphan members' bloom sidecars with them") {
    val root = freshRoot("bloomvac")
    Manifest.commitAdd(frame(0 until 10), root, "a", bloomCols = Seq("id"))
    Manifest.commitAdd(frame(10 until 20), root, "b", bloomCols = Seq("id"))
    val small = Seq(s"$root/files/a", s"$root/files/b")
    Manifest.commitReplace(spark.read.parquet(small: _*), root, small, "ab")
    Manifest.commitAdd(frame(20 until 25), root, "c")
    Manifest.vacuum(root, keepVersions = 2)
    assert(!Files.exists(Paths.get(root, "blooms", "a-id.bloom")))
    assert(!Files.exists(Paths.get(root, "blooms", "b-id.bloom")))
  }

  test("applyCdcBatch works after vacuum (expired manifests are skipped, not read)") {
    val root = freshRoot("cdc-vac")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    Manifest.vacuum(root, keepVersions = 1) // v1 expired, manifest gone
    val v = Manifest.applyCdcBatch(
      Seq((0L, "U", "u0")).toDF("id", "op", "payload"), root, "id", "t1")
    assert(v == 3)
    assert(Manifest.read(spark, root, v)
      .as[(Long, String)].collect().toSet ==
      ((1 until 20).map(i => (i.toLong, s"v$i")).toSet + ((0L, "u0"))))
  }

  test("vacuum deletes only files no retained version references") {
    val root = freshRoot("vacuum")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    val small = Seq(s"$root/files/a", s"$root/files/b")
    Manifest.commitReplace(spark.read.parquet(small: _*), root, small, "ab")
    Manifest.commitAdd(frame(20 until 25), root, "c")   // head v4
    val (expired, deleted) = Manifest.vacuum(root, keepVersions = 2)
    assert(expired == Seq(1, 2), expired.toString)
    // a and b are only referenced by expired v1/v2 → deleted; ab/c live
    assert(deleted.toSet == small.toSet, deleted.toString)
    assert(!Files.exists(Paths.get(root, "files", "a")))
    assert(Files.exists(Paths.get(root, "files", "ab")))
    // retained versions still read bit-identically
    assert(Manifest.read(spark, root, 3).count() == 20)
    assert(Manifest.read(spark, root, 4).count() == 25)
    // expired pins are gone loudly, not silently empty — and the
    // error NAMES the cause (r10 verdict item 7: a vacuumed pin must
    // be distinguishable from a version that never existed)
    val e = intercept[IllegalStateException] { Manifest.read(spark, root, 1) }
    assert(e.getMessage.contains("VACUUMED"), e.getMessage)
  }

  test("refs: atomic swing, head-isolation, loud on unpublished targets") {
    val root = freshRoot("refs")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    assert(Manifest.refVersion(root, "main").isEmpty)
    Manifest.setRef(root, "main", 2)
    assert(Manifest.refVersion(root, "main").contains(2))
    // staging commits advance the head but never the ref
    Manifest.commitAdd(frame(20 until 30), root, "c")
    assert(Manifest.currentVersion(root) == 3)
    assert(Manifest.readRef(spark, root, "main").count() == 20)
    // publish = one atomic swing; readers now see the audited commit
    Manifest.setRef(root, "main", 3)
    assert(Manifest.readRef(spark, root, "main").count() == 30)
    // a ref can never dangle
    intercept[IllegalArgumentException] { Manifest.setRef(root, "x", 99) }
    intercept[IllegalArgumentException] { Manifest.readRef(spark, root, "x") }
  }

  test("vacuum pins ref'd versions past the retention window") {
    val root = freshRoot("refs-vacuum")
    Manifest.commitAdd(frame(0 until 10), root, "a")   // v1 — ref'd
    Manifest.setRef(root, "old", 1)
    Manifest.commitAdd(frame(10 until 20), root, "b")  // v2
    Manifest.commitAdd(frame(20 until 25), root, "c")  // v3 head
    val (expired, deleted) = Manifest.vacuum(root, keepVersions = 1)
    // v1 is outside the window but pinned by the ref; v2 expires
    assert(expired == Seq(2), expired.toString)
    assert(!deleted.contains(s"$root/files/a"), deleted.toString)
    assert(Manifest.readRef(spark, root, "old").count() == 10)
    val e = intercept[IllegalStateException] { Manifest.read(spark, root, 2) }
    assert(e.getMessage.contains("VACUUMED"), e.getMessage)
  }

  test("MOR equality delete: key-batch commit, anti-join read, no rewrite") {
    val root = freshRoot("mor")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    val dataPre = Manifest.dataMembers(root, 2)
    val v = Manifest.commitEqualityDelete(
      Seq(3L, 7L, 15L, 999L).toDF("id"), root, "d1", "id")
    assert(v == 3)
    // the commit wrote ONLY the delete file — data members untouched
    assert(Manifest.dataMembers(root, v) == dataPre)
    assert(Manifest.deleteMembers(root, v) == Seq((s"$root/files/d1", "id")))
    // MOR read subtracts the keys; the orphan key 999 is a no-op
    assert(Manifest.readMor(spark, root, v).select("id").as[Long]
      .collect().toSet == ((0L until 20L).toSet -- Set(3L, 7L, 15L)))
    // a second delete batch stacks (debt accumulates across commits)
    val v2 = Manifest.commitEqualityDelete(
      Seq(0L, 3L).toDF("id"), root, "d2", "id")
    assert(Manifest.readMor(spark, root, v2).select("id").as[Long]
      .collect().toSet == ((1L until 20L).toSet -- Set(3L, 7L, 15L)))
    // the pre-delete pin still reads everything via MOR semantics too
    assert(Manifest.readMor(spark, root, 2).count() == 20)
  }

  test("equality deletes respect commit sequence: a re-added key lives") {
    val root = freshRoot("mor-seq")
    Manifest.commitAdd(frame(0 until 10), root, "a")        // seq 1
    Manifest.commitEqualityDelete(
      Seq(3L, 4L).toDF("id"), root, "d1", "id")             // seq 2
    // key 3 re-added AFTER the delete — the delete is older than this
    // member, so it must NOT apply (the Iceberg v2 sequence rule)
    Manifest.commitAdd(frame(3 until 4), root, "b")         // seq 3
    val v = Manifest.currentVersion(root)
    assert(Manifest.readMor(spark, root, v).select("id").as[Long]
      .collect().toSet == ((0L until 10L).toSet - 4L),
      "re-added key must survive an older delete")
    // compaction must preserve exactly that view
    val vs = Manifest.compactDeletes(spark, root, "settle")
    assert(Manifest.read(spark, root, vs).select("id").as[Long]
      .collect().toSet == ((0L until 10L).toSet - 4L))
    // and a NEW delete (younger than everything) kills it again
    Manifest.commitEqualityDelete(Seq(3L).toDF("id"), root, "d2", "id")
    assert(Manifest.readMor(spark, root, Manifest.currentVersion(root))
      .select("id").as[Long].collect().toSet
      == ((0L until 10L).toSet -- Set(3L, 4L)))
  }

  test("compactDeletes folds the debt, drops delete members, leaves pins intact") {
    val root = freshRoot("mor-compact")
    Manifest.commitAdd(frame(0 until 10), root, "a")   // affected
    Manifest.commitAdd(frame(10 until 20), root, "b")  // NOT affected
    Manifest.commitAdd(frame(20 until 30), root, "c")  // affected
    val vDebt = Manifest.commitEqualityDelete(
      Seq(1L, 2L, 25L).toDF("id"), root, "d1", "id")
    val vSettled = Manifest.compactDeletes(spark, root, "settle")
    assert(vSettled == vDebt + 1)
    // delete debt cleared; untouched member survives by reference
    assert(Manifest.deleteMembers(root, vSettled).isEmpty)
    val ms = Manifest.members(root, vSettled)
    assert(ms.contains(s"$root/files/b"), "unaffected member must survive")
    assert(!ms.contains(s"$root/files/a") && !ms.contains(s"$root/files/c"))
    // settled plain read ≡ debt MOR read
    val want = (0L until 30L).toSet -- Set(1L, 2L, 25L)
    assert(Manifest.read(spark, root, vSettled).select("id").as[Long]
      .collect().toSet == want)
    assert(Manifest.readMor(spark, root, vDebt).select("id").as[Long]
      .collect().toSet == want)
    // the debt pin still sees its full pre-delete data files
    assert(Manifest.dataMembers(root, vDebt)
      .forall(p => Files.exists(Paths.get(p))))
    // no debt → no-op, version does not advance
    assert(Manifest.compactDeletes(spark, root, "settle2") == vSettled)
    // vacuum after compaction GCs the delete file with the old versions
    Manifest.vacuum(root, keepVersions = 1)
    assert(!Files.exists(Paths.get(root, "files", "d1")))
    assert(Manifest.read(spark, root, vSettled).count() == 27)
  }

  test("metadataRowCounts answers COUNT(*) from the manifest alone, with partition tags") {
    val root = freshRoot("meta-count")
    Manifest.commitAdd(frame(0 until 10), root, "a",
      partition = Map("grp" -> "x"))
    Manifest.commitAdd(frame(10 until 25), root, "b",
      partition = Map("grp" -> "y"))
    Manifest.commitAdd(frame(25 until 30), root, "c") // untagged
    val v = Manifest.currentVersion(root)
    val got = Manifest.metadataRowCounts(root, v)
      .map { case (p, tags, n) => (p.split('/').last, tags, n) }.toSet
    assert(got == Set(
      ("a", Map("grp" -> "x"), 10L),
      ("b", Map("grp" -> "y"), 15L),
      ("c", Map.empty[String, String], 5L)), got.toString)
    assert(got.toSeq.map(_._3).sum == Manifest.read(spark, root, v).count())
  }

  test("rows stats stay exact through COW delete, CDC, and compaction; MOR debt fails loudly") {
    val root = freshRoot("meta-count-writers")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 20), root, "b")
    // COW delete rewrites member a — its rewrite must carry fresh rows
    Manifest.deleteWhere(spark, root, col("id") < 3, "del")
    def total(v: Int) =
      Manifest.metadataRowCounts(root, v).map(_._3).sum
    assert(total(Manifest.currentVersion(root)) == 17)
    // CDC batch: update 2 keys, insert 1, delete 1 → 16 rows... then
    // verify metadata total tracks the real count exactly
    val ch = Seq((5L, "nv5", "U"), (99L, "v99", "I"), (15L, "", "D"))
      .toDF("id", "payload", "op")
    Manifest.applyCdcBatch(ch, root, "id", "cdc1")
    val vCdc = Manifest.currentVersion(root)
    assert(total(vCdc) == Manifest.read(spark, root, vCdc).count())
    // MOR delete debt → metadata counts would overcount → loud
    val vDebt = Manifest.commitEqualityDelete(
      Seq(7L).toDF("id"), root, "d1", "id")
    val e = intercept[IllegalArgumentException] {
      Manifest.metadataRowCounts(root, vDebt)
    }
    assert(e.getMessage.contains("delete debt"))
    // compaction settles the debt; counts are metadata-answerable again
    val vSettled = Manifest.compactDeletes(spark, root, "settle")
    assert(total(vSettled) == Manifest.read(spark, root, vSettled).count())
  }

  test("mergeBranch applies clean changes, reports conflicts, and the policy flips them") {
    def setup(tag: String): (String, String) = {
      val root = freshRoot(tag)
      val mainT = s"$root/m"; val brT = s"$root/b"
      Manifest.commitAdd(frame(0 until 10), mainT, "base")
      Manifest.commitAdd(frame(0 until 10), brT, "base")
      Manifest.applyCdcBatch(
        Seq((1L, "m1", "U"), (2L, "", "D"), (5L, "same5", "U"))
          .toDF("id", "payload", "op"), mainT, "id", "m2")
      Manifest.applyCdcBatch(
        Seq((1L, "b1", "U"), (2L, "b2", "U"), (5L, "same5", "U"),
          (7L, "b7", "U"), (99L, "v99", "I"), (3L, "", "D"))
          .toDF("id", "payload", "op"), brT, "id", "b2")
      (mainT, brT)
    }
    val (m1, b1) = setup("mrg-main")
    val (v, confl) = Manifest.mergeBranch(
      spark, m1, 1, b1, 1, "id", Seq("payload"), "mrg")
    val got = Manifest.read(spark, m1, v)
      .as[(Long, String)].collect().toMap
    // clean: 7 edited, 99 inserted, 3 deleted; converged: 5 (same
    // image both sides); conflicts (main wins): 1 keeps m1, 2 stays
    // deleted
    val want = (0 until 10).map(i => i.toLong -> s"v$i").toMap ++
      Map(1L -> "m1", 5L -> "same5", 7L -> "b7", 99L -> "v99") --
      Seq(2L, 3L)
    assert(got == want, got.toString)
    val cs = confl.select("id", "branch_change", "main_change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cs == Set((1L, "changed", "changed"),
      (2L, "changed", "deleted")), cs.toString)
    // branch-wins on a fresh pair: conflicted keys take the branch
    // image — including RESURRECTING the key main deleted
    val (m2, b2) = setup("mrg-bw")
    val (v2, c2) = Manifest.mergeBranch(
      spark, m2, 1, b2, 1, "id", Seq("payload"), "mrg",
      branchWins = true)
    val got2 = Manifest.read(spark, m2, v2)
      .as[(Long, String)].collect().toMap
    assert(got2 == want ++ Map(1L -> "b1", 2L -> "b2"), got2.toString)
    assert(c2.count() == 2) // same conflicts, different resolution
  }

  test("readEvolved unions schema generations; COW delete rewrites each under its own schema") {
    val root = freshRoot("evolve")
    Manifest.commitAdd(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload"), root, "g1")
    Manifest.commitAdd(
      Seq((10L, "x", 100L), (11L, "y", 200L)).toDF("id", "payload", "extra"),
      root, "g2")
    val v2 = Manifest.currentVersion(root)
    val got = Manifest.readEvolved(spark, root, v2)
    assert(got.columns.sorted.toSeq == Seq("extra", "id", "payload"))
    assert(got.filter(col("extra").isNull).count() == 3,
      "pre-evolution rows must surface NULL in the added column")
    // a COW delete hitting BOTH generations rewrites each member
    // under its own schema
    val v3 = Manifest.deleteWhere(spark, root, col("id") % 10 === 1, "del")
    val after = Manifest.readEvolved(spark, root, v3)
    assert(after.select("id").as[Long].collect().toSet == Set(2L, 3L, 10L))
    // the pinned pre-delete snapshot is unaffected
    assert(Manifest.readEvolved(spark, root, v2).count() == 5)
  }

  test("concurrent committers ALL land (CAS safety + commitWithRetry liveness)") {
    import scala.jdk.CollectionConverters._
    for (attempt <- 1 to 4) {
      val root = freshRoot(s"race$attempt")
      Manifest.commitAdd(frame(0 until 5), root, "base")
      val latch = new java.util.concurrent.CountDownLatch(1)
      val results =
        new java.util.concurrent.ConcurrentLinkedQueue[(String, Either[Throwable, Int])]()
      val writers = Seq("w1" -> (10 until 15), "w2" -> (20 until 25)).map {
        case (name, range) =>
          new Thread(() => {
            latch.await()
            try results.add(name -> Right(
              Manifest.commitAdd(frame(range), root, name)))
            catch { case e: Throwable => results.add(name -> Left(e)) }
          })
      }
      writers.foreach(_.start()); latch.countDown(); writers.foreach(_.join())
      val rs = results.asScala.toMap
      // r10 proved SAFETY (the loser fails loudly instead of erasing
      // the winner); commitAdd's CAS retry adds LIVENESS: the loser
      // recomputes against the winner's head and lands too — a race
      // now yields TWO commits, zero exceptions
      val losers = rs.collect { case (n, Left(e)) => (n, e) }
      assert(losers.isEmpty,
        "every committer must land via retry: " +
          losers.map { case (n, e) => s"$n: $e" }.mkString("; "))
      val winners = rs.collect { case (n, Right(v)) => (n, v) }
      assert(winners.size == 2 && winners.values.toSet.size == 2,
        s"both writers claim DISTINCT versions: $winners")
      val head = Manifest.currentVersion(root)
      assert(head == 3, s"head $head after base + two racing commits")
      val ms = Manifest.members(root, head).map(_.split('/').last).toSet
      assert(ms == Set("base", "w1", "w2"),
        s"head manifest must reference every commit's member: $ms")
      // every writer's data is readable at head — nothing was erased
      assert(Manifest.read(spark, root, head).count() == 15L)
    }
  }

  test("rollbackTo republishes an old member list; history stays readable") {
    val root = freshRoot("rollback")
    Manifest.commitAdd(frame(0 until 5), root, "a")
    Manifest.commitAdd(frame(5 until 8), root, "b")
    Manifest.commitAdd(frame(100 until 110), root, "oops")
    val v = Manifest.rollbackTo(root, 2)
    assert(v == 4, "restore is a NEW commit, not history rewriting")
    assert(Manifest.members(root, 4) == Manifest.members(root, 2))
    assert(Manifest.read(spark, root, 4).count() == 8)
    // the bad version remains pinned and auditable
    assert(Manifest.read(spark, root, 3).count() == 18)
    // ingestion resumes on the restored line
    Manifest.commitAdd(frame(8 until 10), root, "c")
    assert(Manifest.read(spark, root, 5)
      .select("id").as[Long].collect().toSet == (0L until 10L).toSet)
    intercept[IllegalArgumentException] { Manifest.rollbackTo(root, 99) }
  }

  test("vacuum after rollback keeps the restored files, GCs the bad version's") {
    val root = freshRoot("rollback-vacuum")
    Manifest.commitAdd(frame(0 until 5), root, "a")     // v1
    Manifest.commitAdd(frame(100 until 120), root, "oops") // v2 (bad)
    Manifest.rollbackTo(root, 1)                        // v3 == v1's members
    Manifest.commitAdd(frame(5 until 9), root, "b")     // v4 head
    val (expired, deleted) = Manifest.vacuum(root, keepVersions = 2)
    // v1 and v2 expire; member `a` survives (v3/v4 reference it),
    // the bad commit's member is now truly orphaned and GC'd
    assert(expired.toSet == Set(1, 2), expired.toString)
    assert(deleted.exists(_.endsWith("/oops")), deleted.toString)
    assert(!deleted.exists(_.endsWith("/a")), deleted.toString)
    assert(Manifest.read(spark, root, 4)
      .select("id").as[Long].collect().toSet == (0L until 9L).toSet)
    val e = intercept[IllegalStateException] { Manifest.read(spark, root, 2) }
    assert(e.getMessage.contains("VACUUMED"), e.getMessage)
  }

  test("addedRows reads exactly the delta members; loud on rewritten history") {
    val root = freshRoot("added")
    Manifest.commitAdd(frame(0 until 10), root, "a")
    Manifest.commitAdd(frame(10 until 15), root, "b")
    Manifest.commitAdd(frame(15 until 18), root, "c")
    assert(Manifest.addedRows(spark, root, 1, 3)
      .select("id").as[Long].collect().toSet == (10L until 18L).toSet)
    val empty = Manifest.addedRows(spark, root, 2, 2)
    assert(empty.isEmpty)
    // an empty delta still carries the table schema — column
    // references (e.g. an IVM join on the delta) must resolve
    assert(empty.columns.sorted.toSeq == Seq("id", "payload"),
      s"empty delta lost the member schema: ${empty.columns.toSeq}")
    // a COW rewrite breaks append-only history → loud, never wrong
    Manifest.deleteWhere(spark, root, col("id") === 4, "del")
    val v4 = Manifest.currentVersion(root)
    val e = intercept[IllegalArgumentException] {
      Manifest.addedRows(spark, root, 1, v4)
    }
    assert(e.getMessage.contains("not append-only"))
    // from AFTER the rewrite, history is append-only again
    Manifest.commitAdd(frame(18 until 20), root, "d")
    assert(Manifest.addedRows(spark, root, v4, v4 + 1)
      .select("id").as[Long].collect().toSet == Set(18L, 19L))
  }

  test("mergeBranch equals the git-semantics fold on random divergent feeds (both policies)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // base keys 0..30; edits (U/D) restricted to live base keys;
    // inserts share the 100..106 range on BOTH sides so I/I
    // convergence and I/I conflicts both occur
    val caseGen = for {
      nSnap <- Gen.chooseNum(1, 25)
      snap <- Gen.listOfN(nSnap, for {
        k <- Gen.chooseNum(0L, 30L); v <- Gen.chooseNum(-50L, 50L)
      } yield (k, v))
      mEd <- Gen.listOfN(15, for {
        k <- Gen.chooseNum(0L, 30L); op <- Gen.oneOf("U", "D")
        v <- Gen.chooseNum(-50L, 50L)
      } yield (k, op, v))
      mIn <- Gen.listOfN(4, for {
        k <- Gen.chooseNum(100L, 106L); v <- Gen.chooseNum(-50L, 50L)
      } yield (k, "I", v))
      bEd <- Gen.listOfN(15, for {
        k <- Gen.chooseNum(0L, 30L); op <- Gen.oneOf("U", "D")
        v <- Gen.chooseNum(-50L, 50L)
      } yield (k, op, v))
      bIn <- Gen.listOfN(4, for {
        k <- Gen.chooseNum(100L, 106L); v <- Gen.chooseNum(-50L, 50L)
      } yield (k, "I", v))
    } yield {
      val s = snap.distinctBy(_._1)
      val keys = s.map(_._1).toSet
      (s, (mEd.filter(o => keys(o._1)) ++ mIn).distinctBy(_._1),
        (bEd.filter(o => keys(o._1)) ++ bIn).distinctBy(_._1))
    }
    def applyOps(st: Map[Long, Long],
        ops: Seq[(Long, String, Long)]): Map[Long, Long] =
      ops.foldLeft(st) {
        case (m, (k, "D", _)) => m - k
        case (m, (k, _, v))   => m + (k -> v)
      }
    for (seed <- 1L to 6L; branchWins <- Seq(false, true)) {
      val (snap, mOps, bOps) = sample(caseGen, seed)
      val root = freshRoot(s"mrg-prop-$seed-$branchWins")
      val mainT = s"$root/m"; val brT = s"$root/b"
      Manifest.commitAdd(snap.toDF("id", "v"), mainT, "base")
      Manifest.commitAdd(snap.toDF("id", "v"), brT, "base")
      Manifest.applyCdcBatch(
        mOps.map(o => (o._1, o._3, o._2)).toDF("id", "v", "op"),
        mainT, "id", "m2")
      Manifest.applyCdcBatch(
        bOps.map(o => (o._1, o._3, o._2)).toDF("id", "v", "op"),
        brT, "id", "b2")
      val snapMap = snap.toMap
      val mHead = applyOps(snapMap, mOps)
      val bHead = applyOps(snapMap, bOps)
      val mTouched = (snapMap.keySet ++ mHead.keySet)
        .filter(k => snapMap.get(k) != mHead.get(k))
      val bTouched = (snapMap.keySet ++ bHead.keySet)
        .filter(k => snapMap.get(k) != bHead.get(k))
      var exp = mHead
      var confKeys = Set.empty[Long]
      for (k <- bTouched) {
        val bOut = bHead.get(k); val mOut = mHead.get(k)
        if (!mTouched(k))
          exp = bOut.fold(exp - k)(v => exp + (k -> v))
        else if (bOut != mOut) {
          confKeys += k
          if (branchWins) exp = bOut.fold(exp - k)(v => exp + (k -> v))
        }
      }
      val (vm, confl) = Manifest.mergeBranch(
        spark, mainT, 1, brT, 1, "id", Seq("v"), "mrg", branchWins)
      val got = Manifest.read(spark, mainT, vm)
        .as[(Long, Long)].collect().toMap
      assert(got == exp,
        s"seed=$seed bw=$branchWins:\n got=$got\n exp=$exp\n m=$mOps\n b=$bOps")
      val gotConf = confl.select("id").as[Long].collect().toSet
      assert(gotConf == confKeys,
        s"seed=$seed bw=$branchWins conflicts: got=$gotConf exp=$confKeys")
    }
  }

  test("Txn: atomic cross-table pins survive interleaved commits; loud on bad pins") {
    val root = freshRoot("txn")
    val ta = s"$root/a"; val tb = s"$root/b"
    Manifest.commitAdd(frame(0 until 10), ta, "b1")
    Manifest.commitAdd(frame(0 until 10), tb, "b1")
    // a txn cannot pin an unpublished version
    intercept[IllegalArgumentException] {
      Txn.commit(root, Map(ta -> 1, tb -> 2))
    }
    val t1 = Txn.commit(root, Map(ta -> 1, tb -> 1))
    assert(t1 == 1 && Txn.current(root) == 1)
    // interleaved writer: a's v2 lands, b lags — raw heads torn
    Manifest.commitAdd(frame(10 until 25), ta, "b2")
    assert(Txn.readAt(spark, root, t1, ta).count() == 10)
    assert(Txn.readAt(spark, root, t1, tb).count() == 10)
    assert(Manifest.read(spark, ta, 2).count() == 25) // the torn head
    Manifest.commitAdd(frame(10 until 25), tb, "b2")
    val t2 = Txn.commit(root, Map(ta -> 2, tb -> 2))
    assert(Txn.pins(root, t2) == Map(ta -> 2, tb -> 2))
    assert(Txn.readAt(spark, root, t2, ta).count() == 25)
    // the old txn still resolves the old consistent pair
    assert(Txn.readAt(spark, root, t1, ta).count() == 10)
    // reads of a table the txn does not pin fail loudly
    intercept[IllegalArgumentException] {
      Txn.readAt(spark, root, t1, s"$root/zzz")
    }
    intercept[IllegalArgumentException] { Txn.pins(root, 99) }
  }
}
