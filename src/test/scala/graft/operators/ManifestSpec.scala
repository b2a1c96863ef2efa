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
}
