package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the key-bucketed index layout (r13 verdict item 1):
  *  - a probe's scanned member files follow the DELTA's key set,
  *    never the index size (the whole point);
  *  - pruning is never lossy: the pruned union ⊇ every index row a
  *    delta key matches, and a key-equi-join against the pruned read
  *    equals the join against the full read;
  *  - conservative fallbacks: untagged members and members bucketed
  *    under a different modulus are always read;
  *  - size-tiered compaction folds WITHIN tag groups (pruning
  *    survives), touches only the small tier, and changes no rows;
  *  - crash recovery: a crashed attempt's orphan dirs are GC'd on
  *    retry.
  */
class BucketedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 16

  private def index(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("t", "id")

  private def fp(df: DataFrame): Set[(Long, Long)] =
    df.select("t", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pruned reads follow the delta's key set, not the index size") {
    val root = TestSpark.tmpDir("bidx-prune").toString
    val base = index((1L to 400L).map(t => (t, t * 10)))
    BucketedIndex.commitBucketed(base, root, "base", Seq("t"), N)
    val v = Manifest.currentVersion(root)
    val all = Manifest.members(root, v)
    assert(all.size > 8, s"400 keys must occupy most of $N buckets")

    // a single-key delta must read exactly its ONE bucket's member
    val one = Seq((7L, 0L)).toDF("t", "id").select("t")
    val p1 = BucketedIndex.prunedMemberPaths(root, v, one, Seq("t"), N)
    assert(p1.size == 1,
      s"a 1-key delta must open 1 bucket member, opened ${p1.size}")
    // and that member must be the key's own bucket
    val kb = Seq((7L, 0L)).toDF("t", "id")
      .select(BucketedIndex.bucketOf(N, col("t"))).collect()(0).getLong(0)
    assert(p1.head.endsWith(s"base-b$kb"))

    // pruning is an optimization, never the semantics: the key join
    // against the pruned read equals the join against the full read
    val delta = Seq(3L, 7L, 250L, 999L).toDF("t") // 999 matches nothing
    val full = Manifest.read(spark, root, v).join(delta, Seq("t"))
    val pruned = BucketedIndex
      .prunedRead(spark, root, v, delta, Seq("t"), N)
      .join(delta, Seq("t"))
    assert(fp(pruned) == fp(full) && fp(full).nonEmpty)

    // an empty delta reads nothing but keeps the schema resolvable
    val none = BucketedIndex.prunedRead(spark, root, v,
      Seq.empty[Long].toDF("t"), Seq("t"), N)
    assert(none.columns.toSeq == Seq("t", "id") && none.isEmpty)
  }

  test("conservative fallbacks: untagged members and foreign bucketings are always read") {
    val root = TestSpark.tmpDir("bidx-cons").toString
    BucketedIndex.commitBucketed(index(Seq((1L, 10L))), root, "b16",
      Seq("t"), N)
    Manifest.commitAdd(index(Seq((2L, 20L))), root, "legacy") // untagged
    BucketedIndex.commitBucketed(index(Seq((3L, 30L))), root, "b4",
      Seq("t"), 4) // different modulus
    val v = Manifest.currentVersion(root)
    // a delta matching NONE of the keys still reads the untagged and
    // foreign-modulus members (no pruning without a matching kbn)
    val paths = BucketedIndex.prunedMemberPaths(root, v,
      Seq(999L).toDF("t"), Seq("t"), N)
    assert(paths.exists(_.endsWith("legacy")),
      "an untagged member must be conservatively read")
    assert(paths.exists(_.contains("b4-b")),
      "a member bucketed under a different modulus must be read")
    // and the join equality holds across the mixed layout
    val delta = Seq(1L, 2L, 3L).toDF("t")
    val full = Manifest.read(spark, root, v).join(delta, Seq("t"))
    val pruned = BucketedIndex.prunedRead(spark, root, v, delta,
      Seq("t"), N).join(delta, Seq("t"))
    assert(fp(pruned) == fp(full) && fp(full).size == 3)
  }

  test("tiered compaction folds within tag groups; pruning and rows survive") {
    val root = TestSpark.tmpDir("bidx-tier").toString
    val day0 = index((1L to 100L).map(t => (t, t)))
    val day1 = index((101L to 200L).map(t => (t, t)))
    BucketedIndex.commitBucketed(day0, root, "day0", Seq("t"), 4)
    BucketedIndex.commitBucketed(day1, root, "day1", Seq("t"), 4)
    val before = Manifest.currentVersion(root)
    val want = fp(Manifest.read(spark, root, before))
    assert(Manifest.members(root, before).size == 8,
      "two bucketed commits at 4 buckets each")
    Manifest.compactTiered(spark, root, "cmp1")
    val after = Manifest.currentVersion(root)
    val tags = Manifest.memberPartitions(root, after)
    assert(tags.size == 4, s"fold must land one member per bucket group")
    assert(tags.forall { case (_, m) =>
      m.get("kbn").contains("4") && m.contains("kb") },
      "the fold must preserve the layout tags — pruning survives compaction")
    assert(fp(Manifest.read(spark, root, after)) == want,
      "compaction is layout-only")
    // pruning still follows the delta after compaction
    val p = BucketedIndex.prunedMemberPaths(root, after,
      Seq(5L).toDF("t"), Seq("t"), 4)
    assert(p.size == 1, s"post-compaction 1-key probe opened ${p.size}")
  }

  test("tiered compaction touches only the small tier; settled members pass verbatim") {
    val root = TestSpark.tmpDir("tier-size").toString
    // one SETTLED member (5000 rows) + three small ones (10 each),
    // all untagged so they share one group
    Manifest.commitAdd((1L to 5000L).toDF("k"), root, "big")
    (0 until 3).foreach(i =>
      Manifest.commitAdd((1L to 10L).map(_ + 100L * i).toDF("k"),
        root, s"small$i"))
    val before = Manifest.currentVersion(root)
    val want = Manifest.read(spark, root, before).collect()
      .map(_.getLong(0)).sorted.toSeq
    Manifest.compactTiered(spark, root, "cmp", maxTierRows = 100L)
    val after = Manifest.currentVersion(root)
    val ms = Manifest.memberPartitions(root, after).map(_._1)
    assert(ms.exists(_.endsWith("big")),
      "the settled member must survive VERBATIM (never rewritten)")
    assert(ms.size == 2, s"3 small members fold to 1, got ${ms.mkString(", ")}")
    // rewrite IO bounded by the folded tier: the new member holds
    // exactly the 30 small-tier rows
    val folded = ms.filter(_.contains("cmp")).head
    assert(spark.read.parquet(folded).count() == 30L,
      "rewrite bytes must be the folded tier, never the table")
    assert(Manifest.read(spark, root, after).collect()
      .map(_.getLong(0)).sorted.toSeq == want)
    // idempotent maintenance: a second call with nothing foldable
    // (one small member left < 2) publishes nothing
    assert(Manifest.compactTiered(spark, root, "cmp2", 100L) == after)
  }

  test("string-keyed bucketing: a point lookup opens only the key's bucket") {
    // the q425 inverted-index shape — bucketOf over a STRING key
    // column (xxhash64 of the term), the third key type after longs
    // (t / id) and tuples ((band, bucket) / (chunk, ckey))
    val root = TestSpark.tmpDir("bidx-str").toString
    val postings = (1 to 300).map(i => (s"term$i", i.toLong)).toDF("bg", "id")
    BucketedIndex.commitBucketed(postings, root, "b1", Seq("bg"), N)
    val v = Manifest.currentVersion(root)
    val term = Seq("term42").toDF("bg")
    val paths = BucketedIndex.prunedMemberPaths(root, v, term, Seq("bg"), N)
    assert(paths.size == 1,
      s"a 1-term lookup must open 1 bucket member, opened ${paths.size}")
    val got = BucketedIndex.prunedRead(spark, root, v, term, Seq("bg"), N)
      .join(term, Seq("bg")).collect()
    assert(got.length == 1 && got(0).getLong(1) == 42L,
      "the pruned lookup must return exactly the term's postings")
  }

  test("layout-preserving COW upsert rewrites touched buckets only; untouched members verbatim") {
    val root = TestSpark.tmpDir("bidx-upsert").toString
    // base: 400 keys, up to all 16 buckets occupied; key 7 gets TWO
    // rows (the multi-row-per-key grain an adjacency list uses)
    val base = index((1L to 400L).map(t => (t, t * 10)) :+ (7L, 99L))
    BucketedIndex.commitBucketed(base, root, "base", Seq("t"), N)
    val v0 = Manifest.currentVersion(root)
    val before = Manifest.memberPartitions(root, v0).toMap
    // update: key 7 swaps its whole row set (2 rows -> 1), key 401 is
    // a brand-new key (insert), key 3 gets an extra row alongside a
    // replacement
    val up = index(Seq((7L, 777L), (401L, 4010L), (3L, 33L), (3L, 34L)))
    BucketedIndex.upsertBucketed(up, root, "day1", Seq("t"), N)
    val v1 = Manifest.currentVersion(root)
    assert(v1 > v0)
    // content: delete-then-insert at the key grain
    val want = fp(Manifest.read(spark, root, v0))
      .filterNot { case (t, _) => Set(7L, 3L).contains(t) } ++
      Set((7L, 777L), (401L, 4010L), (3L, 33L), (3L, 34L))
    assert(fp(Manifest.read(spark, root, v1)) == want)
    // rewrite IO bounded by the touched buckets: untouched members
    // survive VERBATIM (same paths), and only the update keys'
    // buckets gained day1 members
    val after = Manifest.memberPartitions(root, v1).toMap
    val upKbs = up.select(BucketedIndex.bucketOf(N, col("t"))).distinct()
      .collect().map(_.getLong(0).toString).toSet
    val untouchedBefore = before.filterNot { case (_, t) => upKbs(t("kb")) }
    assert(untouchedBefore.forall { case (p, _) => after.contains(p) },
      "untouched buckets' members must pass through verbatim")
    val rewritten = after.keySet -- before.keySet
    assert(rewritten.nonEmpty &&
      rewritten.forall(p => p.contains("day1-b")),
      s"new members must carry the upsert tag: $rewritten")
    assert(after.filter(_._1.contains("day1-b"))
        .forall { case (_, t) => upKbs(t("kb")) && t("kbn") == N.toString },
      "rewritten members must keep the layout tags — pruning survives")
    // post-upsert pruning still follows the delta
    val p1 = BucketedIndex.prunedMemberPaths(root, v1,
      Seq((7L, 0L)).toDF("t", "id").select("t"), Seq("t"), N)
    assert(p1.size == 1 && p1.head.contains("day1-b"))
    // redelivery ledger: the tag is visible in the manifest
    assert(Manifest.tagApplied(root, "day1"))
  }

  test("rebucket: one atomic rewrite heals mixed layouts and re-sizes the modulus") {
    // the layout-maintenance op the bucket-count constant needs at
    // scale: a table that outgrew its build modulus (or accreted
    // legacy/foreign members) re-buckets once; content is identical,
    // probes prune under the NEW modulus immediately, redelivery is
    // a no-op
    val root = TestSpark.tmpDir("bidx-rebucket").toString
    BucketedIndex.commitBucketed(index((1L to 100L).map(t => (t, t))),
      root, "base", Seq("t"), 4)
    Manifest.commitAdd(index(Seq((200L, 2000L))), root, "legacy") // untagged
    val before = Manifest.currentVersion(root)
    val want = fp(Manifest.read(spark, root, before))
    val v1 = BucketedIndex.rebucket(spark, root, "wider", Seq("t"), N)
    assert(fp(Manifest.read(spark, root, v1)) == want,
      "rebucketing is layout-only")
    val tags = Manifest.memberPartitions(root, v1)
    assert(tags.forall { case (_, m) =>
      m.get("kbn").contains(N.toString) && m.contains("kb") &&
        m.get("kc").contains("t") },
      "every member must carry the NEW layout's tags — mixed layouts heal")
    // pruning works under the new modulus: a 1-key probe opens 1 member
    val p = BucketedIndex.prunedMemberPaths(root, v1,
      Seq(7L).toDF("t"), Seq("t"), N)
    assert(p.size == 1, s"post-rebucket 1-key probe opened ${p.size}")
    // the healed table now accepts COW upserts (was mixed → refused)
    BucketedIndex.upsertBucketed(index(Seq((7L, 77L))), root, "day1",
      Seq("t"), N)
    // redelivery is a no-op
    assert(BucketedIndex.rebucket(spark, root, "wider", Seq("t"), N) ==
      Manifest.currentVersion(root))
  }

  test("COW upsert refuses mismatched KEY COLUMNS loudly (kc tag)") {
    // r14 advice item 1: kb/kbn alone cannot catch an upsert stated
    // under DIFFERENT key columns than the build — same modulus, same
    // tags, but survivors hash elsewhere and updated keys in
    // non-touched buckets are never deleted (silent stale duplicates).
    // commitBucketed now records the column list as a kc tag and the
    // upsert validates it like PqStore screens its codebook tags.
    val root = TestSpark.tmpDir("bidx-kc").toString
    BucketedIndex.commitBucketed(index(Seq((1L, 10L), (2L, 20L))), root,
      "base", Seq("t"), N)
    val e = intercept[IllegalArgumentException] {
      BucketedIndex.upsertBucketed(index(Seq((1L, 11L))), root, "day1",
        Seq("id"), N)
    }
    assert(e.getMessage.contains("key columns") &&
      e.getMessage.contains("(t)") && e.getMessage.contains("(id)"),
      s"the failure must name both column lists: ${e.getMessage}")
    // and a pruned read stated under foreign key columns degrades to a
    // conservative FULL read (kc mismatch → must read), never wrong
    // pruning
    val v = Manifest.currentVersion(root)
    val paths = BucketedIndex.prunedMemberPaths(root, v,
      Seq(999L).toDF("id"), Seq("id"), N)
    assert(paths.size == Manifest.members(root, v).size,
      "a kc mismatch must be read conservatively")
  }

  test("a concurrent commit into a touched bucket voids the upsert premise loudly") {
    // r14 advice item 2: the slot-level CAS re-validates that replaced
    // members still exist, but not that touched buckets gained NO new
    // members since the merge was computed — such a member's
    // updated-key rows would survive as silent stale duplicates. The
    // premise closure (re-run inside the CAS retry) must refuse. The
    // two-writer interleaving isn't deterministically constructible
    // in-process, so pin the closure against a crafted head.
    val root = TestSpark.tmpDir("bidx-premise").toString
    BucketedIndex.commitBucketed(index(Seq((1L, 10L))), root, "base", Seq("t"), 4)
    val v = Manifest.currentVersion(root)
    val head = Manifest.memberPartitions(root, v)
    val paths = head.map(_._1).toSet
    val kb = head.head._2("kb")
    // clean premise: the touched member is in the replaced set → ok
    BucketedIndex.upsertPremise(root, "day1", Set(kb), 4, "t",
      paths, paths)(head)
    // raced premise: the head holds a member in a touched bucket the
    // merge never saw → loud refusal naming the member
    val e = intercept[IllegalStateException] {
      BucketedIndex.upsertPremise(root, "day1", Set(kb), 4, "t",
        Set.empty[String], Set.empty[String])(head)
    }
    assert(e.getMessage.contains("gained members") &&
      e.getMessage.contains(head.head._1), e.getMessage)
    // an untouched-bucket CONFORMING newcomer never voids it (its rows
    // hash only into its own, untouched bucket)
    BucketedIndex.upsertPremise(root, "day1", Set("999"), 4, "t",
      Set.empty[String], Set.empty[String])(head)
    // but a newcomer OUTSIDE the stated layout voids it even in an
    // untouched bucket (r15 advice item 3): a foreign-modulus,
    // foreign-kc, or untagged member can hold updated keys ANYWHERE —
    // the snapshot's mixed-layout check cannot see concurrent arrivals
    val eKbn = intercept[IllegalStateException] {
      BucketedIndex.upsertPremise(root, "day1", Set("999"), 8, "t",
        Set.empty[String], Set.empty[String])(head)
    }
    assert(eKbn.getMessage.contains("self-describing"), eKbn.getMessage)
    val eKc = intercept[IllegalStateException] {
      BucketedIndex.upsertPremise(root, "day1", Set("999"), 4, "other",
        Set.empty[String], Set.empty[String])(head)
    }
    assert(eKc.getMessage.contains("self-describing"), eKc.getMessage)
    val eUntagged = intercept[IllegalStateException] {
      BucketedIndex.upsertPremise(root, "day1", Set("999"), 4, "t",
        Set.empty[String], Set.empty[String])(
        head ++ Seq(("concurrent-legacy", Map.empty[String, String])))
    }
    assert(eUntagged.getMessage.contains("concurrent-legacy"),
      eUntagged.getMessage)
    // SNAPSHOT members are exempt from the layout check — the
    // pre-merge checks already vetted them (incl. the documented
    // legacy kc-untagged tolerance); only what the head GAINED voids
    BucketedIndex.upsertPremise(root, "day1", Set("999"), 8, "t",
      paths, Set.empty[String])(head)
  }

  test("COW delete drops match-grain rows in the victims' buckets; emptied buckets leave the layout (r16)") {
    val root = TestSpark.tmpDir("bidx-delete").toString
    // keys 1..40, two rows per key (ids k*10 and k*10+1)
    val base = index((1L to 40L).flatMap(t => Seq((t, t * 10), (t, t * 10 + 1))))
    BucketedIndex.commitBucketed(base, root, "base", Seq("t"), N)
    val v0 = Manifest.currentVersion(root)
    val before = Manifest.memberPartitions(root, v0).map(_._1).toSet
    // match-grain finer than the bucketing: delete (t=7, id=70) but
    // keep (t=7, id=71)
    BucketedIndex.deleteBucketed(index(Seq((7L, 70L))), root, "d1",
      Seq("t"), N, Seq("t", "id"))
    val v1 = Manifest.currentVersion(root)
    assert(fp(Manifest.read(spark, root, v1)) == fp(base) - ((7L, 70L)))
    // untouched buckets' members survive byte-verbatim
    val after1 = Manifest.memberPartitions(root, v1).map(_._1).toSet
    assert((before & after1).size >= before.size - 2,
      "only the victim's bucket may rewrite")
    assert(Manifest.memberPartitions(root, v1).forall { case (_, t) =>
      t.contains("kb") && t.get("kbn").contains(N.toString)
    }, "the delete must preserve the bucketed layout")
    // deleting EVERY row of a bucket leaves the bucket absent (no
    // empty member) — and the pruned read of that key set is empty
    val tToKb = (1L to 40L).toDF("t")
      .select(col("t"), BucketedIndex.bucketOf(N, col("t")).as("kb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kb9 = tToKb(9L)
    val allT = (1L to 40L).filter(tToKb(_) == kb9)
    BucketedIndex.deleteBucketed(
      index(allT.flatMap(t => Seq((t, t * 10), (t, t * 10 + 1)))),
      root, "d2", Seq("t"), N, Seq("t", "id"))
    val v2 = Manifest.currentVersion(root)
    assert(!Manifest.memberPartitions(root, v2)
      .exists(_._2.get("kb").contains(kb9.toString)),
      "an emptied bucket must leave the layout entirely")
    // a victim matching nothing is an idempotent no-op rewrite
    val rows2 = fp(Manifest.read(spark, root, v2))
    BucketedIndex.deleteBucketed(index(Seq((7L, 70L))), root, "d3",
      Seq("t"), N, Seq("t", "id"))
    assert(fp(Manifest.read(spark, root,
      Manifest.currentVersion(root))) == rows2)
  }

  test("atomic delete+upsert advances both in ONE version (r16)") {
    val root = TestSpark.tmpDir("bidx-delup").toString
    BucketedIndex.commitBucketed(index(Seq((1L, 10L), (2L, 20L), (3L, 30L))),
      root, "base", Seq("t"), N)
    val v0 = Manifest.currentVersion(root)
    // replace key 1's rows, delete key 2, keep key 3 — one commit
    val v1 = BucketedIndex.upsertDeleteBucketed(
      index(Seq((1L, 11L))), Seq(2L).toDF("t"), root, "day1", Seq("t"), N)
    assert(v1 == v0 + 1, "delete+upsert must be ONE atomic version")
    assert(fp(Manifest.read(spark, root, v1)) ==
      Set((1L, 11L), (3L, 30L)))
  }

  test("COW upsert refuses a mixed layout loudly") {
    val root = TestSpark.tmpDir("bidx-upmixed").toString
    BucketedIndex.commitBucketed(index(Seq((1L, 10L))), root, "base",
      Seq("t"), N)
    Manifest.commitAdd(index(Seq((2L, 20L))), root, "legacy") // untagged
    val e = intercept[IllegalArgumentException] {
      BucketedIndex.upsertBucketed(index(Seq((1L, 11L))), root, "day1",
        Seq("t"), N)
    }
    assert(e.getMessage.contains("mixed layout") &&
      e.getMessage.contains("commitBucketed"),
      s"the failure must name the remedy: ${e.getMessage}")
  }

  test("a crashed COW-upsert attempt retries cleanly") {
    val root = TestSpark.tmpDir("bidx-upcrash").toString
    BucketedIndex.commitBucketed(index((1L to 50L).map(t => (t, t))),
      root, "base", Seq("t"), 4)
    // plant the crash: staging dir + one moved bucket dir, manifest
    // never published
    val up = index(Seq((7L, 700L)))
    up.write.parquet(s"$root/files/day1-staging/__kb=9")
    up.write.parquet(s"$root/files/day1-b2")
    assert(!Manifest.tagApplied(root, "day1"))
    BucketedIndex.upsertBucketed(up, root, "day1", Seq("t"), 4)
    val v = Manifest.currentVersion(root)
    val got = fp(Manifest.read(spark, root, v))
    assert(got == (1L to 50L).map(t => (t, t)).toSet - ((7L, 7L)) + ((7L, 700L)))
    assert(Manifest.tagApplied(root, "day1"))
  }

  test("a crashed bucketed-commit attempt retries cleanly") {
    val root = TestSpark.tmpDir("bidx-crash").toString
    BucketedIndex.commitBucketed(index(Seq((1L, 1L))), root, "day0",
      Seq("t"), 4)
    // plant the crash: staging dir + one moved bucket dir, manifest
    // never published
    val df = index(Seq((2L, 2L), (3L, 3L)))
    df.write.parquet(s"$root/files/day1-staging/__kb=9")
    df.write.parquet(s"$root/files/day1-b2")
    assert(!Manifest.tagApplied(root, "day1"))
    BucketedIndex.commitBucketed(df, root, "day1", Seq("t"), 4)
    val v = Manifest.currentVersion(root)
    assert(fp(Manifest.read(spark, root, v)) ==
      Set((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(Manifest.tagApplied(root, "day1"))
  }
}
