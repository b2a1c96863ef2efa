package graft.streaming

import graft.TestSpark
import graft.operators.{BucketedIndex, Dedup, Manifest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the PERSISTED streaming clustering state (q478, r12
  * verdict items 1 + 7):
  *  - kill/restart: a drain interrupted between batches and resumed
  *    with the same checkpoint/state dirs equals the one-shot drain
  *    bit for bit (and both equal from-scratch clustering);
  *  - state IO is delta-shaped: a delta fold onto a large standing
  *    corpus materializes batch/touched-bounded frames only, and the
  *    sets/prefix tables advance append-only (one member per batch);
  *  - the crash window between the sets/prefix commit and the labels
  *    commit is safe on retry (over-inclusive base sets are absorbed
  *    by the CC fold);
  *  - redelivered tags are no-ops (the labels ledger);
  *  - a low-threshold misconfiguration trips the candidate guard
  *    loudly instead of exploding the micro-batch.
  */
class StreamingClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def fp(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def dirs(tag: String): (String, String, String) = {
    val root = TestSpark.tmpDir(s"sclu-$tag")
    (s"$root/feed", s"$root/ckpt", s"$root/state")
  }

  private def stage(feed: String, b: Int): Unit =
    LakeIngest.stageBatchFile(feed, s"day$b.parquet", 1000L * (b + 1),
      docs.filter(col("doc_id") % 3 === b))

  test("kill/restart drain == one-shot drain == from-scratch clustering, bit for bit") {
    val (f1, c1, s1) = dirs("oneshot")
    (0 until 3).foreach(stage(f1, _))
    val oneShot = fp(StreamingClusters.docFeedToClusters(spark, f1, c1, s1))
    // interrupted twin: drain the first two batches, then the third
    // file arrives and the drain RESTARTS with the same dirs — the
    // stream checkpoint skips delivered files, the manifest ledger
    // carries the standing state across the restart
    val (f2, c2, s2) = dirs("resume")
    (0 until 2).foreach(stage(f2, _))
    StreamingClusters.docFeedToClusters(spark, f2, c2, s2).count()
    stage(f2, 2)
    val resumed = fp(StreamingClusters.docFeedToClusters(spark, f2, c2, s2))
    assert(resumed == oneShot,
      "a resumed drain must equal the uninterrupted drain bit for bit")
    // and both equal clustering everything from scratch
    val sets = docs.select(col("doc_id").as("id"),
      array_sort(transform(array_distinct(split(col("text"), " ")),
        t => xxhash64(t))).as("ts"))
    val scratch = fp(Dedup.duplicateClusters(
      Dedup.jaccardPairs(sets, threshold = 0.9).select("a_id", "b_id"),
      docs.select("doc_id")))
    assert(oneShot == scratch, "drained fold must equal from-scratch CC")
    assert(oneShot.nonEmpty)
  }

  test("sets/prefixes advance append-only (one bucketed commit per batch); redelivered tags are no-ops") {
    val (f, c, s) = dirs("members")
    (0 until 3).foreach(stage(f, _))
    StreamingClusters.docFeedToClusters(spark, f, c, s).count()
    val setsRoot = s"$s/sets"; val prefRoot = s"$s/prefixes"
    val labRoot = s"$s/labels"
    def batchTags(root: String) = Manifest
      .members(root, Manifest.currentVersion(root))
      .map(_.split("/").last.split("-data").head).distinct.sorted
    // one atomic commit per batch (version == batches), members are
    // the batch's bucket files, every member key-bucket tagged
    assert(Manifest.currentVersion(setsRoot) == 3 &&
      batchTags(setsRoot) == Seq("b0", "b1", "b2"),
      "the sets table must gain exactly one bucketed commit per batch")
    assert(Manifest.currentVersion(prefRoot) == 3 &&
      batchTags(prefRoot) == Seq("b0", "b1", "b2"),
      "the prefix index must gain exactly one bucketed commit per batch")
    assert(Manifest.memberPartitions(prefRoot, 3).forall { case (_, t) =>
      t.contains("kb") && t.get("kbn")
        .contains(StreamingClusters.IndexBuckets.toString) },
      "every prefix member must carry the bucket tags pruned probes read")
    // redelivery: folding an already-ledgered tag changes nothing
    val vLab = Manifest.currentVersion(labRoot)
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 1), s, "b1", threshold = 0.9)
    assert(Manifest.currentVersion(labRoot) == vLab &&
      Manifest.currentVersion(setsRoot) == 3,
      "a redelivered batch tag must be a complete no-op")
  }

  test("labels stay bucket-tagged across folds with at most one member per bucket (r14)") {
    val (f, c, s) = dirs("lablayout")
    (0 until 3).foreach(stage(f, _))
    StreamingClusters.docFeedToClusters(spark, f, c, s).count()
    val labRoot = s"$s/labels"
    val members = Manifest.memberPartitions(labRoot,
      Manifest.currentVersion(labRoot))
    // the layout-preserving upsert keeps every member bucket-tagged —
    // a plain Manifest.upsert would have dropped the tags on its
    // first rewrite
    assert(members.nonEmpty && members.forall { case (_, t) =>
      t.contains("kb") && t.get("kbn")
        .contains(StreamingClusters.IndexBuckets.toString)
    }, "labels members must stay bucket-tagged across folds")
    // bounded debt: a touched bucket folds to ONE member per upsert,
    // an untouched bucket keeps its single member — the labels table
    // never exceeds one member per occupied bucket (why compactState
    // does not touch it)
    assert(members.groupBy(_._2.get("kb")).forall(_._2.size == 1),
      "the labels table must hold at most one member per bucket")
  }

  test("a 1-row label fold rewrites at most one bucket; untouched label members verbatim (r14)") {
    val (_, _, s) = dirs("labcow")
    StreamingClusters.foldBatch(spark, docs.filter(col("doc_id") % 3 === 0),
      s, "b0", threshold = 0.9)
    val labRoot = s"$s/labels"
    val before = Manifest.memberPartitions(labRoot,
      Manifest.currentVersion(labRoot)).map(_._1).toSet
    import spark.implicits._
    // one NEW doc with unique tokens: no pairs at τ=0.9, so the
    // fold's changed set is exactly its singleton label row
    val lone = Seq((999999L, "zqx wvu tsr qpo nml")).toDF("doc_id", "text")
    StreamingClusters.foldBatch(spark, lone, s, "b1", threshold = 0.9)
    val after = Manifest.memberPartitions(labRoot,
      Manifest.currentVersion(labRoot)).map(_._1).toSet
    val rewritten = after -- before
    assert(rewritten.size == 1 && rewritten.head.contains("b1-b"),
      s"a 1-row fold must land exactly one bucket member: $rewritten")
    assert((before -- after).size <= 1,
      "at most the touched bucket's member is superseded")
    assert((before & after).size >= before.size - 1,
      "untouched buckets' label members must survive verbatim")
    // and the fold is correct: the lone doc is a singleton cluster
    val row = Manifest.read(spark, labRoot,
        Manifest.currentVersion(labRoot))
      .filter(col("doc_id") === 999999L).collect()
    assert(row.length == 1 && row(0).getLong(1) == 999999L &&
      row(0).getLong(2) == 1L)
  }

  test("a duplicate doc_id arriving in a LATER batch fails loudly at delta-bucket cost") {
    // the disjointness guard moved from an O(corpus) label scan to a
    // probe of the delta's id buckets over OTHER batches' sets
    // members — it must still catch the duplicate-arrival hazard
    val (_, _, s) = dirs("dupguard")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 0), s, "b0", threshold = 0.9)
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 1), s, "b1", threshold = 0.9)
    val e = intercept[IllegalArgumentException] {
      StreamingClusters.foldBatch(spark, // re-delivers batch 0's docs
        docs.filter(col("doc_id") % 3 === 0), s, "b2", threshold = 0.9)
    }
    assert(e.getMessage.contains("overlap"),
      s"expected the duplicate-arrival guard, got: ${e.getMessage}")
  }

  test("a delta fold materializes batch/touched-bounded frames only — never the standing corpus") {
    val (_, _, s) = dirs("matbound")
    val base = docs.filter(col("doc_id") % 25 =!= 0) // 480 standing docs
    val delta = docs.filter(col("doc_id") % 25 === 0) // 20-doc batch
    StreamingClusters.foldBatch(spark, base, s, "b0", threshold = 0.9)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    StreamingClusters.foldBatch(spark, delta, s, "b1", threshold = 0.9)
    val created = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    // every frame the fold materializes (localCheckpoint blocks) must
    // be batch- or touched-component-bounded: the corpus carries one
    // 231-doc duplicate mega-cluster, so the changed-label frame can
    // legitimately reach ~250 rows when the delta touches it — but
    // the r12 regression shape (re-checkpointing the 480-doc standing
    // sets per batch) materializes ≥ the standing count, which the
    // 400-row ceiling rejects
    assert(base.count() == 480)
    val counts = created.values.map(_.count())
    assert(counts.forall(_ <= 400),
      s"a 20-doc fold onto 480 standing docs materialized an RDD of " +
        s"${if (counts.nonEmpty) counts.max else 0} rows — standing-" +
        "corpus-sized state IO regressed")
  }

  test("a delta fold's stored-table file reads are pruned — labels, clx and sets follow the touched set") {
    // r14 verdict items 1+2, pinned at the FOLD level: a batch whose
    // docs touch ONE tiny base cluster must read a strict subset of
    // the labels / secondary-index / sets member files — the
    // corpus-proportional verify and relabel scans are gone. A
    // synthetic corpus keeps the touched set genuinely small (the
    // real test corpus carries a 231-doc mega-cluster whose members
    // occupy every bucket).
    import spark.implicits._
    val (_, _, s) = dirs("prunedio")
    val base = (0L until 60L)
      .map(i => (i, s"w${i / 2}a w${i / 2}b w${i / 2}c"))
      .toDF("doc_id", "text") // 30 exact-dup pairs → 30 clusters of 2
    val delta = Seq((100L, "w3a w3b w3c")).toDF("doc_id", "text")
    StreamingClusters.foldBatch(spark, base, s, "b0", threshold = 0.9)
    val scanned = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          duration: Long): Unit = scanned.synchronized {
        scanned ++= org.apache.spark.sql.GraftTestBridge
          .fileScanInputs(qe.executedPlan)
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      StreamingClusters.foldBatch(spark, delta, s, "b1", threshold = 0.9)
      org.apache.spark.sql.GraftTestBridge.flushListenerBus(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    def memberDirs(root: String): Set[String] = scanned.synchronized {
      scanned.filter(_.contains(root + "/files/"))
        .map(f => new java.net.URI(f).getPath)
        .map(f => f.substring(0, f.lastIndexOf('/'))).toSet
    }
    for (t <- Seq("labels", "labels_clx", "sets")) {
      val root = s"$s/$t"
      val total = Manifest.members(root, 1).size // the b0 bootstrap commit
      val got = memberDirs(root).size
      assert(got < total,
        s"$t: a 1-doc fold touching one 2-doc cluster read $got of " +
          s"$total member files — the stored-table read is not pruned")
    }
    // and the fold is still the right fold: doc 100 joined cluster 6
    val labs = fp(Manifest.read(spark, s"$s/labels",
      Manifest.currentVersion(s"$s/labels")))
    assert(labs.contains((100L, 6L, 3L)) && labs.contains((6L, 6L, 3L)),
      s"fold result wrong: ${labs.filter(_._2 == 6L)}")
  }

  test("crash between the sets/prefix commit and the labels commit is safe on retry") {
    val delta = docs.filter(col("doc_id") % 3 === 1)
    // clean twin
    val (_, _, sClean) = dirs("cleanpath")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 0), sClean, "b0", threshold = 0.9)
    StreamingClusters.foldBatch(spark, delta, sClean, "b1", threshold = 0.9)
    val want = fp(Manifest.read(spark, s"$sClean/labels",
      Manifest.currentVersion(s"$sClean/labels")))
    // crashed twin: batch 1's sets + prefixes committed, labels NOT
    // (the crash window) — the retry folds with the batch's own sets
    // visible on the base side and must absorb the extra self/internal
    // pairs (CC is invariant under duplicate edges and self-loops)
    val (_, _, sCrash) = dirs("crashpath")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 0), sCrash, "b0", threshold = 0.9)
    val bSets = StreamingClusters.tokenSets(delta).localCheckpoint()
    StreamingClusters.appendBucketedOnce(bSets, s"$sCrash/sets", "b1",
      Seq("id"))
    StreamingClusters.appendBucketedOnce(Dedup.jaccardPrefixes(bSets, 0.9),
      s"$sCrash/prefixes", "b1", Seq("t"))
    // the tripwire is ARMED on the retry: the batch's own ids are
    // anti-joined out of the base side, so the retry sees clean-path
    // candidate counts — a factor the clean path clears must never
    // wedge the crashed drain (the r13 review finding)
    StreamingClusters.foldBatch(spark, delta, sCrash, "b1", threshold = 0.9,
      maxCandidateFactor = Some(50.0))
    val got = fp(Manifest.read(spark, s"$sCrash/labels",
      Manifest.currentVersion(s"$sCrash/labels")))
    assert(got == want,
      "the crash-window retry must produce the clean-path labels")
    assert(Manifest.currentVersion(s"$sCrash/sets") == 2,
      "the retry must NOT append the batch's sets a second time")
  }

  test("maintenance renaming members INSIDE the crash window neither wedges nor duplicates (r15)") {
    // the r15 advice wedge: rebucket (like compaction) renames every
    // member, erasing the name tag the crash-window retry used to
    // exclude its OWN sets rows from the disjointness probe — the old
    // name-based guard then found the batch's ids in 'other' members
    // and failed the drain forever with a false 'duplicate arrivals'.
    // The labels-based guard is invariant under sets-table renames,
    // and the content-probe append fallback keeps the retry from
    // landing the batch's rows a SECOND time (the name ledger is
    // equally blind after a rename).
    val delta = docs.filter(col("doc_id") % 3 === 1)
    val (_, _, sClean) = dirs("mwclean")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 0), sClean, "b0", threshold = 0.9)
    StreamingClusters.foldBatch(spark, delta, sClean, "b1", threshold = 0.9)
    val want = fp(Manifest.read(spark, s"$sClean/labels",
      Manifest.currentVersion(s"$sClean/labels")))
    val wantSetRows = Manifest.read(spark, s"$sClean/sets",
      Manifest.currentVersion(s"$sClean/sets")).count()
    val (_, _, s) = dirs("mwcrash")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 0), s, "b0", threshold = 0.9)
    val bSets = StreamingClusters.tokenSets(delta).localCheckpoint()
    StreamingClusters.appendBucketedOnce(bSets, s"$s/sets", "b1", Seq("id"))
    StreamingClusters.appendBucketedOnce(Dedup.jaccardPrefixes(bSets, 0.9),
      s"$s/prefixes", "b1", Seq("t"))
    // maintenance lands INSIDE the window — every member renamed
    BucketedIndex.rebucket(spark, s"$s/sets", "resize", Seq("id"),
      StreamingClusters.IndexBuckets)
    BucketedIndex.rebucket(spark, s"$s/prefixes", "resize", Seq("t"),
      StreamingClusters.IndexBuckets)
    StreamingClusters.foldBatch(spark, delta, s, "b1", threshold = 0.9)
    val got = fp(Manifest.read(spark, s"$s/labels",
      Manifest.currentVersion(s"$s/labels")))
    assert(got == want,
      "the post-maintenance retry must produce the clean-path labels")
    assert(Manifest.read(spark, s"$s/sets",
        Manifest.currentVersion(s"$s/sets")).count() == wantSetRows,
      "the retry must NOT append the batch's sets rows a second time")
  }

  test("mid-stream state compaction is layout-only: the drain's result is unchanged") {
    // fold two batches, compact the sets/prefix tables to ONE member
    // each, fold a third batch on the compacted state — final labels
    // must equal the uncompacted twin's bit for bit
    def batch(b: Int) = docs.filter(col("doc_id") % 3 === b)
    val (_, _, sPlain) = dirs("nocompact")
    (0 until 3).foreach(b =>
      StreamingClusters.foldBatch(spark, batch(b), sPlain, s"b$b", 0.9))
    val want = fp(Manifest.read(spark, s"$sPlain/labels",
      Manifest.currentVersion(s"$sPlain/labels")))
    val (_, _, sComp) = dirs("compact")
    (0 until 2).foreach(b =>
      StreamingClusters.foldBatch(spark, batch(b), sComp, s"b$b", 0.9))
    StreamingClusters.compactState(spark, sComp, "maint1")
    def maxPerGroup(root: String) = Manifest
      .memberPartitions(root, Manifest.currentVersion(root))
      .groupBy(_._2).valuesIterator.map(_.size).max
    assert(maxPerGroup(s"$sComp/sets") == 1,
      "compaction must fold each sets bucket group to one member")
    assert(maxPerGroup(s"$sComp/prefixes") == 1,
      "compaction must fold each prefix bucket group to one member")
    assert(Manifest.memberPartitions(s"$sComp/prefixes",
        Manifest.currentVersion(s"$sComp/prefixes"))
      .forall(_._2.contains("kb")),
      "compaction must PRESERVE the bucket tags — pruned probes survive")
    StreamingClusters.foldBatch(spark, batch(2), sComp, "b2", 0.9)
    val got = fp(Manifest.read(spark, s"$sComp/labels",
      Manifest.currentVersion(s"$sComp/labels")))
    assert(got == want,
      "a layout-only compaction must not change the drained labels")
  }

  test("mid-stream REBUCKETING of the append-only state is layout-only") {
    // the r15 maintenance op composed with the drain: after two
    // batches the sets/prefix tables rebucket to a WIDER modulus (the
    // move a drain makes when the standing state outgrows its build
    // constant); batch 3 folds on the resized tables. Later appends
    // still land at the drain's own modulus — a mixed-modulus table
    // is CORRECT by the conservative-read rule (foreign-kbn members
    // always read), so the drained labels must equal the untouched
    // twin's bit for bit. (The labels table is NOT rebucketed here:
    // its COW upsert deliberately refuses a modulus it wasn't stated
    // at — resizing it means rebucket + a matching drain constant.)
    def batch(b: Int) = docs.filter(col("doc_id") % 3 === b)
    val (_, _, sPlain) = dirs("norebkt")
    (0 until 3).foreach(b =>
      StreamingClusters.foldBatch(spark, batch(b), sPlain, s"b$b", 0.9))
    val want = fp(Manifest.read(spark, s"$sPlain/labels",
      Manifest.currentVersion(s"$sPlain/labels")))
    val (_, _, sRe) = dirs("rebkt")
    (0 until 2).foreach(b =>
      StreamingClusters.foldBatch(spark, batch(b), sRe, s"b$b", 0.9))
    BucketedIndex.rebucket(spark, s"$sRe/sets", "resize", Seq("id"), 64)
    BucketedIndex.rebucket(spark, s"$sRe/prefixes", "resize", Seq("t"), 64)
    assert(Manifest.memberPartitions(s"$sRe/sets",
        Manifest.currentVersion(s"$sRe/sets"))
      .forall(_._2.get("kbn").contains("64")),
      "rebucket must retag every member under the new modulus")
    StreamingClusters.foldBatch(spark, batch(2), sRe, "b2", 0.9)
    val got = fp(Manifest.read(spark, s"$sRe/labels",
      Manifest.currentVersion(s"$sRe/labels")))
    assert(got == want,
      "a mid-drain rebucket must not change the drained labels")
  }

  test("tiered compaction rewrites only the small tier — settled members survive verbatim") {
    // r13 verdict item 2: compactState folded EVERYTHING into one
    // member per engagement — an O(state) rewrite that grows with the
    // corpus. The size-tiered fold must leave members above the tier
    // bound untouched (their files survive VERBATIM in the manifest)
    // and pay rewrite IO equal to the folded small tier only.
    val (_, _, s) = dirs("tierbound")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 10 < 7), s, "b0", 0.9) // ~350 docs
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 10 === 7), s, "b1", 0.9) // ~50 docs
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 10 === 8), s, "b2", 0.9) // ~50 docs
    val setsRoot = s"$s/sets"
    val vBefore = Manifest.currentVersion(setsRoot)
    val before = Manifest.metadataRowCounts(setsRoot, vBefore)
    val tier = 20L // big-batch bucket members (~25 rows) sit above it
    val settled = before.filter(_._3 > tier).map(_._1).toSet
    assert(settled.nonEmpty, "fixture must produce settled members")
    // the small rows that belong to fold-eligible groups (≥2 small
    // members sharing a tag set) — the exact rewrite budget
    val foldedSum = before.filter(_._3 <= tier)
      .groupBy(_._2).valuesIterator
      .filter(_.size >= 2).flatMap(_.map(_._3)).sum
    StreamingClusters.compactState(spark, s, "maint", maxTierRows = tier)
    val vAfter = Manifest.currentVersion(setsRoot)
    val after = Manifest.metadataRowCounts(setsRoot, vAfter)
    assert(settled.subsetOf(after.map(_._1).toSet),
      "members above the tier bound must survive VERBATIM — a settled " +
        "mega-member must never be rewritten")
    val rewritten = after.map(_._1).toSet -- before.map(_._1).toSet
    val rewrittenRows = after.filter(r => rewritten.contains(r._1)).map(_._3).sum
    assert(rewrittenRows == foldedSum,
      s"rewrite IO must equal the folded small tier: rewrote " +
        s"$rewrittenRows rows, tier holds $foldedSum")
    assert(after.map(_._3).sum == before.map(_._3).sum,
      "compaction is layout-only")
    // and the drain keeps folding correctly on the tiered state
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 10 === 9), s, "b3", 0.9)
    assert(Manifest.refVersion(s"$s/labels", "b3").isDefined)
  }

  test("a crashed compaction attempt (orphan member dir) retries cleanly") {
    // crash window: commitReplace wrote the rewritten member's
    // parquet but died before the manifest publish — foreachBatch
    // redelivers the same batchId, compactState recomputes the SAME
    // tag, and without orphan GC every retry dies PATH_ALREADY_EXISTS
    // forever (r13 advice item 1). The retry must GC the unreferenced
    // dir and land the compaction.
    def batch(b: Int) = docs.filter(col("doc_id") % 3 === b)
    val (_, _, s) = dirs("cmpcrash")
    (0 until 2).foreach(b =>
      StreamingClusters.foldBatch(spark, batch(b), s, s"b$b", 0.9))
    // plant the orphan: a rewritten fold member written, never
    // published (the crash window inside compactTiered)
    val setsRoot = s"$s/sets"
    Manifest.read(spark, setsRoot, Manifest.currentVersion(setsRoot))
      .write.parquet(s"$setsRoot/files/maint1-compacted-0")
    StreamingClusters.compactState(spark, s, "maint1") // must not throw
    assert(Manifest.memberPartitions(setsRoot,
        Manifest.currentVersion(setsRoot))
      .groupBy(_._2).valuesIterator.map(_.size).max == 1,
      "the retried compaction must land")
    // and a redelivery AFTER the successful compaction is a no-op
    // (the published member is manifest-owned — must NOT be GC'd)
    val v = Manifest.currentVersion(setsRoot)
    StreamingClusters.compactState(spark, s, "maint1")
    assert(Manifest.currentVersion(setsRoot) == v,
      "redelivered compaction tag must be a no-op")
    StreamingClusters.foldBatch(spark, batch(2), s, "b2", 0.9)
    val got = fp(Manifest.read(spark, s"$s/labels",
      Manifest.currentVersion(s"$s/labels")))
    val (_, _, sPlain) = dirs("cmpcrash-plain")
    (0 until 3).foreach(b =>
      StreamingClusters.foldBatch(spark, batch(b), sPlain, s"b$b", 0.9))
    assert(got == fp(Manifest.read(spark, s"$sPlain/labels",
        Manifest.currentVersion(s"$sPlain/labels"))),
      "the post-crash drain must equal the clean twin")
  }

  test("deleteDocs: post-delete state equals a from-scratch drain of the remaining corpus; re-adds are clean") {
    // the retraction leg (r16): delete every 7th-ish doc from a fully
    // drained state — shrinks, splits and whole-cluster removals all
    // occur on this corpus — and the persisted labels must equal
    // clustering (corpus − victims) from scratch (the q488 oracle
    // argument). Then the victims RE-ARRIVE as a fold batch: physical
    // deletion means no trace in sets/prefixes/labels, so the re-add
    // is a clean arrival and the state equals a from-scratch run of
    // the full corpus again.
    val (_, _, s) = dirs("delete")
    StreamingClusters.foldBatch(spark, docs, s, "b0", threshold = 0.9)
    val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    StreamingClusters.deleteDocs(spark, victims, s, "del1", threshold = 0.9)
    def scratch(d: DataFrame) = fp(Dedup.duplicateClusters(
      Dedup.jaccardPairs(StreamingClusters.tokenSets(d)
        .select(col("id"), col("ts")), threshold = 0.9)
        .select("a_id", "b_id"),
      d.select("doc_id")))
    val got = fp(Manifest.read(spark, s"$s/labels",
      Manifest.currentVersion(s"$s/labels")))
    assert(got == scratch(docs.filter(col("doc_id") % 7 =!= 3)),
      "post-delete labels must equal from-scratch on the remaining corpus")
    // (no untouched-bucket pin HERE: these victims touch the corpus's
    // 231-doc mega-cluster, whose members legitimately occupy every
    // label bucket — the bounded-rewrite pin lives in the bridge test
    // below and in BucketedIndexSpec)
    // physical removal: no trace left in sets or prefixes
    val vIds = victims.withColumnRenamed("doc_id", "id")
    assert(Manifest.read(spark, s"$s/sets",
        Manifest.currentVersion(s"$s/sets"))
      .join(vIds, Seq("id"), "left_semi").isEmpty,
      "victims' sets rows must be physically gone")
    assert(Manifest.read(spark, s"$s/prefixes",
        Manifest.currentVersion(s"$s/prefixes"))
      .join(vIds, Seq("id"), "left_semi").isEmpty,
      "victims' prefix rows must be physically gone")
    // redelivered delete tag is a no-op (the ref ledger)
    val v = Manifest.currentVersion(s"$s/labels")
    StreamingClusters.deleteDocs(spark, victims, s, "del1", threshold = 0.9)
    assert(Manifest.currentVersion(s"$s/labels") == v)
    // a delete of ALREADY-ABSENT ids under a fresh tag heals its
    // ledger and changes nothing (indistinguishable from the
    // post-commit/pre-ref crash window; commits are atomic)
    StreamingClusters.deleteDocs(spark, victims, s, "del1b", threshold = 0.9)
    assert(Manifest.currentVersion(s"$s/labels") == v &&
      Manifest.refVersion(s"$s/labels", "del1b").isDefined)
    // re-add the victims: a clean arrival, back to the full corpus
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 7 === 3), s, "b1", threshold = 0.9)
    assert(fp(Manifest.read(spark, s"$s/labels",
        Manifest.currentVersion(s"$s/labels"))) == scratch(docs),
      "re-adding deleted docs must equal from-scratch on the full corpus")
  }

  test("deleteDocs: a bridge deletion SPLITS the cluster; sizes and ids re-derive exactly") {
    import spark.implicits._
    val (_, _, s) = dirs("delsplit")
    // a ~ b ~ c at τ=0.5 but a ≁ c: one 3-doc chain cluster (id 1),
    // plus an exact pair {10, 11} and a singleton 20
    val corpus = Seq(
      (1L, "w1 w2 w3 w4"),
      (2L, "w1 w2 w3 w4 u1 u2 u3 u4"),
      (3L, "u1 u2 u3 u4"),
      (10L, "p1 p2 p3"), (11L, "p1 p2 p3"),
      (20L, "z1 z2 z3")).toDF("doc_id", "text")
    StreamingClusters.foldBatch(spark, corpus, s, "b0", threshold = 0.5)
    assert(fp(Manifest.read(spark, s"$s/labels", 1))
      .filter(_._1 <= 3L) == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
    val labBefore = Manifest.memberPartitions(s"$s/labels", 1).map(_._1).toSet
    // delete the bridge (2) AND the whole pair cluster {10, 11}
    StreamingClusters.deleteDocs(spark,
      Seq(2L, 10L, 11L).toDF("doc_id"), s, "del1", threshold = 0.5)
    val got = fp(Manifest.read(spark, s"$s/labels",
      Manifest.currentVersion(s"$s/labels")))
    assert(got == Seq((1L, 1L, 1L), (3L, 3L, 1L), (20L, 20L, 1L)),
      s"the bridge delete must split {1,2,3} into singletons: $got")
    // the rewrite is bucket-bounded: an untouched doc's bucket member
    // survives verbatim (doc 20 is in no touched cluster)
    val labAfter = Manifest.memberPartitions(s"$s/labels",
      Manifest.currentVersion(s"$s/labels")).map(_._1).toSet
    assert((labBefore & labAfter).nonEmpty,
      "a component-bounded delete must not rewrite untouched label buckets")
  }

  test("deleteDocs guards: partial overlap is loud; crash-window retries are clean") {
    import spark.implicits._
    val (_, _, s) = dirs("delguard")
    StreamingClusters.foldBatch(spark, docs, s, "b0", threshold = 0.9)
    // partial overlap (one known victim, one never-drained id): loud
    val e = intercept[IllegalArgumentException] {
      StreamingClusters.deleteDocs(spark,
        Seq(3L, 99999999L).toDF("doc_id"), s, "delbad", threshold = 0.9)
    }
    assert(e.getMessage.contains("partial"), e.getMessage)
    // crash windows: plant the prefix-deleted and the
    // prefix+sets-deleted states (the op's own tags), then retry the
    // FULL delete — bit-identical to the clean twin
    val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val (_, _, sClean) = dirs("delguard-clean")
    StreamingClusters.foldBatch(spark, docs, sClean, "b0", threshold = 0.9)
    StreamingClusters.deleteDocs(spark, victims, sClean, "del1",
      threshold = 0.9)
    val want = fp(Manifest.read(spark, s"$sClean/labels",
      Manifest.currentVersion(s"$sClean/labels")))
    val vIds = victims.withColumnRenamed("doc_id", "id")
    val sv = Manifest.currentVersion(s"$s/sets")
    val vSets = BucketedIndex.prunedRead(spark, s"$s/sets", sv, vIds,
        Seq("id"), StreamingClusters.IndexBuckets)
      .join(vIds, Seq("id"), "left_semi").localCheckpoint()
    // window A: prefixes deleted, nothing else
    BucketedIndex.deleteBucketed(
      Dedup.jaccardPrefixes(vSets, 0.9).select(col("t"), col("id")),
      s"$s/prefixes", "del1-dpref", Seq("t"),
      StreamingClusters.IndexBuckets, Seq("t", "id"))
    // window B: sets deleted too
    BucketedIndex.deleteBucketed(vIds, s"$s/sets", "del1-dsets",
      Seq("id"), StreamingClusters.IndexBuckets, Seq("id"))
    StreamingClusters.deleteDocs(spark, victims, s, "del1", threshold = 0.9)
    assert(fp(Manifest.read(spark, s"$s/labels",
        Manifest.currentVersion(s"$s/labels"))) == want,
      "the crash-window retry must produce the clean-path labels")
  }

  test("CDC drain (adds + deletes in-stream) equals from-scratch on the survivors; resumes mid-stream") {
    def stamp(op: String, df: DataFrame) =
      df.select(lit(op).as("op"), col("doc_id"), col("text"))
    val batches = Seq(
      stamp("I", docs.filter(col("doc_id") % 3 === 0)),
      stamp("I", docs.filter(col("doc_id") % 3 === 1)),
      stamp("D", docs.filter(col("doc_id") % 3 =!= 2 &&
        col("doc_id") % 7 === 3)),
      stamp("I", docs.filter(col("doc_id") % 3 === 2)))
    def stageUpTo(feed: String, from: Int, until: Int): Unit =
      (from until until).foreach(i => LakeIngest.stageBatchFile(feed,
        s"day$i.parquet", 1000L * (i + 1), batches(i)))
    def scratch(d: DataFrame) = fp(Dedup.duplicateClusters(
      Dedup.jaccardPairs(StreamingClusters.tokenSets(d)
        .select(col("id"), col("ts")), threshold = 0.9)
        .select("a_id", "b_id"),
      d.select("doc_id")))
    val (f1, c1, s1) = dirs("cdc-oneshot")
    stageUpTo(f1, 0, 4)
    val oneShot = fp(StreamingClusters.docFeedToClustersCdc(
      spark, f1, c1, s1))
    val survivors = docs.filter(
      !(col("doc_id") % 3 =!= 2 && col("doc_id") % 7 === 3))
    assert(oneShot == scratch(survivors),
      "the CDC drain must equal from-scratch clustering of the survivors")
    // kill/restart between the delete batch and the last add batch
    val (f2, c2, s2) = dirs("cdc-resume")
    stageUpTo(f2, 0, 3)
    StreamingClusters.docFeedToClustersCdc(spark, f2, c2, s2).count()
    stageUpTo(f2, 3, 4)
    assert(fp(StreamingClusters.docFeedToClustersCdc(
        spark, f2, c2, s2)) == oneShot,
      "a resumed CDC drain must equal the uninterrupted drain bit for bit")
    // a MIXED batch (adds AND deletes in one file) applies
    // inserts-then-deletes: deleting a doc added in the same batch
    // and a doc from an earlier batch, both in one micro-batch
    import spark.implicits._
    val (f3, c3, s3) = dirs("cdc-mixed")
    LakeIngest.stageBatchFile(f3, "day0.parquet", 1000L, stamp("I", docs))
    val lone = Seq((999999L, "zqx wvu tsr qpo nml")).toDF("doc_id", "text")
    LakeIngest.stageBatchFile(f3, "day1.parquet", 2000L,
      stamp("I", lone).unionByName(
        stamp("D", lone.select(col("doc_id"), col("text")))
          .unionByName(stamp("D",
            docs.filter(col("doc_id") % 7 === 3)))))
    val mixed = fp(StreamingClusters.docFeedToClustersCdc(
      spark, f3, c3, s3))
    assert(mixed == scratch(docs.filter(col("doc_id") % 7 =!= 3)),
      "a mixed I+D batch must apply inserts first, then deletes")
  }

  test("resuming a state dir at a DIFFERENT threshold fails loudly") {
    // the stored prefix index and the cluster semantics are only
    // valid at the build threshold — a mixed-τ drain would silently
    // diverge from every from-scratch run (r13 review finding)
    val (_, _, s) = dirs("taupin")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") % 3 === 0), s, "b0", threshold = 0.9)
    val e = intercept[IllegalArgumentException] {
      StreamingClusters.foldBatch(spark,
        docs.filter(col("doc_id") % 3 === 1), s, "b1", threshold = 0.5)
    }
    assert(e.getMessage.contains("threshold"),
      s"expected the threshold pin, got: ${e.getMessage}")
  }

  test("a low-threshold misconfiguration trips the candidate guard loudly") {
    val (_, _, s) = dirs("tripwire")
    StreamingClusters.foldBatch(spark,
      docs.filter(col("doc_id") < 150), s, "b0", threshold = 0.05)
    val e = intercept[IllegalStateException] {
      StreamingClusters.foldBatch(spark,
        docs.filter(col("doc_id") >= 150 && col("doc_id") < 160),
        s, "b1", threshold = 0.05, maxCandidateFactor = Some(2.0))
    }
    assert(e.getMessage.contains("tripwire"),
      s"expected the candidate tripwire, got: ${e.getMessage}")
  }
}
