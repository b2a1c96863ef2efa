package graft.operators

import graft.TestSpark
import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for multi-probe sign-LSH ANN (q477): determinism, the
  * recall improvement multi-probe exists for (vs single-probe at
  * the SAME index size), and candidate IO == the probed buckets'
  * rows exactly — the contracts standing in for a SQL oracle on an
  * approximate operator.
  */
class MultiProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private def queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"))
  private val planes = Vec.deterministicPlanes(nPlanes = 6, dim = 64)

  private def bruteTopK(k: Int): Map[Long, Set[Long]] = {
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    (0L until 20L).map { q =>
      q -> vs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
  }

  private def recallAt(nProbes: Int): Double = {
    val exact = bruteTopK(5)
    val got = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
        queries, planes, nProbes, k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    (0L until 20L).map { q =>
      got.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0
    }.sum / 20.0
  }

  test("multi-probe is bitwise run-to-run deterministic") {
    def run() = Similarity.multiProbeTopK(emb, "vec_id", "embedding",
        queries, planes, nProbes = 4, k = 5)
      .collect().map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}")
      .sorted.toSeq
    val a = run()
    assert(a.nonEmpty && a == run())
  }

  test("probing flip buckets recovers recall single-probe loses — at the SAME index size") {
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    val r7 = recallAt(7)
    info(s"recall@5: single-probe $r1, 4 probes $r4, 7 probes $r7")
    assert(r4 > r1, s"multi-probe must beat single-probe: $r4 vs $r1")
    assert(r7 >= r4, "recall must be probe-monotone")
    assert(r4 >= 0.2, s"4-probe recall collapsed: $r4")
  }

  test("candidate IO is exactly the probed buckets' rows") {
    val cands = Similarity.multiProbeCandidates(emb, "vec_id", "embedding",
      queries, planes, nProbes = 4).localCheckpoint()
    // per query: at most 4 distinct probed buckets surface (empty
    // probes produce no rows)
    val perQ = cands.groupBy("query_id")
      .agg(countDistinct(col("bucket")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perQ.nonEmpty && perQ.values.forall(_ <= 4))
    // per (query, probed bucket): EVERY row of that bucket minus the
    // query itself, nothing else — candidate IO ∝ probed buckets
    val sizes = emb.select(Vec.lshBucket(col("embedding"), planes).as("b"))
      .groupBy("b").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val own = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), Vec.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byQB = cands.groupBy("query_id", "bucket").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    byQB.foreach { case ((q, b), n) =>
      val expect = sizes(b) - (if (own(q) == b) 1L else 0L)
      assert(n == expect,
        s"query $q bucket $b: $n candidates vs bucket size ${sizes(b)}")
    }
  }

  test("an nProbes beyond base+one-flip-per-plane fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.multiProbeTopK(emb, "vec_id", "embedding", queries,
        planes, nProbes = 10, k = 5)
    }
    assert(e.getMessage.contains("nProbes"))
  }

  // ---- persisted index (q486, r14) ----

  test("stored index: serving reads probed bucket members only and equals the in-memory probe") {
    val root = TestSpark.tmpDir("slsh-store").toString
    SignLshStore.build(emb, "vec_id", "embedding", root,
      numPlanes = 6, dim = 64)
    val idx = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val stored = canon(SignLshStore.topKStored(spark, idx, emb, "vec_id",
      "embedding", queries, nProbes = 4, k = 5))
    val inMem = canon(Similarity.multiProbeTopK(emb, "vec_id", "embedding",
      queries, planes, nProbes = 4, k = 5))
    assert(stored == inMem,
      "the stored probe must equal the in-memory probe bit for bit")
    // file-level pruning: a 1-bucket probe opens only that bucket's
    // members, not the index
    val oneBucket = spark.range(1).select(lit(0L).as("bucket"))
    val opened = BucketedIndex.prunedMemberPaths(s"$root/buckets",
      idx.version, oneBucket, Seq("bucket"), idx.numBuckets)
    val all = Manifest.members(s"$root/buckets", idx.version)
    assert(opened.size < all.size,
      s"a 1-bucket probe opened ${opened.size}/${all.size} members")
    // a mis-stated plane count fails the bucket-range screen (fewer
    // planes → smaller bucket space than the stored values)
    intercept[IllegalArgumentException] {
      SignLshStore.load(spark, root, numPlanes = 3, dim = 64)
    }
  }

  test("stored index: delta append is pure batch IO, visible to the probe, duplicate-guarded") {
    val root = TestSpark.tmpDir("slsh-append").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
    SignLshStore.build(baseEmb, "vec_id", "embedding", root,
      numPlanes = 6, dim = 64)
    val built = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    val before = Manifest.members(s"$root/buckets", built.version).toSet
    SignLshStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "day1")
    val v1 = Manifest.currentVersion(s"$root/buckets")
    val after = Manifest.members(s"$root/buckets", v1).toSet
    assert(before.subsetOf(after),
      "an append must leave every existing member verbatim")
    assert((after -- before).forall(_.contains("day1-b")),
      "appended members must carry the batch tag")
    // redelivery no-op; duplicate ids loud
    assert(SignLshStore.appendDelta(built, deltaEmb, "vec_id",
      "embedding", "day1") == v1)
    val idx = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    val e = intercept[IllegalArgumentException] {
      SignLshStore.appendDelta(idx, deltaEmb, "vec_id", "embedding", "day2")
    }
    assert(e.getMessage.contains("already present"))
    // the grown index equals an in-memory probe over the full corpus
    // (bucket rows are per-row functions — append ≡ rebuild)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val stored = canon(SignLshStore.topKStored(spark, idx, emb, "vec_id",
      "embedding", queries, nProbes = 4, k = 5))
    val inMem = canon(Similarity.multiProbeTopK(emb, "vec_id", "embedding",
      queries, planes, nProbes = 4, k = 5))
    assert(stored == inMem,
      "post-append stored probe must equal the full-corpus in-memory probe")
  }

  test("stored index: the id-grain guard catches different-vector reuse and stale-handle appends") {
    // r14 verdict item 5 + advice item 3 (the SignLshStore twin of
    // the IvfPqSpec pin): the old guard probed the delta's OWN LSH
    // buckets of the snapshot pinned at load — an id reused with a
    // different vector hashes to another bucket and slipped it, and
    // ids appended after the handle loaded were invisible. The
    // members-ledger probe at the CURRENT head refuses both.
    val root = TestSpark.tmpDir("slsh-idguard").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
    SignLshStore.build(baseEmb, "vec_id", "embedding", root,
      numPlanes = 6, dim = 64)
    val built = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    SignLshStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "day1")
    val eStale = intercept[IllegalArgumentException] {
      SignLshStore.appendDelta(built, deltaEmb, "vec_id", "embedding",
        "day2")
    }
    assert(eStale.getMessage.contains("already present"), eStale.getMessage)
    val reused = baseEmb.limit(5).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val eReuse = intercept[IllegalArgumentException] {
      SignLshStore.appendDelta(built, reused, "vec_id", "embedding", "day3")
    }
    assert(eReuse.getMessage.contains("already present") &&
      eReuse.getMessage.contains("upsert"), eReuse.getMessage)
  }

  test("stored index: delete is a pruned COW retraction — vanishes from serving, re-adds cleanly (r16)") {
    val root = TestSpark.tmpDir("slsh-delete").toString
    SignLshStore.build(emb, "vec_id", "embedding", root,
      numPlanes = 6, dim = 64)
    val built = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    // victims confined to ONE LSH bucket, so the pruned-COW claim is
    // non-vacuous (a corpus-wide victim set touches every file bucket
    // legitimately)
    val assigned = emb.select(col("vec_id"),
      Vec.lshBucket(col("embedding"), built.planes).as("bucket"))
      .localCheckpoint()
    val bSel = assigned.groupBy(col("bucket")).count()
      .filter(col("count") >= 5).agg(min(col("bucket")))
      .collect()(0).getLong(0)
    val victimIds = assigned.filter(col("bucket") === bSel)
      .orderBy(col("vec_id")).limit(5)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val victims = emb.filter(col("vec_id").isin(victimIds: _*))
      .localCheckpoint()
    val nVict = victims.count()
    assert(nVict == 5)
    // changed-vector delivery is loud (the routing check)
    val wrong = victims.limit(3).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val eWrong = intercept[IllegalArgumentException] {
      SignLshStore.deleteDelta(built, wrong, "vec_id", "embedding",
        "dwrong")
    }
    assert(eWrong.getMessage.contains("re-derived"), eWrong.getMessage)
    val before = Manifest.members(s"$root/buckets", built.version).toSet
    val v1 = SignLshStore.deleteDelta(built, victims, "vec_id",
      "embedding", "d1")
    assert((before & Manifest.members(s"$root/buckets", v1).toSet)
      .nonEmpty, "a delete must not rewrite untouched buckets")
    val idx = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    assert(idx.buckets.count() == emb.count() - nVict)
    assert(idx.buckets.join(victims.select(col("vec_id").as("nid")),
      Seq("nid"), "left_semi").isEmpty,
      "victims' bucket rows must be physically gone")
    // redelivery no-op; all-absent fresh tag quiet; deleted ids never
    // surface; re-add equals the full-corpus probe again
    assert(SignLshStore.deleteDelta(built, victims, "vec_id",
      "embedding", "d1") == v1)
    assert(SignLshStore.deleteDelta(built, victims, "vec_id",
      "embedding", "d2") == v1)
    val got = SignLshStore.topKStored(spark, idx, emb, "vec_id",
        "embedding", queries, nProbes = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && !got.exists(r => victimIds.contains(r._2)),
      "a deleted id must never surface from the stored index")
    SignLshStore.appendDelta(idx, victims, "vec_id", "embedding", "re1")
    val regrown = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    assert(canon(SignLshStore.topKStored(spark, regrown, emb, "vec_id",
        "embedding", queries, nProbes = 4, k = 5)) ==
      canon(Similarity.multiProbeTopK(emb, "vec_id", "embedding",
        queries, planes, nProbes = 4, k = 5)),
      "delete + re-add must round-trip to the full-corpus probe")
  }

  test("stored index: the bucket/members crash window completes under its OWN tag, refuses another (r15)") {
    // r15 advice item 2: appendDelta commits bucket rows BEFORE the
    // members ledger. In the window between the two, the members-only
    // id guard is blind to the half-appended ids — the same ids
    // redelivered under a DIFFERENT tag used to pass it and land the
    // bucket rows twice, permanently. The content-bucket second
    // screen refuses that; the ORIGINAL tag's retry skips the guards
    // (its crashed attempt passed them) and just completes the ledger.
    val root = TestSpark.tmpDir("slsh-crashwin").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
    SignLshStore.build(baseEmb, "vec_id", "embedding", root,
      numPlanes = 6, dim = 64)
    val built = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    // plant the window: dayA's bucket rows landed, its members did not
    val rows = deltaEmb.select(col("vec_id").as("nid"),
      graft.functions.Vec.lshBucket(col("embedding"), built.planes)
        .as("bucket"))
    StoredIndex.appendOnce(rows, s"$root/buckets", "dayA", Seq("bucket"),
      built.numBuckets)
    val e = intercept[IllegalArgumentException] {
      SignLshStore.appendDelta(built, deltaEmb, "vec_id", "embedding",
        "dayB")
    }
    assert(e.getMessage.contains("half-applied") &&
      e.getMessage.contains("ORIGINAL"), e.getMessage)
    // the original tag completes idempotently: each row exactly once
    SignLshStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "dayA")
    val idx = SignLshStore.load(spark, root, numPlanes = 6, dim = 64)
    assert(idx.buckets.count() == emb.count(),
      "the completed append must hold each row exactly once")
    // and with the ledger healed, same ids now refuse at the id grain
    val e2 = intercept[IllegalArgumentException] {
      SignLshStore.appendDelta(built, deltaEmb, "vec_id", "embedding",
        "dayC")
    }
    assert(e2.getMessage.contains("already present"), e2.getMessage)
  }
}
