package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the IVF-PQ composed ANN (q420, r10 verdict item 5):
  * determinism (trained artifacts are sample-hash-ordered, scoring
  * is exact integer ADC, ties break on id), the recall floor vs
  * exact cosine top-k, and the scale property the composition
  * exists for — candidate IO proportional to the PROBED lists only.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def queryIds(n: Int) =
    emb.filter(col("vec_id") < n).select(col("vec_id").as("query_id"))

  private def bruteTopK(k: Int, nQueries: Int): Map[Long, Set[Long]] = {
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    (0L until nQueries.toLong).map { q =>
      q -> vs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
  }

  test("IVF-PQ top-k is bitwise run-to-run deterministic") {
    def run(): Seq[String] =
      Pq.ivfPqTopK(emb, "vec_id", "embedding", queryIds(20),
        nlist = 16, nprobe = 4, k = 5)
        .collect().map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}")
        .sorted.toSeq
    val a = run(); val b = run()
    assert(a.nonEmpty && a == b,
      "IVF-PQ ranking must be identical across runs (trained artifacts " +
        "are deterministic, ADC is integer, ties break on id)")
  }

  test("IVF-PQ recall@5 meets the floor vs exact cosine; full probe + big rerank ≈ exact") {
    val exact = bruteTopK(5, 20)
    def recallAt(nprobe: Int, rerank: Int): Double = {
      val got = Pq.ivfPqTopK(emb, "vec_id", "embedding", queryIds(20),
          nlist = 16, nprobe = nprobe, k = 5, rerank = rerank)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      (0L until 20L).map { q =>
        got.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0
      }.sum / 20.0
    }
    val r4 = recallAt(4, 32)
    val r16 = recallAt(16, 64)
    info(s"IVF-PQ recall@5: nprobe=4/rerank=32 → $r4; nprobe=16/rerank=64 → $r16")
    // nprobe=4 probes a quarter of the lists over PQ-coded residuals
    // — the serving configuration's floor
    assert(r4 >= 0.5, s"nprobe=4 recall collapsed: $r4")
    // probing every list with a generous rerank leaves only PQ
    // shortlist error — near-exact
    assert(r16 >= 0.9, s"full-probe recall must be near-exact: $r16")
    assert(r16 >= r4, "recall must not degrade with more probes")
  }

  // ---- persisted index (q485, r14 — the q415/q480/q481/q483
  // stored-index discipline applied to IVF-PQ) ----

  test("stored IVF-PQ: serving reads storage only and equals the in-memory path") {
    val root = TestSpark.tmpDir("pq-store").toString
    PqStore.build(emb, "vec_id", "embedding", root, nlist = 16)
    val idx = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    // artifacts round-trip exactly: centroids float-exact, codebook
    // integer-exact — so the stored path's scoring is bit-identical
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16)
    assert(idx.cents.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq,
      "stored centroids must round-trip bit-exact")
    assert(idx.model.codebook.toSeq ==
      Pq.trainResidualModel(emb, "vec_id", "embedding", cents,
        16, 16, 2048).codebook.toSeq,
      "stored codebook must round-trip bit-exact")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val stored = canon(PqStore.topKStored(spark, idx, emb, "vec_id",
      "embedding", queryIds(20), k = 5))
    val inMem = canon(Pq.ivfPqTopK(emb, "vec_id", "embedding",
      queryIds(20), nlist = 16, nprobe = 4, k = 5))
    assert(stored == inMem,
      "the stored serving path must equal the in-memory path bit for bit")
    // candidate IO ∝ probed lists at the FILE level: a 1-list probe's
    // pruned read opens only that list's bucket members
    val oneList = spark.range(1).select(lit(3).cast("int").as("ivf_list"))
    val opened = BucketedIndex.prunedMemberPaths(s"$root/codes",
      idx.version, oneList, Seq("ivf_list"), idx.numBuckets)
    val all = Manifest.members(s"$root/codes", idx.version)
    assert(opened.size < all.size,
      s"a 1-list probe opened ${opened.size}/${all.size} members — the " +
        "candidate scan does not follow the probed lists")
    // mis-stated parameters fail loudly
    intercept[IllegalArgumentException] {
      PqStore.load(spark, root, nlist = 8, nprobe = 4, m = 16, ksub = 16)
    }
    intercept[IllegalArgumentException] {
      PqStore.load(spark, root, nlist = 16, nprobe = 4, m = 8, ksub = 16)
    }
  }

  test("stored IVF-PQ: delta append is pure batch IO and serves new arrivals") {
    val root = TestSpark.tmpDir("pq-append").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
    PqStore.build(baseEmb, "vec_id", "embedding", root, nlist = 16)
    val built = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    val before = Manifest.memberPartitions(s"$root/codes", built.version)
      .map(_._1).toSet
    PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "day1")
    val v1 = Manifest.currentVersion(s"$root/codes")
    // append-only: EVERY base member survives verbatim (the fold
    // never touches a stored row — the family's cheapest maintenance)
    val after = Manifest.memberPartitions(s"$root/codes", v1).map(_._1).toSet
    assert(before.subsetOf(after),
      "an append must leave every existing member verbatim")
    assert((after -- before).forall(_.contains("day1-b")),
      "appended members must carry the batch tag")
    // the appended codes equal a re-encode under the same artifacts
    val idx = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    val storedCodes = idx.codes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = Pq.encodeResiduals(emb, "vec_id", "embedding", built.cents,
        built.model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(storedCodes == want,
      "stored codes after the append must equal a full encode under " +
        "the stored artifacts")
    // redelivery is a no-op; a duplicate id fails loudly
    assert(PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding",
      "day1") == v1)
    val e = intercept[IllegalArgumentException] {
      PqStore.appendDelta(idx, deltaEmb, "vec_id", "embedding", "day2")
    }
    assert(e.getMessage.contains("already present"))
    // serving the grown index keeps the recall floor and sees deltas
    val got = PqStore.topKStored(spark, idx, emb, "vec_id", "embedding",
        queryIds(20), k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val exact = bruteTopK(5, 20)
    val recall = (0L until 20L).map(q =>
      got.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0).sum / 20.0
    info(s"post-append stored IVF-PQ recall@5: $recall")
    assert(recall >= 0.5, s"post-append stored recall collapsed: $recall")
    assert(got.values.flatten.toSet.exists(_ % 10 == 0),
      "the grown index must surface delta arrivals as neighbors")
  }

  test("stored IVF-PQ: the id-grain guard catches different-vector reuse and stale-handle appends") {
    // r14 verdict item 5 + advice item 3: the old guard probed the
    // delta's OWN list buckets of the codes snapshot pinned at load —
    // an id reused with a DIFFERENT vector encodes into another list
    // and slipped it, and ids appended AFTER the handle loaded were
    // invisible to it. The members-ledger probe (StoredIndex
    // .requireNewIds at the CURRENT head) refuses both.
    val root = TestSpark.tmpDir("pq-idguard").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
    PqStore.build(baseEmb, "vec_id", "embedding", root, nlist = 16)
    val built = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "day1")
    // (a) stale handle: a SECOND append reusing the same pre-append
    // handle with the same ids must fail (the head knows them)
    val eStale = intercept[IllegalArgumentException] {
      PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "day2")
    }
    assert(eStale.getMessage.contains("already present"), eStale.getMessage)
    // (b) different-vector reuse: a BASE id arriving again with a
    // negated vector (→ a different coarse list, so the old
    // own-bucket probe saw nothing) must fail at the id grain
    val reused = baseEmb.limit(5).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val eReuse = intercept[IllegalArgumentException] {
      PqStore.appendDelta(built, reused, "vec_id", "embedding", "day3")
    }
    assert(eReuse.getMessage.contains("already present") &&
      eReuse.getMessage.contains("upsert"), eReuse.getMessage)
    // and neither refused append left partial state: codes equal the
    // clean base+day1 encode
    val idx = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    assert(idx.codes.count() == emb.count(),
      "a refused append must not land partial members")
  }

  test("stored IVF-PQ: the codes/members crash window completes under its OWN tag, refuses another (r15)") {
    // r15 advice item 2 (the PqStore twin of the MultiProbeSpec pin):
    // codes commit BEFORE the members ledger, so in the window between
    // the two the members-only id guard is blind — the same ids under
    // a DIFFERENT tag used to land duplicate code rows permanently.
    // The content-bucket second screen refuses that; the ORIGINAL
    // tag's retry just completes the ledger.
    val root = TestSpark.tmpDir("pq-crashwin").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
    PqStore.build(baseEmb, "vec_id", "embedding", root, nlist = 16)
    val built = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    // plant the window: dayA's codes landed, its members did not
    val coded = Pq.encodeResiduals(deltaEmb, "vec_id", "embedding",
        built.cents, built.model)
      .withColumnRenamed("vec_id", "id")
    StoredIndex.appendOnce(coded, s"$root/codes", "dayA", Seq("ivf_list"),
      built.numBuckets)
    val e = intercept[IllegalArgumentException] {
      PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "dayB")
    }
    assert(e.getMessage.contains("half-applied") &&
      e.getMessage.contains("ORIGINAL"), e.getMessage)
    // the original tag completes idempotently: each row exactly once
    PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "dayA")
    val idx = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    assert(idx.codes.count() == emb.count(),
      "the completed append must hold each code row exactly once")
    // and with the ledger healed, same ids now refuse at the id grain
    val e2 = intercept[IllegalArgumentException] {
      PqStore.appendDelta(built, deltaEmb, "vec_id", "embedding", "dayC")
    }
    assert(e2.getMessage.contains("already present"), e2.getMessage)
  }

  test("stored IVF-PQ: delete is a pruned COW retraction — vanishes from serving, re-adds cleanly (r16)") {
    val root = TestSpark.tmpDir("pq-delete").toString
    PqStore.build(emb, "vec_id", "embedding", root, nlist = 16)
    val built = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    // victims confined to ONE coarse list, so the pruned-COW claim is
    // non-vacuous (a corpus-wide victim set touches every file bucket
    // legitimately)
    val enc = Pq.encodeResiduals(emb, "vec_id", "embedding", built.cents,
      built.model).localCheckpoint()
    val listSel = enc.groupBy(col("ivf_list")).count()
      .filter(col("count") >= 5).agg(min(col("ivf_list")))
      .collect()(0).getInt(0)
    val victimIds = enc.filter(col("ivf_list") === listSel)
      .orderBy(col("vec_id")).limit(5)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val victims = emb.filter(col("vec_id").isin(victimIds: _*))
      .localCheckpoint()
    val nVict = victims.count()
    assert(nVict == 5)
    // a changed-vector delivery is LOUD (the routing check), never a
    // silent residue — checked BEFORE the real delete
    val wrong = victims.limit(3).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val eWrong = intercept[IllegalArgumentException] {
      PqStore.deleteDelta(built, wrong, "vec_id", "embedding", "dwrong")
    }
    assert(eWrong.getMessage.contains("re-derived"), eWrong.getMessage)
    // partial overlap (live ids + a never-added id) is loud
    import spark.implicits._
    val ePart = intercept[IllegalArgumentException] {
      PqStore.deleteDelta(built,
        victims.limit(2).unionByName(Seq((99999999L,
          Seq.fill(64)(0.1f))).toDF("vec_id", "embedding")),
        "vec_id", "embedding", "dpart")
    }
    assert(ePart.getMessage.contains("partial overlap"), ePart.getMessage)
    // the real delete: pruned COW — untouched code members verbatim
    val before = Manifest.memberPartitions(s"$root/codes", built.version)
      .map(_._1).toSet
    val v1 = PqStore.deleteDelta(built, victims, "vec_id", "embedding",
      "d1")
    val after = Manifest.memberPartitions(s"$root/codes", v1).map(_._1).toSet
    assert((before & after).nonEmpty,
      "a delete must not rewrite untouched code buckets")
    val idx = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    assert(idx.codes.count() == emb.count() - nVict)
    assert(idx.codes.join(victims.select(col("vec_id").as("id")),
      Seq("id"), "left_semi").isEmpty,
      "victims' code rows must be physically gone")
    // redelivered tag no-op; all-absent under a fresh tag is a quiet
    // applied-delete (the post-commit/pre-ledger window)
    assert(PqStore.deleteDelta(built, victims, "vec_id", "embedding",
      "d1") == v1)
    assert(PqStore.deleteDelta(built, victims, "vec_id", "embedding",
      "d2") == v1)
    // deleted ids never surface from the stored serving
    val got = PqStore.topKStored(spark, idx, emb, "vec_id", "embedding",
        queryIds(20), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && !got.exists(r => victimIds.contains(r._2)),
      "a deleted id must never surface from the stored index")
    // deleted ids are CLEAN re-arrivals, and the re-grown index equals
    // a full encode under the stored artifacts (the append pin)
    PqStore.appendDelta(idx, victims, "vec_id", "embedding", "re1")
    val regrown = PqStore.load(spark, root, nlist = 16, nprobe = 4,
      m = 16, ksub = 16)
    val storedCodes = regrown.codes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = Pq.encodeResiduals(emb, "vec_id", "embedding", built.cents,
        built.model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(storedCodes == want,
      "delete + re-add must round-trip to the full encode")
  }

  test("candidate IO is exactly the probed lists' rows — never the other lists") {
    val nlist = 16; val nprobe = 4
    val cands = Pq.ivfPqCandidates(emb, "vec_id", "embedding", queryIds(20),
      nlist, nprobe)
    // per query: exactly nprobe distinct probed lists
    val listsPerQuery = cands.groupBy("query_id")
      .agg(countDistinct(col("ivf_list")).as("nl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(listsPerQuery.values.forall(_ == nprobe.toLong),
      s"probe fan-out drifted: $listsPerQuery")
    // per (query, probed list): every row of that list (minus the
    // query itself) and NOTHING else — candidate count == list size
    // − self-hit, which pins "IO ∝ probed lists"
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist)
    val indexed = Similarity.ivfIndex(emb, "embedding", cents)
    val sizes = indexed.groupBy("ivf_list").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ownList = indexed.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("ivf_list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQL = cands.groupBy("query_id", "ivf_list").count()
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2)))
    assert(byQL.nonEmpty)
    byQL.foreach { case ((q, l), n) =>
      val expect = sizes(l) - (if (ownList(q) == l) 1L else 0L)
      assert(n == expect,
        s"query $q list $l: $n candidates vs list size ${sizes(l)} " +
          s"(self in list: ${ownList(q) == l})")
    }
  }
}
