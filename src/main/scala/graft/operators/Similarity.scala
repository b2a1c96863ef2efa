package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour via IVF (inverted-file index) —
  * the coarse-quantization scale path next to the sign-LSH variant.
  *
  * Index: `nlist` spherical k-means centroids trained on a
  * DETERMINISTIC sample (global top-`sampleN` by `(xxhash64(id), id)`
  * — a TakeOrdered partial top-n per partition, never a full sort of
  * the corpus). Farthest-point init + a few Lloyd iterations on the
  * driver: the sample is a few thousand vectors regardless of corpus
  * size, which is exactly how large-scale IVF builds train their
  * coarse quantizer (train on a sample, assign the full corpus).
  *
  * Assignment is a PURE COLUMN EXPRESSION: the trained centroids are
  * literals in the plan, each corpus vector scores all `nlist`
  * centroids in one codegen'd projection and takes the argmax — no
  * join, no window, no shuffle. Same for query probe selection
  * (top-`nprobe` via `array_sort` of a literal-sized array). The only
  * shuffle in the whole operator is the final candidate equi-join on
  * `ivf_list`, which touches ~nprobe/nlist of the corpus per query.
  *
  * Search: a query probes only its `nprobe` nearest centroid lists;
  * exact re-rank (VecCosine) inside the probed lists.
  *
  * Determinism: sample selection is hash-ordered with an id
  * tie-break; Lloyd runs on the driver over a fixed-order sample with
  * index-ascending float64 accumulation; ties in assignment and probe
  * order break toward the smallest centroid index. Same corpus →
  * same index, on any cluster size or partitioning.
  */
object Similarity {

  /** Signature/assignment passes are CPU-bound narrow maps; when the
    * input arrives as fewer partitions than cores (one small file),
    * fan it out first. No-op on real multi-partition inputs (same
    * discipline as Dedup.parallelized).
    */
  private def parallelized(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(parallelism / 2, 1))
      df.repartition(parallelism)
    else df
  }

  /** Train spherical k-means centroids on a deterministic sample.
    * Returns ≤ `nlist` unit-norm centroids (fewer only when the
    * corpus itself has fewer vectors).
    */
  def kmeansCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int = 5,
      sampleN: Int = 2048): Array[Array[Float]] = {
    // deterministic sample: TakeOrderedAndProject, not a corpus sort
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .map(normalize)

    val k = math.min(nlist, sample.length)
    if (k == 0) return Array.empty

    // farthest-point init: deterministic spread without an RNG
    val centroids = new Array[Array[Double]](k)
    centroids(0) = sample(0)
    var c = 1
    while (c < k) {
      var bestIdx = -1
      var bestScore = Double.MaxValue // min over chosen of max-cosine
      var i = 0
      while (i < sample.length) {
        var nearest = -1.0
        var j = 0
        while (j < c) {
          val s = dot(sample(i), centroids(j))
          if (s > nearest) nearest = s
          j += 1
        }
        // the point least similar to its nearest chosen centroid
        if (nearest < bestScore) { bestScore = nearest; bestIdx = i }
        i += 1
      }
      centroids(c) = sample(bestIdx)
      c += 1
    }

    // Lloyd: assign (argmax cosine, tie → lowest index), re-mean,
    // re-normalize; an emptied cluster keeps its previous centroid
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](k)
      var i = 0
      while (i < sample.length) {
        var best = 0
        var bestSim = dot(sample(i), centroids(0))
        var j = 1
        while (j < k) {
          val s = dot(sample(i), centroids(j))
          if (s > bestSim) { bestSim = s; best = j }
          j += 1
        }
        val acc = sums(best)
        val v = sample(i)
        var d = 0
        while (d < v.length) { acc(d) += v(d); d += 1 }
        counts(best) += 1
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) centroids(j) = normalize(sums(j))
        j += 1
      }
      iter += 1
    }
    centroids.map(_.map(_.toFloat))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    if (n == 0.0) v else v.map(_ / n)
  }

  /** `array<struct<s, ni>>` scoring `vecCol` against every centroid:
    * `s` = cosine, `ni` = negated index so that struct-max / sort
    * order breaks similarity ties toward the SMALLEST centroid index.
    * Evaluated per row inside whole-stage codegen — no join.
    */
  private[operators] def centroidScores(vecCol: Column, cents: Array[Array[Float]]): Column =
    array(cents.zipWithIndex.map { case (cv, i) =>
      struct(
        Vec.cosine(vecCol, typedlit(cv.toSeq)).as("s"),
        lit(-i).as("ni"))
    }: _*)

  /** Nearest-centroid id (argmax cosine) as a narrow expression. */
  private def nearestList(vecCol: Column, cents: Array[Array[Float]]): Column =
    -array_max(centroidScores(vecCol, cents)).getField("ni")

  /** Corpus with an `ivf_list` assignment column — one narrow
    * codegen'd projection over the corpus, no shuffle. Prefer the
    * centroid-taking overload when also searching: train once, pass
    * the same centroids to both.
    */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    ivfIndex(emb, vecCol, kmeansCentroids(emb, idCol, vecCol, nlist))

  /** Assignment against pre-trained centroids (no training pass). */
  def ivfIndex(emb: DataFrame, vecCol: String, cents: Array[Array[Float]]): DataFrame =
    parallelized(emb).withColumn("ivf_list", nearestList(col(vecCol), cents))

  /** Top-k neighbours for each query id, probing `nprobe` lists.
    * Centroids are re-derived from the same deterministic training
    * rule, so index and search can never disagree — or pass the
    * trained centroids explicitly to skip the second training pass.
    */
  def ivfTopK(
      indexed: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame, // single column `query_id`
      nlist: Int,
      nprobe: Int,
      k: Int): DataFrame =
    ivfTopK(indexed, idCol, vecCol, queryIds,
      kmeansCentroids(indexed, idCol, vecCol, nlist), nprobe, k)

  /** Search against pre-trained centroids (no training pass). */
  def ivfTopK(
      indexed: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      cents: Array[Array[Float]],
      nprobe: Int,
      k: Int): DataFrame = {
    // a silent min() here would mask a misconfigured nprobe as
    // "probe everything" — fail loudly instead (same discipline as
    // SignLsh's dim check)
    require(cents.nonEmpty, "ivfTopK: no centroids (empty corpus?)")
    require(nprobe >= 1 && nprobe <= cents.length,
      s"ivfTopK: nprobe=$nprobe out of range [1, ${cents.length}] " +
        "(nprobe must not exceed the trained centroid count)")
    val queries = indexed.join(queryIds, indexed(idCol) === queryIds("query_id"))
      .select(col("query_id"), col(vecCol).as("qv"))

    // probe assignment: top-nprobe centroids per query, computed by
    // sorting the literal-sized score array — narrow, no window
    val probes = queries
      .withColumn("__probe",
        explode(slice(reverse(array_sort(centroidScores(col("qv"), cents))),
          1, nprobe)))
      .select(col("query_id"), col("qv"), (-col("__probe.ni")).as("ivf_list"))

    // candidate join restricted to probed lists, exact re-rank
    val rw = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col(idCol))
    probes.join(indexed, Seq("ivf_list"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim", Vec.cosine(col("qv"), col(vecCol)))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** EXACT cosine-threshold self-join via block-partitioned
    * equi-joins (the "triangle join") — no CartesianProduct /
    * BroadcastNestedLoopJoin node anywhere in the plan.
    *
    * Why not LSH candidates here: an OR-construction over sign-LSH
    * tables misses a pair with probability `(1 − p^r)^L` where
    * `p = 1 − θ/π`. That vanishes fast for near-dup thresholds
    * (τ ≥ 0.7 → see `cosineNearDupLsh`), but when the threshold sits
    * INSIDE the bulk of the similarity distribution, borderline pairs
    * make recall 1.0 unreachable: on the sf0.1 corpus, a qualifying
    * pair at sim 0.45011 (θ/π ≈ 0.3515) needs ~1,100 tables to
    * collide — far more work than evaluating every pair. Exact
    * semantics over an un-gapped threshold is irreducibly O(n²)
    * compute; what scale engineering buys is the SHAPE:
    *
    *  - each vector is hash-assigned to one of `blocks` blocks (a
    *    narrow map), and each unordered block pair is evaluated
    *    exactly once — join keys `(ba, bb)` give `B(B+1)/2` evenly
    *    sized work units, so the evaluate stage parallelizes across
    *    `~B²/2` shuffle keys (a cartesian gives Spark nothing to
    *    partition evenly by);
    *  - shuffle volume is `n·(B+1)/2` rows (each vector replicated
    *    once per partner block), NOT n² — pair evaluation streams
    *    through the codegen'd VecCosine filter inside the join,
    *    never materializing the pair space;
    *  - `blocks` sizes the work unit: pick `B` ≥ cluster cores so
    *    every core gets blocks, with `n/B` vectors per block fitting
    *    a hash-join partition.
    */
  def cosineThresholdPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blocks: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Identical-vector collapse (the shared Collapse machinery, same
    // discipline as jaccardPairs): a 100 TB web corpus is 30-60%
    // exact duplicates, and duplicated documents embed to the SAME
    // vector — one window shuffle groups equal arrays under a min-id
    // representative so the quadratic triangle join runs over
    // DISTINCT vectors only; verdicts expand back to member cross
    // pairs afterward. Exactness is preserved: cosine is a pure
    // function of the two vectors.
    val collapsed = Collapse.byValue(
      emb.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "id")
    val members = collapsed.members // ids only — tiny
    val dvecs = collapsed.distinct
    val block = pmod(xxhash64(col("id")), lit(blocks.toLong))
    val a = dvecs.select(col("id").as("a_id"), col("v").as("va"),
      block.as("ba"))
    val b = dvecs.select(col("id").as("b_id"), col("v").as("vb"),
      block.as("bb"))
    // every unordered block combo once; the tiny combo table
    // broadcast-fans each side out to its partner blocks, then the
    // composite (ba, bb) equi-join gives B(B+1)/2 balanced work units
    val combos = (for { i <- 0 until blocks; j <- i until blocks }
      yield (i.toLong, j.toLong)).toDF("ba", "bb")
    val repPairs = a.join(broadcast(combos), "ba")
      .join(b.join(broadcast(combos), "bb"), Seq("ba", "bb"))
      // same-block combo evaluates each unordered pair once via the
      // id order; cross-block combos are already unique by key order
      .filter(col("ba") =!= col("bb") || col("a_id") < col("b_id"))
      // NaN guard: a zero-norm vector yields cosine 0/0 = NaN, and
      // Spark orders NaN ABOVE every value — an unguarded >= would
      // pair degenerate vectors with the whole corpus. Projected to
      // a column FIRST so the hottest expression in the repo is
      // evaluated exactly once per candidate regardless of codegen
      // subexpression elimination.
      .withColumn("cos", Vec.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold && !isnan(col("cos")))
      // cross-block pairs carry no id-order guarantee — canonicalize
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
    // expansion (shared Collapse machinery): a verdict between reps
    // covers every member cross pair; a multi-member group adds its
    // internal pairs whenever the shared vector passes its own
    // self-cosine (norm > 0 — a zero vector matches nothing, per the
    // NaN guard) — the eligibility frame expresses that edge rule
    val cross = Collapse.expandInterPairs(repPairs, members)
      .select(col("a_id"), col("b_id"))
    val eligible = dvecs
      .withColumn("selfcos", Vec.cosine(col("v"), col("v")))
      .filter(col("selfcos") >= threshold && !isnan(col("selfcos")))
      .select(col("id").as("rep"))
    val intra = Collapse.intraPairs(members, eligible)
      .select(col("a_id"), col("b_id"))
    cross.unionByName(intra)
  }

  /** Exact cross-side cosine pairs ≥ `threshold` between a
    * batch-sized QUERY set and a standing corpus — the SEMANTIC
    * contamination check (eval set vs training corpus), the vector
    * sibling of [[Dedup.crossJaccardPairs]]. Every (query row,
    * corpus row) pair at or above the threshold is emitted as
    * (q_id, c_id); sides are roles, not an unordered pair — no
    * canonicalization, no intra-side pairs.
    *
    * Scale design: the query side is an EVAL SET — thousands of
    * rows at any corpus scale — so its collapsed representatives
    * broadcast and the corpus streams through the codegen'd cosine
    * filter ONCE, with zero corpus shuffle beyond the identical-
    * vector collapse window. Both sides collapse first (the shared
    * [[Collapse]] discipline: a duplicated eval prompt and its 40
    * corpus near-copies cost ONE representative evaluation, not
    * 40); verdicts expand through each side's own member list. The
    * NaN guard keeps zero-norm vectors (cosine 0/0) from matching
    * the corpus; the cosine is projected once, never re-evaluated.
    * For symmetric big×big joins use [[cosineNearDupLsh]] on the
    * union instead — a broadcast query side is this operator's
    * contract, enforced loudly by `maxQueryRows`.
    */
  def crossCosinePairs(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxQueryRows: Long = 1000000L): DataFrame = {
    val q = Collapse.byValue(
      queries.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "id")
    val c = Collapse.byValue(
      parallelized(corpus.select(col(idCol).as("id"), col(vecCol).as("v"))),
      "v", "id")
    // loud broadcast-contract guard: a bounded limit probe, not a
    // full count — the query side must be eval-set-sized
    val probe = q.distinct.limit((maxQueryRows + 1).toInt).count()
    require(probe <= maxQueryRows,
      s"crossCosinePairs query side exceeds $maxQueryRows distinct " +
        "vectors — this operator broadcasts the query side; use " +
        "cosineNearDupLsh on the union for big-big joins")
    val repPairs = c.distinct
      .select(col("id").as("c_id"), col("v").as("vc"))
      .crossJoin(broadcast(q.distinct
        .select(col("id").as("q_id"), col("v").as("vq"))))
      .withColumn("cos", Vec.cosine(col("vq"), col("vc")))
      .filter(col("cos") >= threshold && !isnan(col("cos")))
      .select(col("q_id"), col("c_id"))
    repPairs
      .join(q.members.select(col("rep").as("q_id"), col("id").as("__q")), "q_id")
      .join(c.members.select(col("rep").as("c_id"), col("id").as("__c")), "c_id")
      .select(col("__q").as("q_id"), col("__c").as("c_id"))
  }

  /** Near-duplicate pairs (cosine ≥ `threshold`) via multi-table
    * sign-LSH candidate generation + exact VecCosine verify — the
    * 100 TB path for REAL near-dup thresholds (τ ≥ ~0.7), where the
    * similarity distribution has a gap above the bulk.
    *
    * Table count is derived from the documented miss bound: a pair
    * at exactly `threshold` collides in one table with probability
    * `p^r`, `p = 1 − arccos(τ)/π`, so `L = ⌈ln(targetMiss) /
    * ln(1 − p^r)⌉` bounds the per-pair miss probability by
    * `targetMiss`; pairs above the threshold miss even less. Only
    * `(table, bucket, id)` rows enter the candidate join — vectors
    * are re-joined for the verify stage, so the shuffle never
    * carries payloads (same discipline as minHashLsh).
    */
  def cosineNearDupLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int = 64,
      planesPerTable: Int = 8,
      targetMiss: Double = 1e-6,
      seed: Long = 42L): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, "threshold in (0, 1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val perTable = math.pow(p, planesPerTable)
    val tables = math.max(1,
      math.ceil(math.log(targetMiss) / math.log1p(-perTable)).toInt)
    val planes = Vec.deterministicPlanes(tables * planesPerTable, dim, seed)

    // planesPerTable sizes the bucket space per table (2^r buckets):
    // more planes per table → more tables L for the same miss bound,
    // but random-pair collisions fall as p(0)^r = 2^-r per table, so
    // total candidates L·n²·2^-r shrink fast. r=8 (256 buckets) is
    // the right regime once corpora reach thousands of vectors.
    val vecs = parallelized(emb.select(col(idCol).as("id"), col(vecCol).as("v")))
    // signatures feed both sides of the candidate self-join — persist
    // so the L·r projections per vector compute once (see minHashLsh)
    val banded = vecs.select(col("id"),
      posexplode(Vec.signLshBuckets(col("v"), planes, planesPerTable))
        .as(Seq("tbl", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = banded.select(col("tbl"), col("bucket"), col("id").as("a_id"))
    val cb = banded.select(col("tbl"), col("bucket"), col("id").as("b_id"))
    val candidates = ca.join(cb, Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    val verified = candidates
      .join(vecs.select(col("id").as("a_id"), col("v").as("va")), "a_id")
      .join(vecs.select(col("id").as("b_id"), col("v").as("vb")), "b_id")
      // NaN guard, same as cosineThresholdPairs: zero-norm vectors
      // cosine to NaN, which Spark orders above every threshold.
      // Single projected evaluation — no reliance on codegen CSE.
      .withColumn("cos", Vec.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold && !isnan(col("cos")))
      .select("a_id", "b_id")
      .localCheckpoint() // see minHashLsh: materialize + GC-cleanable
    banded.unpersist()
    verified
  }

  /** Multi-probe sign-LSH ANN (Lv et al., VLDB'07, the 1-step probe
    * sequence): single-bucket LSH ANN (q42's shape) loses near
    * neighbors that fall JUST across one hyperplane — they land in
    * an adjacent bucket. Multi-probe recovers them WITHOUT more
    * tables: each query also probes the buckets reached by flipping
    * its lowest-|margin| sign bits — the planes the query sits
    * closest to, exactly where a true neighbor most likely
    * disagrees. The corpus index is untouched (ONE bucket per
    * vector); only the few queries fan out `nProbes` ways, so
    * candidate IO is ~nProbes × single-probe cost while index size
    * stays 1× (the memory trade that makes multi-probe the standard
    * production LSH).
    *
    * Deterministic end to end: planes are literals, margins exact
    * float64 in the SAME accumulation order as the bucket bits
    * ([[graft.functions.Vec.lshBucket]]'s zip_with fold), |margin|
    * ties break to the lower plane index, scoring is exact cosine
    * with (sim desc, id) ties. Approximate by construction →
    * rows-only; MultiProbeSpec pins determinism, the recall
    * improvement over single-probe, and candidate IO == probed
    * buckets' rows exactly.
    */
  def multiProbeTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame, // single column `query_id`
      planes: Array[Array[Double]],
      nProbes: Int,
      k: Int): DataFrame =
    multiProbeRank(
      multiProbeCandidates(emb, idCol, vecCol, queryIds, planes, nProbes), k)

  /** [[multiProbeTopK]] under a pluggable index source (see
    * [[multiProbeCandidatesFrom]]) — the stored-index serving entry.
    */
  private[operators] def multiProbeTopKFrom(
      indexedFor: DataFrame => DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      planes: Array[Array[Double]],
      nProbes: Int,
      k: Int): DataFrame =
    multiProbeRank(multiProbeCandidatesFrom(indexedFor, emb, idCol,
      vecCol, queryIds, planes, nProbes), k)

  /** Exact-cosine rank + top-k over a multi-probe candidate frame —
    * one definition shared by the in-memory and stored paths.
    */
  private def multiProbeRank(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nid"))
    cands
      .withColumn("sim", Vec.cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nid").as("neighbor_id"), col("rank"))
  }

  /** The candidate frame of [[multiProbeTopK]] —
    * (query_id, qv, bucket probed, nid, nv) — exposed (the
    * ivfPqCandidates pattern) so MultiProbeSpec can pin candidate IO
    * to the probed buckets' rows exactly.
    */
  def multiProbeCandidates(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      planes: Array[Array[Double]],
      nProbes: Int): DataFrame = {
    val indexed = parallelized(emb)
      .select(col(idCol).as("nid"), col(vecCol).as("nv"),
        Vec.lshBucket(col(vecCol), planes).as("bucket"))
    multiProbeCandidatesFrom(_ => indexed, emb, idCol, vecCol, queryIds,
      planes, nProbes)
  }

  /** The multi-probe candidate core under a PLUGGABLE index source —
    * `indexedFor` maps the probed (query_id, qv, bucket) spine to the
    * index rows (nid, nv, bucket) the join may score. The in-memory
    * form passes the constant one-pass projection; the stored form
    * ([[SignLshStore.topKStored]]) reads only the probed buckets'
    * members. Any SUPERSET of the probed buckets' rows is correct
    * (the join keys on bucket) — the bucket-pruning contract.
    */
  private[operators] def multiProbeCandidatesFrom(
      indexedFor: DataFrame => DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      planes: Array[Array[Double]],
      nProbes: Int): DataFrame = {
    require(nProbes >= 1 && nProbes <= planes.length + 1,
      s"multiProbe: nProbes=$nProbes out of range [1, ${planes.length + 1}] " +
        "(the base bucket plus at most one flip per plane)")
    // queries are FEW (the serving asymmetry): the margin sort and
    // probe fan-out run interpreted per query row, then the probed
    // (query, bucket) spine BROADCASTS into the index join — the
    // corpus never shuffles
    val margins = array(planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      struct(abs(Vec.dot(plane, col("qv"))).as("m"), lit(i).as("i"))
    }: _*)
    val queries = emb.join(queryIds, col(idCol) === col("query_id"))
      .select(col("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", Vec.lshBucket(col("qv"), planes))
      .withColumn("flips", slice(array_sort(margins), 1, nProbes - 1))
      .withColumn("bucket", explode(concat(array(col("bucket")),
        transform(col("flips"), f =>
          col("bucket").bitwiseXOR(element_at(
            array(planes.indices.map(i => lit(1L << i)): _*),
            f.getField("i") + 1))))))
      .select(col("query_id"), col("qv"), col("bucket"))
    broadcast(queries).join(indexedFor(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("nid"))
  }
}
