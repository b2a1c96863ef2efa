package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection suite for document corpora.
  *
  * Everything is built from codegen'd column expressions —
  * `transform`/`filter`/`aggregate`/`xxhash64` — so signatures are
  * computed in one narrow map over the corpus (no shuffle), and only
  * compact signatures + ids shuffle into the candidate join. That is
  * the property that lets each algorithm run over 100 TB: the
  * candidate-pair stage never touches document bytes, and the final
  * verify joins payloads back for candidates only.
  *
  * Algorithms:
  *  - exact:      content-digest groupBy (see TextOps q32)
  *  - minHashLsh: shingle → minhash signature → banded buckets →
  *                bucket join → exact-Jaccard verify
  *  - simHash:    token-hash bit voting → 64-bit fingerprint →
  *                chunk-blocked join → Hamming verify
  *  - ngramJaccard: exact Jaccard over shingle sets via an
  *                inverted-index equi-join (no cross join)
  *
  * Determinism: all hashes are xxhash64 (fixed seed 42); permutation
  * constants come from splitmix64(seed) — reproducible across runs,
  * partitionings, and cluster sizes.
  */
object Dedup {

  /** Word n-gram shingles of `textCol`, as distinct 64-bit hashes.
    * Hashing shingles immediately keeps the row footprint bounded
    * regardless of document size.
    */
  def shingleHashes(textCol: Column, n: Int): Column = {
    // native one-pass expression: the composed transform/concat_ws
    // form paid ~20 us interpreter overhead PER SHINGLE (see
    // ShingleHashes64); semantics identical (delimiter-joined
    // n-grams, whole-doc shingle for short docs, distinct output)
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.ShingleHashes64(
      GraftColumnBridge.expression(textCol), n))
  }

  /** Signature passes are CPU-bound narrow maps; when the input
    * arrives as fewer partitions than cores (one small file), fan it
    * out first. No-op on real multi-partition inputs.
    */
  private def parallelized(docs: DataFrame): DataFrame = {
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < math.max(parallelism / 2, 1))
      docs.repartition(parallelism)
    else docs
  }

  /** The minhash permutation salt stream (exposed for the SQL
    * function registry so both surfaces share one hash family).
    */
  private[graft] def permSalts(numPerm: Int, seed: Long = 42L): Seq[Long] =
    splitmix(seed, numPerm).toSeq

  /** |A ∩ B| of two sorted duplicate-free long arrays — native merge
    * walk (see SortedIntersectCount). Union size = na + nb − count.
    */
  private def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Splitmix64 stream, used for minhash permutation constants. */
  private def splitmix(seed: Long, count: Int): Array[Long] = {
    var x = seed
    Array.fill(count) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** MinHash signature column (array<long> of length `numPerm`) over
    * a column of shingle-hash arrays. The i-th "permutation" is
    * xxhash64(shingle, salt_i) — independent per-salt hash families,
    * no overflow under ANSI arithmetic, deterministic everywhere.
    * Computed by the single-pass codegen MinHashSig expression
    * (identical hash family to the k-sweep Column formulation).
    */
  def minHashSignature(shingles: Column, numPerm: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.MinHashSig(
      GraftColumnBridge.expression(shingles), splitmix(seed, numPerm).toSeq))
  }

  /** Candidate pairs whose minhash signatures collide in at least
    * one LSH band, verified with exact Jaccard ≥ `threshold`.
    * Output: (a_id, b_id), a_id < b_id, deterministic.
    */
  def minHashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    // shingle arrays feed both the banding branch and the verify
    // branch — persist so the (string-heavy) shingling runs once;
    // sorted so the verify stage can merge-walk instead of hash-set
    val shingleSets = parallelized(docs).select(
      col(idCol).as("id"),
      array_sort(shingleHashes(col(textCol), shingleN)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band hash: one bucket key per band over its signature slice.
    // Candidate generation carries ONLY (band, bucket, id) — the
    // shingle arrays stay out of the join and the dedup shuffle;
    // they are re-joined for the (much smaller) verify stage. At
    // scale this is the difference between shuffling ids and
    // shuffling the corpus.
    val banded = minHashBuckets(shingleSets, "sh", numPerm, bands)

    val a = banded.select(col("band"), col("bucket"), col("id").as("a_id"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("b_id"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    val verified = candidates
      .join(shingleSets.select(col("id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(shingleSets.select(col("id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter", sortedIntersectCount(col("sha"), col("shb")).cast("double"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("double") - col("inter"))
      .filter(col("inter") / col("uni") >= threshold)
      .select("a_id", "b_id")
      // localCheckpoint (not persist): materializes the small pair
      // set so the corpus-sized shingle cache can be released, and
      // the checkpointed blocks are GC-cleaned with the DataFrame —
      // repeated invocations don't accumulate CacheManager entries
      .localCheckpoint()
    shingleSets.unpersist()
    verified
  }

  /** Banded LSH bucket rows `(id, band, bucket)` of a shingle-set
    * frame — the PERSISTED INDEX UNIT of the minhash family (the
    * [[jaccardPrefixes]] analog for the approximate path): a
    * standing corpus materializes these once (e.g. a [[Manifest]]
    * table, O(bands) longs per doc regardless of threshold), and an
    * incremental probe shuffles only its own batch's bucket rows
    * against the stored index. Bucket key = xxhash64 over the band's
    * signature slice (`numPerm / bands` minhash values); shared by
    * the self-join ([[minHashLsh]]) and the cross probe
    * ([[crossMinHashLsh]]) so index build and probe can never
    * diverge.
    */
  def minHashBuckets(
      sets: DataFrame,
      setCol: String,
      numPerm: Int = 32,
      bands: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(bands >= 1 && numPerm % bands == 0,
      s"minHashBuckets: bands=$bands must divide numPerm=$numPerm")
    val rowsPerBand = numPerm / bands
    sets.select(col("id"),
        minHashSignature(col(setCol), numPerm, seed).as("mh"))
      .select(col("id"),
        posexplode(array((0 until bands).map { b =>
          xxhash64((0 until rowsPerBand).map(r =>
            element_at(col("mh"), b * rowsPerBand + r + 1)): _*)
        }: _*)).as(Seq("band", "bucket")))
  }

  /** A band-bucket index TOGETHER with the parameters it was built
    * under — the reconstruction contract for a PERSISTED index: the
    * bucket rows are meaningless without (numPerm, bands, seed), and
    * a probe that recomputes delta buckets under different values
    * would silently produce near-zero candidates (band slice hashes
    * differ for every doc). Carrying the parameters in the handle
    * makes the probe derive them from the index — they cannot
    * diverge in-process; a caller reconstructing from storage states
    * them once, next to the frame they describe.
    */
  final case class LshBucketIndex(
      buckets: DataFrame, numPerm: Int, bands: Int, seed: Long)

  /** Build the [[LshBucketIndex]] of a [[jaccardSets]] frame (the
    * persisted form is `buckets` written out plus the three
    * parameters recorded alongside — they are part of the index).
    */
  def lshBucketIndex(
      sets: DataFrame,
      numPerm: Int = 32,
      bands: Int = 8,
      seed: Long = 42L): LshBucketIndex =
    LshBucketIndex(minHashBuckets(sets, "ts", numPerm, bands, seed),
      numPerm, bands, seed)

  /** Incremental MinHash-LSH dedup probe against a PERSISTED
    * band-bucket index — the APPROXIMATE twin of the exact
    * prefix-index probe ([[crossJaccardPairsPre]] / q415): a daily
    * batch checks the standing corpus by joining its own bucket rows
    * against the STORED index on (band, bucket), then exact-verifies
    * candidates at Jaccard ≥ `threshold` on the sorted shingle sets
    * (the delta's computed here, the base's read from storage).
    *
    * Why both twins exist: the exact prefix index is lossless but
    * its prefix length grows as the threshold drops (τ → 0 indexes
    * whole documents and candidates degenerate); the LSH index is
    * O(bands) rows per doc AT ANY THRESHOLD with recall following
    * the band curve — the production trade for low-τ dedup over
    * 100 TB. Candidates here are IDENTICAL to running [[minHashLsh]]
    * over base ∪ delta and keeping cross pairs (signatures and band
    * keys are per-doc), so the cross probe loses nothing vs the
    * batch self-join — spec-A/B'd, through a parquet round trip.
    *
    * Inputs are [[jaccardSets]] frames (id, ts, n); the delta's
    * buckets are derived under the INDEX's own parameters, so probe
    * and index can never disagree. Output: (a_id ∈ delta,
    * b_id ∈ base).
    *
    * `assumeDisjoint` skips the delta-vs-base id guard — set it ONLY
    * when the caller has already proven disjointness at sub-corpus
    * cost (the r13-verdict item-5 pattern: a base sets table written
    * id-BUCKETED lets the proof probe just the delta's id bucket
    * members — [[BucketedIndex.prunedRead]] — instead of this
    * guard's full base-side scan per probe; q480 does exactly that).
    * The default keeps the loud full scan.
    */
  def crossMinHashLsh(
      deltaSets: DataFrame,
      baseSets: DataFrame,
      threshold: Double,
      index: LshBucketIndex,
      assumeDisjoint: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    // delta/base disjointness ENFORCED unless the caller proved it
    // cheaper (the incrementalClusters discipline): an overlapping
    // id would silently emit (x, x) self-verdicts into downstream
    // dedup decisions. Broadcast the delta ids; the base side streams
    // map-side.
    if (!assumeDisjoint)
      require(baseSets.select(col("id"))
          .join(broadcast(deltaSets.select(col("id")).distinct()),
            Seq("id"), "left_semi").isEmpty,
        "crossMinHashLsh: delta ids overlap base ids — delta must be " +
          "NEW arrivals, or the probe would emit self-pairs")
    val dBuckets = minHashBuckets(deltaSets, "ts",
      index.numPerm, index.bands, index.seed)
    val bBuckets = index.buckets
    val cand = dBuckets.select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(bBuckets.select(col("band"), col("bucket"), col("id").as("b_id")),
        Seq("band", "bucket"))
      .select("a_id", "b_id").distinct()
    verifyCrossPairs(cand, deltaSets, baseSets, threshold)
  }

  /** 64-bit SimHash fingerprint of the token multiset: bit k is the
    * majority vote over tokens' hash-bit k. Native codegen
    * expression (one fused loop; see SimHash64).
    */
  def simHash(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val hashes = transform(split(textCol, " "), t => xxhash64(t))
    GraftColumnBridge.column(graft.functions.expressions.SimHash64(
      GraftColumnBridge.expression(hashes)))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ `maxHamming`.
    * Blocking: split the 64-bit fingerprint into `maxHamming + 1`
    * chunks — any pair within distance d must agree on ≥1 chunk
    * (pigeonhole), so candidates come from chunk-equality joins,
    * never a cross join.
    */
  def simHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = parallelized(docs)
      .select(col(idCol).as("id"), simHash(col(textCol)).as("fp"))
    hammingPairs64(fp, maxHamming)
  }

  /** Near-dup pairs among 64-bit fingerprints `(id: long, fp: long)`
    * by Hamming distance ≤ `maxHamming` — the blocking core shared
    * by text SimHash (q37) and perceptual media dHash (q471). Split
    * the fingerprint into `maxHamming + 1` DISJOINT bit chunks: any
    * pair within distance d ≤ maxHamming has ≥1 chunk with zero
    * differing bits (pigeonhole), so candidates form in chunk-
    * equality equi-joins — never a cross join — and the exact
    * `bit_count` verify keeps the output EQUAL to the brute-force
    * Hamming join. The pigeonhole argument requires the chunks to
    * COVER all 64 bits, i.e. `maxHamming + 1` divides 64 (use
    * maxHamming in 0/1/3/7/15/31/63) — enforced loudly: a partial
    * cover would silently miss pairs whose differing bits fall in
    * the uncovered remainder.
    */
  def hammingPairs64(
      fps: DataFrame,
      maxHamming: Int,
      maxCandidateFactor: Option[Double] = None): DataFrame = {
    val chunks = maxHamming + 1
    require(chunks >= 1 && 64 % chunks == 0,
      s"hammingPairs64: maxHamming + 1 = $chunks must divide 64 " +
        "(maxHamming in 0/1/3/7/15/31/63) — a partial chunk cover " +
        "silently misses pairs whose differing bits fall outside " +
        "the chunks")
    // IDENTICAL-FINGERPRINT COLLAPSE (r12 verdict item 2): a
    // dup-heavy media corpus — the workload perceptual dedup exists
    // for; crawls carry the same logo/banner 10⁴–10⁶ times — puts
    // all n copies of a fingerprint in the same chunk buckets, so
    // the raw pigeonhole join forms all O(n²) pairs. Run the
    // quadratic join over DISTINCT fingerprints only (min-id
    // representative per fp — the shared [[Collapse]] machinery the
    // Jaccard join uses) and expand afterwards: intra-group pairs
    // are Hamming 0 ≤ maxHamming always, and an inter-group verdict
    // for (repA, repB) holds verbatim for every member cross pair
    // (identical fingerprints ⇒ identical XOR). Exactness preserved;
    // worst-case candidate cost O(distinct²), not O(n²).
    val reps = Collapse.byValue(fps, "fp", "id").labeled
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = reps.select(col("rep"), col("id"))
    val dfps = reps.filter(col("id") === col("rep"))
      .select(col("id"), col("fp"))

    val candidates0 = hammingCandidates64(dfps, maxHamming)
    val candidates = if (maxCandidateFactor.isDefined)
      candidates0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else candidates0
    // operational tripwire mirroring jaccardPairs: fail loudly when
    // the chunk blocking degenerates (e.g. a corpus whose distinct
    // fingerprints still share chunk keys near-universally) instead
    // of letting an O(distinct²) slide into a 100 TB run unnoticed
    maxCandidateFactor.foreach { f =>
      val nFps = dfps.count()
      val nCand = candidates.count()
      if (nCand > f * math.max(nFps, 1L)) {
        candidates.unpersist()
        reps.unpersist()
        throw new IllegalStateException(
          s"hammingPairs64: $nCand candidate pairs over $nFps distinct " +
            s"fingerprints exceeds the $f× tripwire — the chunk blocking " +
            "has degenerated (low-entropy fingerprints). Lower maxHamming " +
            "(more, narrower chunks) or raise maxCandidateFactor.")
      }
    }

    val verifiedReps = candidates
      .filter(bit_count(col("fpa").bitwiseXOR(col("fpb"))) <= maxHamming)
      .select("a_id", "b_id")
    val inter = Collapse.expandInterPairs(verifiedReps, members)
      .select("a_id", "b_id")
    val intra = Collapse.intraPairs(members, dfps.select(col("id").as("rep")))
      .select("a_id", "b_id")
    val out = inter.unionByName(intra)
      .localCheckpoint() // see minHashLsh: materialize + GC-cleanable
    if (maxCandidateFactor.isDefined) candidates.unpersist()
    reps.unpersist()
    out
  }

  /** Pigeonhole chunk rows `(id, fp, chunk, ckey)` of a fingerprint
    * frame — the Hamming family's index unit (the [[minHashBuckets]]
    * analog): `maxHamming + 1` disjoint bit chunks per fingerprint,
    * candidates form wherever a chunk key matches. Shared by the
    * self-join ([[hammingPairs64]]) and the cross probe
    * ([[crossHammingPairs64]]).
    */
  private[operators] def hammingChunkRows64(
      fps: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val baseMask = if (bitsPer == 64) -1L else (1L << bitsPer) - 1
    fps.select(col("id"), col("fp"),
      posexplode(array((0 until chunks).map { c =>
        col("fp").bitwiseAND(lit(baseMask << (c * bitsPer)))
      }: _*)).as(Seq("chunk", "ckey")))
  }

  /** The pigeonhole chunk-equality candidate join of
    * [[hammingPairs64]] over DISTINCT fingerprints `(id, fp)` —
    * exposed separately (the allPairsCandidates pattern) so specs
    * can pin candidate counts directly. Output: (a_id, b_id, fpa,
    * fpb), every true pair present (false positives verified
    * downstream by the exact bit_count).
    */
  private[graft] def hammingCandidates64(
      dfps: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = hammingChunkRows64(dfps, maxHamming)
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("a_id"), col("fp").as("fpa"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("b_id"), col("fp").as("fpb"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "fpa", "fpb").distinct()
  }

  /** The PERSISTED Hamming index of a fingerprint corpus `(id, fp)`:
    * chunk rows over the DISTINCT fingerprints (min-id representative
    * each — the identical-fp collapse, so a dup-heavy media corpus
    * stores and probes O(distinct) rows), the (rep, id) member table
    * verdicts expand through, and the RADIUS the chunk cover was
    * built at — a stored cover is only valid at its own maxHamming
    * (different radii chunk different bit widths), so the radius is
    * part of the index, not a probe-time argument. Both frames are
    * plain columnar rows — materialize them once (e.g. [[Manifest]]
    * tables) and every later probe reads the index instead of
    * re-fingerprinting the corpus; record maxHamming alongside.
    */
  final case class HammingIndex64(
      chunks: DataFrame, members: DataFrame, maxHamming: Int)

  def hammingIndex64(fps: DataFrame, maxHamming: Int): HammingIndex64 = {
    val chunks = maxHamming + 1
    require(chunks >= 1 && 64 % chunks == 0,
      s"hammingIndex64: maxHamming + 1 = $chunks must divide 64 " +
        "(maxHamming in 0/1/3/7/15/31/63)")
    // the labeled frame feeds BOTH outputs (chunks via the distinct
    // reps, members) — materialize once, or each write action
    // re-fingerprints the corpus and re-runs the value-keyed window
    val labeled = Collapse.byValue(fps, "fp", "id").labeled
      .localCheckpoint()
    HammingIndex64(
      hammingChunkRows64(labeled.filter(col("id") === col("rep"))
        .select(col("id"), col("fp")), maxHamming),
      labeled.select(col("rep"), col("id")),
      maxHamming)
  }

  /** Cross-side Hamming pairs between a DELTA fingerprint frame
    * `(id, fp)` and a standing BASE corpus's [[hammingIndex64]] —
    * the incremental probe of the Hamming family (the
    * q406/q415/q480 delta-vs-base discipline applied to SimHash
    * text and dHash media fingerprints): a daily batch checks the
    * corpus WITHOUT re-pairing base×base, and the base index can
    * come from storage. The probe's radius and chunking come FROM
    * THE INDEX (they cannot diverge in-process); a 1-row sanity
    * probe validates a storage-reconstructed index against its
    * declared radius, since a wrong declaration silently drops true
    * pairs. The delta side collapses identical fingerprints
    * in-probe; verdicts expand cross-side on both member tables
    * (identical fps ⇒ identical XOR — exactness preserved, candidate
    * cost O(distinct_delta × colliding distinct_base)). Delta and
    * base id spaces must be disjoint (new arrivals) — ENFORCED
    * loudly. Output: (a_id ∈ delta, b_id ∈ base) — EQUAL to the
    * brute-force cross Hamming join at ≤ `base.maxHamming`
    * (spec-pinned).
    *
    * `assumeDisjoint` skips the delta-vs-base id guard — set it ONLY
    * when the caller has already proven disjointness at sub-corpus
    * cost (the r13-verdict item-5 pattern: a members table written
    * id-BUCKETED lets the proof probe just the delta's id bucket
    * members — [[BucketedIndex.prunedRead]] — instead of this
    * guard's full member-table scan per probe; q481 does exactly
    * that). The default keeps the loud full scan: a silent overlap
    * would emit self-pairs into downstream dedup decisions.
    */
  /** `membersByRep` (optional) makes the VERDICT-EXPANSION leg
    * candidate-bounded (the r15 crossJaccardPairsStored discipline
    * applied to the Hamming family's last full-table read): given the
    * verified base-rep frame (one `rep` column, delta-bounded), it
    * must return a SUPERSET of the member rows whose `rep` is in it —
    * e.g. [[prunedHammingMembers]] over a rep-BUCKETED copy of the
    * members table. Without it, `base.members` streams whole
    * (map-side, exact, O(index) read IO per probe). The verified reps
    * materialize before the closure runs, so the expensive chunk join
    * never re-runs for the bucket collect.
    */
  def crossHammingPairs64(
      deltaFps: DataFrame,
      base: HammingIndex64,
      assumeDisjoint: Boolean = false,
      membersByRep: Option[DataFrame => DataFrame] = None): DataFrame = {
    val maxHamming = base.maxHamming
    val chunks = maxHamming + 1
    require(chunks >= 1 && 64 % chunks == 0,
      s"crossHammingPairs64: maxHamming + 1 = $chunks must divide 64 " +
        "(maxHamming in 0/1/3/7/15/31/63)")
    // storage-reconstruction guard: every stored chunk row must obey
    // ckey == fp & mask(chunk) under THIS radius's masks, and carry
    // chunk < chunks. One sampled row catches a mismatched
    // declaration loudly instead of returning a near-empty result.
    val bitsPer = 64 / chunks
    val baseMask = if (bitsPer == 64) -1L else (1L << bitsPer) - 1
    base.chunks.limit(1).collect().foreach { r =>
      val c = r.getAs[Int]("chunk"); val fp = r.getAs[Long]("fp")
      val ckey = r.getAs[Long]("ckey")
      require(c >= 0 && c < chunks && ckey == (fp & (baseMask << (c * bitsPer))),
        s"crossHammingPairs64: the stored index is inconsistent with " +
          s"maxHamming=$maxHamming (sampled chunk=$c, ckey=$ckey, fp=$fp) — " +
          "a chunk cover is only valid at the radius it was built at; " +
          "reconstruct HammingIndex64 with the build-time maxHamming")
    }
    // delta/base disjointness ENFORCED unless the caller proved it
    // cheaper (see the assumeDisjoint doc; the crossMinHashLsh twin)
    if (!assumeDisjoint)
      require(base.members.select(col("id"))
          .join(broadcast(deltaFps.select(col("id")).distinct()),
            Seq("id"), "left_semi").isEmpty,
        "crossHammingPairs64: delta ids overlap the index's member ids — " +
          "delta must be NEW arrivals, or the probe would emit self-pairs")
    val dReps = Collapse.byValue(deltaFps, "fp", "id").labeled
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dChunks = hammingChunkRows64(
      dReps.filter(col("id") === col("rep")).select(col("id"), col("fp")),
      maxHamming)
    val verifiedReps0 = dChunks
      .select(col("chunk"), col("ckey"), col("id").as("a_id"), col("fp").as("fpa"))
      .join(base.chunks.select(col("chunk"), col("ckey"),
        col("id").as("b_id"), col("fp").as("fpb")), Seq("chunk", "ckey"))
      .select("a_id", "b_id", "fpa", "fpb").distinct()
      .filter(bit_count(col("fpa").bitwiseXOR(col("fpb"))) <= maxHamming)
    // delta-bounded; feeds the pruned members' bucket collect AND the
    // expansion joins when the candidate-bounded leg is on
    val verifiedReps =
      if (membersByRep.isDefined) verifiedReps0.localCheckpoint()
      else verifiedReps0
    val bMembers = membersByRep.fold(base.members)(f =>
      f(verifiedReps.select(col("b_id").as("rep"))))
    val out = verifiedReps
      .join(dReps.select(col("rep").as("a_id"), col("id").as("__da")), "a_id")
      .join(bMembers.select(col("rep").as("b_id"), col("id").as("__db")), "b_id")
      .select(col("__da").as("a_id"), col("__db").as("b_id"))
      .localCheckpoint() // see minHashLsh: materialize + GC-cleanable
    dReps.unpersist()
    out
  }

  /** The pruned stored Hamming MEMBERS read for the verdict-expansion
    * leg: a rep-BUCKETED copy of the index's (rep, id) member table
    * (write with `commitBucketed(index.members, root, tag, Seq("rep"),
    * numBuckets)`), read pruned to the verified reps' buckets. Feed
    * as [[crossHammingPairs64]]'s `membersByRep`. (The id-bucketed
    * members copy serves the id-grain arrival guard — the two key
    * grains genuinely need two layouts, and the table is two longs
    * per row.)
    */
  def prunedHammingMembers(
      spark: org.apache.spark.sql.SparkSession,
      memRepRoot: String,
      version: Int,
      numBuckets: Int)(reps: DataFrame): DataFrame =
    BucketedIndex.prunedRead(spark, memRepRoot, version, reps.select("rep"),
      Seq("rep"), numBuckets)

  /** Winnowing fingerprint (rolling-hash document sketch): the k
    * minimum shingle hashes, sorted — a compact content signature
    * whose overlap estimates containment. One narrow map; the
    * sketch (k longs) is all that ever shuffles.
    */
  def winnowFingerprint(textCol: Column, shingleN: Int = 3, k: Int = 16): Column =
    slice(array_sort(shingleHashes(textCol, shingleN)), 1, k)

  /** Exact Jaccard-threshold self-join over pre-hashed, SORTED
    * element-set arrays `(id, ts: array<long>)` — the shared core of
    * token-set (q35) and n-gram (q38) similarity joins. Three
    * published, exactness-preserving prunes (AllPairs/PPJoin,
    * Bayardo et al. 2007 / Xiao et al. 2008):
    *
    *  - PREFIX FILTER: Jaccard ≥ τ ⇒ overlap ≥ ⌈τ·|d|⌉, and any
    *    pair with that overlap shares an element among each side's
    *    first `|d| − ⌈τ·|d|⌉ + 1` elements — only those enter the
    *    inverted index. Because the global order is HASH order, the
    *    prefix elements are a uniform sample of each set, so posting
    *    lists stay balanced even when the raw element distribution
    *    is skewed (a lexicographic order degenerates: every set's
    *    prefix starts with the alphabet's smallest tokens).
    *  - LENGTH FILTER: τ·|a| ≤ |b| ≤ |a|/τ, applied inside the
    *    candidate join before any pair materializes.
    *  - POSITION FILTER: a pair matching at 0-based prefix positions
    *    (pa, pb) has overlap ≤ min(|a|−pa, |b|−pb); requiring that
    *    to reach α = ⌈τ/(1+τ)·(|a|+|b|)⌉ prunes the row. Safe under
    *    the trailing distinct: the pair's FIRST common element (all
    *    common elements sit at positions ≥ it) always satisfies the
    *    bound if the pair truly qualifies.
    *
    * Candidates are then verified on the full sets — no false
    * negatives. Output: (a_id, b_id, c, na, nb, jaccard), exact.
    *
    * IDENTICAL-SET COLLAPSE: the AllPairs filters are exactness-
    * preserving but degenerate on low-entropy corpora (a tiny shared
    * vocabulary means every pair shares a prefix element — candidates
    * approach n²/2). The corpora where a high-τ join explodes are
    * exactly the near-duplicate-heavy ones where most qualifying
    * pairs ARE identical sets, so the join here runs over DISTINCT
    * sets only (min-id representative per equal `ts` array), and the
    * result is expanded back afterwards: intra-group pairs all have
    * jaccard exactly 1.0 = n/(2n−n) ≥ τ, and an inter-group verdict
    * for (repA, repB) holds verbatim for every member cross pair
    * (identical sets ⇒ identical similarity). Exactness preserved;
    * worst-case candidate cost drops from O(n²) to O(distinct²).
    */
  /** Each set labeled with its identical-set group's min-id
    * representative: one shuffle groups equal arrays (the shared
    * [[Collapse.byValue]] machinery). Factored out so the plan-dump
    * tool can show the collapsed candidate join.
    */
  private[graft] def repLabeled(sets0: DataFrame): DataFrame =
    Collapse.byValue(sets0, "ts", "id").labeled
      .withColumn("n", size(col("ts")))

  /** `maxCandidateFactor`: optional operational tripwire — fail
    * loudly when the candidate count exceeds `factor × distinct
    * sets`, i.e. the AllPairs filters have degenerated on a
    * low-entropy corpus and the join is heading toward O(n²) work
    * that an approximate minhash pass would avoid. Off by default
    * (exact semantics never require it); turn it on in pipelines
    * where an unbounded exact join must never slip into a 100 TB run.
    */
  private[graft] def jaccardPairs(
      sets0: DataFrame,
      threshold: Double,
      maxCandidateFactor: Option[Double] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val reps = repLabeled(sets0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = reps.select(col("rep"), col("id")) // ids only — tiny
    val dsets = reps.filter(col("id") === col("rep"))
      .select(col("id"), col("ts"), col("n"))

    val candidates0 = allPairsCandidates(dsets, threshold)
    // tripwire needs a count; persist so the (ids-only) candidate set
    // isn't computed twice
    val candidates = if (maxCandidateFactor.isDefined)
      candidates0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else candidates0
    maxCandidateFactor.foreach { f =>
      val nSets = dsets.count()
      val nCand = candidates.count()
      if (nCand > f * math.max(nSets, 1L)) {
        candidates.unpersist()
        reps.unpersist()
        throw new IllegalStateException(
          s"jaccardPairs: $nCand candidate pairs over $nSets distinct sets exceeds " +
            s"the $f× tripwire — the corpus is too low-entropy for exact AllPairs " +
            "prefix filtering (near-all-pairs candidates). Use the approximate " +
            "minhash twin (Dedup.minHashLsh) or raise maxCandidateFactor.")
      }
    }

    val verifiedReps = candidates
      .join(dsets.select(col("id").as("a_id"), col("ts").as("ta"), col("n").as("na")), "a_id")
      .join(dsets.select(col("id").as("b_id"), col("ts").as("tb"), col("n").as("nb")), "b_id")
      // allocation-free merge walk over the sorted sets (the arrays
      // are ascending + distinct by construction above)
      .withColumn("c", sortedIntersectCount(col("ta"), col("tb")))
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)

    // inter-group expansion (shared Collapse machinery): every member
    // cross pair inherits the representatives' verdict; the sides' set
    // sizes na/nb swap with the canonicalization flag
    val inter = Collapse.expandInterPairs(verifiedReps, members)
      .select(col("a_id"), col("b_id"), col("c"),
        when(!col("swapped"), col("na")).otherwise(col("nb")).cast("long").as("na"),
        when(!col("swapped"), col("nb")).otherwise(col("na")).cast("long").as("nb"),
        col("jaccard"))

    // intra-group expansion: pairs of identical non-empty sets are
    // exact duplicates — c = n, jaccard = 1.0 (empty sets keep the
    // pre-collapse 0/0 = NaN semantics: never a pair — expressed as
    // the eligibility frame, per Collapse's edge-rule-ownership doc)
    val intra = Collapse.intraPairs(members,
        dsets.filter(col("n") > 0).select(col("id").as("rep"), col("n")))
      .select(col("a_id"), col("b_id"), col("n").cast("long").as("c"),
        col("n").cast("long").as("na"), col("n").cast("long").as("nb"),
        lit(1.0).as("jaccard"))

    val out = inter.unionByName(intra)
      .localCheckpoint() // see minHashLsh: materialize + GC-cleanable
    if (maxCandidateFactor.isDefined) candidates.unpersist()
    reps.unpersist()
    out
  }

  /** Exact containment-threshold self-join over the same sorted-hash
    * sets as [[jaccardPairs]] — the ASYMMETRIC twin: C(A→B) =
    * |A∩B|/|A| ≥ tNum/tDen means A sits (mostly) inside B — quotes,
    * partial copies, templated supersets — with NO upper bound on
    * |B|, which is exactly what Jaccard cannot express (a 50-token
    * quote inside a 5000-token page has Jaccard ≈ 0.01 but
    * containment 1.0). Threshold arithmetic is fully INTEGER:
    * req = ⌈t·|A|⌉ = (tNum·n + tDen−1) div tDen, verification keeps
    * c ≥ req — no float boundary cases on either engine.
    *
    * Exactness-preserving prunes:
    *  - A-side prefix filter: a qualifying pair shares an element in
    *    A's first n − req + 1 hash-ordered elements (all common
    *    elements past the prefix ⇒ c ≤ req − 1).
    *  - B-side FULL postings — the price of asymmetry: no length
    *    filter bounds |B| below its partner, so every element of B
    *    must be indexable. Only (id, n, element) rows shuffle,
    *    term-sharded like the q69 contamination join.
    *  - Position filter min(|A|−pa, |B|−pb) ≥ req and size filter
    *    |B| ≥ req, both inside the candidate join.
    *  - Identical-set collapse (shared [[Collapse]] machinery): the
    *    quadratic join runs over DISTINCT sets; intra-group ordered
    *    pairs are full containments both ways (c = n ≥ req always),
    *    inter-group verdicts expand ORIENTATION-PRESERVING (the
    *    canonicalizing expandInterPairs would destroy the direction).
    *
    * Output ORDERED pairs (`a_id` contained in `b_id`): a_id, b_id,
    * c, na, nb — all long. Empty sets never pair (0/0 undefined).
    */
  private[graft] def containmentPairs(
      sets0: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"containment threshold must be in (0, 1], got $tNum/$tDen")
    val labeled = Collapse.byValue(sets0, "ts", "id").labeled
      .withColumn("n", size(col("ts")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = labeled.select(col("rep"), col("id"))
    val dsets = labeled.filter(col("id") === col("rep") && col("n") > 0)
      .select(col("id"), col("ts"), col("n"))
      .withColumn("req", expr(s"($tNum * n + ${tDen - 1}) div $tDen"))

    val verifiedReps = containmentCandidates(dsets)
      .join(dsets.select(col("id").as("a_id"), col("ts").as("ta"),
        col("n").as("na"), col("req")), "a_id")
      .join(dsets.select(col("id").as("b_id"), col("ts").as("tb"),
        col("n").as("nb")), "b_id")
      .withColumn("c", sortedIntersectCount(col("ta"), col("tb")))
      .filter(col("c") >= col("req"))
      .select(col("a_id"), col("b_id"), col("c"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))

    val inter = verifiedReps
      .join(members.select(col("rep").as("a_id"), col("id").as("__ma")), "a_id")
      .join(members.select(col("rep").as("b_id"), col("id").as("__mb")), "b_id")
      .select(col("__ma").as("a_id"), col("__mb").as("b_id"),
        col("c"), col("na"), col("nb"))

    // intra: identical non-empty sets fully contain each other, both
    // directions (c = na = nb = n and req ≤ n always since t ≤ 1)
    val intraU = Collapse.intraPairs(members,
      dsets.select(col("id").as("rep"), col("n")))
    val intra = intraU.select(col("a_id"), col("b_id"), col("n"))
      .unionByName(intraU.select(col("b_id").as("a_id"),
        col("a_id").as("b_id"), col("n")))
      .select(col("a_id"), col("b_id"), col("n").cast("long").as("c"),
        col("n").cast("long").as("na"), col("n").cast("long").as("nb"))

    val out = inter.unionByName(intra).localCheckpoint()
    labeled.unpersist()
    out
  }

  /** Containment candidate generation over `(id, ts, n, req)` sets —
    * A-side prefix postings against B-side FULL postings with the
    * position and size filters, exposed separately so specs and the
    * plan-dump tool can show the candidate join (the driver-facing
    * query checkpoints past it). Exact: every qualifying ordered pair
    * appears, with false positives verified downstream.
    */
  private[graft] def containmentCandidates(dsets: DataFrame): DataFrame = {
    val aPref = dsets.select(col("id"), col("n"), col("req"),
      posexplode(slice(col("ts"), lit(1), col("n") - col("req") + 1))
        .as(Seq("p", "t")))
    val bAll = dsets.select(col("id"), col("n"),
      posexplode(col("ts")).as(Seq("p", "t")))
    aPref.as("a").join(bAll.as("b"),
        col("a.t") === col("b.t") && col("a.id") =!= col("b.id") &&
        col("b.n") >= col("a.req") &&
        least(col("a.n") - col("a.p"), col("b.n") - col("b.p")) >= col("a.req"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** AllPairs/PPJoin candidate generation over `(id, ts, n)` sets —
    * the prefix/length/position-filter join, exposed separately so
    * specs can measure candidate counts directly. Exactness: every
    * pair with Jaccard ≥ τ appears (possibly with false positives).
    */
  private[graft] def allPairsCandidates(sets: DataFrame, threshold: Double): DataFrame = {
    val tau = lit(threshold)
    val prefixLen = (col("n") - ceil(col("n") * tau).cast("int") + 1)
    val prefixes = sets.select(col("id"), col("n"),
      posexplode(slice(col("ts"), lit(1), prefixLen)).as(Seq("p", "t")))
    prefixes.as("a").join(prefixes.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id") &&
        col("b.n") >= col("a.n") * tau && col("a.n") >= col("b.n") * tau &&
        least(col("a.n") - col("a.p"), col("b.n") - col("b.p")) >=
          (tau / (lit(1.0) + tau)) * (col("a.n") + col("b.n")))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components
    * with the component's minimum id as the deterministic cluster
    * id, plus the component size. This is the step that turns a pair
    * list into dedup decisions (keep `doc_id == cluster_id`, drop the
    * rest — or sample per cluster).
    *
    * Algorithm: iterative min-label propagation. Each round is two
    * shuffles (edge-join + per-node min) on (id, label) pairs ONLY —
    * never payloads — and converges in diameter(component) rounds,
    * which for near-dup clusters is small (near-dup similarity is
    * close to transitive). Every round ends in a `localCheckpoint`,
    * so the plan never grows with the iteration count. The
    * convergence probe is an aggregated any-change count, not a
    * collect. For adversarially long chains at extreme scale, the
    * large-star/small-star rewriting (Kiveris et al., "Connected
    * Components in MapReduce", SoCC'14) drops rounds to O(log n) —
    * the loop shape here is the same, only the edge rewrite differs.
    *
    * `pairs`: (a_id, b_id) near-dup pairs. `ids`: one row per
    * document id (singletons become their own clusters).
    * Output: (doc_id, cluster_id, cluster_size).
    */
  def duplicateClusters(pairs: DataFrame, ids: DataFrame, maxIters: Int = 50): DataFrame = {
    val idCol = ids.columns.head
    // materialize the pair source once, so an expensive one (a
    // similarity join) never re-runs per consumer / per iteration
    val p = pairs.select(col(pairs.columns.head).as("s"), col(pairs.columns(1)).as("d"))
      .localCheckpoint()
    val labels = ccMinLabels(p, ids.select(col(idCol).as("id")), maxIters)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** Connected-component min-labels of `ids` under the (materialized)
    * pair list `p(s, d)` — the shared core of [[duplicateClusters]].
    * Two execution paths with IDENTICAL semantics (DedupSpec pins the
    * equivalence on random graphs, including edges with endpoints
    * outside `ids`, which both paths IGNORE — an unknown endpoint
    * never joins the label table, so it cannot bridge components):
    *
    *  - SMALL pair lists (≤ `spark.graft.cc.maxUnionFindPairs`,
    *    default 2M — bounded by what one task unions in memory in
    *    well under a second; raise/lower per executor heap) run an
    *    exact single-task union-find: the delta-bounded contraction
    *    graphs of [[incrementalClustersDeltaBy]] folds spent ~1.1 s
    *    per fold on 3 propagation rounds × ~9 AQE stage-jobs of pure
    *    scheduler/planning overhead to label a 634-node graph (r18
    *    profile). One job replaces the loop; known-endpoint rows ride
    *    the same single-partition exchange as the edges.
    *  - larger pair lists (or non-integral id types) keep the
    *    O(diameter) min-label-propagation loop, whose per-round work
    *    is two shuffles of (id, label) pairs only — the shape that
    *    scales to 100 TB.
    */
  private def ccMinLabels(p: DataFrame, ids: DataFrame, maxIters: Int,
      idsCoverEndpoints: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val spark = p.sparkSession
    val idType = ids.schema.head.dataType
    val integral = idType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val maxPairs = spark.conf.get("spark.graft.cc.maxUnionFindPairs",
      "2000000").toLong
    // the count is one cheap job over the checkpointed pair blocks;
    // skipped entirely when the fast path is disabled or inapplicable
    val nPairs = if (integral && maxPairs > 0) p.count() else Long.MaxValue
    if (integral && nPairs <= maxPairs) {
      // ids *cast long* is injective for integral types, so min-label
      // components in long-space equal components in id-space
      val pL = p.select(col("s").cast("long").as("s"),
        col("d").cast("long").as("d"))
      // the known endpoint set: delta-bounded (≤ 2·nPairs). When the
      // caller has PROVEN every edge endpoint is in `ids` and `ids`
      // itself is edge-bounded (the contraction fold: `touched` IS
      // the endpoint set, validated by the missing-endpoints guard),
      // feed ids straight in — no endpoint distinct, no broadcast
      // semi. Otherwise derive it with the (possibly corpus-sized)
      // `ids` streaming map-side against a broadcast.
      val known = (if (idsCoverEndpoints) ids.select(col("id").cast("long").as("s"))
        else {
          val endpoints = pL.select(col("s").as("id"))
            .union(pL.select(col("d").as("id"))).distinct()
          ids.select(col("id").cast("long").as("s"))
            .join(broadcast(endpoints.withColumnRenamed("id", "s")),
              Seq("s"), "left_semi")
        })
        .select(col("s"), lit(0L).as("d"), lit(true).as("__node"))
      val ufIn = known.unionByName(
          pL.select(col("s"), col("d"), lit(false).as("__node")))
        .select(col("s").as("_1"), col("d").as("_2"), col("__node").as("_3"))
      import org.apache.spark.sql.Encoders
      val enc3 = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaBoolean)
      val enc2 = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      val ufLabels = ufIn.as(enc3).repartition(1)
        .mapPartitions(unionFindMinLabels)(enc2)
        .toDF("id", "label")
        .select(col("id").cast(idType).as("id"),
          col("label").cast(idType).as("label"))
      // touched-node labels are delta-bounded — broadcast them so the
      // (possibly corpus-sized) id table never shuffles
      ids.join(broadcast(ufLabels), Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    } else {
      // symmetrize lazily off the checkpointed pair blocks
      val edges = p.union(p.select(col("d").as("s"), col("s").as("d")))
      var labels = ids.select(col("id"), col("id").as("label")).localCheckpoint()
      var updates = 0
      var converged = false
      // the convergence probe reads the SAME joined frame the update
      // does — no extra join per round — and runs before counting an
      // update, so a component of diameter exactly `maxIters` still
      // succeeds (its last probe sees the fixpoint)
      while (!converged && updates <= maxIters) {
        val minNbr = edges.join(labels.withColumnRenamed("id", "s"), "s")
          .groupBy(col("d").as("id")).agg(min(col("label")).as("nbr"))
        val joined = labels.join(minNbr, Seq("id"), "left").localCheckpoint()
        if (joined.filter(col("nbr") < col("label")).isEmpty) converged = true
        else {
          labels = joined.select(col("id"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
            .localCheckpoint()
          updates += 1
        }
      }
      if (!converged)
        throw new IllegalStateException(
          // the loop permits maxIters + 1 update rounds (the probe runs
          // before counting an update) — report the true bound
          s"duplicateClusters did not converge after ${maxIters + 1} update rounds — " +
            "component diameter exceeds the bound; raise maxIters or switch to star-rewriting")
      labels
    }
  }

  /** The single-task exact union-find of [[ccMinLabels]]' fast path:
    * input rows are either known-node registrations (`__node` = true)
    * or edges; edges whose endpoints are not BOTH registered are
    * ignored (the propagation loop's semantics). Emits (id, min id of
    * its component) for every registered node. Deterministic: the
    * union order varies with row arrival, but min-per-component does
    * not.
    */
  private def unionFindMinLabels(
      it: Iterator[(Long, Long, Boolean)]): Iterator[(Long, Long)] = {
    val idx = new java.util.HashMap[Long, Integer]()
    val nodeIds = new scala.collection.mutable.ArrayBuffer[Long]()
    val es = new scala.collection.mutable.ArrayBuilder.ofLong
    val ed = new scala.collection.mutable.ArrayBuilder.ofLong
    while (it.hasNext) {
      val (s, d, isNode) = it.next()
      if (isNode) {
        if (!idx.containsKey(s)) { idx.put(s, nodeIds.length); nodeIds += s }
      } else { es += s; ed += d }
    }
    val n = nodeIds.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val esA = es.result(); val edA = ed.result()
    var i = 0
    while (i < esA.length) {
      val a = idx.get(esA(i)); val b = idx.get(edA(i))
      if (a != null && b != null) {
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(ra) = rb
      }
      i += 1
    }
    // min id per root, then emit every node's component min
    val minOf = new Array[Long](n)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    i = 0
    while (i < n) {
      val r = find(i)
      if (nodeIds(i) < minOf(r)) minOf(r) = nodeIds(i)
      i += 1
    }
    (0 until n).iterator.map(j => (nodeIds(j), minOf(find(j))))
  }

  /** Incremental connected-components MAINTENANCE — the delta
    * discipline (q406 dedup probes, q430 ER, q472 k-NN graph)
    * applied to the cluster assignment itself: a standing corpus's
    * [[duplicateClusters]] labels are a persisted artifact, and a
    * daily batch must never re-run CC over the full edge set.
    *
    * Contraction argument (the union-find view): base labels are
    * EXACT components of the base edges, and new edges only add
    * connectivity — so CC(base ∪ delta) equals CC over the
    * CONTRACTED graph whose nodes are the base labels touched by
    * delta edges plus the delta ids, expanded back through the
    * old→new label mapping. Because labels are component-min ids,
    * the contracted min-label IS the merged component's min id, so
    * the output is bit-identical to a from-scratch run (the q67
    * oracle applies unchanged — DedupSpec pins the equality, the
    * driver hash-pins it against DuckDB's recursive CTE).
    *
    * Scale shape: every operation against the O(n) label table is a
    * BROADCAST semi/anti join keyed by the delta-bounded touched
    * set — the base table never shuffles; the CC loop runs on the
    * contracted graph (≤ one node per touched component, regardless
    * of component sizes); merged sizes fold the stored sizes instead
    * of recounting members. Inputs: `baseLabels` (doc_id,
    * cluster_id, cluster_size — a prior run's output), `deltaIds`
    * (one id column, NEW nodes, disjoint from base), `deltaPairs`
    * (two id columns; delta–delta, delta–base and base–base edges
    * all legal). Unknown edge endpoints fail loudly.
    */
  def incrementalClusters(
      baseLabels: DataFrame,
      deltaIds: DataFrame,
      deltaPairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val d = incrementalClustersDelta(baseLabels, deltaIds, deltaPairs, maxIters)
    // untouched base rows survive VERBATIM via a broadcast anti join
    val untouched = baseLabels
      .join(broadcast(d.touched.select(col("id").as("cluster_id"))),
        Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    untouched.unionByName(d.changed)
  }

  /** The CHANGED label rows of an [[incrementalClusters]] fold plus
    * the touched old-label set — what a PERSISTED label table needs
    * to advance by a keyed COW upsert (q478's streaming state): the
    * in-memory composition re-reads untouched rows per fold, but a
    * [[Manifest]]-backed table keeps untouched members verbatim on
    * storage and rewrites only members carrying changed keys, so the
    * fold's state IO follows the delta, never the corpus.
    */
  final case class LabelDelta(changed: DataFrame, touched: DataFrame)

  /** See [[incrementalClusters]] (same contraction argument, same
    * inputs/guards); returns only rows whose assignment this fold
    * creates or changes — relabeled members of touched components
    * plus the delta rows — and the touched old-label frame
    * (localCheckpoint-materialized, delta-bounded).
    *
    * `assumeDisjoint` skips the delta-vs-base id guard — set it ONLY
    * when the caller has already PROVEN disjointness by a cheaper,
    * delta-shaped probe (q478's foldBatch checks the batch's ids
    * against the id-bucket-pruned stored sets members — r13 advice
    * item 2: the guard here is an O(base) label scan per call, which
    * on a streaming drain quietly contradicted the per-batch
    * delta-shaped-IO contract). The default stays enforced.
    */
  def incrementalClustersDelta(
      baseLabels: DataFrame,
      deltaIds: DataFrame,
      deltaPairs: DataFrame,
      maxIters: Int = 50,
      assumeDisjoint: Boolean = false): LabelDelta =
    incrementalClustersDeltaBy(_ => baseLabels, _ => baseLabels,
      deltaIds, deltaPairs, maxIters, assumeDisjoint)

  /** [[incrementalClustersDelta]] with PRUNED label-table access —
    * the form a [[Manifest]]-backed label table serves (r14 verdict
    * item 2): the in-memory overload streams the whole base label
    * frame map-side at every touch (never shuffled, but still
    * O(corpus) read IO per fold), while a doc_id-BUCKETED stored
    * table with a cluster_id-keyed secondary index ([[LabelStore]])
    * can serve each leg from the relevant bucket members alone.
    *
    * `labelsByDocIds(ids)` must return a SUPERSET of the base label
    * rows whose `doc_id` is in `ids` (a one-column frame); it backs
    * the disjointness guard and the edge-endpoint label lookup —
    * both keyed by delta-bounded id sets. `labelsByClusterIds(cids)`
    * must return a superset of the rows whose `cluster_id` is in
    * `cids` (the fold's touched old labels); it backs the old-size
    * fold and the relabel leg. Supersets are fine — every consumer
    * applies the exact key match (semi/inner join) downstream, so
    * pruning is an optimization, never the semantics. Each closure
    * is invoked at most twice per fold with delta/touched-bounded
    * key frames.
    */
  def incrementalClustersDeltaBy(
      labelsByDocIds: DataFrame => DataFrame,
      labelsByClusterIds: DataFrame => DataFrame,
      deltaIds: DataFrame,
      deltaPairs: DataFrame,
      maxIters: Int = 50,
      assumeDisjoint: Boolean = false): LabelDelta = {
    // delta-bounded by contract, but often expensive-LAZY (a
    // similarity-verify join — q484's crossJaccardPairsStored returns
    // an unmaterialized verify leg): the endpoint union scans it
    // twice and the contraction join a third time, so without this
    // checkpoint the caller's verify pipeline re-runs ~3x per fold
    // (r17 measurement: 2x ~0.9 s at sf0.1 on q484 alone). The
    // repartition compacts the checkpoint: the verify legs arrive as
    // ~100 near-empty partitions (a union of both sources' map
    // tails), and every downstream pass over the materialized pairs
    // would otherwise pay that task count again — AQE picks the
    // post-shuffle partition count from the actual delta bytes.
    val p = deltaPairs.select(col(deltaPairs.columns.head).as("a"),
      col(deltaPairs.columns(1)).as("b"))
      .repartition(col("a"))
      .localCheckpoint()
    val dIds = deltaIds.select(col(deltaIds.columns.head).as("id"))
      .repartition(col("id")) // compact like p — read by 5 consumers
      .localCheckpoint()
    // restrict the label lookup to edge endpoints FIRST — a
    // broadcast semi keyed by the delta-bounded endpoint set, so the
    // base label table streams map-side (pruned to the endpoints'
    // buckets when stored) and never shuffles
    val endpoints = p.select(col("a").as("id"))
      .unionByName(p.select(col("b").as("id"))).distinct()
      .localCheckpoint()
    val lab = labelsByDocIds(endpoints)
      .select(col("doc_id").as("id"), col("cluster_id").as("lab"))
      .unionByName(dIds.select(col("id"), col("id").as("lab")))
    val labTouched = lab.join(broadcast(endpoints), Seq("id"), "left_semi")
      .localCheckpoint() // delta-bounded
    // both validation guards in ONE job (each was a separate action —
    // pure fixed overhead on a per-batch fold):
    //  - disjointness (r12 advice, unless the caller proved it): a
    //    delta id already present in base would put two rows in the
    //    label lookup and emit duplicate/contradictory output
    //    silently. Broadcast the delta side so the base table streams
    //    map-side.
    //  - unknown endpoints: an edge endpoint that is neither a base
    //    doc nor a delta id would silently drop its edges in the
    //    inner contraction join.
    val overlapViol =
      if (assumeDisjoint) labTouched.select(lit("overlap").as("v")).limit(0)
      else labelsByDocIds(dIds).select(col("doc_id").as("id"))
        .join(broadcast(dIds), Seq("id"), "left_semi")
        .select(lit("overlap").as("v"))
    val missingViol = endpoints.join(labTouched, Seq("id"), "left_anti")
      .select(lit("missing").as("v"))
    val viols = overlapViol.unionByName(missingViol)
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(!viols.contains("overlap"),
      "incrementalClusters: deltaIds overlap base doc_ids — delta ids " +
        "must be NEW arrivals (disjoint from baseLabels), or the label " +
        "lookup would carry duplicate rows per overlapping id")
    require(!viols.contains("missing"),
      s"incrementalClusters: ${viols.getOrElse("missing", 0L)} edge " +
        "endpoint(s) are neither base " +
        "docs nor delta ids — an inner contraction join would silently " +
        "drop their edges")
    // contract edges to label space; same-component edges vanish
    val contracted = p
      .join(labTouched.select(col("id").as("a"), col("lab").as("la")), "a")
      .join(labTouched.select(col("id").as("b"), col("lab").as("lb")), "b")
      .filter(col("la") =!= col("lb"))
      .select(col("la"), col("lb")).distinct()
      .localCheckpoint()
    val touched = contracted.select(col("la").as("id"))
      .unionByName(contracted.select(col("lb").as("id"))).distinct()
      .localCheckpoint() // ≤ 2·|delta edges| labels
    // CC on the contracted graph only — component count, not size,
    // bounds the work. Straight through ccMinLabels: the contracted
    // edges are already materialized (no second pair checkpoint) and
    // the mapping never needs duplicateClusters' sizes join — merged
    // sizes fold the STORED sizes below.
    val mapping = ccMinLabels(
        contracted.select(col("la").as("s"), col("lb").as("d")),
        touched, maxIters, idsCoverEndpoints = true)
      .select(col("id").as("old_lab"), col("label").as("new_lab"))
      .localCheckpoint()
    // the touched-cluster label rows feed BOTH the size fold and the
    // relabel leg — resolve the (possibly pruned) read once
    val touchedClusterRows = labelsByClusterIds(touched)
    // merged sizes fold STORED sizes (+1 per merged delta singleton)
    val oldSizes = touchedClusterRows.select(col("cluster_id").as("old_lab"),
        col("cluster_size")).distinct()
      .join(broadcast(touched.select(col("id").as("old_lab"))),
        Seq("old_lab"), "left_semi")
      .unionByName(dIds.select(col("id").as("old_lab"),
        lit(1L).as("cluster_size"))
        .join(broadcast(touched.select(col("id").as("old_lab"))),
          Seq("old_lab"), "left_semi"))
    val newSizes = oldSizes.join(broadcast(mapping), Seq("old_lab"))
      .groupBy(col("new_lab"))
      .agg(sum(col("cluster_size")).as("cluster_size"))
      .localCheckpoint() // touched-space
    // touched base rows relabel through the (broadcast) mapping
    val relabeledBase = touchedClusterRows
      .join(broadcast(mapping.withColumnRenamed("old_lab", "cluster_id")),
        Seq("cluster_id"))
      .select(col("doc_id"), col("new_lab").as("cluster_id"))
    val relabeledDelta = dIds
      .join(broadcast(mapping.withColumnRenamed("old_lab", "id")), Seq("id"))
      .select(col("id").as("doc_id"), col("new_lab").as("cluster_id"))
    val merged = relabeledBase.unionByName(relabeledDelta)
      .join(broadcast(newSizes.withColumnRenamed("new_lab", "cluster_id")),
        Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    // delta nodes in NO edge stay singletons
    val deltaSingles = dIds
      .join(broadcast(touched), Seq("id"), "left_anti")
      .select(col("id").as("doc_id"), col("id").as("cluster_id"),
        lit(1L).as("cluster_size"))
    LabelDelta(merged.unionByName(deltaSingles), touched)
  }

  /** One star-rewriting round (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC'14): every node points its
    * strictly larger (large-star) or strictly smaller (small-star)
    * neighbours at the minimum of its closed neighbourhood. Edges
    * stay canonical (u < v) and duplicate-free.
    */
  private def star(edges: DataFrame, large: Boolean): DataFrame = {
    val dir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val emitted =
      if (large) {
        // large-star(u): m = min(Γ(u) ∪ {u}); connect every STRICTLY
        // LARGER neighbour to m (u's own link to m is re-derived by
        // the reduce of its other endpoints)
        val m = dir.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        dir.filter(col("v") > col("u")).join(m, "u").select(col("v"), col("m"))
      } else {
        // small-star(u): over the SMALLER neighbourhood N = {v < u},
        // m = min(N ∪ {u}) = min(N); connect every v ∈ N ∪ {u} to m —
        // the ∪{u} self-emission is what keeps u attached to its star
        val smaller = dir.filter(col("v") < col("u"))
        val m = smaller.groupBy("u").agg(min(col("v")).as("m"))
        smaller.join(m, "u").select(col("v"), col("m"))
          .union(m.select(col("u").as("v"), col("m")))
      }
    emitted
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** [[duplicateClusters]] alternative with ROUND COMPLEXITY
    * O(log n) instead of O(diameter): alternating large-star /
    * small-star edge rewriting until the edge set is a fixed point —
    * every component is then a star centred at its minimum id. Same
    * output contract as duplicateClusters; prefer this when
    * components can be adversarially long chains (min-propagation
    * pays one round per hop), and min-propagation when components
    * are shallow (its rounds are one shuffle cheaper).
    */
  def duplicateClustersStar(pairs: DataFrame, ids: DataFrame, maxRounds: Int = 30): DataFrame = {
    val idCol = ids.columns.head
    var edges = pairs
      .select(least(col(pairs.columns.head), col(pairs.columns(1))).as("u"),
        greatest(col(pairs.columns.head), col(pairs.columns(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds <= maxRounds) {
      val next = star(star(edges, large = true), large = false).localCheckpoint()
      converged = next.exceptAll(edges).isEmpty && edges.exceptAll(next).isEmpty
      edges = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClustersStar did not converge in $maxRounds rounds")
    // fixed point = stars: every edge is (component centre, member)
    val labels = ids.select(col(idCol).as("doc_id"))
      .join(edges.select(col("v").as("doc_id"), col("u").as("centre")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("centre"), col("doc_id")).as("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** Exact n-gram Jaccard pairs ≥ `threshold` via [[jaccardPairs]]
    * (shingles are already hashed 64-bit values; hash order IS the
    * global element order).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxCandidateFactor: Option[Double] = None): DataFrame = {
    val sets = parallelized(docs).select(col(idCol).as("id"),
      array_sort(shingleHashes(col(textCol), shingleN)).as("ts"))
    jaccardPairs(sets, threshold, maxCandidateFactor).select("a_id", "b_id")
  }

  /** Exact cross-set n-gram Jaccard pairs ≥ `threshold` between a
    * DELTA batch and a standing BASE corpus — the INCREMENTAL
    * ingestion dedup. The point at 100 TB: a daily batch must check
    * against the corpus WITHOUT re-pairing base×base (what running
    * [[ngramJaccardPairs]] on the union would do — the full-corpus
    * quadratic cost every day). AllPairs prefix filtering holds
    * cross-side unchanged (one global hash order, a qualifying pair
    * shares an element inside BOTH prefixes, symmetric length +
    * position filters), so only (id, n, prefix-element) rows
    * shuffle, the delta side is batch-sized (AQE broadcasts it),
    * and the base pays one term-sharded prefix index scan.
    * Verification is [[jaccardPairs]]' sorted merge walk. Output:
    * (a_id ∈ delta, b_id ∈ base).
    */
  def crossJaccardPairs(
      delta: DataFrame,
      base: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame =
    crossJaccardPairsPre(
      jaccardSets(delta, idCol, textCol, shingleN),
      jaccardSets(base, idCol, textCol, shingleN),
      threshold)

  /** The (id, sorted-shingle-set, set-size) frame the exact Jaccard
    * family runs over — exposed so a standing corpus can MATERIALIZE
    * it once (e.g. into a [[Manifest]] table) and amortize the
    * shingling across every later incremental probe. Columns:
    * (id, ts: array<long> ascending, n: int).
    */
  def jaccardSets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame =
    parallelized(df).select(col(idCol).as("id"),
      array_sort(shingleHashes(col(textCol), shingleN)).as("ts"))
      .withColumn("n", size(col("ts")))

  /** The AllPairs prefix-index rows of a [[jaccardSets]] frame for a
    * FIXED threshold: (id, n, p, t) — one row per element of each
    * set's filtering prefix, the only rows an incremental candidate
    * probe shuffles. The prefix length depends on `threshold`, so a
    * persisted index serves probes at that threshold (or HIGHER —
    * more selective thresholds need shorter prefixes, so candidates
    * stay a superset and the verify stage keeps exactness; probing
    * BELOW the build threshold would miss pairs and must rebuild).
    */
  def jaccardPrefixes(sets: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val tau = lit(threshold)
    val prefixLen = (col("n") - ceil(col("n") * tau).cast("int") + 1)
    sets.select(col("id"), col("n"),
      posexplode(slice(col("ts"), lit(1), prefixLen)).as(Seq("p", "t")))
  }

  // ───── Pruned stored-index reads (r13 verdict item 1) ─────
  //
  // Each persisted probe index is written key-BUCKETED
  // (BucketedIndex.commitBucketed) so an incremental probe's scan
  // follows the DELTA's key set instead of the index size: the probe
  // derives its delta keys under the family's own key function, and
  // the read unions only the matching bucket members (conservative
  // on untagged / foreign-modulus members — legacy layouts stay
  // correct, just unpruned). The helpers below own the family → key
  // mapping so writer and prober can never disagree on it.

  /** The pruned stored AllPairs prefix-index read for a delta probe:
    * bucket key is the prefix element `t` (write the index with
    * `BucketedIndex.commitBucketed(jaccardPrefixes(sets, τ), root,
    * tag, Seq("t"), numBuckets)`). The delta's prefix keys are a
    * delta-sized narrow projection; the scan opens only their bucket
    * members. Feed the result to [[crossJaccardPairsPre]]'s
    * `basePrefixes`.
    */
  def prunedBasePrefixes(
      spark: org.apache.spark.sql.SparkSession,
      prefRoot: String,
      version: Int,
      deltaSets: DataFrame,
      threshold: Double,
      numBuckets: Int): DataFrame =
    BucketedIndex.prunedRead(spark, prefRoot, version,
      jaccardPrefixes(deltaSets, threshold).select("t"), Seq("t"), numBuckets)

  /** The pruned stored LSH band-bucket index read for a delta probe:
    * bucket key is `(band, bucket)` (write with `commitBucketed(
    * index.buckets, root, tag, Seq("band", "bucket"), numBuckets)`).
    * The delta's band keys derive under the INDEX's own banding
    * parameters — pass the reconstructed handle's values.
    */
  def prunedLshBuckets(
      spark: org.apache.spark.sql.SparkSession,
      bktRoot: String,
      version: Int,
      deltaSets: DataFrame,
      numPerm: Int,
      bands: Int,
      seed: Long,
      numBuckets: Int): DataFrame =
    BucketedIndex.prunedRead(spark, bktRoot, version,
      minHashBuckets(deltaSets, "ts", numPerm, bands, seed)
        .select("band", "bucket"),
      Seq("band", "bucket"), numBuckets)

  /** The pruned stored Hamming chunk-index read for a delta probe:
    * bucket key is `(chunk, ckey)` (write with `commitBucketed(
    * index.chunks, root, tag, Seq("chunk", "ckey"), numBuckets)`).
    * Pruning keys need no identical-fp collapse — duplicate keys
    * hit the same buckets.
    */
  def prunedHammingChunks(
      spark: org.apache.spark.sql.SparkSession,
      chunkRoot: String,
      version: Int,
      deltaFps: DataFrame,
      maxHamming: Int,
      numBuckets: Int): DataFrame =
    BucketedIndex.prunedRead(spark, chunkRoot, version,
      hammingChunkRows64(deltaFps.select(col("id"), col("fp")), maxHamming)
        .select("chunk", "ckey"),
      Seq("chunk", "ckey"), numBuckets)

  /** [[crossJaccardPairs]] over PRE-BUILT set frames (see
    * [[jaccardSets]]) — the incremental-index form: the base side's
    * sets (and their [[jaccardPrefixes]]) can come from storage, so
    * a daily probe pays shingling for the delta alone.
    *
    * `maxCandidateFactor`: optional tripwire mirroring
    * [[jaccardPairs]]' — fail loudly when candidates exceed
    * `factor × delta docs`, i.e. a low-τ misconfiguration (or a
    * degenerate batch) is heading toward probing most of the
    * standing corpus per delta doc. The guard is what keeps a
    * STREAMING drain (q478) from silently exploding one micro-batch
    * into a corpus-sized candidate join at 100 TB.
    */
  def crossJaccardPairsPre(
      deltaSets: DataFrame,
      baseSets: DataFrame,
      threshold: Double,
      basePrefixes: Option[DataFrame] = None,
      maxCandidateFactor: Option[Double] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val d = deltaSets
    val cand0 = crossPrefixCandidates(d,
      basePrefixes.getOrElse(jaccardPrefixes(baseSets, threshold)), threshold)
    val cand = if (maxCandidateFactor.isDefined)
      cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else cand0
    maxCandidateFactor.foreach(f =>
      candidateTripwire(cand, d, f, threshold, () => cand.unpersist()))
    val out = verifyCrossPairs(cand, d, baseSets, threshold)
    if (maxCandidateFactor.isDefined) {
      // materialize before releasing the candidate cache (the
      // jaccardPairs discipline: checkpointed blocks GC with the frame)
      val o = out.localCheckpoint()
      cand.unpersist()
      o
    } else out
  }

  private def candidateTripwire(
      cand: DataFrame,
      deltaSets: DataFrame,
      factor: Double,
      threshold: Double,
      release: () => Unit): Unit = {
    val nDelta = deltaSets.count() // delta-sized count — cheap by contract
    val nCand = cand.count()
    if (nCand > factor * math.max(nDelta, 1L)) {
      release()
      throw new IllegalStateException(
        s"crossJaccardPairs: $nCand candidate pairs for $nDelta delta " +
          s"docs exceeds the $factor× tripwire — the threshold ($threshold) " +
          "is too low for this corpus (near-corpus-sized probe per doc). " +
          "Raise the threshold, switch to the approximate minhash twin, " +
          "or raise maxCandidateFactor.")
    }
  }

  /** [[crossJaccardPairsPre]] against a STORED, id-BUCKETED sets
    * table — the CANDIDATE-BOUNDED verify leg (r14 verdict item 1):
    * the plain form re-joins candidate payloads against a FULL scan
    * of the standing sets table, the one remaining O(corpus) read in
    * a per-batch fold. Here the candidate pairs (delta-bounded by the
    * prefix probe) MATERIALIZE first, and the base payloads come from
    * [[BucketedIndex.prunedRead]] on the CANDIDATES' base-id buckets —
    * so the verify leg's file IO follows the candidates, never the
    * corpus. Exactness is untouched: the pruned read is a superset of
    * every row whose id a candidate names, and the verify join's
    * equi-match on `b_id` is the semantics (the prunedMembers rule).
    *
    * `basePrefixes` is the (already pruned, already exclusion-
    * filtered) stored prefix-index read — [[prunedBasePrefixes]].
    * The sets table under `setsRoot` must be committed id-bucketed
    * (`commitBucketed(sets, root, tag, Seq("id"), setsNumBuckets)`);
    * a legacy unbucketed member degrades to a conservative full read,
    * never to wrong pruning.
    *
    * NO delta-vs-base disjointness guard runs here: the caller owns
    * it (the id-bucketed sets table makes that proof delta-bucket
    * cost — q415/q480/foldBatch all do it), and candidates inherit
    * whatever exclusion `basePrefixes` carries (an anti-joined own-id
    * prefix row can never produce its id as a `b_id`).
    */
  def crossJaccardPairsStored(
      spark: org.apache.spark.sql.SparkSession,
      deltaSets: DataFrame,
      setsRoot: String,
      setsVersion: Int,
      threshold: Double,
      basePrefixes: DataFrame,
      setsNumBuckets: Int,
      maxCandidateFactor: Option[Double] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    // delta-bounded; feeds the bucket collect, the tripwire count AND
    // the verify join — materialize once, or the prefix join re-runs
    // per action
    val cand = crossPrefixCandidates(deltaSets, basePrefixes, threshold)
      .localCheckpoint()
    maxCandidateFactor.foreach(f =>
      candidateTripwire(cand, deltaSets, f, threshold, () => ()))
    val basePayload = BucketedIndex.prunedRead(spark, setsRoot, setsVersion,
      cand.select(col("b_id").as("id")), Seq("id"), setsNumBuckets)
    verifyCrossPairs(cand, deltaSets, basePayload, threshold)
  }

  /** [[crossMinHashLsh]] against a STORED, id-BUCKETED sets table —
    * the approximate twin of [[crossJaccardPairsStored]], same
    * candidate-bounded verify leg: candidates come from the (pruned)
    * stored band-bucket index join, materialize delta-bounded, and
    * the exact-Jaccard verify reads base payloads from the
    * candidates' id buckets only. Disjointness is the caller's (see
    * crossJaccardPairsStored); `index.buckets` is the pruned stored
    * read ([[prunedLshBuckets]]) under the handle's own parameters.
    */
  def crossMinHashLshStored(
      spark: org.apache.spark.sql.SparkSession,
      deltaSets: DataFrame,
      setsRoot: String,
      setsVersion: Int,
      threshold: Double,
      index: LshBucketIndex,
      setsNumBuckets: Int): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val dBuckets = minHashBuckets(deltaSets, "ts",
      index.numPerm, index.bands, index.seed)
    // delta-bounded; feeds the bucket collect AND the verify join
    val cand = dBuckets
      .select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(index.buckets.select(col("band"), col("bucket"),
        col("id").as("b_id")), Seq("band", "bucket"))
      .select("a_id", "b_id").distinct()
      .localCheckpoint()
    val basePayload = BucketedIndex.prunedRead(spark, setsRoot, setsVersion,
      cand.select(col("b_id").as("id")), Seq("id"), setsNumBuckets)
    verifyCrossPairs(cand, deltaSets, basePayload, threshold)
  }

  /** The AllPairs candidate join of a cross probe: the delta's prefix
    * rows against the base's (stored or derived) prefix rows under
    * the prefix/length/position filters. Exact: every pair at
    * Jaccard ≥ τ appears (false positives verified downstream).
    */
  private[graft] def crossPrefixCandidates(
      deltaSets: DataFrame,
      basePrefixes: DataFrame,
      threshold: Double): DataFrame = {
    val tau = lit(threshold)
    jaccardPrefixes(deltaSets, threshold).as("a")
      .join(basePrefixes.as("b"),
        col("a.t") === col("b.t") &&
        col("b.n") >= col("a.n") * tau && col("a.n") >= col("b.n") * tau &&
        least(col("a.n") - col("a.p"), col("b.n") - col("b.p")) >=
          (tau / (lit(1.0) + tau)) * (col("a.n") + col("b.n")))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** The exact verify leg shared by every cross probe: join candidate
    * pairs back to both sides' (id, ts, n) payloads and keep pairs at
    * Jaccard ≥ τ. The base side may be a PRUNED superset read — the
    * inner equi-join on `b_id` applies the exact key match, so extra
    * base rows never surface.
    */
  private def verifyCrossPairs(
      cand: DataFrame,
      deltaSets: DataFrame,
      baseSets: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(deltaSets.select(col("id").as("a_id"), col("ts").as("ta"),
        col("n").as("na")), "a_id")
      .join(baseSets.select(col("id").as("b_id"), col("ts").as("tb"),
        col("n").as("nb")), "b_id")
      .withColumn("c", sortedIntersectCount(col("ta"), col("tb")))
      .filter(col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double") >= threshold)
      .select(col("a_id"), col("b_id"))
}
