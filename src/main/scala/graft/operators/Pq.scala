package graft.operators

import graft.functions.Vec
import graft.functions.expressions.{PqDist, PqEncode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011): the vector is split
  * into `m` contiguous subspaces, each compressed to a 4-bit code by
  * its own `ksub`-centroid codebook — 64 float dims become ONE
  * packed long (32× smaller), and distance becomes `m` lookups in a
  * precomputed centroid-pair table. This is the memory-bound scale
  * path past int8 scalar quantization (q95/q101): at a billion
  * vectors the code table is 8 GB where the float corpus is 256 GB,
  * so the brute-force ADC scan is bandwidth-feasible per query.
  *
  * Training mirrors `Similarity.kmeansCentroids`'s determinism
  * discipline: a hash-ordered sample (TakeOrderedAndProject, never a
  * corpus sort), farthest-point init, fixed Lloyd iterations,
  * lowest-index tie-breaks — same inputs, same codebooks, no RNG.
  * Codebooks and distance tables are quantized to the fixed
  * `round(x·10000)` integer grid, so encode + scoring are EXACT long
  * arithmetic (bit-reproducible rankings, the q101 property).
  *
  * Approximate by construction (codebooks summarize the corpus), so
  * driver queries built on it are rows-only gated; SimilaritySpec
  * pins determinism and the recall floor vs exact cosine.
  */
object Pq {

  final case class Model(codebook: Array[Long], m: Int, ksub: Int, dsub: Int)

  private def parallelized(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(parallelism / 2, 1))
      df.repartition(parallelism)
    else df
  }

  /** Train per-subspace L2 codebooks on a deterministic sample and
    * quantize them to the integer grid.
    */
  def train(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 16,
      ksub: Int = 16,
      sampleN: Int = 2048,
      iters: Int = 10): Model = {
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      // unit-normalize (full vector, not per subspace): cosine
      // neighbors become L2 neighbors, matching PqEncode
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
    require(sample.nonEmpty, "Pq.train: empty corpus")
    trainVectors(sample, m, ksub, iters)
  }

  /** Codebook training over ALREADY-PREPARED sample vectors — no
    * normalization (the caller decides the geometry). This is the
    * residual-training entry the IVF-PQ composition needs: coarse
    * residuals are NOT unit vectors (their magnitude is the
    * information), so [[train]]'s unit-normalize would be wrong for
    * them.
    */
  def trainVectors(
      sample: Array[Array[Double]],
      m: Int,
      ksub: Int,
      iters: Int = 10): Model = {
    require(sample.nonEmpty, "Pq.trainVectors: empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"Pq.train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val k = math.min(ksub, sample.length)

    val flat = new Array[Long](m * ksub * dsub)
    var j = 0
    while (j < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val cents = lloydL2(sub, k, iters)
      var c = 0
      while (c < ksub) {
        // fewer distinct sample points than ksub → repeat the last
        // centroid (codes simply never pick the duplicates)
        val src = cents(math.min(c, cents.length - 1))
        var d = 0
        while (d < dsub) {
          flat((j * ksub + c) * dsub + d) = Math.round(src(d) * 10000.0)
          d += 1
        }
        c += 1
      }
      j += 1
    }
    Model(flat, m, ksub, dsub)
  }

  /** Plain-L2 Lloyd with farthest-point init and lowest-index
    * tie-breaks; an emptied cluster keeps its previous centroid.
    */
  private def lloydL2(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val cents = new Array[Array[Double]](k)
    cents(0) = points(0).clone()
    var c = 1
    while (c < k) {
      var bestIdx = 0
      var bestScore = -1.0 // max over points of distance-to-nearest
      var i = 0
      while (i < points.length) {
        var nearest = Double.MaxValue
        var j = 0
        while (j < c) {
          val s = d2(points(i), cents(j))
          if (s < nearest) nearest = s
          j += 1
        }
        if (nearest > bestScore) { bestScore = nearest; bestIdx = i }
        i += 1
      }
      cents(c) = points(bestIdx).clone()
      c += 1
    }
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(k)(new Array[Double](points.head.length))
      val counts = new Array[Int](k)
      var i = 0
      while (i < points.length) {
        var best = 0
        var bestDist = d2(points(i), cents(0))
        var j = 1
        while (j < k) {
          val s = d2(points(i), cents(j))
          if (s < bestDist) { bestDist = s; best = j }
          j += 1
        }
        val acc = sums(best)
        var d = 0
        while (d < acc.length) { acc(d) += points(i)(d); d += 1 }
        counts(best) += 1
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var d = 0
          while (d < sums(j).length) { sums(j)(d) /= counts(j); d += 1 }
          cents(j) = sums(j)
        }
        j += 1
      }
      iter += 1
    }
    cents
  }

  /** Corpus with a packed `pq_code` long column — a narrow per-row
    * map, no shuffle.
    */
  def encode(emb: DataFrame, vecCol: String, model: Model): DataFrame =
    parallelized(emb).withColumn("pq_code", GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(col(vecCol)),
        model.codebook, model.m, model.ksub, model.dsub)))

  /** Precomputed centroid-pair squared-L2 tables, flat `[m][ksub][ksub]`. */
  def distTables(model: Model): Array[Long] = {
    val t = new Array[Long](model.m * model.ksub * model.ksub)
    var j = 0
    while (j < model.m) {
      var a = 0
      while (a < model.ksub) {
        var b = 0
        while (b < model.ksub) {
          var s = 0L
          var d = 0
          while (d < model.dsub) {
            val diff = model.codebook((j * model.ksub + a) * model.dsub + d) -
              model.codebook((j * model.ksub + b) * model.dsub + d)
            s += diff * diff
            d += 1
          }
          t(j * model.ksub * model.ksub + a * model.ksub + b) = s
          b += 1
        }
        a += 1
      }
      j += 1
    }
    t
  }

  private def pqDist(a: Column, b: Column, tables: Array[Long], model: Model): Column =
    GraftColumnBridge.column(PqDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      tables, model.m, model.ksub))

  /** Top-k by the standard PQ serving shape: ADC shortlist over the
    * CODE table (queries broadcast, corpus codes streamed once — 8
    * bytes per candidate row, `m` table lookups per pair), then an
    * exact-cosine re-rank of the `rerank`-sized shortlist against the
    * fetched float vectors. Only shortlist rows ever touch floats —
    * the bandwidth win PQ exists for. `rerank = 0` skips the exact
    * pass (pure ADC ranking). Deterministic: distance/sim ties break
    * on id.
    */
  def topK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame, // single column `query_id`
      model: Model,
      k: Int,
      rerank: Int = 0): DataFrame = {
    require(rerank == 0 || rerank >= k, s"rerank=$rerank must be 0 or >= k=$k")
    val tables = distTables(model)
    val codes = encode(emb, vecCol, model)
      .select(col(idCol), col("pq_code"))
    val qs = codes.join(queryIds, codes(idCol) === queryIds("query_id"))
      .select(col("query_id"), col("pq_code").as("qc"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_d"), col(idCol))
    val shortlist = codes.crossJoin(broadcast(qs))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("pq_d", pqDist(col("qc"), col("pq_code"), tables, model))
      .withColumn("rank", row_number().over(wAdc).cast("long"))
      .filter(col("rank") <= math.max(rerank, k))
    if (rerank == 0)
      shortlist.select(col("query_id"), col(idCol).as("neighbor_id"),
        col("rank"), col("pq_d"))
    else {
      val vecs = emb.select(col(idCol).as("__vid"), col(vecCol).as("__vv"))
      val qvecs = emb.select(col(idCol).as("__qid"), col(vecCol).as("__qv"))
      val wExact = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))
      shortlist
        .join(vecs, shortlist(idCol) === col("__vid"))
        .join(broadcast(qvecs), col("query_id") === col("__qid"))
        .withColumn("sim", Vec.cosine(col("__qv"), col("__vv")))
        .withColumn("rank", row_number().over(wExact).cast("long"))
        .filter(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
          col("pq_d"))
    }
  }

  /** IVF-PQ composed ANN — the standard FAISS IVFPQ recipe (Jégou
    * et al. 2011 §V), composing the repo's two existing legs (q44's
    * IVF coarse quantizer, q252's PQ codes) into the
    * billion-vector-serving shape:
    *
    *   1. coarse quantizer: `nlist` spherical-k-means centroids
    *      ([[Similarity.kmeansCentroids]], deterministic);
    *   2. ONE shared PQ codebook trained on coarse RESIDUALS
    *      `r = unit(v) − c(list)` — residuals concentrate near 0
    *      regardless of which list a vector landed in, which is why
    *      the shared codebook quantizes them far better than raw
    *      vectors (the whole point of the composition);
    *   3. index: per-vector (list, packed residual code) — 4+8 bytes
    *      per row in the serving shuffle, floats never move;
    *   4. search: probe `nprobe` lists per query, form the QUERY's
    *      exact residual against each probed list's centroid, and
    *      score by ASYMMETRIC ADC ([[PqAdcResidual]], exact integer —
    *      only the candidate side is 4-bit-coded, halving the
    *      quantization noise of symmetric code-to-code [[PqDist]])
    *      against only that list's codes, shortlist top-`rerank`,
    *      exact-cosine re-rank.
    *
    * Candidate IO is proportional to the PROBED lists only — the
    * scan never touches the other `nlist − nprobe` lists' rows
    * (IvfPqSpec pins the candidate count to the probed lists' sizes)
    * — and per-candidate cost is `m` table lookups on two longs.
    * Deterministic end to end: trained artifacts are
    * sample-hash-ordered, scoring is integer, ties break on id.
    * Approximate by construction → rows-only driver gate; IvfPqSpec
    * pins determinism and the recall floor vs exact cosine top-k.
    */
  def ivfPqTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame, // single column `query_id`
      nlist: Int,
      nprobe: Int,
      k: Int,
      m: Int = 16,
      ksub: Int = 16,
      rerank: Int = 32,
      sampleN: Int = 2048): DataFrame = {
    require(rerank >= k, s"ivfPqTopK: rerank=$rerank must be >= k=$k")
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, nlist)
    require(cents.nonEmpty, "ivfPqTopK: no centroids (empty corpus?)")
    require(nprobe >= 1 && nprobe <= cents.length,
      s"ivfPqTopK: nprobe=$nprobe out of range [1, ${cents.length}]")
    val model = trainResidualModel(emb, idCol, vecCol, cents, m, ksub, sampleN)
    val indexed = encodeResiduals(emb, idCol, vecCol, cents, model)
    ivfPqServe(_ => indexed, emb, idCol, vecCol, queryIds, cents, model,
      nprobe, k, rerank)
  }

  /** Residual codebook trained under `cents` from the deterministic
    * hash-ordered sample — factored from [[ivfPqTopK]] so the
    * stored-index build ([[PqStore]]) trains the IDENTICAL artifact
    * (same sample rule, same in-driver coarse assignment + residual
    * computation; sampleN rows, never the corpus).
    */
  private[operators] def trainResidualModel(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Float]],
      m: Int,
      ksub: Int,
      sampleN: Int): Model = {
    val dim = cents.head.length
    require(dim % m == 0, s"ivfPqTopK: dim $dim not divisible by m=$m")
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val residuals = sample.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = if (n == 0.0) v else v.map(_ / n)
      var best = 0
      var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < cents.length) {
        var s = 0.0; var d = 0
        while (d < dim) { s += u(d) * cents(j)(d); d += 1 }
        if (s > bestSim) { bestSim = s; best = j } // tie → lowest index
        j += 1
      }
      Array.tabulate(dim)(d => u(d) - cents(best)(d))
    }
    trainVectors(residuals, m, ksub)
  }

  /** The corpus coded under (cents, model): (idCol, ivf_list, code) —
    * one narrow codegen pass, no shuffle. Factored for the stored
    * build and its delta append ([[PqStore]]): codes are a pure
    * per-row function of the artifacts, so a delta batch encoded
    * later matches what a full re-encode would produce row for row.
    */
  private[operators] def encodeResiduals(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Float]],
      model: Model): DataFrame = {
    val flatCents: Array[Float] = cents.flatten.toArray
    def resCode(vec: Column, list: Column): Column =
      GraftColumnBridge.column(graft.functions.expressions.PqEncodeResidual(
        GraftColumnBridge.expression(vec),
        GraftColumnBridge.expression(list.cast("int")),
        flatCents, model.codebook, model.m, model.ksub, model.dsub))
    Similarity.ivfIndex(emb, vecCol, cents)
      .select(col(idCol), col("ivf_list"),
        resCode(col(vecCol), col("ivf_list")).as("code"))
  }

  /** The serving core of [[ivfPqTopK]] under CALLER-SUPPLIED
    * artifacts and a PLUGGABLE coded-index source — `indexedFor`
    * maps the probe frame (query_id, qv, ivf_list) to the coded rows
    * (idCol, ivf_list, code) the scan may score. The in-memory path
    * passes a constant full index; the stored path
    * ([[PqStore.topKStored]]) reads only the probed lists' bucket
    * members. Any SUPERSET of the probed lists' rows is correct (the
    * scoring join keys on ivf_list) — the bucket-pruning contract.
    */
  private[operators] def ivfPqServe(
      indexedFor: DataFrame => DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      cents: Array[Array[Float]],
      model: Model,
      nprobe: Int,
      k: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k, s"ivfPqTopK: rerank=$rerank must be >= k=$k")
    require(cents.nonEmpty, "ivfPqTopK: no centroids (empty corpus?)")
    require(nprobe >= 1 && nprobe <= cents.length,
      s"ivfPqTopK: nprobe=$nprobe out of range [1, ${cents.length}]")
    val flatCents: Array[Float] = cents.flatten.toArray
    def adcDist(vec: Column, list: Column, code: Column): Column =
      GraftColumnBridge.column(graft.functions.expressions.PqAdcResidual(
        GraftColumnBridge.expression(vec),
        GraftColumnBridge.expression(list.cast("int")),
        GraftColumnBridge.expression(code),
        flatCents, model.codebook, model.m, model.ksub, model.dsub))

    val queries = emb.join(queryIds, emb(idCol) === queryIds("query_id"))
      .select(col("query_id"), col(vecCol).as("qv"))
    // top-nprobe lists per query via the literal-sized score array —
    // narrow, no window; the query KEEPS its float vector (queries
    // are few — the broadcast side), so scoring can run ASYMMETRIC
    // ADC: only the candidate side is 4-bit-coded, halving the
    // quantization noise of the symmetric code-to-code path
    val probes = queries
      .withColumn("__probe", explode(slice(reverse(array_sort(
        Similarity.centroidScores(col("qv"), cents))), 1, nprobe)))
      .select(col("query_id"), col("qv"),
        (-col("__probe.ni")).as("ivf_list"))

    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_d"), col(idCol))
    val shortlist = probes.join(indexedFor(probes), Seq("ivf_list"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("pq_d", adcDist(col("qv"), col("ivf_list"), col("code")))
      .drop("qv")
      .withColumn("rank", row_number().over(wAdc).cast("long"))
      .filter(col("rank") <= rerank)

    // exact re-rank: only shortlist rows ever touch float vectors
    val vecs = emb.select(col(idCol).as("__vid"), col(vecCol).as("__vv"))
    val qvecs = emb.join(queryIds, emb(idCol) === queryIds("query_id"))
      .select(col("query_id").as("__qid"), col(vecCol).as("__qv"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    shortlist
      .join(vecs, shortlist(idCol) === col("__vid"))
      .join(broadcast(qvecs), col("query_id") === col("__qid"))
      .withColumn("sim", Vec.cosine(col("__qv"), col("__vv")))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** The probe-stage candidate frame of [[ivfPqTopK]] — factored so
    * IvfPqSpec can pin "candidate IO ∝ probed lists only" by
    * counting, without re-deriving the join shape. Columns:
    * (query_id, ivf_list, id, pq_d).
    */
  private[graft] def ivfPqCandidates(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      nlist: Int,
      nprobe: Int,
      m: Int = 16,
      ksub: Int = 16,
      sampleN: Int = 2048): DataFrame = {
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, nlist)
    val indexed = Similarity.ivfIndex(emb, vecCol, cents)
      .select(col(idCol), col("ivf_list"))
    val queries = emb.join(queryIds, emb(idCol) === queryIds("query_id"))
      .select(col("query_id"), col(vecCol).as("qv"))
    val probes = queries
      .withColumn("__probe", explode(slice(reverse(array_sort(
        Similarity.centroidScores(col("qv"), cents))), 1, nprobe)))
      .select(col("query_id"), (-col("__probe.ni")).as("ivf_list"))
    probes.join(indexed, Seq("ivf_list"))
      .filter(col(idCol) =!= col("query_id"))
  }
}
