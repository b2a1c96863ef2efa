package graft.queries

import graft.Tables
import graft.functions.Vec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + embedding dedup over the `embeddings` table
  * (`array<float>` column, 64-dim, unit-norm).
  *
  * Scale design: the brute-force path broadcasts the *query* set and
  * streams the corpus (one pass, no corpus shuffle) — correct
  * baseline at any corpus size as long as queries × k fits on an
  * executor. The LSH path buckets the corpus once (narrow map), then
  * joins within buckets — the 100 TB route where brute force is too
  * expensive. Similarity VALUES are never emitted (engines disagree
  * at ~1e-8); only ranks and threshold survivors, which are stable
  * because the data's smallest meaningful gap is ~1e-5.
  */
object VectorOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Class-imbalance weights — the loss-reweighting table an
    // imbalanced classifier head trains with: per label, inverse-
    // frequency weight w = N / (K·n_label) in exact permille plus
    // the label share, and the flag for classes below half parity
    // (n·K·2 < N — float-free cross-multiplication). One K-row
    // aggregate over the label column only; nothing else shuffles.
    "q318_class_weights" -> ((s, d) => {
      val lab = Tables(s, d).embeddings.select(col("label").cast("long"))
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
      val tot = lab.agg(sum(col("n")).as("nt"), count(lit(1)).as("k"))
      lab.crossJoin(broadcast(tot))
        .select(col("label"), col("n"),
          expr("(n * 1000) div nt").as("share_pm"),
          expr("(nt * 1000) div (k * n)").as("weight_pm"),
          (col("n") * col("k") * 2 < col("nt")).as("underrepresented"))
    }),

    // Brute-force exact top-k cosine neighbors for a query subset.
    "q40_ann_topk" -> ((s, d) => {
      val emb = Tables(s, d).embeddings
      val qs = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", Vec.cosine(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
    }),

    // Embedding near-duplicate pairs: cosine above a threshold that
    // sits in a ≥1e-4 gap of the data's sim distribution. EXACT, via
    // the block-partitioned triangle join — equi-joins only, never a
    // CartesianProduct (pinned in PlanSpec). LSH candidates can't
    // preserve exactness at τ=0.45 (borderline pairs — see the
    // cosineThresholdPairs scaladoc); for real near-dup thresholds
    // use Similarity.cosineNearDupLsh, whose recall bound is pinned
    // by SimilaritySpec on planted duplicates.
    "q41_embedding_neardup" -> ((s, d) =>
      graft.operators.Similarity.cosineThresholdPairs(
        Tables(s, d).embeddings, "vec_id", "embedding",
        threshold = 0.45, blocks = 32)),

    // The embedding-side dedup DECISION, end-to-end: exact cosine
    // near-dup pairs (the q41 triangle join) → connected components →
    // keep the min-id representative per cluster with the cluster
    // size it absorbed — the vector-space twin of q68's text dedup.
    // Fully oracled: DuckDB rebuilds the components with a recursive
    // transitive-closure CTE over the exact pair list.
    "q78_embedding_dedup_keep" -> ((s, d) => {
      val emb = Tables(s, d).embeddings
      val pairs = graft.operators.Similarity.cosineThresholdPairs(
        emb, "vec_id", "embedding", threshold = 0.45, blocks = 32)
      graft.operators.Dedup.duplicateClusters(pairs, emb.select("vec_id"))
        .filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id").as("vec_id"), col("cluster_size"))
    }),

    // IVF ANN (coarse-quantization scale path): assign corpus to
    // centroid lists once, probe nprobe lists per query, exact
    // re-rank inside. Approximate → rows-only; recall vs brute force
    // is pinned by SimilaritySpec.
    "q44_ann_ivf" -> ((s, d) => {
      val emb = Tables(s, d).embeddings
      // train the coarse quantizer ONCE; index and search share it
      val cents = graft.operators.Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 16)
      val indexed = graft.operators.Similarity.ivfIndex(emb, "embedding", cents)
      val queryIds = emb.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"))
      graft.operators.Similarity.ivfTopK(indexed, "vec_id", "embedding",
        queryIds, cents, nprobe = 4, k = 5)
    }),

    // Product-quantization ANN — the memory-bound scale path past
    // q95/q101's int8 grid: 64 float dims → ONE packed long of 8
    // 4-bit codes (32× compression), distance = 8 lookups in the
    // precomputed centroid-pair tables. Codebooks train
    // deterministically (hash-ordered sample, farthest-point init);
    // scoring is exact long arithmetic so the RANKING is
    // bit-reproducible — but the codebooks summarize the corpus, so
    // the operator is approximate → rows-only; SimilaritySpec pins
    // determinism + the recall floor vs exact cosine.
    "q252_pq_ann" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val model = graft.operators.Pq.train(emb, "vec_id", "embedding")
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.Pq.topK(emb, "vec_id", "embedding", queryIds, model,
        k = 5, rerank = 32)
    }),

    // IVF-PQ composed ANN (r10 verdict item 5) — q44's coarse
    // quantizer + q252's PQ codes in the standard FAISS IVFPQ
    // arrangement: vectors index as (list, packed residual code),
    // search probes nprobe lists, scores asymmetric integer ADC
    // (PqAdcResidual: the query residual stays exact, only the
    // candidate side is coded) and exact-reranks the shortlist.
    // Candidate IO ∝ probed lists only (IvfPqSpec pins the count);
    // trained artifacts make it approximate → rows-only; IvfPqSpec
    // pins determinism + the recall floor vs exact cosine top-k.
    "q420_ivfpq_ann" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.Pq.ivfPqTopK(emb, "vec_id", "embedding", queryIds,
        nlist = 16, nprobe = 4, k = 5)
    }),

    // Offline k-NN GRAPH build (the NSW/HNSW index's substrate):
    // per-vector top-8 cosine neighbors among IVF-candidate peers —
    // every vector is a SOURCE, so the build uses plain shuffled
    // equi-joins (no broadcast anywhere, unlike the few-query
    // serving paths). Approximate via the IVF candidate restriction
    // → rows-only; GraphAnnSpec pins determinism, degree bounds, and
    // edge recall vs exact neighbors.
    "q437_knn_graph" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      graft.operators.GraphAnn.knnGraph(emb, "vec_id", "embedding", k = 8)
    }),

    // Graph ANN serving: greedy BEAM SEARCH over the q437 graph —
    // per query O(beam · hops · degree) candidates, independent of
    // list sizes (the latency-bound serving shape IVF trades away).
    // Deterministic walk (per-query entry = the min-id member of the
    // query's nearest coarse list — r13; (sim, id) orders, fixed
    // hops) but approximate end-to-end → rows-only; GraphAnnSpec
    // pins the recall floor vs exact cosine top-k.
    "q438_graph_ann" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      // train the coarse quantizer ONCE and share it between build
      // and search (the serving discipline) — retraining is
      // deterministic so the output would be identical, but it costs
      // a sampled corpus scan + driver Lloyd per call
      val cents = graft.operators.Similarity.kmeansCentroids(
        emb, "vec_id", "embedding", 16)
      val graph = graft.operators.GraphAnn.knnGraphWithCentroids(
        emb, "vec_id", "embedding", 8, cents, nprobe = 4).localCheckpoint()
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.GraphAnn.beamSearchWithCentroids(graph, emb,
        "vec_id", "embedding", queryIds, beam = 24, hops = 4, kOut = 5,
        cents = cents)
    }),

    // Incremental k-NN-graph MAINTENANCE (r11 verdict item 6) —
    // corpora grow daily and q437's from-scratch build re-pairs
    // base x base every day. The delta fold reuses the base coarse
    // quantizer: delta vectors probe the existing lists for their
    // own edges; affected base sources re-rank their STORED top-k
    // against only the delta arrivals sharing a probed list (base x
    // base never re-forms — GraphAnnSpec pins the candidate count to
    // the probe x delta-list join exactly); untouched sources keep
    // their rows by anti-join. The fold EQUALS a frozen-centroid
    // rebuild bit for bit (merging a stored top-k with delta-only
    // candidates is lossless). Approximate via the IVF candidate
    // restriction → rows-only; GraphAnnSpec pins determinism, the
    // rebuild equality, and the recall floor vs a fresh rebuild.
    "q472_knn_graph_delta" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
      val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
      val base = graft.operators.GraphAnn.knnGraph(
        baseEmb, "vec_id", "embedding", k = 8).localCheckpoint()
      graft.operators.GraphAnn.knnGraphDelta(base, baseEmb, deltaEmb,
        "vec_id", "embedding", k = 8)
    }),

    // PERSISTED graph-ANN index, end to end (r13 verdict item 3 —
    // the stored-index discipline of q415/q480/q481 applied to the
    // graph family): the base corpus's k-NN graph commits as a
    // src-bucketed Manifest table beside its quantizer + entry
    // nodes; the day-1 delta FOLDS THROUGH the stored table (changed
    // sources COW-upsert at touched-bucket IO, untouched members
    // verbatim — no retrain: the quantizer comes from storage); the
    // serving walk then reads ONLY the stored tables, each hop's
    // edge scan pruned to the frontier's bucket members — serving IO
    // follows the walk, never the graph size. Approximate (IVF
    // candidate restriction + greedy walk) → rows-only; GraphAnnSpec
    // pins stored-vs-in-memory walk equality, the fold ≡
    // knnGraphDelta row for row, touched-bucket-only rewrite, and
    // the ≥0.8 recall floor.
    "q483_graph_ann_stored" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val root = freshScratch("q483", d)
      val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
      val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
      graft.operators.GraphAnnStore.build(baseEmb, "vec_id", "embedding",
        root, k = 8, nlist = 16, nprobe = 4)
      val built = graft.operators.GraphAnnStore.load(s, root,
        k = 8, nlist = 16, nprobe = 4)
      graft.operators.GraphAnnStore.foldDelta(built, baseEmb, deltaEmb,
        "vec_id", "embedding", nameTag = "day1")
      val idx = graft.operators.GraphAnnStore.load(s, root,
        k = 8, nlist = 16, nprobe = 4)
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.GraphAnnStore.beamSearchStored(s, idx, emb,
        "vec_id", "embedding", queryIds, beam = 24, hops = 4, kOut = 5)
    }),

    // PERSISTED sign-LSH ANN index (r14 — the last ANN family still
    // serving from an in-query index build): the base corpus's
    // hyperplane-bucket assignments commit once as a Manifest table
    // key-bucketed on the LSH bucket; the day-1 delta APPENDS its own
    // bucket rows (pure batch IO — bucket assignment is a per-row
    // function of the frozen plane family, which itself persists as
    // nothing but the handle's (numPlanes, dim, seed): planes are
    // deterministic); the multi-probe query then reads ONLY its
    // probed buckets' member files and exact-cosine-ranks the
    // candidates against the corpus table. Approximate (LSH) →
    // rows-only; MultiProbeSpec pins stored ≡ in-memory, append
    // visibility, probed-buckets-only file IO, and the recall floor.
    "q486_signlsh_stored" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val root = freshScratch("q486", d)
      val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
      val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
      graft.operators.SignLshStore.build(baseEmb, "vec_id", "embedding",
        root, numPlanes = 6, dim = 64)
      val built = graft.operators.SignLshStore.load(s, root,
        numPlanes = 6, dim = 64)
      graft.operators.SignLshStore.appendDelta(built, deltaEmb, "vec_id",
        "embedding", nameTag = "day1")
      val idx = graft.operators.SignLshStore.load(s, root,
        numPlanes = 6, dim = 64)
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.SignLshStore.topKStored(s, idx, emb, "vec_id",
        "embedding", queryIds, nProbes = 4, k = 5)
    }),

    // PERSISTED IVF-PQ index, end to end (r14 — the stored-index
    // discipline applied to the LAST index family): the base
    // corpus's coarse centroids + residual codebook + 4-bit codes
    // commit as Manifest tables (codes KEY-BUCKETED on ivf_list);
    // the day-1 delta APPENDS its own codes — pure batch IO, no
    // stored row read or touched (codes are a per-row function of
    // the frozen artifacts — the cheapest fold of all the families);
    // serving reads storage alone, the candidate scan opening only
    // the probed lists' bucket members, so "candidate IO ∝ probed
    // lists" holds at the FILE level too. Approximate (trained
    // artifacts) → rows-only; IvfPqSpec pins stored ≡ in-memory,
    // append ≡ full re-encode, probed-lists-only file IO, recall.
    "q485_ivfpq_stored" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val root = freshScratch("q485", d)
      val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
      val deltaEmb = emb.filter(col("vec_id") % 10 === 0)
      graft.operators.PqStore.build(baseEmb, "vec_id", "embedding", root,
        nlist = 16)
      val built = graft.operators.PqStore.load(s, root, nlist = 16,
        nprobe = 4, m = 16, ksub = 16)
      graft.operators.PqStore.appendDelta(built, deltaEmb, "vec_id",
        "embedding", nameTag = "day1")
      val idx = graft.operators.PqStore.load(s, root, nlist = 16,
        nprobe = 4, m = 16, ksub = 16)
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.PqStore.topKStored(s, idx, emb, "vec_id",
        "embedding", queryIds, k = 5)
    }),

    // DELETION from the persisted graph-ANN index (r16 — the
    // retraction leg of the stored-index lifecycle): an ANN graph
    // cannot delete at delta cost (edges POINTING at a victim live in
    // arbitrary src buckets), so deletes land as an id-bucketed
    // TOMBSTONE append (one commit, delta IO), serving keeps walking
    // through tombstoned nodes but never surfaces them, and EXCISE
    // amortizes the physical removal: one narrow full-index scan
    // finds the affected sources, their lists recompute from scratch
    // against the remaining corpus under the STORED quantizer (one
    // definition with the build — GraphAnn.knnListsFor), victims'
    // rows leave and affected lists replace in ONE atomic
    // delete+upsert, dead entry nodes repair first. Approximate
    // (IVF-restricted graph + greedy walk) → rows-only; GraphAnnSpec
    // pins tombstones-never-surface, excise ≡ frozen-quantizer
    // rebuild on the remaining corpus row for row, entry repair, and
    // clean re-arrival after excision.
    "q489_graph_ann_delete" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val root = freshScratch("q489", d)
      graft.operators.GraphAnnStore.build(emb, "vec_id", "embedding",
        root, k = 8, nlist = 16, nprobe = 4)
      val built = graft.operators.GraphAnnStore.load(s, root,
        k = 8, nlist = 16, nprobe = 4)
      val victims = emb.filter(col("vec_id") % 10 === 3)
        .select(col("vec_id"))
      graft.operators.GraphAnnStore.deleteDelta(built, victims, "d1")
      val tomb = graft.operators.GraphAnnStore.load(s, root,
        k = 8, nlist = 16, nprobe = 4)
      graft.operators.GraphAnnStore.excise(tomb, emb, "vec_id",
        "embedding", "x1")
      val idx = graft.operators.GraphAnnStore.load(s, root,
        k = 8, nlist = 16, nprobe = 4)
      val queryIds = emb
        .filter(col("vec_id") < 20 && col("vec_id") % 10 =!= 3)
        .select(col("vec_id").as("query_id"))
      graft.operators.GraphAnnStore.beamSearchStored(s, idx, emb,
        "vec_id", "embedding", queryIds, beam = 24, hops = 4, kOut = 5)
    }),

    // Multi-table sign-LSH near-dup join at a REAL near-dup
    // threshold (τ=0.8) — the regime cosineNearDupLsh is designed
    // for. The raw corpus has no pairs above ~0.51, so the query
    // deterministically plants one twin per vec_id < 100 (first
    // coordinate +0.3, id offset 10M): planted pairs land at sim
    // ≥ 0.95, every other pair stays ≤ ~0.51, so the τ=0.8 survivor
    // set is exactly the plants, the gap dwarfs any float noise, and
    // the derived table count (miss ≤ 1e-6 AT the threshold; planted
    // pairs sit far above it, missing with p < 1e-30) makes the LSH
    // output provably equal to the exact join — hence a full DuckDB
    // hash oracle on an approximate operator.
    "q71_cosine_neardup_lsh" -> ((s, d) => {
      // project away the table's extra `label` column up front so the
      // twin union is (vec_id, embedding) on both sides
      val base = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 100)
        .select((col("vec_id") + 10000000L).as("vec_id"),
          concat(
            array(element_at(col("embedding"), 1) + lit(0.3f)),
            slice(col("embedding"), 2, 63)).as("embedding"))
      graft.operators.Similarity.cosineNearDupLsh(
        base.unionByName(twins), "vec_id", "embedding",
        threshold = 0.8, dim = 64)
    }),

    // Int8 scalar quantization (the storage/serving compression a
    // vector index applies before ANN): per-dimension min/max over
    // the corpus → each component mapped to ⌊(x−mn)·255/(mx−mn)⌋,
    // capped at 255. All arithmetic is double-precision IEEE in the
    // same association order as the oracle, and floor (never
    // round-half banker's ambiguity) — bitwise identical across
    // engines. The stats aggregate shuffles (dim, x) pairs only;
    // quantization itself is a broadcast-join narrow map.
    "q95_embed_quantize" -> ((s, d) => {
      val e = Tables(s, d).embeddings
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          col("x").cast("double").as("x"))
      val stats = e.groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      e.join(broadcast(stats), "dim")
        .select(col("vec_id"), col("dim"),
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(least(
              floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))),
              lit(255.0)).cast("long")).as("q"))
    }),

    // Per-class centroid accounting over the QUANTIZED codes (q95's
    // grid): per (label, dim) the count and exact integer code sum —
    // the class-centroid building block (centroid = sum/n at the
    // consumer) emitted in the exact-partials form, so embedding-
    // space class analytics (drift, imbalance, separation audits)
    // hash-match on any engine. Long-form (label, dim) keeps the
    // aggregate a plain two-key hash agg — no array-typed shuffles.
    "q174_class_centroids" -> ((s, d) => {
      val e = Tables(s, d).embeddings
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          col("x").cast("double").as("x"))
      val stats = e.groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      e.join(broadcast(stats), "dim")
        .select(col("label"), col("dim"),
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(least(
              floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))),
              lit(255.0)).cast("long")).as("q"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("q")).as("sum_q"))
    }),

    // ANN over int8-QUANTIZED vectors — the serving path after q95's
    // compression: per-dim stats (64-row aggregate, collected like
    // IVF centroids and embedded as plan literals — no join), codes
    // built in a narrow map, then top-k by EXACT integer dot product
    // (native VecDotLong codegen loop). Integer scores make the
    // ranking bit-reproducible across engines and partitionings —
    // the property float ANN scores never have — so this ANN variant
    // is fully hash-oracled, not rows-only.
    "q101_quantized_ann" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val st = emb
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim"), col("x").cast("double").as("x"))
        .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      val mnA = array(st.map(t => lit(t._2)).toIndexedSeq: _*)
      val mxA = array(st.map(t => lit(t._3)).toIndexedSeq: _*)
      val codes = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(mnA, i + 1)
          val mx = element_at(mxA, i + 1)
          when(mx === mn, lit(0L))
            .otherwise(least(
              floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)),
              lit(255.0)).cast("long"))
        }).as("codes"))
      val qs = codes.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("codes").as("qc"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id"))
      codes.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score", Vec.dotLong(col("qc"), col("codes")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), col("score"))
    }),

    // LSH-bucketed ANN (the scale path): deterministic sign-LSH
    // bucket per vector, exact rerank within bucket. Approximate —
    // verified by a rows-only check plus RecallSpec in ScalaTest.
    // 8 planes = 256 buckets (the query's long-standing config —
    // q477's multi-probe variant runs its OWN 6-plane index; the
    // two deliberately do not share a plane family, r12 advice).
    "q42_ann_lsh" -> ((s, d) => {
      val planes = Vec.deterministicPlanes(nPlanes = 8, dim = 64)
      val emb = Tables(s, d).embeddings
        .withColumn("bucket", Vec.lshBucket(col("embedding"), planes))
      val a = emb.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("va"))
      val b = emb.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("vb"))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("sim").desc, col("b_id"))
      a.join(b, "bucket")
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("sim", Vec.cosine(col("va"), col("vb")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("a_id"), col("b_id").as("neighbor_id"), col("rank"))
    }),

    // MULTI-PROBE sign-LSH ANN (Lv et al., VLDB'07) — q42's bucketed
    // ANN upgraded to the production memory trade: instead of more
    // tables (more index copies), each query ALSO probes the buckets
    // reached by flipping its lowest-|margin| sign bits — the planes
    // it sits closest to, exactly where a true neighbor most likely
    // landed across. Corpus index stays 1× (one bucket per vector);
    // only the 20 queries fan out 4 ways and broadcast into the
    // bucket join. Approximate → rows-only; MultiProbeSpec pins
    // determinism, recall(multi) > recall(single), the recall floor,
    // and candidate IO == probed buckets' rows exactly.
    "q477_multiprobe_lsh" -> ((s, d) => {
      val planes = graft.functions.Vec.deterministicPlanes(
        nPlanes = 6, dim = 64)
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      graft.operators.Similarity.multiProbeTopK(emb, "vec_id", "embedding",
        queryIds, planes, nProbes = 4, k = 5)
    }),

    // Test↔train SEMANTIC contamination over quantized codes: the
    // embedding-space twin of q69's n-gram contamination. A held-out
    // md5 split (~1/16) is checked against the train corpus by
    // exact INTEGER cosine on q95's int8 grid —
    // 25·dot² > 22·‖a‖²·‖b‖² ⟺ cos > √0.88 — evaluated by the
    // native VecDotLong codegen loop with per-row norms computed
    // once before the join. Integer arithmetic makes the verdict
    // (and the emitted dot scores) bit-reproducible, so unlike
    // float-cosine contamination this one is fully hash-oracled.
    // Scale shape: the test side broadcasts (held-out splits are
    // small by construction); cost is linear in the train corpus.
    "q196_semantic_contamination" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val st = emb
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim"), col("x").cast("double").as("x"))
        .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      val mnA = array(st.map(t => lit(t._2)).toIndexedSeq: _*)
      val mxA = array(st.map(t => lit(t._3)).toIndexedSeq: _*)
      val codes = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(mnA, i + 1)
          val mx = element_at(mxA, i + 1)
          when(mx === mn, lit(0L))
            .otherwise(least(
              floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)),
              lit(255.0)).cast("long"))
        }).as("codes"))
      val isTest = substring(md5(col("vec_id").cast("string")), 1, 1) === "0"
      val test = codes.filter(isTest)
        .select(col("vec_id").as("test_id"), col("codes").as("tc"),
          Vec.dotLong(col("codes"), col("codes")).as("na"))
      codes.filter(!isTest)
        .withColumn("nb", Vec.dotLong(col("codes"), col("codes")))
        .crossJoin(broadcast(test))
        .withColumn("dot", Vec.dotLong(col("tc"), col("codes")))
        .filter(col("dot") > 0 &&
          lit(25L) * col("dot") * col("dot") > lit(22L) * col("na") * col("nb"))
        .select(col("test_id"), col("vec_id").as("train_id"), col("dot"))
    }),

    // Hard-negative mining — q151 samples RANDOM negatives, this
    // mines the similar-but-not-duplicate band contrastive training
    // actually wants: for each md5-selected anchor (1/16 of vectors,
    // q196's split), candidates with quantized cosine in [0.90, 0.92)
    // — both fences as exact integer cross-multiplications over the
    // int8 codes (100·dot² ≥ 81·na·nb AND 10⁴·dot² < 8464·na·nb,
    // dot > 0),
    // so the band is bit-reproducible and hash-oracled. The anchor
    // set broadcasts; no all-pairs shuffle.
    "q290_hard_negatives" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val st = emb
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim"), col("x").cast("double").as("x"))
        .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      val mnA = array(st.map(t => lit(t._2)).toIndexedSeq: _*)
      val mxA = array(st.map(t => lit(t._3)).toIndexedSeq: _*)
      val codes = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(mnA, i + 1)
          val mx = element_at(mxA, i + 1)
          when(mx === mn, lit(0L))
            .otherwise(least(
              floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)),
              lit(255.0)).cast("long"))
        }).as("codes"))
      val isAnchor = substring(md5(col("vec_id").cast("string")), 1, 1) === "0"
      val anchors = codes.filter(isAnchor)
        .select(col("vec_id").as("anchor_id"), col("codes").as("ac"),
          Vec.dotLong(col("codes"), col("codes")).as("na"))
      codes.filter(!isAnchor)
        .withColumn("nb", Vec.dotLong(col("codes"), col("codes")))
        .crossJoin(broadcast(anchors))
        .withColumn("dot", Vec.dotLong(col("ac"), col("codes")))
        .filter(col("dot") > 0 &&
          lit(100L) * col("dot") * col("dot") >= lit(81L) * col("na") * col("nb") &&
          lit(10000L) * col("dot") * col("dot") < lit(8464L) * col("na") * col("nb"))
        .select(col("anchor_id"), col("vec_id").as("negative_id"), col("dot"))
    }),

    // ANN quality evaluation harness: recall@5 of the IVF index
    // (q44's exact path) against brute-force ground truth, per
    // query — the measurement every index rollout needs before
    // trading exactness for probe cost. Both sides run in one job;
    // the intersection count is an integer and recall an exact
    // n/5 rational. Approximate input → rows-only gate;
    // SimilaritySpec pins the corpus-level recall floor.
    "q205_ann_recall" -> ((s, d) => {
      val emb = Tables(s, d).embeddings
      val cents = graft.operators.Similarity.kmeansCentroids(
        emb, "vec_id", "embedding", nlist = 16)
      val indexed = graft.operators.Similarity.ivfIndex(emb, "embedding", cents)
      val queryIds = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"))
      val ivf = graft.operators.Similarity.ivfTopK(indexed, "vec_id",
        "embedding", queryIds, cents, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val qs = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val brute = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", Vec.cosine(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      queryIds.join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / 5.0).as("recall"))
    }),

    // Semantic dedup keeping the most CENTRAL member (q78 keeps
    // min-id): clusters from the exact cosine pairs + connected
    // components, then each cluster's representative is the member
    // nearest its centroid — scored WITHOUT floats by minimizing
    // n·(x·x) − 2·(x·s) over int8 codes (≡ argmin ‖x − s/n‖², all
    // cross terms integer via VecDotLong), so the centrality choice
    // is bit-reproducible and the whole decision hash-oracles
    // against DuckDB's recursive-CTE + integer-argmin replay. The
    // cluster-sum vectors shuffle (cluster, dim) longs only.
    "q233_semantic_keep_central" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val pairs = graft.operators.Similarity.cosineThresholdPairs(
        emb, "vec_id", "embedding", threshold = 0.45, blocks = 32)
      val clusters = graft.operators.Dedup
        .duplicateClusters(pairs, emb.select("vec_id"))
        .select(col("doc_id").as("vec_id"), col("cluster_id"),
          col("cluster_size"))
      val st = emb
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim"), col("x").cast("double").as("x"))
        .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      val mnA = array(st.map(t => lit(t._2)).toIndexedSeq: _*)
      val mxA = array(st.map(t => lit(t._3)).toIndexedSeq: _*)
      val codes = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(mnA, i + 1)
          val mx = element_at(mxA, i + 1)
          when(mx === mn, lit(0L))
            .otherwise(least(
              floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)),
              lit(255.0)).cast("long"))
        }).as("codes"))
      val member = codes
        .withColumn("dot_self", Vec.dotLong(col("codes"), col("codes")))
        .join(clusters, "vec_id")
      val sums = member
        .select(col("cluster_id"), posexplode(col("codes")).as(Seq("dim", "q")))
        .groupBy("cluster_id", "dim").agg(sum(col("q")).as("sd"))
      val dotS = member
        .select(col("vec_id"), col("cluster_id"),
          posexplode(col("codes")).as(Seq("dim", "q")))
        .join(sums, Seq("cluster_id", "dim"))
        .groupBy(col("vec_id"), col("cluster_id"))
        .agg(sum(col("q") * col("sd")).as("dot_s"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("score"), col("vec_id"))
      member.select(col("vec_id"), col("cluster_id"), col("cluster_size"),
          col("dot_self"))
        .join(dotS, Seq("vec_id", "cluster_id"))
        .withColumn("score",
          col("cluster_size") * col("dot_self") - lit(2L) * col("dot_s"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("vec_id").as("keep_id"),
          col("cluster_size"), col("score"))
    }),

    // EXACT contamination check — the exact float-cosine leg next
    // to q196's quantized-int8 screen, and the embedding-space
    // sibling of q406's incremental text dedup: an eval set (every
    // 10th vector stands in for a benchmark) is checked against the
    // training corpus for cosine ≥ 0.45 (a known ≥1e-4 gap in the
    // data's sim distribution, same fence as q41). The eval side
    // broadcasts; the corpus streams through the codegen'd cosine
    // ONCE — no corpus pair join, no corpus shuffle beyond the
    // identical-vector collapse (Similarity.crossCosinePairs,
    // spec-A/B'd vs brute force incl. planted duplicates).
    "q407_exact_contamination" -> ((s, d) => {
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.crossCosinePairs(
          emb.filter(col("vec_id") % 10 === 7),
          emb.filter(col("vec_id") % 10 =!= 7),
          "vec_id", "embedding", threshold = 0.45)
        .select(col("q_id").as("eval_id"), col("c_id").as("corpus_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q318_class_weights" ->
      """WITH c AS (SELECT label::BIGINT AS label, count(*)::BIGINT AS n
                    FROM embeddings GROUP BY 1),
         t AS (SELECT sum(n)::BIGINT AS nt, count(*)::BIGINT AS k FROM c)
         SELECT label, n,
                ((n * 1000) // nt)::BIGINT AS share_pm,
                ((nt * 1000) // (k * n))::BIGINT AS weight_pm,
                (n * k * 2 < nt) AS underrepresented
         FROM c, t""",
    "q233_semantic_keep_central" ->
      """WITH RECURSIVE prs AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM prs
           UNION SELECT b_id, a_id FROM prs),
         reach AS (
           SELECT vec_id AS s, vec_id AS d FROM embeddings
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         clu AS (
           SELECT s AS vec_id, min(d) AS cluster_id FROM reach GROUP BY 1),
         n AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
               FROM clu GROUP BY 1),
         e AS (
           SELECT vec_id,
                  unnest(range(len(embedding)))::BIGINT AS dim,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
         q AS (
           SELECT vec_id, dim,
                  (CASE WHEN mx = mn THEN 0
                        ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
                   END)::BIGINT AS q
           FROM e JOIN st USING (dim)),
         xx AS (SELECT vec_id, sum(q * q)::BIGINT AS dot_self
                FROM q GROUP BY 1),
         sv AS (SELECT c.cluster_id, q.dim, sum(q.q)::BIGINT AS sd
                FROM q JOIN clu c USING (vec_id) GROUP BY 1, 2),
         xs AS (SELECT q.vec_id, c.cluster_id,
                       sum(q.q * s.sd)::BIGINT AS dot_s
                FROM q JOIN clu c USING (vec_id)
                JOIN sv s ON s.cluster_id = c.cluster_id AND s.dim = q.dim
                GROUP BY 1, 2),
         sc AS (
           SELECT x.vec_id, x.cluster_id, n.cluster_size,
                  (n.cluster_size * xx.dot_self - 2 * x.dot_s)::BIGINT AS score
           FROM xs x JOIN n USING (cluster_id)
           JOIN xx ON xx.vec_id = x.vec_id)
         SELECT cluster_id, vec_id AS keep_id, cluster_size, score
         FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                 ORDER BY score, vec_id) AS rn FROM sc)
         WHERE rn = 1""",
    "q290_hard_negatives" ->
      """WITH e AS (
           SELECT vec_id,
                  unnest(range(len(embedding)))::BIGINT AS dim,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
         q AS (
           SELECT vec_id, dim,
                  (CASE WHEN mx = mn THEN 0
                        ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
                   END)::BIGINT AS q
           FROM e JOIN s USING (dim)),
         d AS (
           SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
                  sum(a.q * b.q)::BIGINT AS dot,
                  sum(a.q * a.q)::BIGINT AS na,
                  sum(b.q * b.q)::BIGINT AS nb
           FROM q a JOIN q b ON a.dim = b.dim
           WHERE substr(md5(a.vec_id::VARCHAR), 1, 1) = '0'
             AND substr(md5(b.vec_id::VARCHAR), 1, 1) <> '0'
           GROUP BY 1, 2)
         SELECT anchor_id, negative_id, dot
         FROM d WHERE dot > 0 AND 100 * dot * dot >= 81 * na * nb
           AND 10000 * dot * dot < 8464 * na * nb""",
    "q196_semantic_contamination" ->
      """WITH e AS (
           SELECT vec_id,
                  unnest(range(len(embedding)))::BIGINT AS dim,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
         q AS (
           SELECT vec_id, dim,
                  (CASE WHEN mx = mn THEN 0
                        ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
                   END)::BIGINT AS q
           FROM e JOIN s USING (dim)),
         d AS (
           SELECT a.vec_id AS test_id, b.vec_id AS train_id,
                  sum(a.q * b.q)::BIGINT AS dot,
                  sum(a.q * a.q)::BIGINT AS na,
                  sum(b.q * b.q)::BIGINT AS nb
           FROM q a JOIN q b ON a.dim = b.dim
           WHERE substr(md5(a.vec_id::VARCHAR), 1, 1) = '0'
             AND substr(md5(b.vec_id::VARCHAR), 1, 1) <> '0'
           GROUP BY 1, 2)
         SELECT test_id, train_id, dot
         FROM d WHERE dot > 0 AND 25 * dot * dot > 22 * na * nb""",
    "q40_ann_topk" ->
      """SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
         FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND b.vec_id <> a.vec_id
         QUALIFY rank <= 5""",
    "q41_embedding_neardup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
    "q78_embedding_dedup_keep" ->
      """WITH RECURSIVE pairs AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT vec_id AS s, vec_id AS d FROM embeddings
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         SELECT s AS vec_id, count(*) AS cluster_size
         FROM reach GROUP BY s HAVING s = min(d)""",
    "q71_cosine_neardup_lsh" ->
      """WITH twins AS (
           SELECT vec_id + 10000000 AS vec_id,
                  list_prepend(embedding[1] + 0.3, embedding[2:]) AS embedding
           FROM embeddings WHERE vec_id < 100),
         u AS (SELECT vec_id, embedding FROM embeddings
               UNION ALL SELECT vec_id, embedding FROM twins)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id
         FROM u a JOIN u b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8""",
    "q95_embed_quantize" ->
      """WITH e AS (
           SELECT vec_id,
                  unnest(range(len(embedding)))::BIGINT AS dim,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1)
         SELECT vec_id, dim,
                (CASE WHEN mx = mn THEN 0
                      ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) END)::BIGINT AS q
         FROM e JOIN s USING (dim)""",
    "q174_class_centroids" ->
      """WITH e AS (
           SELECT label::BIGINT AS label,
                  unnest(range(len(embedding)))::BIGINT AS dim,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1)
         SELECT label, dim, count(*) AS n_vecs,
                sum((CASE WHEN mx = mn THEN 0
                          ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
                     END)::BIGINT)::BIGINT AS sum_q
         FROM e JOIN s USING (dim)
         GROUP BY 1, 2""",
    "q101_quantized_ann" ->
      """WITH e AS (
           SELECT vec_id,
                  unnest(range(len(embedding)))::BIGINT AS dim,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
         q AS (
           SELECT vec_id, dim,
                  (CASE WHEN mx = mn THEN 0
                        ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) END)::BIGINT AS q
           FROM e JOIN s USING (dim)),
         d AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  sum(a.q * b.q)::BIGINT AS score
           FROM q a JOIN q b ON a.dim = b.dim
           WHERE a.vec_id < 20 AND b.vec_id <> a.vec_id
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS rank,
                score
         FROM d
         QUALIFY rank <= 5""",
    "q407_exact_contamination" ->
      """SELECT a.vec_id AS eval_id, b.vec_id AS corpus_id
         FROM embeddings a JOIN embeddings b
           ON a.vec_id % 10 = 7 AND b.vec_id % 10 <> 7
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"""
    // q42_ann_lsh: approximate, not SQL-expressible → rows-only check.
  )

  /** PID-scoped scratch (the DedupOps.freshScratch pattern): content-
    * addressed by input dir, wiped per run so verify/bench re-runs
    * start clean.
    */
  private def freshScratch(tag: String, d: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-" + Integer.toHexString(d.hashCode) +
        "-p" + ProcessHandle.current().pid())
    graft.util.Fs.deleteRecursively(p)
    p.toString
  }
}
