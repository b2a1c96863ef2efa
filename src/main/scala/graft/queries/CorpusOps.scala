package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators (q72–q77): the steps between
  * a cleaned document set and a training run — context-window
  * chunking, deterministic splits, source mixing, shuffle sharding,
  * PII redaction, and the JSONL interchange format.
  *
  * All six are EXACT and fully oracled: where an operator is
  * conventionally random (splits, mixing, shuffling), the randomness
  * is replaced by md5 of the document id — deterministic, engine-
  * independent, uniformly distributed, and reproducible on any
  * cluster size, which is precisely what a production pipeline wants
  * anyway (re-runs must route every doc the same way).
  *
  * Scale notes per operator are on each query; none of them shuffles
  * document text except where the output IS the text (chunking,
  * redaction), and nothing funnels through the driver.
  */
object CorpusOps {

  /** Chunk geometry: windows of `chunkTokens` starting every
    * `strideTokens` (overlap = chunk − stride).
    */
  private val chunkTokens = 50
  private val strideTokens = 40

  /** Email/phone patterns shared by the redaction and its counts —
    * RE2-compatible (DuckDB) and java.util.regex-compatible (Spark)
    * subset: character classes, bounded repeats, word boundaries.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b555-\\d{4}\\b"

  /** Deterministic PII planting (the corpus is synthetic word salad
    * with no real PII): one email + one phone per doc, derived from
    * doc_id — identical construction in the SQL oracle.
    */
  private def plantedText = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com or call 555-0"),
    lpad((col("doc_id") % 1000).cast("string"), 3, "0"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Source-interleaved stream order — the deterministic global
    // training order that round-robins sources instead of q75's
    // stateless hash shards: every source gets its own md5-shuffled
    // rank (GroupedRank — 20 sources would otherwise mean 20 one-task
    // window sorts), then the stream position is the global rank over
    // (round, source), ALSO two-phase — so consecutive stream
    // positions cycle through sources while each source's internal
    // order stays shuffled. The property batch-wise loss smoothing
    // wants, with zero residual single-task structure anywhere in
    // the plan.
    "q316_interleave_stream" -> ((s, d) => {
      val tagged = Tables(s, d).documents
        .select(col("doc_id"), col("source"),
          md5(concat(lit("il"), col("doc_id").cast("string"))).as("h"))
      val ranked = graft.operators.GroupedRank.withRank(tagged,
        Seq("source"), Seq(col("h"), col("doc_id")), "rk")
      graft.operators.GroupedRank.withGlobalRank(ranked,
          Seq(col("rk"), col("source")), "stream_pos")
        .select(col("doc_id"), col("source"), col("rk"),
          col("stream_pos"))
    }),

    // Importance-based data selection (the DSIR shape, Xie et al.
    // 2023, made integer-exact): hash every token into 256 feature
    // buckets (the md5-mix recipe q236 oracles), count each bucket's
    // occurrences in the TARGET distribution (lang = 'en') vs the
    // RAW pool (everything else), call a bucket distinctive when its
    // relative rate is strictly higher in target — the float-free
    // cross-multiplication t_n·R > r_n·T (done in Decimal so corpus-
    // scale counts cannot overflow) — then score each raw doc by how
    // many of its distinct features are distinctive and keep the
    // top 50 (score desc, doc_id tie-break). The scale shape: one
    // token-bucket aggregate over (feature, is_target) pairs, a
    // 256-row broadcast of the distinctive set, one per-doc count —
    // log-ratio DSIR with the same shuffles, no FP divergence.
    "q255_importance_select" -> ((s, d) => {
      val h = md5(col("tok"))
      val feat = ((ascii(substring(h, 1, 1)) * 49 +
        ascii(substring(h, 2, 1)) * 7 + ascii(substring(h, 3, 1))) % 256)
        .cast("long")
      val fd = TextOps.parallelized(Tables(s, d).documents)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("lang"), feat.as("f"))
      val counts = fd.groupBy(col("f")).agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_n"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("r_n"))
      val totals = counts.agg(sum(col("t_n")).as("tt"), sum(col("r_n")).as("rr"))
      val distinctive = counts.crossJoin(broadcast(totals))
        .filter(col("t_n").cast("decimal(38,0)") * col("rr") >
          col("r_n").cast("decimal(38,0)") * col("tt"))
        .select(col("f"))
      fd.filter(col("lang") =!= "en")
        .select(col("doc_id"), col("f")).distinct()
        .join(broadcast(distinctive), "f")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50)
    }),

    // Release pipeline v2 — q240 composed the round-4 stages; this
    // chains the round-6 ones end to end in ONE dataflow: C4-lite
    // quality gate → exact dedup (min-id digest rep) → temperature-
    // scaled source mixing (q256's integer Bernoulli) → hash split
    // (q73) → per-(split, source) release manifest with doc counts,
    // token mass, and the q273-style order-independent checksum. The
    // COMPOSITION is what's gated: the oracle replays the whole
    // chain relationally, so a change to any stage's semantics
    // breaks this row even if the stage's own gate still passes.
    "q300_release_v2" -> ((s, d) => {
      val docs = Tables(s, d).documents
        .filter(size(split(col("text"), " ")) >= 30 && col("lang") === "en")
      val rep = docs.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      val kept = docs.join(rep.select(col("doc_id")), "doc_id")
      val stats = kept.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
        .withColumn("tgt", least(col("n_src"),
          floor(sqrt(col("n_src").cast("double"))) * 16L))
      val mixed = kept.join(broadcast(stats), "source")
        .withColumn("u", expr(
          "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 5), 16, 10) AS BIGINT)"))
        .filter(col("u") * col("n_src") < col("tgt") * lit(1048576L))
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      mixed
        .withColumn("split", when(h <= "b", "train")
          .when(h.isin("c", "d"), "val").otherwise("test"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("token_mass"),
          sum(expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6)," +
            " 16, 10) AS BIGINT)")).cast("long").as("checksum"))
    }),

    // Temporal (leakage-free) split — the third canonical split next
    // to q73's hash split and q230's group split: train = events
    // before the 80% point of the corpus's WALL-CLOCK span (cutoff =
    // min + 4·(max−min) div 5, a pure 1-row integer aggregate — no
    // global rank pass at any scale), eval = at-or-after. The split
    // manifest records counts, shares, and each side's day range.
    "q296_temporal_split" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("event_id"), unix_micros(col("ts")).as("us"), col("ts"))
      val cut = ev.agg(expr(
        "(min(us) + ((max(us) - min(us)) * 4) div 5)").as("cut_us"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      ev.crossJoin(broadcast(cut))
        .select(when(col("us") < col("cut_us"), "train")
          .otherwise("eval").as("split"), col("ts"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_rows"),
          date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("ts")), "yyyy-MM-dd").as("last_day"))
        .crossJoin(broadcast(tot))
        .select(col("split"), col("n_rows"),
          expr("(n_rows * 1000) div n_total").as("share_pm"),
          col("first_day"), col("last_day"))
    }),

    // Split-parity audit — does q73's hash split preserve the
    // language mix? Per (split, lang): the cell count against its
    // expectation n_l·n_s/n, flagged when the share deviates by more
    // than 20‰ — the comparison |n_sl·n − n_l·n_s|·50 > n_s·n runs
    // in DECIMAL(38,0) cross-multiplication so corpus-scale counts
    // cannot overflow and no float ratio is ever formed. Two small
    // aggregates over the (split, lang) histogram.
    "q297_split_parity" -> ((s, d) => {
      val docs = Tables(s, d).documents.select(col("doc_id"), col("lang"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "b", "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 1)
            .isin("c", "d"), "val")
          .otherwise("test").as("split"))
      val cell = docs.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_sl"))
      val bySplit = cell.groupBy(col("split")).agg(sum(col("n_sl")).as("n_s"))
      val byLang = cell.groupBy(col("lang")).agg(sum(col("n_sl")).as("n_l"))
      val total = cell.agg(sum(col("n_sl")).as("n"))
      cell.join(broadcast(bySplit), "split")
        .join(broadcast(byLang), "lang")
        .crossJoin(broadcast(total))
        .select(col("split"), col("lang"), col("n_sl"),
          col("n_s").cast("long").as("n_s"), col("n_l").cast("long").as("n_l"),
          (abs(col("n_sl").cast("decimal(38,0)") * col("n") -
            col("n_l").cast("decimal(38,0)") * col("n_s")) * 50 >
            col("n_s").cast("decimal(38,0)") * col("n")).as("skewed"))
    }),

    // Per-source language-purity report — the mixture monitor next
    // to q256's rebalance: Herfindahl concentration Σ share² in
    // exact permille via the integer form Σ(n_lang²)·1000 div n²,
    // plus the majority language (count desc, lang asc) and distinct
    // language count. Two small aggregates; the per-source language
    // histogram is the only corpus shuffle.
    "q282_source_purity" -> ((s, d) => {
      val byLang = Tables(s, d).documents
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n").desc, col("lang"))
      byLang.withColumn("rk", row_number().over(w))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          sum(col("n") * col("n")).as("sum_sq"),
          min(when(col("rk") === 1, col("lang"))).as("majority_lang"))
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("n_langs"),
          expr("(sum_sq * 1000) div (n_docs * n_docs)").as("purity_pm"),
          col("majority_lang"))
    }),

    // Temperature-scaled source mixing (the Gopher/PaLM α = 1/2
    // rebalance): per-source counts n_s give a flattened target
    // k_s = min(n_s, 16·⌊√n_s⌋) — the keep RATE k_s/n_s ∝ n_s^(-1/2)
    // downsamples dominant sources while small sources survive
    // whole. Selection is Bernoulli by 20-bit md5 threshold with the
    // float-free cross-multiplication u·n_s < k_s·2^20 (exact in
    // int64 up to n_s ≈ 8.8e12 rows per source — documented bound;
    // IEEE sqrt is correctly rounded so ⌊√n⌋ is engine-stable). The
    // scale shape: one tiny per-source aggregate broadcast back, then
    // a pure narrow filter — no window, no per-source sort, unlike
    // rank-based selection which serializes each source's rows
    // through one partition.
    "q256_temperature_mix" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val stats = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_src"))
        .withColumn("tgt", least(col("n_src"),
          floor(sqrt(col("n_src").cast("double"))) * 16L))
      docs.join(broadcast(stats), "source")
        .withColumn("u", expr(
          "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 5), 16, 10) AS BIGINT)"))
        .filter(col("u") * col("n_src") < col("tgt") * lit(1048576L))
        .select(col("doc_id"), col("source"), col("n_src"), col("tgt"))
    }),

    // Context-window chunking with overlap: one row per (doc, chunk),
    // chunk = tokens [start, start+50), starts every 40 tokens. A
    // narrow generator (posexplode over a per-row sequence) — no
    // shuffle at all; output size is input size × ~n/stride. The
    // universal pre-tokenization step for long-document training.
    "q72_chunk_overlap" -> ((s, d) => {
      Tables(s, d).documents
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0),
            greatest(size(col("toks")) - 1, lit(0)), lit(strideTokens)))
            .as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          array_join(slice(col("toks"), col("start") + 1, lit(chunkTokens)), " ")
            .as("chunk_text"))
    }),

    // Deterministic train/val/test assignment by the first hex digit
    // of md5(doc_id): 12/16 train, 2/16 val, 2/16 test. Pure narrow
    // map — the split of a 100 TB corpus costs one projection, and
    // every engine/re-run routes each doc identically (the property
    // that keeps eval sets uncontaminated across pipeline versions).
    "q73_split_assign" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      Tables(s, d).documents.select(col("doc_id"),
        when(h <= "b", "train").when(h.isin("c", "d"), "val")
          .otherwise("test").as("split"))
    }),

    // Source-weighted mixing: per-source sampling rates (derived here
    // from the source index mod 4 → 25/50/75/100%) applied via a
    // 256-bucket md5 hash — the deterministic form of temperature /
    // mixture-weight sampling between corpus sources. Narrow map +
    // filter; weights live in the plan, not in a join.
    "q74_mix_weighted" -> ((s, d) => {
      val idx = substring(col("source"), 4, 16).cast("int")
      val bucket = substring(md5(concat(lit("mix"), col("doc_id").cast("string"))), 1, 2)
      Tables(s, d).documents
        .filter(idx % 4 === 3 ||
          (idx % 4 === 0 && bucket < "40") ||
          (idx % 4 === 1 && bucket < "80") ||
          (idx % 4 === 2 && bucket < "c0"))
        .select(col("doc_id"), col("source"))
    }),

    // Shuffle sharding for training order: shard = first byte of
    // md5(doc_id) (256 shards), rank = position within the shard in
    // md5 order. A reader streaming shards 00..ff in rank order sees
    // a uniform deterministic permutation of the corpus. This is the
    // scale-correct global shuffle: a direct row_number over the full
    // corpus would pull every row through ONE window partition,
    // whereas sharding keeps the sort fully parallel (one modest sort
    // per shard) at any corpus size.
    "q75_shuffle_shard" -> ((s, d) => {
      val h = md5(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables(s, d).documents
        .select(col("doc_id"), substring(h, 1, 2).as("shard"), h.as("h"))
        .withColumn("rank_in_shard", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("rank_in_shard"))
    }),

    // PII redaction with audit counts. The synthetic corpus carries
    // no PII, so one email + one phone are planted per doc (same
    // expression in the oracle) and must come back out: emails →
    // [EMAIL], phones → [PHONE], plus per-doc match counts. Narrow
    // map; regexes are RE2-safe so the same patterns run on any
    // engine. At 100 TB this is one codegen'd projection pass.
    "q76_pii_redact" -> ((s, d) => {
      Tables(s, d).documents.select(col("doc_id"),
        regexp_replace(regexp_replace(plantedText, emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]").as("redacted"),
        size(regexp_extract_all(plantedText, lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(plantedText, lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"))
    }),

    // JSONL interchange: stage the documents as line-delimited JSON
    // (the lingua franca of training-data exchange), read them back
    // through Spark's JSON source with an explicit schema, and
    // aggregate from the round-tripped frame. The oracle computes the
    // same result from the parquet directly, so the row proves the
    // JSONL write→read path is lossless. Staging is content-addressed
    // under java.io.tmpdir (same pattern as the streaming source
    // stager) — bounded across re-runs.
    // KV serving round-trip: per-source corpus stats batch-upserted
    // through the batched KV client (the DynamoDB batchWriteItem
    // shape), then read back through the `graft-kv` DSv2 source —
    // one input partition per scan SEGMENT (the parallel-scan shape),
    // so the read never funnels through the driver. Oracle: the same
    // aggregate straight off the parquet.
    "q80_kv_serving" -> ((s, d) => {
      import graft.music.{BatchedKvSink, InMemoryKvClient, InMemoryKvServer}
      val table = "q80_doc_stats_" + Integer.toHexString(d.hashCode)
      InMemoryKvServer.reset(table) // idempotent re-runs
      val agg = Tables(s, d).documents
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
      new BatchedKvSink(InMemoryKvClient(table)).upsert(agg, Seq("source"))
      s.read.format("graft-kv")
        .option("table", table).option("segments", "8").load()
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("total_chars").cast("long").as("total_chars"))
    }),

    // KV serving with PUSHDOWN: the q80 table re-read through the
    // DSv2 pushdown surfaces — the source-attribute equality
    // evaluates INSIDE the scan (a KV FilterExpression; no post-scan
    // Filter node — pinned in PipelineSpec) and only the required
    // columns materialize into rows. The point-lookup shape a
    // serving layer runs against a corpus-scale KV table.
    "q176_kv_pushdown" -> ((s, d) => {
      import graft.music.{BatchedKvSink, InMemoryKvClient, InMemoryKvServer}
      val table = "q176_doc_stats_" + Integer.toHexString(d.hashCode)
      InMemoryKvServer.reset(table) // idempotent re-runs
      val agg = Tables(s, d).documents
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
      new BatchedKvSink(InMemoryKvClient(table)).upsert(agg, Seq("source"))
      s.read.format("graft-kv")
        .option("table", table).option("segments", "8").load()
        .filter(col("source") === "src3")
        .select(col("source"), col("n_docs").cast("long").as("n_docs"))
    }),

    // GPT-style sequence PACKING (concat-and-chunk): documents are
    // laid end-to-end in deterministic doc_id order and cut into
    // fixed 2048-token training sequences; docs may straddle a cut.
    // The global token offset is a TWO-PHASE PREFIX SUM — per-shard
    // running sums in parallel plus a tiny cumulative over shard
    // totals (broadcast back) — never a single-partition window over
    // the corpus: the pattern that makes a global ordering scale.
    // Output: one row per (sequence, doc) overlap with the token
    // count it contributes — exactly the index a packed-pretraining
    // dataloader consumes.
    "q106_sequence_pack" -> ((s, d) => {
      val cap = 2048L
      val nd = Tables(s, d).documents
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .filter(col("n") > 0)
        .withColumn("shard", expr("doc_id div 1000"))
      // phase 1: within-shard running sums (parallel across shards)
      val wIn = Window.partitionBy(col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = nd.withColumn("local_end", sum(col("n")).over(wIn))
      // phase 2: shard offsets — a window over #shards rows only
      val wSh = Window.orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = nd.groupBy("shard").agg(sum(col("n")).as("shard_total"))
        .withColumn("shard_offset",
          coalesce(sum(col("shard_total")).over(wSh), lit(0L)))
        .select("shard", "shard_offset")
      local.join(broadcast(offsets), "shard")
        .withColumn("start", col("shard_offset") + col("local_end") - col("n"))
        .select(col("doc_id"), col("n"), col("start"),
          explode(sequence(expr(s"start div $cap"),
            expr(s"(start + n - 1) div $cap"))).as("seq_id"))
        .select(col("seq_id"), col("doc_id"),
          (least((col("seq_id") + 1) * cap, col("start") + col("n")) -
            greatest(col("seq_id") * cap, col("start"))).as("n_tokens_in_seq"))
    }),

    // Deterministic negative sampling for contrastive training: each
    // test-split anchor gets 3 negatives drawn from a BOUNDED,
    // hash-selected train-split pool (32 docs, broadcast), ranked by
    // a per-(anchor, candidate) hash with a different-source
    // constraint. The bounded pool is what makes this linear — the
    // naive anchors × corpus ranking is quadratic; a 32-row
    // broadcast pool caps per-anchor work at 32 comparisons at any
    // corpus size. Same split rule as q73 (md5 first hex digit).
    "q151_negative_sampling" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val split = substring(md5(col("doc_id").cast("string")), 1, 1)
      val anchors = docs.filter(split > "d")
        .select(col("doc_id").as("anchor_id"), col("source").as("a_src"))
      // orderBy + limit plans as a parallel TakeOrderedAndProject —
      // never a single-reducer global window just to pick 32 rows
      val pool = docs.filter(split <= "b")
        .select(col("doc_id"), col("source"),
          md5(concat(lit("pool:"), col("doc_id").cast("string"))).as("ph"))
        .orderBy(col("ph"), col("doc_id")).limit(32)
        .select(col("doc_id").as("cand_id"), col("source").as("c_src"))
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy(col("anchor_id")).orderBy(col("h"), col("cand_id"))
      anchors.join(broadcast(pool), col("a_src") =!= col("c_src"))
        .withColumn("h", md5(concat(col("anchor_id").cast("string"),
          lit(":"), col("cand_id").cast("string"))))
        .withColumn("rk", row_number().over(wA).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("anchor_id"), col("cand_id").as("neg_id"), col("rk"))
    }),

    // Length-bucketed batching for inference/training: docs grouped
    // into token-length buckets (pad waste bounded by the bucket
    // width), then deterministic batch ids of 8 within each bucket.
    // The batch-id window runs PER BUCKET — parallel across buckets,
    // never a global sequence.
    "q156_length_batching" -> ((s, d) => {
      val nTok = size(split(col("text"), " "))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket")).orderBy(col("doc_id"))
      Tables(s, d).documents
        .select(col("doc_id"), nTok.cast("long").as("n_tokens"))
        .withColumn("bucket", expr("n_tokens div 16"))
        .withColumn("batch_in_bucket",
          expr("(row_number() over (partition by bucket order by doc_id) - 1) div 8"))
        .select(col("doc_id"), col("n_tokens"), col("bucket"),
          col("batch_in_bucket").cast("long").as("batch_in_bucket"))
    }),

    "q77_jsonl_source" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-q77-" + Integer.toHexString(d.hashCode)).toString
      Tables(s, d).documents
        .select(to_json(struct(col("doc_id"), col("text"), col("source"))).as("value"))
        .write.mode("overwrite").text(dir)
      s.read.schema("doc_id LONG, text STRING, source STRING").json(dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
    }),

    // Token-budget sampling: each source contributes at most 1000
    // tokens to the mix, chosen in deterministic hash order (md5 of
    // doc_id — a fixed shuffle of the corpus, not "first files win").
    // Greedy cumulative-sum-under-budget is the standard way a
    // training mix hits per-source token targets; docs stay whole.
    // One shuffle on source; the window is per-source parallel.
    "q165_token_budget" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables(s, d).documents
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= 1000)
    }),

    // Fractional-epoch upsampling — the other half of the data
    // recipe (q74 downsamples, this upsamples): per-source epoch
    // weights 0.5/1.0/1.5/2.5 realized as floor(w) whole copies plus
    // one md5-gated extra copy for the fractional part. Every copy
    // is an explicit (doc, copy_idx) row, so downstream shuffling
    // treats repeats as independent training examples. A narrow
    // explode with fan-out = the epoch weight — no shuffle, no join;
    // the recipe lives in the plan.
    "q170_epoch_upsample" -> ((s, d) => {
      val idx = substring(col("source"), 4, 16).cast("int")
      val whole = when(idx % 4 === 0, 0).when(idx % 4 === 1, 1)
        .when(idx % 4 === 2, 1).otherwise(2)
      val frac = substring(
        md5(concat(lit("ep"), col("doc_id").cast("string"))), 1, 2) < "80"
      val copies = whole + when(frac, 1).otherwise(0)
      Tables(s, d).documents
        .select(col("doc_id"), col("source"), copies.as("n_copies"))
        .filter(col("n_copies") >= 1)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1L), col("n_copies").cast("long")))
            .as("copy_idx"))
    }),

    // Curriculum ordering: a global training order of
    // (length band ASC, md5 shuffle within band) — short documents
    // first, deterministically shuffled inside each difficulty tier.
    // The rank is q171's two-phase construction (range exchange →
    // parallel per-partition windows → broadcast prefix offsets), so
    // the TOTAL order never funnels through a single-reducer window
    // at any corpus size.
    "q201_curriculum" -> ((s, d) => {
      val docs = Tables(s, d).documents
        .select(col("doc_id"), expr("n_chars div 200").as("band"),
          md5(concat(lit("cur"), col("doc_id").cast("string"))).as("h"))
      val parts = docs
        .repartitionByRange(16, col("band"), col("h"), col("doc_id"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val counts = parts.groupBy(col("pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets: Map[Int, Long] = {
        val sorted = counts.toSeq.sortBy(_._1)
        sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
      }
      val w = Window.partitionBy(col("pid"))
        .orderBy(col("band"), col("h"), col("doc_id"))
      parts
        .withColumn("rank",
          row_number().over(w).cast("long") +
            element_at(typedLit(offsets), col("pid")))
        .select(col("doc_id"), col("band"), col("rank"))
    }),

    // Exact-quota proportional sampling (largest-remainder method):
    // a 100-doc sample allocated across sources EXACTLY proportional
    // to size — floor(100·cᵢ/C) per source plus the leftover seats
    // by largest remainder (source-name tie-break), then the first
    // nᵢ docs per source in md5 order. All-integer allocation: the
    // quota table is exact and sums to precisely 100 (the property
    // per-row Bernoulli sampling like q74 can't give you). The
    // allocation math runs on the source-count aggregate
    // (broadcast-sized); the corpus pass is one md5-ranked window.
    "q216_quota_sample" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val c = docs.groupBy(col("source")).agg(count(lit(1)).as("ci"))
      val t = c.agg(sum(col("ci")).as("ct"))
      val a0 = c.crossJoin(broadcast(t))
        .withColumn("base", expr("(100 * ci) div ct"))
        .withColumn("rem", (lit(100) * col("ci")) % col("ct"))
      val r = a0.agg((lit(100L) - sum(col("base"))).as("extra"))
      val wr = Window.orderBy(col("rem").desc, col("source"))
      val alloc = a0.crossJoin(broadcast(r))
        .withColumn("rn", row_number().over(wr))
        .withColumn("n_i",
          col("base") + when(col("rn") <= col("extra"), 1L).otherwise(0L))
        .select(col("source"), col("n_i"))
      val wd = Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("qs"), col("doc_id").cast("string"))),
          col("doc_id"))
      docs.withColumn("rk", row_number().over(wd))
        .join(broadcast(alloc), "source")
        .filter(col("rk") <= col("n_i"))
        .select(col("source"), col("doc_id"))
    }),

    // GROUP-aware train/val/test split (q73 splits at the DOC grain;
    // behavioral data must split at the USER grain or a user's
    // events straddle train and eval — target leakage). Split is a
    // pure function of md5(user_id); the leakage audit — users
    // assigned to more than one split — is COMPUTED from the data
    // (not assumed) and must be zero, which the oracle pins as a
    // literal.
    "q230_group_split" -> ((s, d) => {
      val h = substring(md5(concat(lit("usr"),
        col("user_id").cast("string"))), 1, 1)
      val split = when(h <= "b", "train")
        .when(h.isin("c", "d"), "val").otherwise("test")
      val ev = Tables(s, d).events.withColumn("split", split)
      val leak = ev.select(col("user_id"), col("split")).distinct()
        .groupBy("user_id").agg(countDistinct(col("split")).as("ns"))
        .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("leak_users"))
      ev.groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .crossJoin(broadcast(leak))
    }),

    // Next-event training pairs (the SUPERVISED example builder; q81
    // emits raw sequences): within each session, (2-event context →
    // next event type) pairs via two lag() columns over one session
    // ordering — session starts get a "^" boundary marker, the
    // first event of a session never leaks the previous session as
    // context. One window shuffle on (user, session); everything
    // else is codegen.
    "q232_next_event_pairs" -> ((s, d) => {
      val sess = graft.streaming.Sessionize.withSessionIds(
        Tables(s, d).events, gapMinutes = 30)
      val w = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts"), col("event_id"))
      sess
        .withColumn("prev1", lag(col("event_type"), 1).over(w))
        .withColumn("prev2", lag(col("event_type"), 2).over(w))
        .filter(col("prev1").isNotNull)
        .select(col("user_id"), col("event_id"),
          concat_ws(">", coalesce(col("prev2"), lit("^")), col("prev1"))
            .as("context"),
          col("event_type").as("label"))
    }),

    // Recency-decay sampling: keep probability halves every 7 days
    // of age — the freshness-weighted training sample. The weight
    // 1/2^(age/7 weeks) is an exact BINARY rational, so selection is
    // a pure integer compare: u = first 6 md5 hex digits (24 uniform
    // bits) < 2^24 >> weeks. No floats anywhere; both engines decode
    // the same hex so the kept set hash-matches exactly.
    "q239_recency_sample" -> ((s, d) => {
      val ev = Tables(s, d).events
      val mx = ev.agg(max(to_date(col("ts"))).as("mx"))
      ev.crossJoin(broadcast(mx))
        .withColumn("age_d",
          datediff(col("mx"), to_date(col("ts"))).cast("long"))
        .withColumn("u", expr(
          "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"))
        // clamp the shift: Spark/Java shift semantics are mod-64, so
        // age >= 448 days (shift >= 64) would WRAP back to a full
        // keep-threshold while SQL `>>` engines yield 0 — past 24
        // weeks the threshold is 0 anyway, pin it there explicitly
        .filter(col("u") < when(expr("age_d div 7") >= 24, lit(0L))
          .otherwise(expr("shiftright(16777216L, CAST(age_d div 7 AS INT))")))
        .select(col("event_id"), col("age_d"))
    }),

    // The corpus RELEASE run, end to end in one dataflow: quality
    // gate (C4-lite: token floor + language) → exact dedup keeping
    // the min-id representative → per-source release accounting
    // (surviving docs, token mass, duplicates removed). Each stage
    // is an operator proven elsewhere (q134 / q32 / q122); this row
    // set is the composed artifact a release manifest records, and
    // the oracle replays the full chain relationally — so the
    // COMPOSITION is gated, not just the parts.
    "q240_release_pipeline" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val toks = split(col("text"), " ")
      val filtered = docs.filter(size(toks) >= 30 && col("lang") === "en")
      val kept = filtered
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      kept
        .join(docs.select(col("doc_id"), col("source"),
          size(toks).cast("long").as("nt")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"),
          sum(col("n_copies") - 1).as("dups_removed"))
    }),

    // Greedy coverage-based data SELECTION — the submodular
    // facility-location shape behind modern "pick the most
    // informative subset" curation: 8 greedy rounds, each picking
    // the document adding the most UNCOVERED vocabulary (tie-break
    // doc_id), exact 1-1/e guarantee by submodularity. The coverage
    // unit is distinct BIGRAMS (the unigram vocab of this corpus is
    // 31 tokens — one doc covers it; bigrams give a 900+ element
    // universe). Per round the corpus pays one (doc, bigram)-distinct
    // anti-join + aggregate; the covered set is the picked docs'
    // vocabulary (≤K docs — broadcast-sized), the picked list is K
    // driver-held ids, and the bigram frame persists across rounds —
    // nothing quadratic, nothing driver-sized but the answer. The
    // oracle replays all 8 rounds as MATERIALIZED CTEs (the
    // q355/q257 discipline).
    "q414_coverage_select" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val bgs = transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
      val tok = Tables(s, d).documents
        .filter(size(toks) >= 2)
        .select(col("doc_id"), explode(array_distinct(bgs)).as("tk"))
        .persist()
      try {
        var picked = Vector.empty[(Long, Long)] // (doc_id, gain)
        var exhausted = false
        for (_ <- 1 to 8 if !exhausted) {
          val ids = picked.map(_._1)
          val remaining =
            if (ids.isEmpty) tok else tok.filter(!col("doc_id").isin(ids: _*))
          val uncovered =
            if (ids.isEmpty) remaining
            else remaining.join(
              tok.filter(col("doc_id").isin(ids: _*))
                .select(col("tk")).distinct(),
              Seq("tk"), "left_anti")
          // headOption, not (0): when the bigram universe is fully
          // covered before round 8 (tiny corpora), no document adds
          // coverage — stop gracefully with fewer rows instead of an
          // ArrayIndexOutOfBoundsException (r10 advice)
          uncovered
            .groupBy(col("doc_id")).agg(count(lit(1)).as("g"))
            .orderBy(col("g").desc, col("doc_id"))
            .limit(1).collect().headOption match {
            case Some(top) => picked :+= ((top.getLong(0), top.getLong(1)))
            case None => exhausted = true
          }
        }
        import s.implicits._
        picked.zipWithIndex.map { case ((id, g), i) =>
          (i + 1L, id, g, picked.take(i + 1).map(_._2).sum)
        }.toDF("rank", "doc_id", "gain", "covered_total")
      } finally { tok.unpersist(); () }
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q316_interleave_stream" ->
      """WITH r AS (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5('il' || doc_id::VARCHAR), doc_id)::BIGINT
                    AS rk
           FROM documents)
         SELECT doc_id, source, rk,
                row_number() OVER (ORDER BY rk, source)::BIGINT AS stream_pos
         FROM r""",
    "q255_importance_select" ->
      """WITH tf AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         fd AS (
           SELECT doc_id, lang,
                  ((ascii(substr(md5(tok), 1, 1)) * 49
                    + ascii(substr(md5(tok), 2, 1)) * 7
                    + ascii(substr(md5(tok), 3, 1))) % 256)::BIGINT AS f
           FROM tf),
         c AS (
           SELECT f,
                  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_n,
                  sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS r_n
           FROM fd GROUP BY 1),
         tot AS (SELECT sum(t_n) AS tt, sum(r_n) AS rr FROM c),
         dist AS (SELECT f FROM c, tot WHERE t_n * rr > r_n * tt)
         SELECT doc_id, count(*)::BIGINT AS score
         FROM (SELECT DISTINCT doc_id, f FROM fd WHERE lang <> 'en') df
         JOIN dist USING (f)
         GROUP BY 1
         ORDER BY score DESC, doc_id
         LIMIT 50""",
    "q300_release_v2" ->
      """WITH f AS (
           SELECT * FROM documents
           WHERE len(string_split(text, ' ')) >= 30 AND lang = 'en'),
         rep AS (SELECT md5(text) AS fp, min(doc_id) AS doc_id
                 FROM f GROUP BY 1),
         k AS (SELECT f.* FROM f JOIN rep ON rep.doc_id = f.doc_id),
         st AS (SELECT source, count(*)::BIGINT AS n_src,
                  least(count(*), floor(sqrt(count(*)))::BIGINT * 16)::BIGINT
                    AS tgt
                FROM k GROUP BY 1),
         m AS (SELECT k.* FROM k JOIN st USING (source)
               WHERE ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 5))::BIGINT
                     * st.n_src < st.tgt * 1048576),
         sp AS (SELECT m.*,
                  CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) <= 'b'
                       THEN 'train'
                       WHEN substring(md5(doc_id::VARCHAR), 1, 1) IN ('c', 'd')
                       THEN 'val' ELSE 'test' END AS split
                FROM m)
         SELECT split, source, count(*)::BIGINT AS n_docs,
                sum(len(string_split(text, ' ')))::BIGINT AS token_mass,
                sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT)
                  ::BIGINT AS checksum
         FROM sp GROUP BY 1, 2""",
    "q296_temporal_split" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us, ts FROM events),
         c AS (SELECT min(us) + ((max(us) - min(us)) * 4) // 5 AS cut_us
               FROM e),
         t AS (SELECT count(*)::BIGINT AS n_total FROM e),
         s AS (SELECT CASE WHEN e.us < c.cut_us THEN 'train'
                           ELSE 'eval' END AS split, e.ts
               FROM e, c),
         g AS (SELECT split, count(*)::BIGINT AS n_rows,
                      strftime(min(ts), '%Y-%m-%d') AS first_day,
                      strftime(max(ts), '%Y-%m-%d') AS last_day
               FROM s GROUP BY 1)
         SELECT split, n_rows, ((n_rows * 1000) // t.n_total)::BIGINT AS share_pm,
                first_day, last_day
         FROM g, t""",
    "q297_split_parity" ->
      """WITH d AS (
           SELECT doc_id, lang,
                  CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) <= 'b'
                       THEN 'train'
                       WHEN substring(md5(doc_id::VARCHAR), 1, 1) IN ('c', 'd')
                       THEN 'val' ELSE 'test' END AS split
           FROM documents),
         cell AS (SELECT split, lang, count(*)::BIGINT AS n_sl
                  FROM d GROUP BY 1, 2),
         bs AS (SELECT split, sum(n_sl)::BIGINT AS n_s FROM cell GROUP BY 1),
         bl AS (SELECT lang, sum(n_sl)::BIGINT AS n_l FROM cell GROUP BY 1),
         t AS (SELECT sum(n_sl)::BIGINT AS n FROM cell)
         SELECT cell.split, cell.lang, cell.n_sl, bs.n_s, bl.n_l,
                abs(cell.n_sl::HUGEINT * t.n - bl.n_l::HUGEINT * bs.n_s) * 50
                  > bs.n_s::HUGEINT * t.n AS skewed
         FROM cell JOIN bs USING (split) JOIN bl USING (lang), t""",
    "q282_source_purity" ->
      """WITH bl AS (
           SELECT source, lang, count(*)::BIGINT AS n
           FROM documents GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY source
                 ORDER BY n DESC, lang) AS rk
               FROM bl),
         agg AS (
           SELECT source, sum(n)::BIGINT AS n_docs,
                  count(*)::BIGINT AS n_langs,
                  sum(n * n)::BIGINT AS sum_sq,
                  min(CASE WHEN rk = 1 THEN lang END) AS majority_lang
           FROM r GROUP BY 1)
         SELECT source, n_docs, n_langs,
                ((sum_sq * 1000) // (n_docs * n_docs))::BIGINT AS purity_pm,
                majority_lang
         FROM agg""",
    "q256_temperature_mix" ->
      """WITH st AS (
           SELECT source, count(*)::BIGINT AS n_src,
                  least(count(*), floor(sqrt(count(*)))::BIGINT * 16)::BIGINT AS tgt
           FROM documents GROUP BY 1)
         SELECT d.doc_id, d.source, st.n_src, st.tgt
         FROM documents d JOIN st USING (source)
         WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 5))::BIGINT * st.n_src
               < st.tgt * 1048576""",
    "q240_release_pipeline" ->
      """WITH f AS (
           SELECT * FROM documents
           WHERE len(string_split(text, ' ')) >= 30 AND lang = 'en'),
         k AS (
           SELECT md5(text) AS fp, min(doc_id) AS doc_id,
                  count(*) AS n_copies
           FROM f GROUP BY 1),
         e AS (
           SELECT k.doc_id, k.n_copies, d.source,
                  len(string_split(d.text, ' '))::BIGINT AS nt
           FROM k JOIN documents d USING (doc_id))
         SELECT source, count(*)::BIGINT AS n_docs,
                sum(nt)::BIGINT AS n_tokens,
                sum(n_copies - 1)::BIGINT AS dups_removed
         FROM e GROUP BY 1""",
    "q239_recency_sample" ->
      """WITH m AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
         b AS (
           SELECT event_id,
                  date_diff('day', CAST(ts AS DATE), mx)::BIGINT AS age_d
           FROM events, m)
         SELECT event_id, age_d
         FROM b
         WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 6))::BIGINT
               < (CASE WHEN age_d // 7 >= 24 THEN 0
                       ELSE 16777216 >> (age_d // 7) END)""",
    "q232_next_event_pairs" ->
      """WITH x AS (
           SELECT user_id, event_id, ts, event_type,
                  lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev_ts
           FROM events),
         f AS (
           SELECT *, CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL '30 minutes'
                          THEN 1 ELSE 0 END AS new_s
           FROM x),
         t AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM f),
         l AS (
           SELECT user_id, event_id, event_type,
                  lag(event_type, 1) OVER w AS prev1,
                  lag(event_type, 2) OVER w AS prev2
           FROM t
           WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
         SELECT user_id, event_id,
                coalesce(prev2, '^') || '>' || prev1 AS context,
                event_type AS label
         FROM l WHERE prev1 IS NOT NULL""",
    "q230_group_split" ->
      """WITH e AS (
           SELECT user_id,
                  CASE WHEN substr(md5('usr' || user_id::VARCHAR), 1, 1) <= 'b'
                         THEN 'train'
                       WHEN substr(md5('usr' || user_id::VARCHAR), 1, 1)
                         IN ('c', 'd') THEN 'val'
                       ELSE 'test' END AS split
           FROM events)
         SELECT split, count(DISTINCT user_id)::BIGINT AS n_users,
                count(*)::BIGINT AS n_events, 0::BIGINT AS leak_users
         FROM e GROUP BY 1""",
    "q216_quota_sample" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS ci
                    FROM documents GROUP BY 1),
         t AS (SELECT sum(ci) AS ct FROM c),
         a0 AS (SELECT source, ci, (100 * ci) // ct AS base,
                       (100 * ci) % ct AS rem
                FROM c, t),
         r AS (SELECT 100 - sum(base) AS extra FROM a0),
         alloc AS (
           SELECT source,
                  base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                                   <= extra THEN 1 ELSE 0 END AS n_i
           FROM a0, r),
         ranked AS (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5('qs' || doc_id::VARCHAR), doc_id) AS rk
           FROM documents)
         SELECT d.source, d.doc_id
         FROM ranked d JOIN alloc a USING (source)
         WHERE d.rk <= a.n_i""",
    "q201_curriculum" ->
      """SELECT doc_id, (n_chars // 200)::BIGINT AS band,
                row_number() OVER (ORDER BY n_chars // 200,
                  md5('cur' || doc_id::VARCHAR), doc_id) AS rank
         FROM documents""",
    "q176_kv_pushdown" ->
      """SELECT source, count(*) AS n_docs
         FROM documents WHERE source = 'src3' GROUP BY 1""",
    "q170_epoch_upsample" ->
      """WITH c AS (
           SELECT doc_id, source,
                  (CASE substring(source, 4, 16)::INT % 4
                     WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 2 END)
                  + (CASE WHEN substring(md5('ep' || doc_id::VARCHAR), 1, 2) < '80'
                          THEN 1 ELSE 0 END) AS n_copies
           FROM documents)
         SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy_idx
         FROM c WHERE n_copies >= 1""",
    "q165_token_budget" ->
      """SELECT doc_id, source, n_tokens, cum_tokens FROM (
           SELECT doc_id, source,
                  len(string_split(text, ' '))::BIGINT AS n_tokens,
                  sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY source
                          ORDER BY md5(doc_id::VARCHAR), doc_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
           FROM documents)
         WHERE cum_tokens <= 1000""",
    "q156_length_batching" ->
      """SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                (len(string_split(text, ' ')) // 16)::BIGINT AS bucket,
                ((row_number() OVER (
                    PARTITION BY len(string_split(text, ' ')) // 16
                    ORDER BY doc_id) - 1) // 8)::BIGINT AS batch_in_bucket
         FROM documents""",
    "q151_negative_sampling" ->
      """WITH sp AS (
           SELECT doc_id, source, substring(md5(doc_id::VARCHAR), 1, 1) AS s
           FROM documents),
         anchors AS (
           SELECT doc_id AS anchor_id, source AS a_src FROM sp WHERE s > 'd'),
         pool AS (
           SELECT doc_id AS cand_id, source AS c_src FROM (
             SELECT doc_id, source,
                    row_number() OVER (
                      ORDER BY md5('pool:' || doc_id::VARCHAR), doc_id) AS prk
             FROM sp WHERE s <= 'b')
           WHERE prk <= 32),
         j AS (
           SELECT anchor_id, cand_id,
                  md5(anchor_id::VARCHAR || ':' || cand_id::VARCHAR) AS h
           FROM anchors JOIN pool ON a_src <> c_src)
         SELECT anchor_id, cand_id AS neg_id, rk FROM (
           SELECT anchor_id, cand_id,
                  row_number() OVER (
                    PARTITION BY anchor_id ORDER BY h, cand_id)::BIGINT AS rk
           FROM j)
         WHERE rk <= 3""",
    "q106_sequence_pack" ->
      """WITH d AS (
           SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n
           FROM documents WHERE len(string_split(text, ' ')) > 0),
         o AS (
           SELECT doc_id, n,
                  (sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n)::BIGINT AS start
           FROM d),
         x AS (
           SELECT doc_id, n, start,
                  unnest(range(start // 2048, (start + n - 1) // 2048 + 1)) AS seq_id
           FROM o)
         SELECT seq_id, doc_id,
                least((seq_id + 1) * 2048, start + n)
                  - greatest(seq_id * 2048, start) AS n_tokens_in_seq
         FROM x""",
    "q72_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         e AS (SELECT doc_id, toks,
                      unnest(range(0, greatest(len(toks), 1), 40)) AS s
               FROM t)
         SELECT doc_id, (s // 40)::BIGINT AS chunk_idx,
                array_to_string(toks[s+1 : s+50], ' ') AS chunk_text
         FROM e""",
    "q73_split_assign" ->
      """SELECT doc_id,
                CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) <= 'b' THEN 'train'
                     WHEN substring(md5(doc_id::VARCHAR), 1, 1) IN ('c', 'd') THEN 'val'
                     ELSE 'test' END AS split
         FROM documents""",
    "q74_mix_weighted" ->
      """WITH t AS (
           SELECT doc_id, source,
                  substring(source, 4)::INT % 4 AS w,
                  substring(md5('mix' || doc_id::VARCHAR), 1, 2) AS bucket
           FROM documents)
         SELECT doc_id, source FROM t
         WHERE w = 3 OR (w = 0 AND bucket < '40')
            OR (w = 1 AND bucket < '80') OR (w = 2 AND bucket < 'c0')""",
    "q75_shuffle_shard" ->
      """SELECT doc_id, substring(md5(doc_id::VARCHAR), 1, 2) AS shard,
                row_number() OVER (
                  PARTITION BY substring(md5(doc_id::VARCHAR), 1, 2)
                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS rank_in_shard
         FROM documents""",
    "q76_pii_redact" ->
      """WITH p AS (
           SELECT doc_id,
                  text || ' contact user' || doc_id::VARCHAR ||
                  '@example.com or call 555-0' ||
                  lpad((doc_id % 1000)::VARCHAR, 3, '0') AS planted
           FROM documents)
         SELECT doc_id,
                regexp_replace(
                  regexp_replace(planted,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                  '\b555-\d{4}\b', '[PHONE]', 'g') AS redacted,
                len(regexp_extract_all(planted,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
                len(regexp_extract_all(planted, '\b555-\d{4}\b'))::BIGINT AS n_phones
         FROM p""",
    "q77_jsonl_source" ->
      """SELECT doc_id, source,
                len(string_split(text, ' '))::BIGINT AS n_tokens
         FROM documents""",
    "q80_kv_serving" ->
      """SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
         FROM documents GROUP BY 1""",
    // 8 greedy rounds replayed as MATERIALIZED CTEs (generated — each
    // round is the same block over the previous round's state)
    "q414_coverage_select" -> {
      val head =
        """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents WHERE len(string_split(text, ' ')) >= 2),
           tok AS MATERIALIZED (
             SELECT doc_id,
                    unnest(list_distinct(
                      [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]))
                      AS tk
             FROM ws),
           p1 AS MATERIALIZED (
             SELECT doc_id, count(*)::BIGINT AS g FROM tok
             GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
           s1 AS MATERIALIZED (SELECT doc_id, 1::BIGINT AS rank, g FROM p1)"""
      val steps = (2 to 8).map { r =>
        s""",
           c${r - 1} AS MATERIALIZED (
             SELECT DISTINCT tk FROM tok
             WHERE doc_id IN (SELECT doc_id FROM s${r - 1})),
           p$r AS MATERIALIZED (
             SELECT t.doc_id, count(*)::BIGINT AS g FROM tok t
             WHERE t.doc_id NOT IN (SELECT doc_id FROM s${r - 1})
               AND t.tk NOT IN (SELECT tk FROM c${r - 1})
             GROUP BY 1 ORDER BY g DESC, t.doc_id LIMIT 1),
           s$r AS MATERIALIZED (
             SELECT * FROM s${r - 1}
             UNION ALL SELECT doc_id, $r::BIGINT, g FROM p$r)"""
      }.mkString
      head + steps + """
           SELECT a.rank, a.doc_id, a.g AS gain,
                  (SELECT sum(b.g) FROM s8 b
                   WHERE b.rank <= a.rank)::BIGINT AS covered_total
           FROM s8 a"""
    }
  )
}
