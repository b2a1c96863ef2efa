package graft.queries

import graft.Tables
import graft.operators.{BloomFilterOp, DistributedQuantile, HeavyHitters, ZOrder}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators whose POINT is the scale shape: sketch-accelerated
  * joins and frequency mining, distributed exact quantiles,
  * sliding-range distinct counts, compliance purges, and
  * interval-overlap joins. Each query is the small-data-correct,
  * 100 TB-shaped formulation (bounded candidate sets, map-side
  * pre-filters, broadcast-sized summaries — never a single-reducer
  * aggregate or a driver-side loop over data).
  */
object ScaleOps {

  /** Sessions as intervals [s_start, s_end] (epoch µs) per user at a
    * 30-minute inactivity gap — the interval form of q51's
    * sessionization, built on the SAME Sessionize.withSessionIds
    * assignment so the contracts can never drift apart.
    */
  private def sessionIntervals(ev: DataFrame): DataFrame =
    graft.streaming.Sessionize.withSessionIds(ev, gapMinutes = 30)
      .groupBy(col("user_id"), col("session_id").as("sid"))
      .agg(min(unix_micros(col("ts"))).as("s_start"),
        max(unix_micros(col("ts"))).as("s_end"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-filter pre-filtered join (the runtime-filter pattern):
    // build a 128 KiB bloom over the selective dimension subset
    // (high-value orders, ~4 %), probe the fact MAP-SIDE before any
    // exchange, then run the exact join — false positives from the
    // bloom are dropped by the join, so the result is exactly the
    // plain join's (and is oracled as such). At 100 TB the fact
    // rows that reach the join shuffle drop ~25×.
    "q116_bloom_join" -> ((s, d) => {
      val t = Tables(s, d)
      val dims = t.orders.filter(col("o_totalprice") >= 480000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val filtered = BloomFilterOp.prefilter(
        t.lineitem, col("l_orderkey"), dims, col("o_orderkey"))
      filtered.join(dims, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
    }),

    // Misra-Gries heavy hitters with exact verify: per-partition
    // bounded summaries generate <= (k-1)*P candidate keys (vs a
    // full groupBy shuffling every distinct key), an exact keyed
    // recount decides membership with integer compares. Output is
    // EXACT (sketch-then-verify), so it hash-oracles against plain
    // GROUP BY ... HAVING.
    "q117_heavy_hitters" -> ((s, d) =>
      HeavyHitters.frequentKeys(
        Tables(s, d).events, col("user_id"), k = 200)
        .withColumnRenamed("key", "user_id")),

    // Trailing-7-day distinct users per day. Scale shape: collapse
    // to (user, day) DISTINCT first (the only big shuffle), then
    // each row fans out to the <= 7 window-end days it serves —
    // linear expansion, no self-join of the fact against itself.
    "q118_trailing_distinct" -> ((s, d) => {
      val ud = Tables(s, d).events
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = ud.select(col("day")).distinct()
        .withColumnRenamed("day", "day_w")
      ud.select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("day_w"), col("user_id"))
        .join(broadcast(days), Seq("day_w"), "left_semi")
        .groupBy(col("day_w"))
        .agg(countDistinct(col("user_id")).as("u7"))
        .select(date_format(col("day_w"), "yyyy-MM-dd").as("day"), col("u7"))
    }),

    // Right-to-be-forgotten purge with audit: an erasure-request
    // list (modeled as a deterministic subset of users) is
    // broadcast-anti-joined out of every table that carries the
    // key; the gate row is the audit (per-table before/purged/
    // after counts) a compliance pipeline must emit. The purged
    // frames themselves are pinned in ScaleOpsSpec (zero tombstone
    // rows survive).
    "q120_rtbf_purge" -> ((s, d) => {
      val t = Tables(s, d)
      val tomb = rtbfTombstones(t.events)
      rtbfAudit("events", t.events, col("user_id"), tomb)
        .unionByName(rtbfAudit("orders", t.orders, col("o_custkey"), tomb))
    }),

    // IQR outlier detection on inter-event gaps, with the quantiles
    // computed by DISTRIBUTED exact selection (DistributedQuantile:
    // range exchange + two-phase prefix-sum indexing) instead of
    // Spark's one-reducer `percentile` buffer. Bounds land on exact
    // binary fractions, so the verdict hash-matches quantile_cont.
    "q121_gap_outliers" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = Tables(s, d).events
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("tsu"))
        .withColumn("gap_us", col("tsu") - lag(col("tsu"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .select(col("event_id"), col("user_id"), col("gap_us"))
      val q = DistributedQuantile.exactQuantiles(
        gaps, col("gap_us"), col("event_id"),
        Seq("q1" -> 0.25, "q3" -> 0.75))
      gaps.crossJoin(broadcast(q)) // 1-row bounds frame
        .filter(col("gap_us") < col("q1") - (col("q3") - col("q1")) * 1.5 ||
          col("gap_us") > col("q3") + (col("q3") - col("q1")) * 1.5)
        .select(col("event_id"), col("user_id"), col("gap_us"))
    }),

    // Z-order zone-map build: Morton-encode (l_partkey, l_suppkey),
    // coarsen the curve into zones, and emit per-zone min/max stats
    // on BOTH dimensions — the data-skipping index a
    // multi-dimensional OPTIMIZE ZORDER layout exists to produce.
    // Pure integral bit math (builtin expressions, codegen), and the
    // DuckDB oracle replays the identical mask cascade bit for bit.
    // The locality claim (z-zones bound both columns tighter than
    // scan-order zones) is pinned quantitatively in ScaleOpsSpec.
    "q125_zorder_zonemap" -> ((s, d) =>
      Tables(s, d).lineitem
        .select(col("l_partkey"), col("l_suppkey"),
          ZOrder.morton16(col("l_partkey"), col("l_suppkey")).as("z"))
        .withColumn("zone", expr("z div 65536"))
        .groupBy("zone")
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))),

    // Equi-depth histogram on octile boundaries. Octiles (p = k/8)
    // land on exact binary fractions, so the interpolated boundaries
    // are bitwise engine-independent (any interpolation formula is
    // exact there — the reason this uses 8 buckets, not 10). The
    // boundaries come from DistributedQuantile: no one-reducer
    // percentile buffer; bucket assignment is a map-side compare
    // chain against the broadcast 1-row boundary frame.
    "q126_equidepth_hist" -> ((s, d) => {
      val v = Tables(s, d).events.select(
        round(col("value") * 100).cast("long").as("c"), col("event_id"))
      val qs = DistributedQuantile.exactQuantiles(
        v, col("c"), col("event_id"),
        (1 to 7).map(i => (s"b$i", i / 8.0)))
      v.crossJoin(broadcast(qs))
        .withColumn("bucket",
          (1 to 7).map(i => when(col("c") > col(s"b$i"), 1L).otherwise(0L))
            .reduce(_ + _))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    }),

    // Banded theta join (|a.value − b.value| ≤ δ): bucketize by
    // ⌊cents/δ⌋, fan each left row out to its 3 candidate buckets
    // (each qualifying pair matches in EXACTLY one bucket — the
    // right side keeps its single home bucket), then the exact
    // band filter. Turns an O(n²) inequality join into an equi-join
    // whose candidate count is data-density-bounded. Exact integer
    // cents both sides.
    //
    // OUTPUT-CARDINALITY BOUND: the result set itself is quadratic in
    // per-bucket value density — 5.48 M pairs at sf0.1 (~1.5 M
    // events over ~10k distinct cents values). That cost is inherent
    // to the query's SEMANTICS (every qualifying pair is emitted),
    // not to the plan: the plan's candidate work is within 3× of the
    // output size. A consumer that only needs per-row band STATS
    // should aggregate per bucket instead (q208's frame / q238's
    // banded shapes) rather than materialize pairs.
    "q127_band_join" -> ((s, d) => {
      val delta = 5L
      // single-file events arrive as ONE scan partition; the 3-way
      // bucket explode + join-side shuffle write would run serial
      // without the fan-out (r18 job census: 3 tasks for the whole
      // query). No-op on real multi-partition inputs.
      val ev = TextOps.parallelized(Tables(s, d).events
        .select(col("event_id"), round(col("value") * 100).cast("long").as("c")))
      val a = ev.select(col("event_id").as("a_id"), col("c").as("ca"))
        .withColumn("bk0", expr(s"ca div $delta"))
        .select(col("a_id"), col("ca"),
          explode(array(col("bk0") - 1, col("bk0"), col("bk0") + 1)).as("bk"))
      val b = ev.select(col("event_id").as("b_id"), col("c").as("cb"))
        .withColumn("bk", expr(s"cb div $delta"))
      a.join(b, "bk")
        .filter(abs(col("ca") - col("cb")) <= delta &&
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("ca"), col("cb"),
          abs(col("ca") - col("cb")).as("diff"))
    }),

    // Iterative graph computation beyond connected components:
    // PageRank over the token-transition (bigram) graph, in SCALED
    // INTEGER fixed-point so every iteration is exact long
    // arithmetic — floor divisions instead of float damping — and
    // ten unrolled DuckDB CTE iterations reproduce it bit for bit.
    // The Spark loop is the distributed shape (edges ⋈ ranks per
    // iteration, ranks checkpointed to truncate lineage); overflow
    // bound: r ≤ V·SCALE ≈ 2^45 and r·85·c stays < 2^62 for edge
    // counts up to ~3·10⁵. Published algorithm: Page et al. 1999.
    "q129_pagerank_tokens" -> ((s, d) => {
      val scale = 1000000000L
      val base = scale * 15L / 100L
      val toks = split(col("text"), " ")
      // fan out the single-partition parquet before the interpreted
      // transform/explode tokenize pass (CLAUDE.md guard)
      val docs = TextOps.parallelized(Tables(s, d).documents)
      val occ = docs.filter(size(toks) >= 2)
        .select(explode(transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val edges0 = occ.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val outs = edges0.groupBy("w1").agg(sum(col("c")).as("out"))
      val edges = edges0.join(outs, "w1").localCheckpoint()
      val nodes = docs.select(explode(toks).as("tok")).distinct()
        .localCheckpoint()
      var ranks = nodes.withColumn("r", lit(scale))
      for (_ <- 1 to 10) {
        val contrib = edges
          .join(ranks, edges("w1") === ranks("tok"))
          .select(col("w2").as("tok"),
            expr(s"(r * 85 * c) div (100 * out)").as("m"))
          .groupBy("tok").agg(sum(col("m")).as("in_mass"))
        ranks = nodes.join(contrib, Seq("tok"), "left")
          .select(col("tok"),
            (lit(base) + coalesce(col("in_mass"), lit(0L))).as("r"))
          .localCheckpoint() // truncate the 10-join lineage chain
      }
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("r").desc, col("tok"))
      ranks.select(col("tok"), col("r"),
        row_number().over(wRank).cast("long").as("rnk"))
    }),

    // Grouped weighted median — exact, via per-group cumulative
    // weight windows (groups run in parallel; nothing funnels to one
    // reducer): smallest value whose cumulative weight reaches half
    // the group total. Weights and values are exact integers.
    "q130_weighted_median" -> ((s, d) => {
      val ev = Tables(s, d).events.select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"),
        coalesce(length(col("props")), lit(0)).cast("long").as("w"),
        col("event_id"))
      val wCum = Window.partitionBy(col("event_type"))
        .orderBy(col("c"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = ev.groupBy("event_type").agg(sum(col("w")).as("total_w"))
      ev.withColumn("cum", sum(col("w")).over(wCum))
        .join(broadcast(tot), "event_type")
        .filter(col("cum") * 2 >= col("total_w"))
        .groupBy(col("event_type"))
        .agg(min(col("c")).as("wmedian_cents"),
          min(col("total_w")).as("total_w"))
    }),

    // Interval-overlap join: user sessions (intervals from the q51
    // sessionization) x a small maintenance-window calendar.
    // Overlap predicate is strict half-open (zero-length touches
    // excluded); the calendar side is broadcast, so the plan is a
    // BroadcastNestedLoopJoin over intervals — the right plan when
    // one side is calendar-sized. Overlap is emitted in exact
    // integer microseconds.
    "q123_interval_overlap" -> ((s, d) => {
      val sess = sessionIntervals(Tables(s, d).events)
      val win = maintenanceWindows(s)
      sess.join(broadcast(win),
          col("s_start") < col("w_end") && col("w_start") < col("s_end"))
        .select(col("user_id"), col("sid"), col("window_id"),
          (least(col("s_end"), col("w_end")) -
            greatest(col("s_start"), col("w_start"))).as("overlap_us"))
    }),

    // Mergeable HLL sketches (Apache DataSketches, built into Spark
    // 4): per-event-type user sketches PLUS their union re-estimated
    // — the sketch algebra that makes 100 TB distinct counts cheap:
    // partials merge associatively across partitions/days/segments,
    // so a year of daily sketches answers "distinct users any time
    // range" without re-touching raw data. Estimates are
    // deterministic for a fixed input multiset but engine-specific
    // — rows-only gate; ScaleOpsSpec pins the ±5% envelope vs exact
    // and union-consistency (union-of-sketches == sketch-of-union).
    "q168_hll_sketch" -> ((s, d) => {
      val perType = Tables(s, d).events
        .groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("exact"))
      val union = perType.agg(
        lit("ALL").as("event_type"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
        lit(null).cast("long").as("exact"))
      perType
        .select(col("event_type"),
          hll_sketch_estimate(col("sk")).as("est"), col("exact"))
        .unionByName(union)
    }),

    // Count-min sketch point-frequency estimates: the sketch is ONE
    // distributed aggregate (fixed seed → deterministic), the probe
    // set is the exact top-10 users, and the output carries exact
    // next to estimate so the CMS guarantee (est >= exact, bounded
    // overshoot) is visible in the row. At 100 TB the sketch is the
    // only full-scan pass; probing is O(keys probed) driver work —
    // the same "aggregate once, serve point lookups" lifecycle a
    // real frequency service runs. Rows-only gate (CMS estimates
    // aren't SQL-expressible); ScaleOpsSpec pins the envelope.
    "q169_cms_freq" -> ((s, d) => {
      import org.apache.spark.util.sketch.CountMinSketch
      val ev = Tables(s, d).events
      val skBytes = ev.select(
        count_min_sketch(col("user_id"), lit(0.0001), lit(0.99), lit(42))
          .as("sk")).head().getAs[Array[Byte]](0)
      val cms = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val top = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("user_id")).limit(10).collect()
      import s.implicits._
      top.map(r => (r.getLong(0), r.getLong(1),
          cms.estimateCount(r.getLong(0))))
        .toSeq.toDF("user_id", "exact", "cms_est")
    }),

    // Distributed global ORDER BY rank — the two-phase shape that
    // replaces the one-reducer window: range-repartition on the sort
    // key, rank WITHIN each range partition (parallel windows), then
    // add broadcast per-partition prefix offsets. Output is the
    // exact global row_number at any scale; the only full-order
    // structure is the 32-entry offset table. The checkpoint pins
    // one partition assignment across the offset-count action and
    // the final pass.
    "q171_global_rank" -> ((s, d) => {
      val parts = Tables(s, d).events
        .select(col("event_id"), col("value"))
        .repartitionByRange(32, col("value"), col("event_id"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val counts = parts.groupBy(col("pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets: Map[Int, Long] = {
        val sorted = counts.toSeq.sortBy(_._1)
        sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
      }
      val w = Window.partitionBy(col("pid"))
        .orderBy(col("value"), col("event_id"))
      parts
        .withColumn("rank",
          row_number().over(w).cast("long") +
            element_at(typedLit(offsets), col("pid")))
        .select(col("event_id"), col("value"), col("rank"))
    }),

    // Mergeable approximate quantiles (Greenwald–Khanna style
    // percentile_approx): per-type p50/p90/p99 from a bounded-size
    // summary that merges associatively across partitions — the
    // sketch twin of the exact DistributedQuantile (q121). At 100 TB
    // the exact path costs a range exchange; the sketch path is one
    // hash aggregate whose state is O(accuracy), the right tool when
    // ±rank-ε is acceptable. Estimates are real data values but the
    // picked rank is engine-specific — rows-only gate; ScaleOpsSpec
    // pins the rank-error envelope against exact quantiles.
    "q175_approx_quantile" -> ((s, d) => {
      Tables(s, d).events
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
        .select(col("event_type"),
          col("qs").getItem(0).as("p50"),
          col("qs").getItem(1).as("p90"),
          col("qs").getItem(2).as("p99"))
    }),

    // Bitmap-index exact distinct (Spark 4 bitmap functions): each
    // (type, 32768-id bucket) folds its users into a fixed-size bit
    // vector via bitmap_construct_agg — associative, mergeable,
    // byte-bounded state (4 KiB/bucket regardless of row count),
    // then distinct = sum of popcounts. The RoaringBitmap-style
    // shape: at 100 TB the shuffle carries |types|x|id-space/32768|
    // bitmaps, not one row per (type, user) pair like count
    // (DISTINCT)'s expand — and unlike HLL (q168) the answer is
    // EXACT, so it hash-oracles against count(DISTINCT).
    "q186_bitmap_distinct" -> ((s, d) => {
      Tables(s, d).events
        .select(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy(col("event_type"), col("bkt"))
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .groupBy(col("event_type"))
        .agg(sum(expr("bitmap_count(bm)")).as("distinct_users"))
    }),

    // Day-over-day audience overlap WITHOUT a fact self-join:
    // per-day user bitmaps (one distinct pass), pairs of adjacent
    // days OR-merged per bucket (bitmap_or_agg), and the exact
    // intersection recovered by inclusion-exclusion
    // |A∩B| = |A|+|B|-|A∪B|. The classic retention self-join
    // shuffles O(events) twice; this shuffles O(days x buckets)
    // fixed-size bitmaps once — and stays exact (hash-oracled
    // against the literal distinct-intersection join).
    "q187_bitmap_overlap" -> ((s, d) => {
      val bm = Tables(s, d).events
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        .select(col("day"),
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy(col("day"), col("bkt"))
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      val totals = bm.groupBy(col("day"))
        .agg(sum(expr("bitmap_count(bm)")).as("u"))
      val unions = bm.select(col("day").as("pair_day"), col("bkt"), col("bm"))
        .unionByName(bm.select(date_sub(col("day"), 1).as("pair_day"),
          col("bkt"), col("bm")))
        .groupBy(col("pair_day"), col("bkt"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy(col("pair_day"))
        .agg(sum(expr("bitmap_count(bm)")).as("u_union"))
      unions
        .join(totals.select(col("day").as("pair_day"), col("u").as("users_day")),
          Seq("pair_day"))
        .join(totals.select(date_sub(col("day"), 1).as("pair_day"),
          col("u").as("users_next")), Seq("pair_day"))
        .select(date_format(col("pair_day"), "yyyy-MM-dd").as("day"),
          col("users_day"), col("users_next"),
          (col("users_day") + col("users_next") - col("u_union"))
            .as("common_users"))
    }),

    // Theta-sketch set algebra (DataSketches): per-type user
    // sketches, then pairwise INTERSECTION and UNION estimates —
    // the set operations HLL (q168) structurally cannot answer.
    // Sketch state is bounded (default lgK=12 → ≤4096 retained
    // hashes) and associative across partitions; below that
    // retention the sketch runs in exact mode, so at gate scales
    // the estimates ARE the true counts and the query hash-oracles
    // against the literal distinct-intersection SQL. At 100 TB the
    // same plan degrades gracefully to ±ε estimates — accepting
    // that trade (vs q187's exact bitmaps over a dense id space)
    // is the operator's point.
    "q191_theta_overlap" -> ((s, d) => {
      val sk = Tables(s, d).events.groupBy(col("event_type"))
        .agg(expr("theta_sketch_agg(user_id)").as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          expr("theta_sketch_estimate(theta_intersection(ska, skb))")
            .as("common_users"),
          expr("theta_sketch_estimate(theta_union(ska, skb))")
            .as("union_users"))
    }),

    // approx_top_k (frequent-items sketch): "top tokens" from ONE
    // mergeable bounded-state aggregate — no full token-universe
    // groupBy shuffle, the serving-layer shape for frequency
    // dashboards over unbounded vocabularies. Estimates are exact
    // while the universe fits the sketch capacity (true at every
    // gate sf) but the CONTRACT is approximate → rows-only gate;
    // ScaleOpsSpec A/Bs item counts against the exact aggregate.
    // Fan-out is the shared single-file guard (session parallelism),
    // never a hardcoded task count — the sketch partials are
    // mergeable, so more partitions = more map-side parallelism at
    // zero exchange cost beyond the final 1-group merge.
    "q192_approx_topk" -> ((s, d) => {
      TextOps.parallelized(Tables(s, d).documents)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(expr("approx_top_k(tok, 10)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("token"),
          col("e.count").cast("long").as("cnt_est"))
    }),

    // The OPTIMIZER-EXTENSION path to q186's bitmap shape: the query
    // below is written as a plain count(DISTINCT) — the
    // BitmapDistinctRewrite Rule[LogicalPlan] (scoped session,
    // spark.graft.rewrite.bitmapDistinct=true) rewrites it into the
    // two-phase bitmap aggregate automatically. A require() proves
    // the rewrite actually engaged, so this gate can never silently
    // degenerate into q19's plan; the oracle proves the rewritten
    // plan computes exactly count(DISTINCT).
    "q206_bitmap_rewrite" -> ((s, d) => {
      val scoped = s.newSession()
      scoped.experimental.extraOptimizations =
        Seq(graft.plans.BitmapDistinctRewrite)
      scoped.conf.set(graft.plans.BitmapDistinctRewrite.FLAG, "true")
      scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      scoped.conf.set("spark.sql.shuffle.partitions", "32")
      val df = Tables(scoped, d).events
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("distinct_users"))
      require(df.queryExecution.optimizedPlan.toString
          .contains("bitmap_construct_agg"),
        "bitmap rewrite did not engage — q206 would just re-run q19's plan")
      df
    }),

    // Native top-k AGGREGATE (graft.functions.expressions.TopKAgg, a
    // TypedImperativeAggregate): per-type top-10 values carried as a
    // bounded k-element min-heap through the ordinary two-phase hash
    // aggregate — map-side partial heaps, reduce-side heap merge, at
    // most k longs per (group, partition) in the exchange. The
    // window form shuffles and sorts the whole fact to rank it; this
    // shuffles 10 longs per group. Output is the top-k multiset in
    // descending order → partitioning-independent → hash-oracled.
    "q213_topk_agg" -> ((s, d) => {
      graft.GraftFunctions.register(s)
      Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"))
        .agg(expr("topk_agg(cents, 10)").as("tk"))
        .select(col("event_type"),
          posexplode(col("tk")).as(Seq("pos0", "cents")))
        .select(col("event_type"), (col("pos0") + 1).cast("long").as("pos"),
          col("cents"))
    }),

    // Winsorization at exact global percentiles: every value clipped
    // into [p05, p95] computed by DistributedQuantile (range
    // exchange + two-phase prefix sum — q121's machinery, so the
    // interpolated fences are bit-identical to DuckDB's
    // quantile_cont), then a broadcast clamp over the fact — one
    // narrow pass, the outlier-robust normalization step before any
    // float-sensitive training statistics.
    "q217_winsorize" -> ((s, d) => {
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val fences = graft.operators.DistributedQuantile.exactQuantiles(
        base, col("cents"), col("event_id"),
        Seq("p05" -> 0.05, "p95" -> 0.95))
      base.crossJoin(broadcast(fences))
        .select(col("event_id"),
          greatest(col("p05"),
            least(col("p95"), col("cents").cast("double"))).as("winsorized"))
    }),

    // Join-key skew profiler — the pre-flight diagnostic that decides
    // whether q89's salting is needed: per-key row counts, keys
    // exceeding 1.2× the mean flagged via the float-free cross-
    // multiplication n·n_keys·10 > n_rows·12, with the hotness ratio
    // emitted as an exact percent (n·n_keys·100 div n_rows). One
    // key aggregate + a 1-row broadcast; the profile output is
    // bounded by the number of HOT keys, never the key space.
    "q270_skew_profile" -> ((s, d) => {
      val cnt = Tables(s, d).events
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val tot = cnt.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
      cnt.crossJoin(broadcast(tot))
        .filter(col("n") * col("n_keys") * 10 > col("n_rows") * 12)
        .select(col("user_id"), col("n"), col("n_keys"), col("n_rows"),
          expr("(n * n_keys * 100) div n_rows").as("x_avg_pct"))
    }),

    // Rank (quantile) normalization — the outlier-immune third of
    // the feature-scaling family (q263 min-max, q217 winsorize):
    // each value mapped to its within-type permille rank
    // (rn·1000 div n) under the explicit (cents, event_id) total
    // order. event_type is 5 values, so a plain per-type window is a
    // 5-task sort of the whole corpus — the rank runs through
    // GroupedRank's two-phase range-partition shape instead (P
    // parallel sorts + broadcast offsets), and n per type is a
    // broadcast 5-row aggregate.
    "q295_rank_normalize" -> ((s, d) => {
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val totals = base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.operators.GroupedRank.withRank(base, Seq("event_type"),
          Seq(col("cents"), col("event_id")), "rn")
        .join(broadcast(totals), "event_type")
        .select(col("event_id"), col("event_type"),
          expr("(rn * 1000) div n").as("rank_pm"))
    }),

    // Global decile assignment — the equal-frequency band label every
    // feature store ships next to q295's permille rank: decile =
    // ((rn−1)·10) div n + 1 over the (cents, event_id) total order,
    // written as explicit integer arithmetic so both engines draw
    // identical band edges (never ntile, whose remainder policy is
    // engine-specific). The global rank is GroupedRank's two-phase
    // range exchange; n is a broadcast 1-row count.
    "q313_decile_assign" -> ((s, d) => {
      val base = Tables(s, d).events
        .select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val tot = base.agg(count(lit(1)).as("n"))
      graft.operators.GroupedRank.withGlobalRank(base,
          Seq(col("cents"), col("event_id")), "rn")
        .crossJoin(broadcast(tot))
        .select(col("event_id"), col("cents"),
          (expr("((rn - 1) * 10) div n") + 1L).as("decile"))
    }),

    // Join-cardinality preflight — q270 profiles one side's skew,
    // this predicts the OUTPUT of a self/equi join before running
    // it: per-key counts → Σ n(k)² total pairs plus the top-5
    // contributing keys. The estimate costs one aggregate over the
    // key column only; the top-N is a k-row TakeOrdered, never a
    // global sort. The guard that decides whether a q266-style
    // pair build is safe to launch.
    "q274_join_preflight" -> ((s, d) => {
      val cnt = Tables(s, d).lineitem
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .withColumn("pairs", col("n") * col("n"))
      val tot = cnt.agg(sum(col("pairs")).as("total_pairs"),
        count(lit(1)).as("n_keys"))
      cnt.orderBy(col("pairs").desc, col("l_partkey")).limit(5)
        .crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("n"), col("pairs"),
          col("total_pairs").cast("long").as("total_pairs"), col("n_keys"))
    }),

    // Equi-WIDTH histogram (q126 is equi-depth): per type, 16 fixed-
    // width bins over the broadcast [min, max] — bin index and both
    // edges derived by pure integer division so every engine draws
    // identical fences. The layout histogram that drives zone-map
    // and bin-packing decisions; one aggregate + a narrow bucketing
    // pass.
    "q275_histogram_equiwidth" -> ((s, d) => {
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val ext = base.groupBy(col("event_type"))
        .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      base.join(broadcast(ext), "event_type")
        .withColumn("bin", least(lit(15L),
          expr("((cents - mn) * 16) div (mx - mn + 1)")))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("mn")).as("mn"), min(col("mx")).as("mx"))
        .select(col("event_type"), col("bin"), col("n"),
          expr("mn + (bin * (mx - mn + 1)) div 16").as("lo_edge"),
          expr("mn + ((bin + 1) * (mx - mn + 1)) div 16 - 1").as("hi_edge"))
    }),

    // MAD robust outlier detection — the median-based twin of q194's
    // mean/σ z-test, immune to the very outliers it hunts: per type,
    // med = the DISCRETE median (value at rank (n+1) div 2 — a real
    // data point, rank formula written out so engine quantile
    // conventions never differ), mad = discrete median of |x − med|,
    // flag |x − med| > 3·mad. Everything integer cents; two window
    // passes + two broadcast-sized joins, partitioned by type.
    "q268_mad_outliers" -> ((s, d) => {
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      def discreteMedian(df: DataFrame, c: String, out: String): DataFrame = {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col(c), col("event_id"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("event_type"), col(c).as(out))
      }
      val med = discreteMedian(base, "cents", "med")
      val dev = base.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("cents") - col("med")))
      val mad = discreteMedian(dev, "adev", "mad")
      dev.join(broadcast(mad), "event_type")
        .filter(col("adev") > col("mad") * 3)
        .select(col("event_id"), col("event_type"), col("cents"),
          col("med"), col("mad"))
    }),

    // Min-max feature scaling onto a fixed integer grid — the other
    // half of feature prep next to q217's winsorize: per-type min/max
    // cents (one tiny aggregate, broadcast back) map every value to
    // ⌊(x−min)·10000 / (max−min)⌋ ∈ [0, 10000]. Integer division
    // keeps it float-free and engine-exact; a degenerate constant
    // feature (max = min) pins to 0 instead of dividing by zero.
    // Pure narrow map after the broadcast — no second shuffle.
    "q263_minmax_scale" -> ((s, d) => {
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val ext = base.groupBy(col("event_type"))
        .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      base.join(broadcast(ext), "event_type")
        .select(col("event_id"), col("event_type"),
          when(col("mx") === col("mn"), 0L)
            .otherwise(expr("((cents - mn) * 10000) div (mx - mn)"))
            .cast("long").as("scaled"))
    }),

    // DISCRETE per-group quantiles by explicit rank (q121/q175 are
    // the interpolated/approximate forms): the value AT position
    // ceil(p·n) of each type's sorted order — a real data point,
    // zero interpolation, and the rank formula is written out
    // identically in both engines (quantile_disc's off-by-one
    // conventions differ across engines, so neither side uses it).
    // One window pass per type partition; emitted values are exact
    // longs.
    "q218_quantile_disc" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cents"), col("event_id"))
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      base.filter(col("rn") === ceil(col("n") * 0.5) ||
          col("rn") === ceil(col("n") * 0.9))
        .select(col("event_type"),
          when(col("rn") === ceil(col("n") * 0.5), "p50")
            .otherwise("p90").as("p"),
          col("cents"))
    }),

    // Distribution-drift report (the PSI shape with exact
    // arithmetic): decile fences computed on the BASELINE window by
    // DistributedQuantile (bit-exact interpolation), both windows
    // bucketed by the broadcast fences (compare-chain, q126's
    // pattern), and each bucket's share shift tested WITHOUT
    // division: |nb·Na − na·Nb|·50 > Na·Nb ⟺ |Δshare| > 2%, in
    // DECIMAL(38,0) so the verdict is exact at any count. The
    // monitoring query a training-data pipeline runs before
    // accepting a new ingest window.
    "q229_drift_report" -> ((s, d) => {
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val wa = base.filter(col("ts") < cutoff)
      val wb = base.filter(col("ts") >= cutoff)
      val fences = graft.operators.DistributedQuantile.exactQuantiles(
        wa, col("cents"), col("event_id"),
        (1 to 9).map(i => (s"p$i", i / 10.0)))
      def bucketed(df: DataFrame): DataFrame = df
        .crossJoin(broadcast(fences))
        .withColumn("bucket",
          ((1 to 9).map(i =>
            when(col("cents").cast("double") > col(s"p$i"), 1).otherwise(0))
            .reduce(_ + _) + 1).cast("long"))
      val ca = bucketed(wa).groupBy("bucket").agg(count(lit(1)).as("na"))
      val cb = bucketed(wb).groupBy("bucket").agg(count(lit(1)).as("nb"))
      // FULL outer: a bucket populated only in the comparison window
      // (possible when baseline ties collapse decile fences) is
      // precisely a maximal-drift cell — a left join would silently
      // drop it from the report and from tot_b
      val joined = ca.join(cb, Seq("bucket"), "full")
        .select(col("bucket"), coalesce(col("na"), lit(0L)).as("na"),
          coalesce(col("nb"), lit(0L)).as("nb"))
      val totals = joined.agg(sum(col("na")).as("tot_a"),
        sum(col("nb")).as("tot_b"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      joined.crossJoin(broadcast(totals))
        .select(col("bucket"), col("na"), col("nb"),
          (abs(dec(col("nb")) * dec(col("tot_a")) -
            dec(col("na")) * dec(col("tot_b"))) * lit(50) >
            dec(col("tot_a")) * dec(col("tot_b"))).as("drifted"))
    }),

    // Zone-map CONSULT (q125 builds the index; this USES it): a
    // (partkey, suppkey) box query first prunes to the zones whose
    // per-dimension min/max intersect the box — a metadata-sized
    // decision — then scans and exact-filters only rows in surviving
    // zones. Skipping a non-overlapping zone cannot lose rows, so
    // the aggregate oracles as the plain box filter; a require()
    // proves pruning actually dropped zones (Z-ordering is what
    // makes the zones narrow on BOTH dims — the locality q125's
    // spec quantifies). At 100 TB the zone map is the manifest an
    // Iceberg/Delta reader consults before touching data files.
    "q238_zonemap_consult" -> ((s, d) => {
      // box chosen to be non-empty at every sf (key spaces scale
      // with sf: partkey 0..200·sf·1000, suppkey 0..10·sf·1000)
      val (pLo, pHi, sLo, sHi) = (10L, 120L, 1L, 6L)
      val pre = Tables(s, d).lineitem
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          ZOrder.morton16(col("l_partkey"), col("l_suppkey")).as("z"))
      // fixed zone COUNT (64), not fixed zone width: the morton key
      // space grows with the sf's key ranges, and a layout pins the
      // number of zones (files/manifest entries), not their span
      val zMax = pre.agg(max(col("z"))).collect()(0).getLong(0)
      val zoneSize = math.max(1L, zMax / 64 + 1)
      val rows = pre.withColumn("zone", expr(s"z div $zoneSize"))
      val zones = rows.groupBy("zone")
        .agg(min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
        .localCheckpoint()
      val hit = zones.filter(
        col("max_part") >= pLo && col("min_part") <= pHi &&
          col("max_supp") >= sLo && col("min_supp") <= sHi)
      val nZones = zones.count()
      val nHit = hit.count()
      require(nHit < nZones,
        s"zone map pruned nothing ($nHit/$nZones) — index degenerate")
      rows.join(broadcast(hit.select(col("zone"))), "zone")
        .filter(col("l_partkey").between(pLo, pHi) &&
          col("l_suppkey").between(sLo, sHi))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    }),

    // GROUPED exact interpolated quantiles — the family completer
    // (q121 global exact, q175 approx, q218 discrete): per-type
    // q25/q50/q75 by the same (n−1)·p+1 bracket interpolation
    // DistributedQuantile uses. The per-type rank goes through
    // GroupedRank's two-phase range exchange (never a 5-task window
    // over the raw corpus); n per type is a broadcast 5-row
    // aggregate; bracket rows are filtered before the final agg so
    // it touches ≤ 6 rows per type. Doubles interpolate identically
    // to quantile_cont — hash-exact.
    "q231_grouped_quantiles" -> ((s, d) => {
      val cents = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val totals = cents.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val base = graft.operators.GroupedRank.withRank(cents,
          Seq("event_type"), Seq(col("cents"), col("event_id")), "rn")
        .join(broadcast(totals), "event_type")
      val ps = Seq(("q25", 0.25), ("q50", 0.5), ("q75", 0.75))
      val bracket = ps.map { case (_, p) =>
        val pos = (col("n") - 1) * p + 1
        col("rn") === floor(pos) || col("rn") === ceil(pos)
      }.reduce(_ || _)
      val aggs = ps.map { case (nm, p) =>
        val pos = (col("n") - 1) * p + 1
        val frac = pos - floor(pos).cast("double")
        (sum(when(col("rn") === floor(pos),
          col("cents").cast("double") * (lit(1.0) - frac)).otherwise(0.0)) +
          sum(when(col("rn") === ceil(pos) && col("rn") =!= floor(pos),
            col("cents").cast("double") * frac).otherwise(0.0))).as(nm)
      }
      base.filter(bracket).groupBy(col("event_type"))
        .agg(aggs.head, aggs.tail: _*)
    }),

    // Balanced shard assignment via ntile: each source's docs dealt
    // into 4 near-equal shards in deterministic md5 order — the
    // fixed-count balanced split (q75's 256-way hash shards trade
    // balance for statelessness; ntile guarantees sizes differ by
    // ≤1). Partitioned by source so every window runs parallel —
    // never a global single-reducer ntile.
    "q219_ntile_shards" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("nt"), col("doc_id").cast("string"))),
          col("doc_id"))
      Tables(s, d).documents
        .select(col("source"), col("doc_id"),
          ntile(4).over(w).cast("long").as("shard"))
    }),

    // 2-D spatial distance join — the planar sibling of q127's 1-D
    // band join: customers get deterministic md5-planted coordinates
    // on a 100k×100k integer grid, and every pair within Euclidean
    // distance 3000 is found by GRID BUCKETING — one side replicated
    // to its 9 neighbor cells (broadcast 9-row offset spine), the
    // other keyed by home cell, so candidates form via a pure
    // (cx, cy) equi-join and the exact dx²+dy² ≤ r² filter runs
    // streaming inside it. Cell size = radius guarantees no misses;
    // candidate cost is density-bounded per cell, never n² — at
    // 100 TB the only shuffle is points keyed by cell. All integer
    // math; pair appears exactly once (a<b, replicated→home walk).
    "q416_spatial_join" -> ((s, d) =>
      spatialPairs(s, plantedPoints(s, d))),

    // Density clustering over the q416 grid join — DBSCAN with
    // eps = 3000, minPts = 2 IS "distance-threshold pairs →
    // connected components → drop singletons": the pair generation
    // stays the density-bounded grid equi-join, the CC labeling is
    // the shared min-label propagation (Dedup.duplicateClusters),
    // and noise points (no neighbor within eps) fall out with the
    // size-≥2 filter. Output: one row per cluster under its min-key
    // representative. The oracle rebuilds components with the
    // recursive-closure CTE over the brute-force pair list (the
    // q67/q78 discipline).
    "q417_spatial_clusters" -> ((s, d) => {
      val pts = plantedPoints(s, d)
      val pairs = spatialPairs(s, pts).select(col("a_key"), col("b_key"))
      graft.operators.Dedup.duplicateClusters(pairs, pts.select(col("k")))
        .filter(col("cluster_size") >= 2 &&
          col("doc_id") === col("cluster_id"))
        .select(col("cluster_id").as("cluster_rep"), col("cluster_size"))
    })
  )

  /** Deterministic md5-planted integer coordinates on a 100k×100k
    * grid (the q75/q183 planting discipline, reproducible in DuckDB
    * as `('0x' || substr(md5(k), …))::BIGINT`).
    */
  private def plantedPoints(s: SparkSession, d: String): DataFrame = {
    def coord(from: Int) = expr(
      s"CAST(conv(substr(md5(CAST(c_custkey AS STRING)), $from, 5), " +
        "16, 10) AS BIGINT) % 100000")
    Tables(s, d).customer
      .select(col("c_custkey").as("k"), coord(1).as("x"), coord(6).as("y"))
  }

  /** Exact pairs within Euclidean distance 3000 via 9-cell grid
    * bucketing (see the q416 scaladoc): (cx, cy) equi-join only,
    * integer dx²+dy² verify streamed inside, each pair exactly once.
    */
  private def spatialPairs(s: SparkSession, pts: DataFrame): DataFrame = {
    import s.implicits._
    val offs = Seq(-1, 0, 1).flatMap(i => Seq(-1, 0, 1).map(j => (i, j)))
      .toDF("ox", "oy")
    val a = pts.crossJoin(broadcast(offs))
      .select(col("k").as("a_key"), col("x").as("ax"), col("y").as("ay"),
        (expr("x div 3000") + col("ox")).as("cx"),
        (expr("y div 3000") + col("oy")).as("cy"))
    val b = pts.select(col("k").as("b_key"), col("x").as("bx"),
      col("y").as("by"),
      expr("x div 3000").as("cx"), expr("y div 3000").as("cy"))
    a.join(b, Seq("cx", "cy"))
      .filter(col("a_key") < col("b_key"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= lit(9000000L)) // 3000²
      .select(col("a_key"), col("b_key"), col("dist2"))
  }

  /** Erasure-request list: the distinct users whose id ≡ 3 (mod 7)
    * — a deterministic stand-in for an arbitrary GDPR request
    * batch. Broadcast-sized by nature (requests, not rows).
    */
  def rtbfTombstones(events: DataFrame): DataFrame =
    events.select(col("user_id").as("k")).distinct()
      .filter(pmod(col("k"), lit(7L)) === 3L)

  /** Purged copy of `df`: broadcast anti-join against the request
    * list on `key` — one map-side-filterable pass per table.
    */
  def rtbfPurge(df: DataFrame, key: Column, tomb: DataFrame): DataFrame =
    df.join(broadcast(tomb), key === col("k"), "left_anti")

  private def rtbfAudit(name: String, df: DataFrame, key: Column,
                        tomb: DataFrame): DataFrame =
    df.join(broadcast(tomb), key === col("k"), "left")
      .agg(count(lit(1)).as("rows_before"),
        sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("rows_purged"))
      .select(lit(name).as("table_name"), col("rows_before"),
        col("rows_purged"),
        (col("rows_before") - col("rows_purged")).as("rows_after"))

  /** Maintenance-window calendar (w4 lies past the data's range on
    * purpose — it must produce zero overlap rows). Bounds in epoch
    * microseconds, UTC.
    */
  private def maintenanceWindows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("w1", "2024-01-04 00:00:00", "2024-01-06 12:00:00"),
      ("w2", "2024-01-12 00:00:00", "2024-01-13 00:00:00"),
      ("w3", "2024-01-20 06:00:00", "2024-01-24 00:00:00"),
      ("w4", "2024-02-10 00:00:00", "2024-02-12 00:00:00"))
      .toDF("window_id", "ws", "we")
      .select(col("window_id"),
        unix_micros(to_timestamp(col("ws"))).as("w_start"),
        unix_micros(to_timestamp(col("we"))).as("w_end"))
  }

  /** Ten unrolled PageRank iterations — the same integer fixed-point
    * recurrence the Spark loop runs, generated mechanically so both
    * engines share one definition.
    */
  private val pagerankIters: String = (1 to 10).map { i =>
    s"""pr$i AS (
           SELECT n.tok, 150000000 + coalesce(s.m, 0) AS r
           FROM nodes n LEFT JOIN (
             SELECT e.w2 AS tok,
                    sum((p.r * 85 * e.c) // (100 * e.out))::BIGINT AS m
             FROM edges e JOIN pr${i - 1} p ON e.w1 = p.tok GROUP BY 1) s
           ON n.tok = s.tok)"""
  }.mkString(",\n         ")

  def oracleSql: Map[String, String] = Map(
    "q191_theta_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         types AS (SELECT DISTINCT event_type FROM events),
         pairs AS (
           SELECT a.event_type AS ta, b.event_type AS tb
           FROM types a JOIN types b ON a.event_type < b.event_type),
         com AS (
           SELECT x.event_type AS ta, y.event_type AS tb, count(*)::BIGINT AS c
           FROM tu x JOIN tu y
             ON x.user_id = y.user_id AND x.event_type < y.event_type
           GROUP BY 1, 2),
         tot AS (SELECT event_type, count(*)::BIGINT AS u FROM tu GROUP BY 1)
         SELECT p.ta AS type_a, p.tb AS type_b,
                coalesce(c.c, 0)::BIGINT AS common_users,
                (t1.u + t2.u - coalesce(c.c, 0))::BIGINT AS union_users
         FROM pairs p
         LEFT JOIN com c ON c.ta = p.ta AND c.tb = p.tb
         JOIN tot t1 ON t1.event_type = p.ta
         JOIN tot t2 ON t2.event_type = p.tb""",
    // q192_approx_topk: approximate contract → rows-only check.
    "q206_bitmap_rewrite" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS distinct_users
         FROM events GROUP BY 1""",
    "q218_quantile_disc" ->
      """WITH b AS (
           SELECT event_type, event_id,
                  round(value * 100, 0)::BIGINT AS cents
           FROM events),
         r AS (
           SELECT event_type, cents,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY cents, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM b)
         SELECT event_type,
                CASE WHEN rn = ceil(n * 0.5) THEN 'p50' ELSE 'p90' END AS p,
                cents
         FROM r
         WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9)""",
    "q219_ntile_shards" ->
      """SELECT source, doc_id,
                ntile(4) OVER (PARTITION BY source
                  ORDER BY md5('nt' || doc_id::VARCHAR), doc_id)::BIGINT
                  AS shard
         FROM documents""",
    "q295_rank_normalize" ->
      """WITH b AS (
           SELECT event_id, event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         r AS (SELECT event_id, event_type,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY cents, event_id)::BIGINT AS rn,
                 (count(*) OVER (PARTITION BY event_type))::BIGINT AS n
               FROM b)
         SELECT event_id, event_type, ((rn * 1000) // n)::BIGINT AS rank_pm
         FROM r""",
    "q313_decile_assign" ->
      """WITH b AS (
           SELECT event_id, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         r AS (SELECT event_id, cents,
                 (row_number() OVER (ORDER BY cents, event_id) - 1)::BIGINT
                   AS rn0,
                 (count(*) OVER ())::BIGINT AS n
               FROM b)
         SELECT event_id, cents, ((rn0 * 10) // n + 1)::BIGINT AS decile
         FROM r""",
    "q274_join_preflight" ->
      """WITH c AS (SELECT l_partkey, count(*)::BIGINT AS n,
                           (count(*) * count(*))::BIGINT AS pairs
                    FROM lineitem GROUP BY 1),
         t AS (SELECT sum(pairs)::BIGINT AS total_pairs,
                      count(*)::BIGINT AS n_keys FROM c)
         SELECT c.l_partkey, c.n, c.pairs, t.total_pairs, t.n_keys
         FROM c, t
         ORDER BY c.pairs DESC, c.l_partkey LIMIT 5""",
    "q275_histogram_equiwidth" ->
      """WITH b AS (
           SELECT event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         ext AS (SELECT event_type, min(cents) AS mn, max(cents) AS mx
                 FROM b GROUP BY 1),
         binned AS (
           SELECT b.event_type,
                  least(15, ((b.cents - ext.mn) * 16) // (ext.mx - ext.mn + 1))
                    ::BIGINT AS bin,
                  ext.mn, ext.mx
           FROM b JOIN ext USING (event_type))
         SELECT event_type, bin, count(*)::BIGINT AS n,
                (mn + (bin * (mx - mn + 1)) // 16)::BIGINT AS lo_edge,
                (mn + ((bin + 1) * (mx - mn + 1)) // 16 - 1)::BIGINT AS hi_edge
         FROM binned GROUP BY 1, 2, mn, mx""",
    "q270_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS n
                    FROM events GROUP BY 1),
         t AS (SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS n_rows
               FROM c)
         SELECT c.user_id, c.n, t.n_keys, t.n_rows,
                ((c.n * t.n_keys * 100) // t.n_rows)::BIGINT AS x_avg_pct
         FROM c, t
         WHERE c.n * t.n_keys * 10 > t.n_rows * 12""",
    "q268_mad_outliers" ->
      """WITH b AS (
           SELECT event_id, event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY cents, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n FROM b),
         med AS (SELECT event_type, cents AS med FROM r1 WHERE rn = (n+1)//2),
         d AS (SELECT b.event_id, b.event_type, b.cents, m.med,
                      abs(b.cents - m.med) AS adev
               FROM b JOIN med m USING (event_type)),
         r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY adev, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n FROM d),
         mad AS (SELECT event_type, adev AS mad FROM r2 WHERE rn = (n+1)//2)
         SELECT d.event_id, d.event_type, d.cents, d.med, mad.mad
         FROM d JOIN mad USING (event_type)
         WHERE d.adev > 3 * mad.mad""",
    "q263_minmax_scale" ->
      """WITH b AS (
           SELECT event_id, event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         ext AS (SELECT event_type, min(cents) AS mn, max(cents) AS mx
                 FROM b GROUP BY 1)
         SELECT b.event_id, b.event_type,
                CASE WHEN ext.mx = ext.mn THEN 0
                     ELSE (b.cents - ext.mn) * 10000 // (ext.mx - ext.mn)
                END::BIGINT AS scaled
         FROM b JOIN ext USING (event_type)""",
    "q217_winsorize" ->
      """WITH b AS (
           SELECT event_id, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         q AS (SELECT quantile_cont(cents, 0.05) AS p05,
                      quantile_cont(cents, 0.95) AS p95 FROM b)
         SELECT event_id,
                greatest(p05, least(p95, cents::DOUBLE)) AS winsorized
         FROM b, q""",
    "q213_topk_agg" ->
      """WITH b AS (
           SELECT event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         r AS (
           SELECT event_type, cents,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY cents DESC) AS pos
           FROM b)
         SELECT event_type, pos::BIGINT AS pos, cents
         FROM r WHERE pos <= 10""",
    "q186_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS distinct_users
         FROM events GROUP BY 1""",
    "q187_bitmap_overlap" ->
      """WITH ud AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         tot AS (SELECT day, count(*)::BIGINT AS u FROM ud GROUP BY 1),
         com AS (
           SELECT a.day AS day, count(*)::BIGINT AS c
           FROM ud a JOIN ud b
             ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
           GROUP BY 1)
         SELECT strftime(t1.day, '%Y-%m-%d') AS day,
                t1.u AS users_day, t2.u AS users_next,
                coalesce(c.c, 0)::BIGINT AS common_users
         FROM tot t1
         JOIN tot t2 ON t2.day = t1.day + INTERVAL 1 DAY
         LEFT JOIN com c ON c.day = t1.day""",
    "q171_global_rank" ->
      """SELECT event_id, value,
                row_number() OVER (ORDER BY value, event_id) AS rank
         FROM events""",
    "q125_zorder_zonemap" ->
      """WITH b AS (
           SELECT l_partkey, l_suppkey,
                  l_partkey::BIGINT & 65535 AS x0,
                  l_suppkey::BIGINT & 65535 AS y0
           FROM lineitem),
         s1 AS (SELECT *, (x0 | (x0 << 8)) & 16711935 AS x1,
                        (y0 | (y0 << 8)) & 16711935 AS y1 FROM b),
         s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
                        (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
         s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
                        (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
         s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
                        (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
         z AS (SELECT l_partkey, l_suppkey, (x4 | (y4 << 1)) AS z FROM s4)
         SELECT z // 65536 AS zone, count(*) AS n_rows,
                min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
         FROM z GROUP BY 1""",
    "q126_equidepth_hist" ->
      """WITH v AS (SELECT round(value * 100)::BIGINT AS c FROM events),
         q AS (SELECT quantile_cont(c, 0.125) AS b1, quantile_cont(c, 0.250) AS b2,
                      quantile_cont(c, 0.375) AS b3, quantile_cont(c, 0.500) AS b4,
                      quantile_cont(c, 0.625) AS b5, quantile_cont(c, 0.750) AS b6,
                      quantile_cont(c, 0.875) AS b7
               FROM v)
         SELECT (CASE WHEN c > b1 THEN 1 ELSE 0 END +
                 CASE WHEN c > b2 THEN 1 ELSE 0 END +
                 CASE WHEN c > b3 THEN 1 ELSE 0 END +
                 CASE WHEN c > b4 THEN 1 ELSE 0 END +
                 CASE WHEN c > b5 THEN 1 ELSE 0 END +
                 CASE WHEN c > b6 THEN 1 ELSE 0 END +
                 CASE WHEN c > b7 THEN 1 ELSE 0 END)::BIGINT AS bucket,
                count(*) AS n
         FROM v, q GROUP BY 1""",
    "q127_band_join" ->
      """WITH v AS (SELECT event_id, round(value * 100)::BIGINT AS c FROM events)
         SELECT a.event_id AS a_id, b.event_id AS b_id, a.c AS ca, b.c AS cb,
                abs(a.c - b.c) AS diff
         FROM v a JOIN v b
           ON a.event_id < b.event_id AND abs(a.c - b.c) <= 5""",
    "q129_pagerank_tokens" ->
      s"""WITH t AS (
           SELECT string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         p AS (
           SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
                          FOR i IN range(1, len(toks))], recursive := true)
           FROM t),
         edges0 AS (SELECT w1, w2, count(*) AS c FROM p GROUP BY 1, 2),
         outs AS (SELECT w1, sum(c)::BIGINT AS out FROM edges0 GROUP BY 1),
         edges AS (SELECT e.w1, e.w2, e.c, o.out
                   FROM edges0 e JOIN outs o USING (w1)),
         nodes AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
                   FROM documents),
         pr0 AS (SELECT tok, 1000000000::BIGINT AS r FROM nodes),
         $pagerankIters
         SELECT tok, r,
                row_number() OVER (ORDER BY r DESC, tok)::BIGINT AS rnk
         FROM pr10""",
    "q130_weighted_median" ->
      """WITH v AS (
           SELECT event_type, round(value * 100)::BIGINT AS c,
                  coalesce(length(props), 0)::BIGINT AS w, event_id
           FROM events),
         t AS (SELECT event_type, sum(w)::BIGINT AS total_w FROM v GROUP BY 1),
         cw AS (
           SELECT event_type, c,
                  sum(w) OVER (PARTITION BY event_type ORDER BY c, event_id
                               ROWS UNBOUNDED PRECEDING) AS cum
           FROM v)
         SELECT cw.event_type, min(cw.c) AS wmedian_cents,
                min(t.total_w) AS total_w
         FROM cw JOIN t USING (event_type)
         WHERE cum * 2 >= total_w
         GROUP BY 1""",
    "q116_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice >= 480000
         GROUP BY 1""",
    "q117_heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
         t AS (SELECT count(*) AS total FROM events)
         SELECT user_id, n, n::DOUBLE / total::DOUBLE AS share
         FROM c, t WHERE n * 200 > total""",
    "q118_trailing_distinct" ->
      """WITH ud AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
         days AS (SELECT DISTINCT day FROM ud)
         SELECT strftime(d.day, '%Y-%m-%d') AS day,
                count(DISTINCT u.user_id)::BIGINT AS u7
         FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
         GROUP BY 1""",
    "q120_rtbf_purge" ->
      """WITH tomb AS (
           SELECT DISTINCT user_id AS k FROM events WHERE user_id % 7 = 3),
         ev AS (
           SELECT 'events' AS table_name, count(*) AS rows_before,
                  sum(CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS rows_purged
           FROM events e LEFT JOIN tomb t ON e.user_id = t.k),
         od AS (
           SELECT 'orders' AS table_name, count(*) AS rows_before,
                  sum(CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS rows_purged
           FROM orders o LEFT JOIN tomb t ON o.o_custkey = t.k)
         SELECT table_name, rows_before, rows_purged,
                (rows_before - rows_purged)::BIGINT AS rows_after
         FROM (SELECT * FROM ev UNION ALL SELECT * FROM od)""",
    "q238_zonemap_consult" ->
      """SELECT l_suppkey, count(*)::BIGINT AS n,
                sum(l_quantity) AS qty
         FROM lineitem
         WHERE l_partkey BETWEEN 10 AND 120
           AND l_suppkey BETWEEN 1 AND 6
         GROUP BY 1""",
    "q231_grouped_quantiles" ->
      """WITH b AS (
           SELECT event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events)
         SELECT event_type,
                quantile_cont(cents, 0.25) AS q25,
                quantile_cont(cents, 0.5) AS q50,
                quantile_cont(cents, 0.75) AS q75
         FROM b GROUP BY 1""",
    "q229_drift_report" ->
      """WITH b AS (
           SELECT ts, round(value * 100, 0)::BIGINT AS cents FROM events),
         a AS (SELECT cents FROM b WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
         w2 AS (SELECT cents FROM b WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
         f AS (SELECT quantile_cont(cents, 0.1) AS p1,
                      quantile_cont(cents, 0.2) AS p2,
                      quantile_cont(cents, 0.3) AS p3,
                      quantile_cont(cents, 0.4) AS p4,
                      quantile_cont(cents, 0.5) AS p5,
                      quantile_cont(cents, 0.6) AS p6,
                      quantile_cont(cents, 0.7) AS p7,
                      quantile_cont(cents, 0.8) AS p8,
                      quantile_cont(cents, 0.9) AS p9
               FROM a),
         ba AS (
           SELECT 1 + (cents > p1)::INT + (cents > p2)::INT + (cents > p3)::INT
                    + (cents > p4)::INT + (cents > p5)::INT + (cents > p6)::INT
                    + (cents > p7)::INT + (cents > p8)::INT + (cents > p9)::INT
                  AS bucket
           FROM a, f),
         bb AS (
           SELECT 1 + (cents > p1)::INT + (cents > p2)::INT + (cents > p3)::INT
                    + (cents > p4)::INT + (cents > p5)::INT + (cents > p6)::INT
                    + (cents > p7)::INT + (cents > p8)::INT + (cents > p9)::INT
                  AS bucket
           FROM w2, f),
         ca AS (SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS na
                FROM ba GROUP BY 1),
         cb AS (SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS nb
                FROM bb GROUP BY 1),
         j AS (SELECT bucket, coalesce(ca.na, 0)::BIGINT AS na,
                      coalesce(cb.nb, 0)::BIGINT AS nb
               FROM ca FULL JOIN cb USING (bucket)),
         t AS (SELECT sum(na) AS tot_a, sum(nb) AS tot_b FROM j)
         SELECT bucket, na, nb,
                abs(nb::DECIMAL(38,0) * tot_a::DECIMAL(38,0)
                    - na::DECIMAL(38,0) * tot_b::DECIMAL(38,0)) * 50
                  > tot_a::DECIMAL(38,0) * tot_b::DECIMAL(38,0) AS drifted
         FROM j, t""",
    "q121_gap_outliers" ->
      """WITH g AS (
           SELECT event_id, user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events),
         gg AS (SELECT * FROM g WHERE gap_us IS NOT NULL),
         s AS (SELECT quantile_cont(gap_us, 0.25) AS q1,
                      quantile_cont(gap_us, 0.75) AS q3 FROM gg)
         SELECT event_id, user_id, gap_us FROM gg, s
         WHERE gap_us < q1 - 1.5 * (q3 - q1)
            OR gap_us > q3 + 1.5 * (q3 - q1)""",
    "q123_interval_overlap" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT user_id, event_id, tsu,
                  CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM x),
         sess0 AS (
           SELECT user_id, tsu,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
           FROM f),
         sess AS (
           SELECT user_id, sid, min(tsu) AS s_start, max(tsu) AS s_end
           FROM sess0 GROUP BY 1, 2),
         win AS (
           SELECT * FROM (VALUES
             ('w1', epoch_us(TIMESTAMP '2024-01-04 00:00:00'),
                    epoch_us(TIMESTAMP '2024-01-06 12:00:00')),
             ('w2', epoch_us(TIMESTAMP '2024-01-12 00:00:00'),
                    epoch_us(TIMESTAMP '2024-01-13 00:00:00')),
             ('w3', epoch_us(TIMESTAMP '2024-01-20 06:00:00'),
                    epoch_us(TIMESTAMP '2024-01-24 00:00:00')),
             ('w4', epoch_us(TIMESTAMP '2024-02-10 00:00:00'),
                    epoch_us(TIMESTAMP '2024-02-12 00:00:00')))
             AS t(window_id, w_start, w_end))
         SELECT s.user_id, s.sid, w.window_id,
                (least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start))::BIGINT
                  AS overlap_us
         FROM sess s JOIN win w
           ON s.s_start < w.w_end AND w.w_start < s.s_end""",
    // brute-force n² reference — the grid join must be invisible
    "q416_spatial_join" ->
      """WITH p AS (SELECT c_custkey AS k,
             ('0x' || substr(md5(c_custkey::VARCHAR), 1, 5))::BIGINT
               % 100000 AS x,
             ('0x' || substr(md5(c_custkey::VARCHAR), 6, 5))::BIGINT
               % 100000 AS y
           FROM customer)
         SELECT a.k AS a_key, b.k AS b_key,
                ((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y))::BIGINT AS dist2
         FROM p a JOIN p b ON a.k < b.k
         WHERE (a.x - b.x) * (a.x - b.x)
               + (a.y - b.y) * (a.y - b.y) <= 9000000""",
    "q417_spatial_clusters" ->
      """WITH RECURSIVE p AS (SELECT c_custkey AS k,
             ('0x' || substr(md5(c_custkey::VARCHAR), 1, 5))::BIGINT
               % 100000 AS x,
             ('0x' || substr(md5(c_custkey::VARCHAR), 6, 5))::BIGINT
               % 100000 AS y
           FROM customer),
         pairs AS (
           SELECT a.k AS a_id, b.k AS b_id FROM p a JOIN p b ON a.k < b.k
           WHERE (a.x - b.x) * (a.x - b.x)
                 + (a.y - b.y) * (a.y - b.y) <= 9000000),
         edges AS (
           SELECT a_id AS s, b_id AS d FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach AS (
           SELECT k AS s, k AS d FROM p
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         SELECT s AS cluster_rep, count(*) AS cluster_size
         FROM reach GROUP BY s
         HAVING s = min(d) AND count(*) >= 2"""
  )
}
