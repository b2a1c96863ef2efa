package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL / analytics breadth: iterative BFS, attribution, basket
  * analysis, corpus filter rules, decorrelated EXISTS, time-series
  * gap filling, snapshot diffing. Everything oracled; every shape
  * chosen for the 1000-executor case (bounded fan-outs, broadcast
  * spines, window-parallel groups, no driver loops over data).
  */
object EtlOps {

  /** Loud DECIMAL(38,0) overflow envelope (r11 verdict item 8). The
    * wide-decimal cross products in q454/q468 are safe at any gate
    * scale but exceed DECIMAL(38,0) around 10⁹-row segments; rather
    * than letting ANSI mode throw a generic ArithmeticException deep
    * inside codegen, every factor that participates in a product
    * passes this envelope first: |factor| > 10¹⁷ raises a NAMED
    * error saying which operator hit the ceiling and what to do
    * (10¹⁷ on every factor keeps 1000·a·b under 10³⁸ with margin).
    * `assert_true` rides the value expression itself, so column
    * pruning can never drop the check. NULL-TRANSPARENT (r12
    * advice): `assert_true` throws on a null condition, so a null
    * factor (a degenerate/empty aggregation upstream) must pass the
    * guard explicitly — it propagates null exactly as the unguarded
    * expression did, and only genuine magnitude violations fire.
    */
  private[graft] def decimalEnvelope(value: Column, op: String): Column =
    when(assert_true(value.isNull ||
      abs(value) <= expr("CAST(100000000000000000 AS DECIMAL(38,0))"),
      lit(s"$op: cross-product factor exceeds the DECIMAL(38,0) envelope " +
        "(|factor| > 1e17) — gcd-reduce the rational or split the product " +
        "into two 64-bit limbs before multiplying")).isNull,
      value)

  /** Session ids per event at a 30-minute gap — ONE source of truth:
    * Sessionize.withSessionIds (the q51/q81/q104 contract), renamed
    * to the local `sid` column. Shared by q133.
    */
  private def withSessionIds(ev: DataFrame): DataFrame =
    graft.streaming.Sessionize.withSessionIds(ev, gapMinutes = 30)
      .withColumnRenamed("session_id", "sid")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD2 (type-2 slowly-changing dimension) build from an event
    // log: per-user runs of consecutive equal attribute values
    // collapse to ONE versioned row with [valid_from, valid_to)
    // effective dating and a current flag — the warehouse operator
    // every dimension load needs. Shape: two key-partitioned window
    // passes (change flag → version number) + one aggregate; nothing
    // global, so it parallelizes by user at any scale. Total order
    // (ts, event_id) makes versions deterministic under ts ties.
    "q248_scd2_history" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, d).events
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("attr"))
        .withColumn("chg",
          when(lag(col("attr"), 1).over(w).isNull ||
            lag(col("attr"), 1).over(w) =!= col("attr"), 1L).otherwise(0L))
        .withColumn("version", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("version"))
        // attr is constant within a version; min is the deterministic pick
        .agg(min(col("ts")).as("vf"),
          min(col("attr")).as("attr"), count(lit(1)).as("n_events"))
        .withColumn("vt", lead(col("vf"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("version"))))
        .select(col("user_id"), col("version"), col("attr"),
          date_format(col("vf"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("vt"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("vt").isNull.as("is_current"), col("n_events"))
    }),

    // MERGE INTO semantics (the batch-upsert statement) expressed as
    // the full-outer merge plan Spark executes for it: a per-user
    // delta batch merged into the pre-cutoff snapshot — WHEN MATCHED
    // → additive update, WHEN NOT MATCHED → insert, target-only rows
    // carried through unchanged, each row tagged with the action the
    // merge took. One key-shaped shuffle per side; at 100 TB this is
    // the same plan Delta/Iceberg MERGE compiles to (minus the
    // file-level skipping, which q238's zone map models).
    "q249_merge_upsert" -> ((s, d) => {
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val ev = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      def agg(df: DataFrame) = df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val target = agg(ev.filter(col("ts") < cutoff))
        .select(col("user_id"), col("n").as("t_n"), col("cents").as("t_cents"))
      val delta = agg(ev.filter(col("ts") >= cutoff))
        .select(col("user_id"), col("n").as("d_n"), col("cents").as("d_cents"))
      target.join(delta, Seq("user_id"), "full")
        .select(col("user_id"),
          (coalesce(col("t_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
            .as("n"),
          (coalesce(col("t_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
            .as("cents"),
          when(col("t_n").isNull, "insert")
            .when(col("d_n").isNull, "keep").otherwise("update").as("action"))
    }),

    // CDC apply (change-data-capture replay): an ordered op log of
    // upserts and deletes per key reduced to the final table state —
    // last-writer-wins by (ts, event_id), keys whose LAST op is a
    // delete vanish. The op log is derived deterministically from
    // events ('error' rows play the delete). Shape: one window pass
    // partitioned by key — the merge an incremental sink replays at
    // any scale without ever materializing intermediate states.
    "q250_cdc_apply" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, d).events
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_ops", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("user_id"), col("cents"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("n_ops"))
    }),

    // BFS hop distances on the token-transition graph from the
    // corpus's most frequent token, 5 unrolled rounds — the frontier
    //-expansion iteration (edges ⋈ frontier per round, min-combine)
    // that underlies every distributed reachability/shortest-path
    // job. Deterministic source pick (max count, token tie-break);
    // per-round localCheckpoint truncates the join lineage.
    "q131_bfs_hops" -> ((s, d) => {
      val toks = split(col("text"), " ")
      // single-file parquet arrives as ONE partition — fan out before
      // the interpreted transform/explode pass (CLAUDE.md guard)
      val docs = TextOps.parallelized(Tables(s, d).documents)
      val occ = docs.filter(size(toks) >= 2)
        .select(explode(transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val edges = occ.distinct().localCheckpoint()
      // deterministic source pick: a 1-row TakeOrderedAndProject,
      // not a global rank window over the whole vocabulary
      val src = docs.select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(1).select(col("tok"))
      var dist = src.withColumn("hops", lit(0L)).localCheckpoint()
      for (_ <- 1 to 5) {
        val expanded = edges.join(dist, edges("w1") === dist("tok"))
          .select(col("w2").as("tok"), (col("hops") + 1L).as("hops"))
        dist = dist.unionByName(expanded)
          .groupBy("tok").agg(min(col("hops")).as("hops"))
          .localCheckpoint()
      }
      dist
    }),

    // Triangle counting + global clustering coefficient on the
    // token-adjacency graph — the third classic distributed graph
    // kernel next to q67/q70 (connected components), q129 (PageRank)
    // and q131 (BFS). Scale shape is the degree-ordered edge
    // ORIENTATION (Suri & Vassilvitskii 2011 / Cohen 2009): each
    // undirected edge points from its (degree, node)-smaller endpoint,
    // so every triangle has exactly ONE center with two out-edges and
    // wedge enumeration is bounded by Σ C(outdeg, 2) = O(m^1.5) —
    // never the Σ C(deg, 2) hub blow-up of naive wedge counting. The
    // counts are exact integers; the coefficient stays a (3·tri,
    // wedges) rational pair.
    "q251_triangle_count" -> ((s, d) => {
      val docs = TextOps.parallelized(Tables(s, d).documents)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      // undirected edge set, canonical a < b, distinct
      val edges = docs.select(explode(
        expr("zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (x, y) -> struct(least(x, y) AS a, greatest(x, y) AS b))")).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      val deg = edges.select(col("a").as("n"))
        .unionAll(edges.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      // orient each edge from the (deg, node)-smaller endpoint
      val oriented = edges
        .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("a"))
            .otherwise(col("b")).as("u"),
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("b"))
            .otherwise(col("a")).as("v"))
      val o2 = oriented.select(col("u"), col("v").as("w"))
      val wedges = oriented.join(o2, "u").filter(col("v") < col("w"))
      val tris = wedges.join(edges,
        least(col("v"), col("w")) === col("a") &&
          greatest(col("v"), col("w")) === col("b"))
        .agg(count(lit(1)).as("n_triangles"))
      val nn = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("d * (d - 1) div 2")).cast("long").as("n_wedges"))
      val ne = edges.agg(count(lit(1)).as("n_edges"))
      nn.crossJoin(broadcast(ne)).crossJoin(broadcast(tris))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"))
    }),

    // k-core peeling (k = 3, 5 unrolled rounds) on the q251 token-
    // adjacency graph — the degeneracy-ordering kernel behind dense-
    // community mining and graph sparsification. Each round: degree
    // per endpoint (one (node)-keyed aggregate over the edge list),
    // keep nodes with deg >= k, restrict edges to kept endpoints via
    // two LEFT SEMI joins — shuffles carry (a, b) string pairs only,
    // and localCheckpoint truncates the per-round lineage exactly as
    // q67/q131 do. Output is the round-5 peel state (node, degree in
    // the surviving subgraph): deterministic whether or not the peel
    // has converged, and the same 5 rounds replay in the oracle as
    // chained MATERIALIZED CTEs (inlined CTEs would re-expand the
    // base scan ~5^5-fold).
    "q257_kcore_peel" -> ((s, d) => {
      val docs = TextOps.parallelized(Tables(s, d).documents)
        .select(split(col("text"), " ").as("ws"))
      var edges = docs.select(explode(
        expr("zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (x, y) -> struct(least(x, y) AS a, greatest(x, y) AS b))")).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct().localCheckpoint()
      for (_ <- 1 to 5) {
        val keep = edges.select(col("a").as("n"))
          .unionAll(edges.select(col("b").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 3).select(col("n"))
          // checkpointed: consumed by BOTH semi joins below — without
          // this the degree aggregate runs twice per round
          .localCheckpoint()
        edges = edges
          .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
          .localCheckpoint()
      }
      edges.select(col("a").as("tok")).unionAll(edges.select(col("b").as("tok")))
        .groupBy("tok").agg(count(lit(1)).as("deg"))
    }),

    // 2-D Pareto skyline over orders — maximize recency, minimize
    // price: an order is on the frontier iff no other order is both
    // at-least-as-recent AND at-most-as-expensive with one strict.
    // Skylines are DISTRIBUTIVE, so the scale shape is reduce-then-
    // refine: (1) per-date min-cents — a plain hash aggregate, the
    // only corpus-sized shuffle, because within a date anything above
    // the min is dominated outright; (2) one running-min window scan
    // over the ≤ |distinct dates| candidates (a few thousand rows at
    // ANY corpus scale — dates bound the window, not order count,
    // which is why the unpartitioned window is safe here); (3) equi-
    // join the frontier coords back to recover every tied order.
    // Ints end to end (2dp cents grid); the oracle states dominance
    // independently as a NOT EXISTS anti-join over the candidates.
    "q258_pareto_skyline" -> ((s, d) => {
      val ord = Tables(s, d).orders.select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("odate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val cand = ord.groupBy(col("odate")).agg(min(col("cents")).as("cents"))
      val w = Window.orderBy(col("odate").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val sky = cand.withColumn("later_min", min(col("cents")).over(w))
        .filter(col("later_min").isNull || col("cents") < col("later_min"))
        .select(col("odate"), col("cents"))
      ord.join(sky, Seq("odate", "cents"))
        .select(col("o_orderkey"),
          date_format(col("odate"), "yyyy-MM-dd").as("order_date"),
          col("cents"))
    }),

    // Event-sequence pattern matching (MATCH_RECOGNIZE-lite): each
    // user's chronologically-ordered event-type initials fold into
    // one journey string (c/e/p/s/v), matched against the strict
    // ADJACENT funnel regex vc+p — a view immediately followed by
    // clicks then a purchase, nothing interleaved (the containment
    // form v.*c.*p matches ~every active user, so adjacency is what
    // makes the detector informative). The sequence build is one
    // per-user aggregate (sort_array over collect_list keeps the
    // order inside the aggregate buffer — no separate window sort
    // pass), and the regex runs row-local; users parallelize freely.
    // Total order (ts, event_id) keeps ts-ties deterministic and the
    // oracle is string_agg ORDER BY the same key.
    "q260_sequence_match" -> ((s, d) => {
      Tables(s, d).events
        .groupBy(col("user_id"))
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c")))),
          x => x.getField("c"))).as("seq"))
        .filter(col("seq").rlike("vc+p"))
        .select(col("user_id"), col("seq"))
    }),

    // Item-item co-occurrence recommender build: distinct (customer,
    // part) baskets from the order facts, customer-keyed self-join
    // emits co-purchase pairs (bounded by per-customer basket size
    // squared — the classic explosion bound, NOT corpus²), symmetric
    // expansion, then top-3 recommendations per item by count with a
    // deterministic (n desc, item) tie-break. The windows partition
    // by item — thousands of parallel partitions at any scale.
    "q266_item_cooccurrence" -> ((s, d) => {
      val t = Tables(s, d)
      val bask = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
      val pairs = bask.select(col("cust"), col("part").as("pa"))
        .join(bask.select(col("cust"), col("part").as("pb")), Seq("cust"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("n_co"))
      val sym = pairs.unionByName(pairs.select(col("pb").as("pa"),
        col("pa").as("pb"), col("n_co")))
      val w = Window.partitionBy(col("pa")).orderBy(col("n_co").desc, col("pb"))
      sym.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("pa").as("item"), col("pb").as("rec"), col("n_co"),
          col("rk").cast("long").as("rk"))
    }),

    // "Frequently bought together" top-3 — the headline-benchable
    // co-occurrence serving query beside q266's customer-lifetime
    // build: baskets are ORDERS (the classic market-basket grain —
    // no dimension join, and pair volume is Σ C(items_per_order, 2),
    // naturally bounded by basket size instead of customer lifetime).
    // The ranked pick packs (n_co desc, rec asc) into one long
    // (n_co<<32 | ~rec; exact while n_co<2^31 and rec<2^32 — true at
    // every bench SF, a wider key space would widen the pack to a
    // struct heap) and runs through the bounded k-heap TopKAgg —
    // map-side partial heaps, ≤3 longs per (item, partition) in the
    // exchange, both directions exploded ABOVE the counted exchange —
    // never a window sort over the pair set, never a union that
    // re-runs the pair aggregate.
    "q312_cooccur_topk" -> ((s0, d) => {
      // ObjectHashAggregate (TopKAgg is a TypedImperativeAggregate)
      // falls back to SORT-based aggregation after 128 distinct keys
      // per partition — which would re-introduce exactly the giant
      // sort this query exists to avoid. The per-key state is a
      // 3-long heap, so a million-key hash map is still tiny. The
      // override is scoped to a CHILD session (the upsertDrain
      // pattern) so concurrent queries on the caller's session never
      // observe it; the caller's shuffle width is re-pinned because
      // newSession restarts from SparkContext defaults.
      val s = s0.newSession()
      s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      s.conf.set("spark.sql.shuffle.partitions",
        s0.conf.get("spark.sql.shuffle.partitions"))
      graft.GraftFunctions.register(s)
      // ONE basket-keyed shuffle does everything the classic
      // distinct + self-join would: repartition by order key (also
      // the single-file fan-out, at the session's shuffle width —
      // never a hardcoded task count), collect each basket's DEDUPED
      // item set in place (the groupBy reuses the exchange — no
      // second shuffle), and emit ordered pairs from the sorted set
      // with an index-windowed lambda — pair volume is Σ C(basket,
      // 2), bounded by basket size, never customer lifetime
      val sets = Tables(s, d).lineitem
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("part"))
        .repartition(col("bk"))
        .groupBy(col("bk"))
        .agg(sort_array(collect_set(col("part"))).as("ws"))
      // pair emission is the hot inner loop (Σ C(basket, 2) packed
      // longs): the native PackedPairs64 expression replaces the
      // interpreted nested-transform lambdas, whose per-element
      // `slice` copied a suffix array per item — O(m²) allocations
      // per basket before any pair existed
      val pairs = sets.select(explode(org.apache.spark.sql.GraftColumnBridge
          .column(graft.functions.expressions.PackedPairs64(
            org.apache.spark.sql.GraftColumnBridge.expression(col("ws")))))
          .as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n_co"))
      val pa = shiftright(col("pair"), 32)
      val pb = col("pair").bitwiseAND(lit(0xFFFFFFFFL))
      pairs.select(explode(array(
          struct(pa.as("item"),
            (shiftleft(col("n_co"), 32) + (lit(0xFFFFFFFFL) - pb)).as("pk")),
          struct(pb.as("item"),
            (shiftleft(col("n_co"), 32) + (lit(0xFFFFFFFFL) - pa)).as("pk"))))
          .as("e"))
        .select(col("e.item").as("item"), col("e.pk").as("pk"))
        .groupBy("item").agg(expr("topk_agg(pk, 3)").as("tk"))
        .select(col("item"), posexplode(col("tk")).as(Seq("pos0", "pk")))
        .select(col("item"),
          (lit(0xFFFFFFFFL) - col("pk").bitwiseAND(lit(0xFFFFFFFFL))).as("rec"),
          shiftright(col("pk"), 32).as("n_co"),
          (col("pos0") + 1).cast("long").as("rk"))
    }),

    // Time-weighted average value per user (TWAP): the step-function
    // integral Σ cents_i·Δt_i / Σ Δt_i between consecutive events —
    // the price/sensor aggregation where arithmetic means lie. Δt is
    // WHOLE SECONDS (µs div 1e6): keeps cents·Δt·Σ inside int64 for
    // any realistic per-user horizon (10 y × 1e5 cents ≈ 3e13 —
    // µs-weighting would overflow at 3e19), so num/den/floor-TWAP
    // are all exact integers. One lead() per user partition; users
    // with no measurable span (den = 0) are excluded honestly.
    "q267_twap" -> ((s, d) => {
      Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("dt", expr("(lead(us) OVER (PARTITION BY user_id " +
          "ORDER BY ts, event_id) - us) div 1000000"))
        .filter(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(col("cents") * col("dt")).as("num"),
          sum(col("dt")).as("den"))
        .filter(col("den") > 0)
        .select(col("user_id"), col("num"), col("den"),
          expr("num div den").as("twap_floor"))
    }),

    // Hierarchical rollup with share-of-parent: revenue per nation
    // inside its region, shares in exact PERMILLE (rev·1000 div
    // parent) — the allocation report every geo hierarchy ships.
    // Nation/region dims broadcast; the only corpus-sized work is
    // the customer-keyed revenue aggregate.
    "q269_hierarchy_share" -> ((s, d) => {
      val t = Tables(s, d)
      val rev = t.orders
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(sum(col("cents")).as("nation_cents"))
      val geo = broadcast(t.nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
        .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey")))
      val byNation = rev.join(geo, col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
          col("nation_cents"))
      val byRegion = byNation.groupBy(col("region"))
        .agg(sum(col("nation_cents")).as("region_cents"))
      byNation.join(broadcast(byRegion), "region")
        .select(col("region"), col("nation"), col("nation_cents"),
          col("region_cents"),
          expr("(nation_cents * 1000) div region_cents").as("share_pm"))
    }),

    // Referential-integrity audit across the star schema's three FK
    // edges — the data-quality gate every warehouse load runs before
    // publishing: per relationship, total child rows and how many
    // have no parent (LEFT join against the parent's DISTINCT key
    // projection; an orphan is a null hit). Keys-only shuffles; the
    // nation/customer parents broadcast, and the one big-big edge
    // (lineitem→orders) is a plain key-partitioned join AQE handles
    // at any scale. The synthetic star is intact, so the audit's
    // zero-orphan verdict is itself the assertion.
    "q262_ri_audit" -> ((s, d) => {
      val t = Tables(s, d)
      def audit(rel: String, childKeys: DataFrame,
                parentKeys: DataFrame): DataFrame =
        childKeys
          .join(parentKeys.distinct().withColumn("hit", lit(1)), Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(rel).as("relationship"), col("n_child"),
            col("n_orphans").cast("long").as("n_orphans"))
      audit("lineitem.l_orderkey -> orders",
          t.lineitem.select(col("l_orderkey").as("k")),
          t.orders.select(col("o_orderkey").as("k")))
        .unionByName(audit("orders.o_custkey -> customer",
          t.orders.select(col("o_custkey").as("k")),
          t.customer.select(col("c_custkey").as("k"))))
        .unionByName(audit("customer.c_nationkey -> nation",
          t.customer.select(col("c_nationkey").as("k")),
          t.nation.select(col("n_nationkey").as("k"))))
    }),

    // Identity stitching — the MDM/identity-graph build: users who
    // share a device (planted device_id = user_id div 3, a 3-way
    // collision structure) merge into one person via connected
    // components over the shared-device pair list. Pair fan-out is
    // bounded by users-per-device², and the CC machinery is q67's
    // (label propagation, (id, label)-only shuffles). Output: each
    // user's canonical person id + identity-cluster size.
    "q309_identity_stitch" -> ((s, d) => {
      val users = Tables(s, d).events.select(col("user_id")).distinct()
        .withColumn("device_id", expr("user_id div 3"))
      val a = users.select(col("device_id"), col("user_id").as("u1"))
      val b = users.select(col("device_id"), col("user_id").as("u2"))
      val pairs = a.join(b, Seq("device_id"))
        .filter(col("u1") < col("u2"))
        .select(col("u1"), col("u2"))
      graft.operators.Dedup.duplicateClusters(pairs, users.select("user_id"))
        .select(col("doc_id").as("user_id"), col("cluster_id").as("person_id"),
          col("cluster_size"))
    }),

    // Hierarchy (bill-of-materials) rollup WITHOUT recursion: orders
    // arranged in a planted 4-ary tree (parent = (k−1) div 4);
    // subtree cents totals computed by exploding each node's ≤ 9
    // ancestors (iterated integer division — a narrow generator)
    // and aggregating once per ancestor. O(n·depth) rows, no
    // iterative joins, no recursive CTE on the engine side — the
    // ancestor-explosion trick that turns tree rollups into one
    // hash aggregate at any scale.
    "q310_bom_rollup" -> ((s, d) => {
      val ord = Tables(s, d).orders.select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      // ancestors of k: fold k → (k−1) div 4 until the root (0);
      // 9 steps cover 4^9 ≈ 262k keys. The chain is built by a
      // higher-order aggregate over a constant sequence — a narrow
      // generator, interpreted but over ≤ 10 elements per row.
      val anc = ord.select(col("k"), col("cents"), explode(expr(
        """aggregate(sequence(1, 9), array(k), (acc, i) ->
             CASE WHEN element_at(acc, size(acc)) > 0
                  THEN concat(acc, array((element_at(acc, size(acc)) - 1) div 4))
                  ELSE acc END)""")).as("anc"))
      anc.groupBy(col("anc").as("node"))
        .agg(sum(col("cents")).as("subtree_cents"),
          count(lit(1)).as("n_desc"))
    }),

    // Timezone-local rollup — the classic global-product pitfall
    // done right: each user's events bucketed by THEIR local day
    // (offset = user_id % 24 − 12 hours, a deterministic stand-in
    // for a tz dimension), entirely in integer µs arithmetic so no
    // session-timezone setting can bend the fences. Per local day:
    // events and active users. At 100 TB this is one narrow shift +
    // one aggregate — the point is the fences, not the plan.
    "q304_local_time_rollup" -> ((s, d) => {
      Tables(s, d).events
        .select(col("user_id"),
          expr("(unix_micros(ts) + ((user_id % 24) - 12) * 3600000000)" +
            " div 86400000000").as("local_epoch_day"))
        .groupBy(col("local_epoch_day"))
        .agg(count(lit(1)).as("n_events"),
          expr("count(DISTINCT user_id)").as("n_users"))
    }),

    // Log2 (power-of-two) histogram — the long-tail shape for
    // latency/size distributions where q275's fixed-width bins
    // starve the head: bucket = ⌊log2(cents)⌋ derived from the
    // BINARY STRING length (never float log2, whose boundary
    // rounding differs across engines); exact [2^b, 2^(b+1)) edges.
    "q305_log2_histogram" -> ((s, d) => {
      val cents = round(col("value") * 100, 0).cast("long")
      Tables(s, d).events
        .select(col("event_type"), cents.as("cents"))
        .filter(col("cents") > 0)
        .withColumn("bucket", (length(bin(col("cents"))) - 1).cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("lo_seen"), max(col("cents")).as("hi_seen"))
        .withColumn("lo_edge", expr("CAST(pow(2, bucket) AS BIGINT)"))
    }),

    // ID-sequence gap detection (islands & gaps): missing o_orderkey
    // ranges via lag() over the ordered key stream — the sequence-
    // completeness check a CDC/ingest pipeline runs to spot dropped
    // batches. The synthetic keys are dense, so batch loss is
    // SIMULATED (every 97th key dropped, the q287 trick) and the
    // detector must recover exactly those holes. Emits each gap's
    // [from, to] and width. The global lag goes through
    // GroupedRank.withGlobalLag — range-partition on the key,
    // per-partition lag in parallel, partition boundaries stitched
    // via a broadcast ≤P-row bounds frame — never the one-task
    // "No Partition Defined" window.
    "q306_id_gaps" -> ((s, d) => {
      val keys = Tables(s, d).orders.select(col("o_orderkey"))
        .filter(col("o_orderkey") % 97 =!= 0)
      graft.operators.GroupedRank
        .withGlobalLag(keys, col("o_orderkey"), "prev")
        .filter(col("prev").isNotNull && col("o_orderkey") - col("prev") > 1)
        .select((col("prev") + 1).as("gap_from"),
          (col("o_orderkey") - 1).as("gap_to"),
          (col("o_orderkey") - col("prev") - 1).as("gap_width"))
    }),

    // Top-N + OTHER bucketing — the reporting tail-lump every
    // dashboard applies: the 5 highest-revenue customers keep their
    // key, everything else rolls into 'OTHER'. Only 5 winners are
    // wanted, so the pick is orderBy+limit (TakeOrderedAndProject —
    // a per-partition top-5 merged on the driver, never a global
    // rank window sorting every customer in one task) broadcast back
    // as a relabel join; the fact shuffles once.
    "q298_other_bucket" -> ((s, d) => {
      val byCust = Tables(s, d).orders
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"),
          count(lit(1)).as("n_orders"))
      val top5 = byCust
        .orderBy(col("cents").desc, col("o_custkey")).limit(5)
        .select(col("o_custkey").as("top_key"))
      byCust
        .join(broadcast(top5), col("o_custkey") === col("top_key"), "left")
        .select(when(col("top_key").isNotNull, col("o_custkey").cast("string"))
          .otherwise("OTHER").as("cust_bucket"), col("cents"), col("n_orders"))
        .groupBy(col("cust_bucket"))
        .agg(sum(col("cents")).cast("long").as("cents"),
          sum(col("n_orders")).cast("long").as("n_orders"),
          count(lit(1)).as("n_customers"))
    }),

    // First-digit (Benford) profile of order amounts — the fraud /
    // data-entry screen: leading digit extracted from the exact
    // cents STRING (never log10 floats), observed counts and
    // permille shares per digit. One tiny aggregate; the judgment
    // against Benford's curve stays with the consumer, the profile
    // itself is engine-exact.
    "q299_first_digit" -> ((s, d) => {
      val digit = substring(round(col("o_totalprice") * 100, 0)
        .cast("long").cast("string"), 1, 1)
      val counts = Tables(s, d).orders
        .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("n_total"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("(n * 1000) div n_total").as("share_pm"))
    }),

    // Window funnel (the ClickHouse windowFunnel shape): per view,
    // the GREEDY chain view → earliest later click → earliest later
    // purchase, each step fenced to 24 h; per-user max depth reached.
    // Built by CHAINING the native as-of exec twice — step 2's left
    // timestamp is step 1's (nullable) match, and the operator's
    // null contract (null ts ⇒ unmatched, never dropped) is exactly
    // funnel semantics for chains that already broke. Two merge
    // walks, no pair explosion.
    "q291_window_funnel" -> ((s, d) => {
      val ev = Tables(s, d).events
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("p_ts"))
      val s1 = graft.plans.NativeAsOfJoin.earliestLater(views, clicks,
        "user_id", "v_ts", "cu", "c_ts", Seq("c_ts"))
      val s2 = graft.plans.NativeAsOfJoin.earliestLater(s1, purchases,
        "user_id", "c_ts", "pu", "p_ts", Seq("p_ts"))
      val fence = 86400000000L // 24 h in µs
      val cOk = col("c_ts").isNotNull &&
        unix_micros(col("c_ts")) - unix_micros(col("v_ts")) <= fence
      val pOk = cOk && col("p_ts").isNotNull &&
        unix_micros(col("p_ts")) - unix_micros(col("c_ts")) <= fence
      s2.select(col("user_id"),
          when(pOk, 3L).when(cOk, 2L).otherwise(1L).as("depth"))
        .groupBy(col("user_id"))
        .agg(max(col("depth")).as("max_depth"))
    }),

    // SCD2 as-of-date read — the BITEMPORAL consumer of q248's
    // versioned build: reconstruct every user's attribute state at
    // the corpus midpoint instant (derived from the data, so the
    // probe scales with the corpus): the version whose
    // [valid_from, valid_to) interval contains the probe. Same
    // window construction as the build; the probe is a broadcast
    // 1-row frame.
    "q292_scd2_asof" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val hist = Tables(s, d).events
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("attr"))
        .withColumn("chg", when(lag(col("attr"), 1).over(w).isNull ||
          lag(col("attr"), 1).over(w) =!= col("attr"), 1L).otherwise(0L))
        .withColumn("version", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("version"))
        .agg(min(unix_micros(col("ts"))).as("vf_us"), min(col("attr")).as("attr"))
        .withColumn("vt_us", lead(col("vf_us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("version"))))
      val mid = Tables(s, d).events.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid"))
      hist.crossJoin(broadcast(mid))
        .filter(col("vf_us") <= col("mid") &&
          (col("vt_us").isNull || col("mid") < col("vt_us")))
        .select(col("user_id"), col("version"), col("attr"))
    }),

    // Greedy budget allocation: fund orders in (priority, orderkey)
    // order until the budget (10% of total cents, computed from the
    // data) runs out — the waterfall/fill every planning system
    // runs. The global running sum is the q171/q201 two-phase shape:
    // range-partition on the funding order, per-partition prefix
    // sums in PARALLEL windows, partition totals broadcast back as
    // offsets — no single-reducer window at any scale. Output is the
    // per-priority funding manifest.
    "q293_budget_allocation" -> ((s, d) => {
      val ord = Tables(s, d).orders.select(col("o_orderkey"),
        col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val budget = ord.agg(expr("sum(cents) div 10").as("budget"))
      val parts = ord
        .repartitionByRange(16, col("o_orderpriority"), col("o_orderkey"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val sums = parts.groupBy(col("pid"))
        .agg(sum(col("cents")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets: Map[Int, Long] = {
        val sorted = sums.toSeq.sortBy(_._1)
        sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
      }
      val w = Window.partitionBy(col("pid"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
      parts
        .withColumn("cum",
          sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
            element_at(typedLit(offsets), col("pid")))
        .crossJoin(broadcast(budget))
        .withColumn("funded", col("cum") <= col("budget"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("funded"), 1L).otherwise(0L)).as("n_funded"),
          sum(when(col("funded"), col("cents")).otherwise(0L)).as("funded_cents"))
        .select(col("o_orderpriority"), col("n_orders"),
          col("n_funded").cast("long").as("n_funded"),
          col("funded_cents").cast("long").as("funded_cents"))
    }),

    // Markov transition matrix over the event stream: (from, to)
    // bigram counts per user timeline plus the row-normalized share
    // in exact permille — the behavior model q232's example builder
    // feeds (this is the AGGREGATE view). One lead() per user
    // partition, one two-key aggregate, 5×5 output.
    "q288_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = Tables(s, d).events
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = trans.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
      trans.join(broadcast(fromTot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          col("n_from").cast("long").as("n_from"),
          expr("(n * 1000) div n_from").as("share_pm"))
    }),

    // Time-to-event (survival) histogram: per user, whole days from
    // FIRST view to the first purchase at-or-after it; users who
    // never convert land in the censored bucket (-1) instead of
    // vanishing — censoring is data, not absence. Two user-keyed
    // min-aggregates + one integer-day bucketing; the histogram the
    // conversion-lag model consumes.
    "q289_time_to_event" -> ((s, d) => {
      val ev = Tables(s, d).events
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("v_us"))
      val firstPurch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        .join(firstView, "user_id")
        .filter(col("p_us") >= col("v_us"))
        .groupBy(col("user_id")).agg(min(col("p_us")).as("p_us"))
      firstView.join(firstPurch, Seq("user_id"), "left")
        .select(when(col("p_us").isNull, lit(-1L))
          .otherwise(expr("(p_us - v_us) div 86400000000")).as("day_bucket"))
        .groupBy(col("day_bucket")).agg(count(lit(1)).as("n_users"))
    }),

    // Orphan quarantine — the REMEDIATION step after q262's audit:
    // simulate parent loss (orders with o_orderkey % 97 = 0 deemed
    // missing), route referencing lineitems to quarantine with a
    // reason code, pass the rest — and emit the routing manifest
    // (disposition, rows, distinct keys) the load report records.
    // One anti/semi join pair against the surviving parent keys.
    "q287_orphan_quarantine" -> ((s, d) => {
      val t = Tables(s, d)
      val parents = t.orders.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("k"))
      val li = t.lineitem.select(col("l_orderkey"))
      def manifest(disposition: String, rows: DataFrame): DataFrame =
        rows.agg(count(lit(1)).as("n_rows"),
          expr("count(DISTINCT l_orderkey)").as("n_keys"))
          .select(lit(disposition).as("disposition"), col("n_rows"),
            col("n_keys"))
      manifest("quarantined:missing_parent",
          li.join(parents, col("l_orderkey") === col("k"), "left_anti"))
        .unionByName(manifest("passed",
          li.join(parents, col("l_orderkey") === col("k"), "left_semi")))
    }),

    // Golden-record build (MDM survivorship): one consolidated
    // profile per user from the event log — first/last seen, event
    // volume, lifetime value in exact cents, and the MODAL event
    // type (count desc, lexicographic tie-break). Two user-keyed
    // aggregates + one rank window, all partitioned by user — no
    // global state, so consolidation parallelizes at any cardinality.
    "q265_golden_record" -> ((s, d) => {
      val ev = Tables(s, d).events
      val prof = ev.groupBy(col("user_id")).agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      val modal = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("modal_type"))
      prof.join(modal, "user_id")
    }),

    // Audience-overlap matrix: exact Jaccard between every pair of
    // event types' user sets, in permille — the segment-similarity
    // report behind campaign dedup. One distinct (type, user)
    // projection (the only corpus shuffle), a user-keyed pair
    // self-join bounded by types-per-user², and the inclusion-
    // exclusion union |A|+|B|−|A∩B| — no second pass over the fact.
    "q283_audience_overlap" -> ((s, d) => {
      val tu = Tables(s, d).events
        .select(col("event_type").as("t"), col("user_id")).distinct()
      val sizes = tu.groupBy(col("t")).agg(count(lit(1)).as("n"))
      val inter = tu.select(col("t").as("ta"), col("user_id"))
        .join(tu.select(col("t").as("tb"), col("user_id")), Seq("user_id"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.select(col("t").as("ta"), col("n").as("n_a"))), "ta")
        .join(broadcast(sizes.select(col("t").as("tb"), col("n").as("n_b"))), "tb")
        .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_inter"),
          expr("(n_inter * 1000) div (n_a + n_b - n_inter)").as("jaccard_pm"))
    }),

    // Repeat-interval summary: per-user gaps between consecutive
    // purchases (lag window), then the DISCRETE global median gap by
    // the explicit (n+1) div 2 rank — the replenishment-cycle number
    // a retention model consumes. Gap extraction partitions by user;
    // the median rank is O(purchases), so it runs through
    // GroupedRank's two-phase global rank (range exchange + parallel
    // windows + broadcast offsets), never a "No Partition Defined"
    // window over the whole gap set.
    "q284_repeat_interval" -> ((s, d) => {
      val p = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val gaps = p
        .withColumn("prev", lag(col("us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), col("event_id"),
          expr("(us - prev) div 1000000").as("gap_s"))
      val tot = gaps.agg(count(lit(1)).as("n"))
      // event_id tiebreak makes the rank order TOTAL (two equal gaps
      // of one user are otherwise interchangeable — value-identical
      // output, but GroupedRank's totality guard rightly objects)
      graft.operators.GroupedRank.withGlobalRank(gaps,
          Seq(col("gap_s"), col("user_id"), col("event_id")), "rn")
        .crossJoin(broadcast(tot))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("n").cast("long").as("n_gaps"),
          col("gap_s").as("median_gap_s"))
    }),

    // q132's attribution core through the NATIVE as-of operator —
    // the custom LogicalPlan + Strategy + SparkPlan path (one
    // sort-merge walk with O(1) state per partition; exchange+sort
    // per side and nothing else) instead of the union+window
    // composition. Same oracle discipline as every as-of: the SQL
    // side replays latest-earlier with a pair join + rank, so the
    // driver gates the native exec's OUTPUT, not just its specs.
    "q280_asof_native" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      graft.plans.NativeAsOfJoin.latestEarlier(purchases, clicks,
          "user_id", "ts", "c_user", "c_ts", Seq("c_id"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("c_id"))
    }),

    // Nearest-event attribution — the BIDIRECTIONAL as-of: for every
    // purchase, the click closest in time in EITHER direction (tie →
    // the earlier one). Built by CHAINING the native as-of exec once
    // backward and once forward (q291's composition trick: step 2's
    // left key/ts are step 1's pass-throughs), then a pure projection
    // picks the closer candidate — two merge walks, O(1) state, no
    // pair explosion and no |Δt| window. The oracle replays both
    // directions with rank-1 windows and the same tie rule, so the
    // driver gates the chained exec's output exactly.
    "q315_asof_nearest" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val back = graft.plans.NativeAsOfJoin.latestEarlier(purchases, clicks,
        "user_id", "ts", "cu", "c_ts", Seq("c_id", "c_ts"))
        .withColumnRenamed("c_id", "b_id").withColumnRenamed("c_ts", "b_ts")
      val both = graft.plans.NativeAsOfJoin.earliestLater(back, clicks,
        "user_id", "ts", "cu", "c_ts", Seq("c_id", "c_ts"))
        .withColumnRenamed("c_id", "f_id").withColumnRenamed("c_ts", "f_ts")
      val bDelta = unix_micros(col("ts")) - unix_micros(col("b_ts"))
      val fDelta = unix_micros(col("f_ts")) - unix_micros(col("ts"))
      val pickBack = col("b_ts").isNotNull &&
        (col("f_ts").isNull || bDelta <= fDelta)
      both.select(col("event_id"), col("user_id"),
        when(pickBack, col("b_id")).otherwise(col("f_id")).as("near_id"),
        when(pickBack, -bDelta).otherwise(fDelta).cast("long").as("delta_us"))
    }),

    // Out-of-orderness audit — the measurement that SIZES a
    // watermark before anyone picks "1 hour" by folklore: per event
    // (in event_id arrival order per user), lateness = running max
    // event-time so far MINUS this event's time; bucketed into a
    // log2-seconds histogram (q305's binary-string trick — no float
    // log) plus the on-time count at bucket -1. The fixture's
    // arrival order is already time-sorted per user, so lateness is
    // SIMULATED in-query (the q306/q287 trick): every 97th event_id
    // arrives with its clock pulled back 1..1000 MINUTES (minutes,
    // not seconds — per-user inter-event gaps swallow a seconds-scale
    // pullback and the late path would fire only a handful of times)
    // — the detector must find exactly those, at every SF. One
    // per-user window (corpus-keyed, parallel), then a
    // histogram-sized aggregate.
    "q323_ooo_audit" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d).events
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) -
            when(col("event_id") % 97 === 0,
              (col("event_id") % 1000 + 1) * 60000000L).otherwise(0L))
            .as("us"))
        .withColumn("hwm", max(col("us")).over(w))
        .withColumn("late_s",
          when(col("hwm").isNull || col("hwm") <= col("us"), lit(-1L))
            .otherwise(expr("(hwm - us) div 1000000")))
        .withColumn("bucket",
          when(col("late_s") <= 0, lit(-1L))
            .otherwise((length(bin(col("late_s"))) - 1).cast("long")))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_events"),
          max(col("late_s")).as("max_late_s"))
    }),

    // Session-concurrency sweep line — the capacity question behind
    // every "how many users are on RIGHT NOW" dashboard: sessions
    // (q51's 30-min-gap machinery) become ±1 edge events at their
    // [start, end+1µs) bounds, the global running sum of deltas over
    // the (t, delta, user, sid) TOTAL order is the live concurrency,
    // and per-day maxima summarize it. The running sum is
    // GroupedRank.withRunningTotal — range exchange + P parallel
    // cumsums + broadcast ≤P-row prefix offsets — never a one-task
    // "No Partition Defined" window; edge volume is 2·sessions, two
    // orders below the event count.
    "q324_session_concurrency" -> ((s, d) => {
      val sess = withSessionIds(Tables(s, d).events)
        .groupBy(col("user_id"), col("sid"))
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          (max(unix_micros(col("ts"))) + 1L).as("e_us"))
      val edges = sess.select(col("user_id"), col("sid"),
          explode(array(
            struct(col("s_us").as("t_us"), lit(1L).as("delta")),
            struct(col("e_us").as("t_us"), lit(-1L).as("delta")))).as("e"))
        .select(col("e.t_us").as("t_us"), col("e.delta").as("delta"),
          col("user_id"), col("sid"))
      graft.operators.GroupedRank.withRunningTotal(edges,
          Seq(col("t_us"), col("delta"), col("user_id"), col("sid")),
          col("delta"), "conc")
        .groupBy(expr("t_us div 86400000000").as("epoch_day"))
        .agg(max(col("conc")).as("max_concurrent"),
          count(lit(1)).as("n_edges"))
    }),

    // Event-mix Gini impurity per user — the engagement-diversity
    // feature beside q318's class weights: impurity
    // = 1 − Σ share², computed in exact integer permille
    // ((n²−Σc²)·1000 div n², no float shares), then a histogram over
    // permille-centile buckets. Two key-shaped aggregates (user×type,
    // then user), output histogram-sized — the per-user frame never
    // funnels anywhere.
    "q325_type_gini" -> ((s, d) => {
      Tables(s, d).events
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
        .select(expr("((n * n - ss) * 1000) div (n * n)").as("gini_pm"))
        // div 10 buckets: the synthetic users cluster inside one
        // permille centile (764..799 at sf0.01), so centile buckets
        // would collapse the histogram to a single row
        .groupBy(expr("gini_pm div 10").as("bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("gini_pm")).as("min_pm"), max(col("gini_pm")).as("max_pm"))
    }),

    // Incremental aggregate maintenance — the materialized-view
    // refresh algebra every warehouse lives on: the pre-cutoff BASE
    // aggregate is built once and STORED (parquet scratch, like
    // q150's layout copies), the refresh scans ONLY the delta
    // partition and merges partials by algebraic addition (count and
    // sum are mergeable; a full-outer union-aggregate re-derives the
    // exact full-history aggregate). The oracle recomputes from
    // scratch — the gate proves delta + stored base ≡ full rescan.
    "q326_incremental_agg" -> ((s, d) => {
      // scratch path carries the PID: keyed on the data dir alone,
      // two concurrent JVMs on the same fixture (Verify and Bench
      // side by side) would race an overwrite against a read
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-q326-" + Integer.toHexString(d.hashCode) +
          "-p" + ProcessHandle.current().pid()).toString
      val cutoff = lit("1999-01-01").cast("timestamp")
      val o = Tables(s, d).orders
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      o.filter(col("o_orderdate") < cutoff)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .write.mode("overwrite").parquet(dir)
      val base = s.read.parquet(dir)
      val delta = o.filter(col("o_orderdate") >= cutoff)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      base.unionByName(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n")).cast("long").as("n_orders"),
          sum(col("cents")).cast("long").as("cents"))
    }),

    // k-anonymity audit — the privacy gate a dataset release runs
    // before shipping quasi-identifiers: for each k in {2, 5, 10,
    // 20}, how many (nation, segment) equivalence classes have
    // fewer than k members, and how many rows sit in them (the
    // re-identification exposure). One QI-shaped aggregate, a 4-way
    // bounded fan-out of the group-size frame, verdicts k-sized —
    // output shape is constant at every SF even when violations
    // vanish at scale.
    "q328_k_anonymity" -> ((s, d) => {
      Tables(s, d).customer
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .select(col("n"), explode(array(
          lit(2L), lit(5L), lit(10L), lit(20L))).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < col("k"), 1L).otherwise(0L))
            .cast("long").as("n_violating_groups"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            .cast("long").as("n_rows_at_risk"))
    }),

    // Lang×source independence screen — the corpus-mix audit that
    // catches "source X is quietly all-German" before training: the
    // contingency matrix of (lang, source) with each cell's signed
    // deviation from independence, (o·N − r·c)·1000 div (r·c), in
    // exact integer permille (the chi-square direction without the
    // float square). One doc-shaped aggregate; margins are broadcast
    // frames; the 5×20 matrix is the output.
    "q329_lang_source_matrix" -> ((s, d) => {
      val o = Tables(s, d).documents
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      val r = o.groupBy(col("lang")).agg(sum(col("o")).as("r"))
      val c = o.groupBy(col("source")).agg(sum(col("o")).as("c"))
      val n = o.agg(sum(col("o")).as("n"))
      o.join(broadcast(r), "lang").join(broadcast(c), "source")
        .crossJoin(broadcast(n))
        .select(col("lang"), col("source"), col("o"),
          expr("((o * n - r * c) * 1000) div (r * c)").as("dev_pm"))
    }),

    // Rate-limit audit — the abuse/bot screen an ingest gate runs:
    // an event is OVER-RATE when its user produced more than 5
    // events in the trailing 10 minutes (value-RANGE frame over µs,
    // tie-consistent by construction: equal timestamps share a
    // frame). Per event type: total, over-rate count, and the
    // worst burst. The window is user-keyed (parallel at any scale);
    // the output is type-sized.
    "q330_rate_audit" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-599999999L, 0)
      Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("in_win", count(lit(1)).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("in_win") > 5, 1L).otherwise(0L))
            .cast("long").as("n_over_rate"),
          max(col("in_win")).as("max_in_window"))
    }),

    // Functional-dependency audit — the column-dependency profiler
    // beside q276's key-grain test: does LHS determine RHS? Four
    // candidate FDs over the fact tables (two that hold, two that
    // don't), each one distinct-project + per-LHS distinct-RHS count
    // + a 1-row verdict — violations counted, not just flagged, so
    // the report ranks cleanup effort. Scale shape: every audit
    // shuffles (lhs, rhs) pairs once; verdicts are count-sized.
    "q319_fd_audit" -> ((s, d) => {
      val t = Tables(s, d)
      def audit(fd: String, pairs: DataFrame): DataFrame =
        pairs.toDF("lhs", "rhs").distinct()
          .groupBy(col("lhs")).agg(count(lit(1)).as("n_rhs"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(fd).as("fd"), col("n_lhs"),
            col("n_violating").cast("long").as("n_violating"),
            (col("n_violating") === 0).as("holds"))
      audit("l_orderkey,l_linenumber->l_partkey",
          t.lineitem.select(concat_ws(":", col("l_orderkey"),
            col("l_linenumber")), col("l_partkey").cast("string")))
        .unionByName(audit("l_orderkey->l_returnflag",
          t.lineitem.select(col("l_orderkey").cast("string"),
            col("l_returnflag"))))
        .unionByName(audit("o_orderkey->o_orderpriority",
          t.orders.select(col("o_orderkey").cast("string"),
            col("o_orderpriority"))))
        .unionByName(audit("o_custkey->o_orderpriority",
          t.orders.select(col("o_custkey").cast("string"),
            col("o_orderpriority"))))
    }),

    // Top session paths — the path-analysis report behind every
    // "how do users reach purchase" dashboard (q232 counts single
    // transitions; this ranks PREFIX PATHS): per session, the first
    // three event types in time order joined with '>', then the
    // 10 most common paths with exact session counts. Session
    // assignment shares q51's machinery; the per-session sequence is
    // a sort_array(collect_list) aggregate (bounded by the 3-prefix),
    // and the ranking is a 10-row TakeOrdered — never a global sort.
    "q320_session_paths" -> ((s, d) => {
      val paths = withSessionIds(Tables(s, d).events)
        .groupBy(col("user_id"), col("sid"))
        .agg(sort_array(collect_list(struct(
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type")))).as("seq"))
        .select(concat_ws(">",
          expr("transform(slice(seq, 1, 3), x -> x.event_type)")).as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(10)
    }),

    // Grain-uniqueness audit — the dbt-style "is this key actually
    // the table's grain?" test, run for candidate grains of the
    // lineitem fact: rows, distinct keys, and keys carrying
    // duplicates for (l_orderkey) — NOT the grain — vs
    // (l_orderkey, l_linenumber) — the true grain, 0 dups. One
    // aggregate per candidate; verdicts are counts, so a load that
    // silently double-writes fails the gate loudly.
    "q276_grain_audit" -> ((s, d) => {
      val li = Tables(s, d).lineitem
      def audit(grain: String, keyed: DataFrame): DataFrame =
        keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_keys"))
          .select(lit(grain).as("grain"),
            col("n_rows").cast("long").as("n_rows"), col("n_keys"),
            col("n_dup_keys").cast("long").as("n_dup_keys"))
      audit("l_orderkey",
          li.select(col("l_orderkey").cast("string").as("k")))
        .unionByName(audit("l_orderkey+l_linenumber",
          li.select(concat_ws(":", col("l_orderkey"),
            col("l_linenumber")).as("k"))))
    }),

    // Compaction planner — q164 executes compaction, this PLANS it
    // fleet-wide from metadata-sized aggregates: per source, total
    // char mass, the 64 KiB-target file count ceil(chars/65536) (as
    // the integer (chars + 65535) div 65536), and rows per planned
    // file — the small-files report an object-store lake runs before
    // every rewrite. One tiny aggregate; no data moves to plan.
    "q277_file_plan" -> ((s, d) => {
      Tables(s, d).documents
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(col("source"), col("n_docs"),
          col("total_chars").cast("long").as("total_chars"),
          expr("(total_chars + 65535) div 65536").as("planned_files"),
          expr("n_docs div greatest(1L, (total_chars + 65535) div 65536)")
            .as("docs_per_file"))
    }),

    // Period-over-period reporting: monthly revenue with
    // month-over-month and year-over-year deltas in exact permille
    // (delta·1000 div prior) — the growth lens every finance rollup
    // ships. Two lag() picks over one month-ordered window per
    // metric; months are few, so the unpartitioned window is
    // metadata-sized at any corpus scale.
    "q278_period_over_period" -> ((s, d) => {
      val monthly = Tables(s, d).orders
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum(col("cents")).as("rev_cents"))
      val w = Window.orderBy(col("month"))
      monthly
        .withColumn("prev_m", lag(col("rev_cents"), 1).over(w))
        .withColumn("prev_y", lag(col("rev_cents"), 12).over(w))
        .select(col("month"), col("rev_cents"),
          expr("CASE WHEN prev_m IS NULL OR prev_m = 0 THEN NULL " +
            "ELSE ((rev_cents - prev_m) * 1000) div prev_m END").as("mom_pm"),
          expr("CASE WHEN prev_y IS NULL OR prev_y = 0 THEN NULL " +
            "ELSE ((rev_cents - prev_y) * 1000) div prev_y END").as("yoy_pm"))
    }),

    // Bounce-rate KPI: share of single-event sessions per day, in
    // exact permille — the engagement headline a product dashboard
    // derives from q51's sessionization. Session sizing is one
    // user-partitioned aggregate; the daily rollup keys on the
    // session's start date.
    "q279_bounce_rate" -> ((s, d) => {
      withSessionIds(Tables(s, d).events)
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_ev"), min(col("ts")).as("start_ts"))
        .groupBy(date_format(col("start_ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"))
        .select(col("day"), col("n_sessions"),
          col("n_bounce").cast("long").as("n_bounce"),
          expr("(n_bounce * 1000) div n_sessions").as("bounce_pm"))
    }),

    // Order-independent table fingerprints — the state-compare
    // primitive behind "did anything change since the last run?"
    // incremental orchestration: per table, row count + a checksum
    // that is the SUM of 24-bit md5 integers over an engine-stable
    // canonical row string (key + an integer-stable content column —
    // never raw doubles, whose to-string rendering differs across
    // engines). Sum is commutative, so the checksum needs no global
    // sort at any scale; 6 independent one-row aggregates union.
    "q273_table_fingerprint" -> ((s, d) => {
      val t = Tables(s, d)
      def fp(name: String, df: DataFrame, canonical: org.apache.spark.sql.Column): DataFrame =
        df.select(canonical.as("__c"))
          .select(expr(
            "CAST(conv(substr(md5(__c), 1, 6), 16, 10) AS BIGINT)").as("u"))
          .agg(count(lit(1)).as("n_rows"), sum(col("u")).as("checksum"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("checksum").cast("long").as("checksum"))
      fp("region", t.region, col("r_regionkey").cast("string"))
        .unionByName(fp("nation", t.nation, col("n_nationkey").cast("string")))
        .unionByName(fp("customer", t.customer,
          concat_ws(":", col("c_custkey"), col("c_nationkey"))))
        .unionByName(fp("orders", t.orders,
          concat_ws(":", col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long"))))
        .unionByName(fp("lineitem", t.lineitem,
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))))
        .unionByName(fp("documents", t.documents,
          concat_ws(":", col("doc_id"), col("n_chars"))))
    }),

    // OHLC bar building — the time-series downsampling every
    // tick-to-candle pipeline runs: per (type, hour) bucket, open =
    // first value, high/low = extremes, close = last value, plus
    // tick volume. First/last are row_number window picks under the
    // (ts, event_id) total order (engine first()/arg_min conventions
    // differ, explicit ranks never do), folded into ONE per-bucket
    // aggregate via rank-gated min/max. Buckets parallelize freely;
    // all values integer cents.
    "q272_ohlc_bars" -> ((s, d) => {
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("bar", date_trunc("hour", col("ts")))
      val wA = Window.partitionBy(col("event_type"), col("bar"))
        .orderBy(col("ts"), col("event_id"))
      val wD = Window.partitionBy(col("event_type"), col("bar"))
        .orderBy(col("ts").desc, col("event_id").desc)
      base.withColumn("ra", row_number().over(wA))
        .withColumn("rd", row_number().over(wD))
        .groupBy(col("event_type"),
          date_format(col("bar"), "yyyy-MM-dd HH:00").as("bar_hr"))
        .agg(min(when(col("ra") === 1, col("cents"))).as("open"),
          max(col("cents")).as("high"), min(col("cents")).as("low"),
          min(when(col("rd") === 1, col("cents"))).as("close"),
          count(lit(1)).as("n_ticks"))
    }),

    // CUSUM changepoint detection on the daily event-count series,
    // per event type — the drift-localization twin of q194's anomaly
    // flags: the changepoint is the day maximizing |S_i|, S_i =
    // cum_i − i·total/n (cumulative deviation from the constant-rate
    // null). Multiplying through by n keeps everything integer:
    // dev_i = |n·cum_i − i·total| (bounded by n·total ≈ 3.7e15 at
    // 1e12 events × 10 y of days — inside int64), so the argmax is
    // bitwise-stable across engines. Two key-partitioned window
    // passes + one rank; series parallelize by type.
    "q261_cusum_changepoint" -> ((s, d) => {
      val daily = Tables(s, d).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val tot = Window.partitionBy(col("event_type"))
      val scored = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("cnt")).over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(tot).cast("long"))
        .withColumn("total", sum(col("cnt")).over(tot).cast("long"))
        .withColumn("dev", abs(col("cum") * col("n") - col("i") * col("total")))
      val best = Window.partitionBy(col("event_type"))
        .orderBy(col("dev").desc, col("day"))
      scored.withColumn("rk", row_number().over(best))
        .filter(col("rk") === 1)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
          col("dev").as("n_scaled_dev"), col("n"), col("total"))
    }),

    // Last-touch ad attribution: each purchase attributed to the
    // same user's LATEST click at or before it, but only within a
    // 24 h lookback — the as-of join operator plus the lookback
    // fence. Purchases with no (recent-enough) click stay rows with
    // attributed = false: unattributed conversions are a KPI, not a
    // dropped row.
    "q132_attribution" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      AsOfJoin.latestEarlier(purchases, clicks,
        leftKey = col("user_id"), leftTs = col("ts"),
        rightKey = col("c_user"), rightTs = col("c_ts"),
        rightValueCols = Seq("c_id", "c_ts"))
        .withColumn("in_window",
          col("c_id").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("c_ts")) <= 86400000000L)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          when(col("in_window"), col("c_id")).as("click_id"),
          col("in_window").as("attributed"))
    }),

    // Market-basket pairs at session grain: which event types
    // co-occur in one session. Distinct (user, session, type) first
    // — the only corpus-sized shuffle — then a per-session self-join
    // over ≤ |type| rows each, counted across sessions.
    "q133_basket_pairs" -> ((s, d) => {
      val st = withSessionIds(Tables(s, d).events)
        .select(col("user_id"), col("sid"), col("event_type")).distinct()
      val a = st.select(col("user_id"), col("sid"), col("event_type").as("type_a"))
      val b = st.select(col("user_id"), col("sid"), col("event_type").as("type_b"))
      a.join(b, Seq("user_id", "sid"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_sessions"))
    }),

    // C4-style corpus filter rules, each emitted as its own verdict
    // column (a release pipeline reports per-rule attrition, not
    // just the final keep): token-count floor, mean-word-length
    // band, stopword evidence, metadata language gate. Exact
    // rational compares; row-local, whole-stage codegen.
    "q134_c4_filters" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val meanLen = length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(toks).cast("double")
      val stopHits = expr(
        "size(filter(split(text, ' '), t -> t IN ('the','a','of','and','to')))")
      Tables(s, d).documents.select(col("doc_id"),
        (size(toks) >= 30).as("len_ok"),
        (meanLen >= 3.0 && meanLen <= 5.0).as("wordlen_ok"),
        (stopHits >= 1).as("stopword_ok"),
        (col("lang") === "en").as("lang_ok"))
        .withColumn("keep",
          col("len_ok") && col("wordlen_ok") && col("stopword_ok") && col("lang_ok"))
    }),

    // Correlated EXISTS, decorrelated into the aggregate form that
    // scales: "orders with a lineitem shipped > 60 days after the
    // order date" — instead of a per-row subquery (or a non-equi
    // semi join, which Spark can only nested-loop), pre-aggregate
    // the fact to max(l_shipdate) per order and equi-join. Same
    // result set as EXISTS, one hash aggregate + one equi-join.
    "q135_exists_decorrelated" -> ((s, d) => {
      val t = Tables(s, d)
      val latest = t.lineitem.groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("max_ship"))
      t.orders.join(latest, col("o_orderkey") === col("l_orderkey"))
        .filter(col("max_ship") > to_timestamp(col("o_orderdate")) +
          expr("INTERVAL 60 DAYS"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"))
    }),

    // Time-series gap filling: the complete daily spine per user
    // over that user's own active range, missing days zero-filled —
    // the resample step before any window/trend computation.
    // sequence() is a bounded narrow generator (≤ the date range);
    // the daily counts are the only shuffle.
    "q136_gap_fill" -> ((s, d) => {
      val daily = Tables(s, d).events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"))
    }),

    // MapType surface: per-user (event_type → count) maps built with
    // map_from_entries, thresholded with the higher-order map_filter,
    // and exploded back to rows. The map content is order-insensitive
    // (collect_list order nondeterminism cannot leak), so the
    // flattened result oracles as plain GROUP BY ... HAVING.
    "q138_map_ops" -> ((s, d) => {
      val counts = Tables(s, d).events
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
          .as("m"))
        .select(col("user_id"),
          explode(map_filter(col("m"), (_, v) => v >= 3)))
        .select(col("user_id"), col("key").as("event_type"), col("value").as("n"))
    }),

    // VARIANT table function (q148 is scalar variant_get; this
    // FLATTENS): a semi-structured tag array parsed once into a
    // binary variant, then LATERAL variant_explode walks the array
    // WITHOUT re-parsing per element — position-preserving, typed
    // extraction per entry. variant_explode is a TABLE function
    // (FROM-clause only), so the query goes through a temp view +
    // SQL. Oracle rebuilds the long form relationally (lossless).
    "q224_variant_explode" -> ((s, d) => {
      Tables(s, d).documents
        .select(col("doc_id"),
          to_json(struct(array(
            struct(lit("lang").as("k"), col("lang").as("v")),
            struct(lit("src").as("k"), col("source").as("v"))).as("tags")))
            .as("j"))
        .createOrReplaceTempView("graft_q224_tags")
      s.sql("""
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               variant_get(value, '$.k', 'string') AS k,
               variant_get(value, '$.v', 'string') AS v
        FROM graft_q224_tags,
        LATERAL variant_explode(variant_get(parse_json(j), '$.tags'))""")
    }),

    // Map re-keying / re-valuing (q138 builds + filters; this
    // REWRITES): transform_keys and transform_values run inside the
    // map without exploding it — the per-key normalization pass a
    // map-typed feature column needs. Exploded afterwards only for
    // the row-sorting oracle; integer values keep it hash-exact.
    "q212_map_transform" -> ((s, d) => {
      val counts = Tables(s, d).events
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
          .as("m"))
        .select(col("user_id"),
          explode(
            transform_values(
              transform_keys(col("m"), (k, _) => upper(k)),
              (_, v) => v * 2L)))
        .select(col("user_id"), col("key").as("event_type"),
          col("value").as("n2"))
    }),

    // Unpivot (melt) — the inverse of q49's pivot, via the native
    // Dataset.unpivot operator. Zero cells materialized by the pivot
    // become explicit rows, so the oracle is the dates × types spine
    // left-joined to the counts.
    "q139_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables(s, d).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .pivot("event_type", types).count()
      val filled = pivoted.select(col("d") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
      filled.unpivot(Array(col("d")), types.map(col).toArray, "event_type", "n")
    }),

    // Gaps-and-islands: maximal runs of consecutive same-type events
    // per user via the rn − rn_by_type island key (two parallel
    // windows over the same partition ordering — no extra shuffle
    // beyond the user partition). Emits one row per run.
    "q140_event_runs" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wt = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, d).events
        .withColumn("rn", row_number().over(w))
        .withColumn("rnt", row_number().over(wt))
        .withColumn("island", col("rn") - col("rnt"))
        .groupBy(col("user_id"), col("event_type"), col("island"))
        .agg(count(lit(1)).cast("long").as("run_len"),
          min(col("event_id")).as("first_event"))
        .select(col("user_id"), col("event_type"), col("run_len"),
          col("first_event"))
    }),

    // Exact money arithmetic in DECIMAL: inputs cast to decimal
    // BEFORE any arithmetic, so products and sums are exact base-10
    // — no float accumulation order, no round(x, k) discipline
    // needed. The contrast operator to the double+round recipes:
    // this is how a financial pipeline sums revenue. The wide-decimal
    // sums are EMITTED AS STRING (fixed scale, both engines render
    // identical digits) — DECIMAL(38,x) has no hash-stable native
    // representation across engines (pandas coerces it to float64).
    "q142_decimal_agg" -> ((s, d) => {
      val p = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(4,2)")
      Tables(s, d).lineitem
        .select(col("l_returnflag"), p.as("p"), (p * (lit(1) - disc)).as("rev"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("p")).cast("decimal(38,2)").cast("string").as("sum_price"),
          sum(col("rev")).cast("decimal(38,4)").cast("string").as("sum_rev"),
          count(lit(1)).as("n"))
    }),

    // Malformed-record handling on ingest: a JSONL staging of the
    // corpus with a deterministic 10% of lines corrupted, read back
    // PERMISSIVE with a corrupt-record column — the quarantine
    // pattern every ingest pipeline needs (bad rows counted and
    // kept, never silently dropped). Oracle recomputes the planted
    // corruption rule from the clean table.
    "q147_corrupt_records" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-q147-" + Integer.toHexString(d.hashCode)).toString
      Tables(s, d).documents.select(
        when(pmod(col("doc_id"), lit(10)) === 7,
          concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"n_tokens\": #broken")))
          .otherwise(to_json(struct(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))))
          .as("value"))
        .write.mode("overwrite").text(dir)
      s.read.schema("doc_id LONG, n_tokens LONG, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
        .agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
          sum(when(col("_corrupt_record").isNull, col("n_tokens"))
            .otherwise(0L)).as("good_tokens"))
    }),

    // Spark 4 VARIANT: semi-structured props parsed once into the
    // binary variant encoding, typed extraction via variant_get —
    // the schema-on-read path that replaces per-query JSON string
    // parsing. Oracle: DuckDB's JSON extraction over the same
    // strings.
    "q148_variant_json" -> ((s, d) =>
      Tables(s, d).events
        .select(expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))),

    // Running distinct count over a window — DISTINCT isn't legal in
    // window frames, so this is the standard first-occurrence-flag
    // construction: rank within (user, type) marks the first sight,
    // a running sum of flags over the user timeline counts the
    // distinct types seen so far. Both engines build it identically.
    "q149_running_distinct" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, d).events
        .withColumn("first_flag",
          when(row_number().over(wType) === 1, 1L).otherwise(0L))
        .withColumn("types_seen", sum(col("first_flag")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("types_seen"))
    }),

    // Dynamic partition pruning: the fact is laid out partitioned by
    // day; the dim side (top-5 busiest days) is only known at
    // RUNTIME, so static pruning can't help — Spark injects a
    // dynamic-pruning subquery into the partitioned scan (reusing
    // the broadcast), and only 5 of the ~30 day directories are
    // read. At 100 TB this is THE mechanism that makes
    // fact-to-selective-dim joins viable on partitioned lakes.
    // PlanSpec pins the dynamicpruning expression in the scan.
    "q150_dpp" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-q150-" + Integer.toHexString(d.hashCode)).toString
      // always rewrite: a marker-file cache would go stale if the
      // source table changes under the same path
      Tables(s, d).events
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(dir)
      val fact = s.read.parquet(dir)
      val wTop = Window.orderBy(col("n").desc, col("day"))
      val top5 = Tables(s, d).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 5).select(col("day"))
      fact.join(broadcast(top5), Seq("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        // partition-column type inference may read `day` back as DATE;
        // pin the output contract to the string form either way
        .select(col("day").cast("string").as("day"),
          col("n_events"), col("total_value"))
    }),

    // Data-quality expectations: a rule suite evaluated in ONE
    // aggregation pass over the table (null checks, domain checks,
    // uniqueness, bounds), then unpivoted to a per-rule report via
    // the stack() generator. Integer observations + integer
    // thresholds — the report hash-matches; a real deployment gates
    // the pipeline on `pass`.
    "q152_expectations" -> ((s, d) => {
      val ev = Tables(s, d).events
      val agg = ev.agg(
        sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("o1"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("o2"),
        sum(when(!col("event_type").isin(
          "click", "view", "purchase", "signup", "error"), 1L)
          .otherwise(0L)).as("o3"),
        sum(when(col("value") < 0.0 || col("value").isNull, 1L)
          .otherwise(0L)).as("o4"),
        sum(when(col("user_id") < 0L, 1L).otherwise(0L)).as("o5"))
      agg.select(expr(
        """stack(5,
             'event_id_not_null', o1,
             'event_id_unique', o2,
             'event_type_in_domain', o3,
             'value_non_negative', o4,
             'user_id_non_negative', o5) AS (rule, violations)"""))
        .withColumn("pass", col("violations") === 0L)
    }),

    // Day-over-day spike detection on event volume: exact integer
    // ratio test (n·10 > prev·13 ⟺ +30%), lag over the tiny daily
    // aggregate — the alerting query every ingest pipeline runs.
    "q153_spike_detection" -> ((s, d) => {
      val daily = Tables(s, d).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day")) // daily grain: tiny window
      daily.withColumn("prev", lag(col("n"), 1).over(w))
        .select(col("day"), col("n"),
          coalesce(col("prev"), lit(0L)).as("prev"),
          (col("prev").isNotNull && col("n") * 10 > col("prev") * 13)
            .as("spike"))
    }),

    // Pipeline observability via observe()/CollectMetrics: the
    // metrics ride the SAME pass as the observed action — no second
    // scan — and surface on the driver through Observation. The gate
    // emits them as a row and oracles against direct aggregates,
    // proving the zero-extra-pass numbers are the real ones.
    "q155_observe" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation(s"q155-${d.hashCode}-${System.nanoTime}")
      val df = Tables(s, d).events.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("value") > 400.0, 1L).otherwise(0L)).as("n_high"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      df.write.mode("overwrite").format("noop").save()
      val row = obs.get
      import s.implicits._
      Seq((row("n_rows").asInstanceOf[Long], row("n_high").asInstanceOf[Long],
        row("min_id").asInstanceOf[Long], row("max_id").asInstanceOf[Long]))
        .toDF("n_rows", "n_high", "min_id", "max_id")
    }),

    // Snapshot diff — the regression-check operator for any
    // incremental pipeline: per-customer order counts at the cutoff
    // vs now, full-outer on the key, rows classified added/changed/
    // same. (removed can't occur on an append-only fact — the class
    // is still emitted by the CASE for generality.)
    "q137_snapshot_diff" -> ((s, d) => {
      val orders = Tables(s, d).orders
      val cutoff = lit("2001-06-01").cast("timestamp")
      val snapA = orders.filter(col("o_orderdate") < cutoff)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("a_cnt"))
      val snapB = orders
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("b_cnt"))
      snapA.join(snapB, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("a_cnt"), lit(0L)).as("a_cnt"),
          coalesce(col("b_cnt"), lit(0L)).as("b_cnt"))
        .withColumn("status",
          when(col("a_cnt") === 0L, "added")
            .when(col("b_cnt") === 0L, "removed")
            .when(col("a_cnt") === col("b_cnt"), "same")
            .otherwise("changed"))
    }),

    // Typed per-key imperative reduce (KeyValueGroupedDataset
    // .mapGroups — the API class between cogroup q145 and
    // transformWithState q104): each user's max inter-event gap,
    // computed by sorting the user's own timestamps in memory. The
    // group buffer is bounded by ONE user's activity (the same bound
    // sessionization already assumes), and groups process in
    // parallel after one shuffle on the key — the escape hatch shape
    // for per-entity logic SQL can't express. Oracle: the lag-window
    // formulation, proving the imperative path equals relational
    // semantics.
    "q172_max_gap" -> ((s, d) => {
      import s.implicits._
      Tables(s, d).events
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val ts = it.map(_._2).toArray
          java.util.Arrays.sort(ts)
          var maxGap = 0L
          var i = 1
          while (i < ts.length) {
            val g = ts(i) - ts(i - 1)
            if (g > maxGap) maxGap = g
            i += 1
          }
          (uid, ts.length.toLong, maxGap)
        }
        .toDF("user_id", "n_events", "max_gap_us")
    }),

    // Exact distributed moments: per-type (n, Σx, Σx², Σxy) entirely
    // in DECIMAL — the mergeable building blocks of mean, variance
    // and covariance (y = seconds into the day). Emitting the moment
    // VECTOR instead of the final float statistic is the scale form:
    // partials merge associatively across any partitioning (the
    // sketch property, but exact), and the lossy division happens
    // once at the consumer. Every value is base-10 exact →
    // hash-matchable on any engine.
    // Sequence-pattern matching (MATCH_RECOGNIZE's workhorse case):
    // sessions whose ordered event-type string matches
    // click …* purchase (sessions in this corpus cap at 3 events,
    // so a 2-step funnel is the binding pattern). The ordered
    // per-session sequence is
    // ONE array_sort over collect_list (no second window pass), the
    // pattern is a regex on the joined string — bounded by session
    // length, parallel per session. Oracle: string_agg ORDER BY over
    // the same session CTE.
    "q179_sequence_pattern" -> ((s, d) => {
      withSessionIds(Tables(s, d).events)
        .groupBy(col("user_id"), col("sid").cast("long").as("sid"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ",").as("seq"),
          count(lit(1)).as("n_events"))
        .filter(col("seq").rlike("click.*purchase"))
    }),

    // Moment sums emitted AS STRING: DECIMAL(38,x) is exact inside
    // both engines but has no hash-stable wire form (pandas/driver
    // coerces wide decimals to float64) — fixed-scale string is.
    "q173_exact_moments" -> ((s, d) => {
      val x = col("value").cast("decimal(12,2)")
      Tables(s, d).events
        .withColumn("day_us", unix_micros(col("ts")) -
          unix_micros(date_trunc("day", col("ts"))))
        // `div` (integer division) — `/` on longs is DOUBLE division
        .select(col("event_type"), x.as("x"),
          expr("day_us div 1000000").cast("decimal(10,0)").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("decimal(38,2)").cast("string").as("sum_x"),
          sum(col("x") * col("x")).cast("decimal(38,4)").cast("string")
            .as("sum_x2"),
          sum(col("x") * col("y")).cast("decimal(38,2)").cast("string")
            .as("sum_xy"))
    }),

    // Incremental aggregate maintenance (additive IVM): a
    // materialized daily rollup is refreshed by UNIONING the prior
    // run's partials with partials of only the new arrivals, then
    // re-combining — count and sum are mergeable, so the combined
    // cell equals a full recompute even when the cutoff splits a
    // day mid-stream (the cutoff here is deliberately 12:00). At
    // 100 TB the refresh cost is O(delta) + O(|cells|), never a
    // rescan of history; the oracle IS the full recompute, so the
    // gate proves merge ≡ rebuild.
    "q202_incremental_agg" -> ((s, d) => {
      val ev = Tables(s, d).events
      val cutoff = lit("2024-01-20 12:00:00").cast("timestamp")
      def partials(df: DataFrame): DataFrame = df
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      partials(ev.filter(col("ts") < cutoff))
        .unionByName(partials(ev.filter(col("ts") >= cutoff)))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("cents"))
    }),

    // IVM equivalence audit — q202 SHIPS the incremental aggregate;
    // this GATES its defining invariant: the partials-merged result
    // and a direct batch recompute, exceptAll'd in both directions,
    // must disagree on zero rows. One audit row (group counts + the
    // pinned-at-0 mismatch) — the backfill-vs-incremental
    // reconciliation every IVM deployment runs before cutover.
    "q302_ivm_audit" -> ((s, d) => {
      val ev = Tables(s, d).events
      val cutoff = lit("2024-01-20 12:00:00").cast("timestamp")
      def partials(df: DataFrame): DataFrame = df
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      val incr = partials(ev.filter(col("ts") < cutoff))
        .unionByName(partials(ev.filter(col("ts") >= cutoff)))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("cents")).cast("long").as("cents"))
      val batch = partials(ev)
      val mismatch = incr.exceptAll(batch).unionAll(batch.exceptAll(incr))
      incr.agg(count(lit(1)).as("n_groups_incr"))
        .crossJoin(broadcast(batch.agg(count(lit(1)).as("n_groups_batch"))))
        .crossJoin(broadcast(mismatch.agg(count(lit(1)).as("n_mismatch"))))
    }),

    // Distributed least squares in exact-partials form: per-type
    // regression of spend (cents) on time-of-day, emitted as the
    // EXACT decimal rationals slope = num/den, intercept = num/den
    // derived from (n, Σx, Σy, Σx², Σxy) — the q173 moment vector
    // taken to its consumer. No division, no floats: the DECIMAL
    // cross-terms are associative partials, so the same query is a
    // one-pass map-side-combined aggregate at any scale, and the
    // result hash-matches any engine bit for bit.
    "q203_regression_exact" -> ((s, d) => {
      val base = Tables(s, d).events.select(col("event_type"),
        expr("(unix_micros(ts) - unix_micros(date_trunc('DAY', ts))) div 1000000")
          .cast("decimal(18,0)").as("x"),
        round(col("value") * 100, 0).cast("decimal(18,0)").as("y"))
      base.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(18,0)").as("n"),
          sum(col("x")).cast("decimal(18,0)").as("sx"),
          sum(col("y")).cast("decimal(18,0)").as("sy"),
          sum(col("x") * col("x")).cast("decimal(18,0)").as("sxx"),
          sum(col("x") * col("y")).cast("decimal(18,0)").as("sxy"))
        .select(col("event_type"),
          // icept_num reaches ~1.27e19 — past int64 AND float64 exact
          // range, so STRING is the only hash-stable emission.
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("decimal(38,0)").cast("string").as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("decimal(38,0)").cast("string").as("slope_den"),
          (col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("decimal(38,0)").cast("string").as("icept_num"))
    }),

    // Forward as-of join (earliest-later): each click matched to the
    // FIRST purchase at-or-after it by the same user — time-to-
    // convert, the mirror of q132's last-touch attribution. Same
    // union+window shape (one shuffle over |C|+|P|, no pair
    // explosion); the 24 h horizon filters after the match, which is
    // equivalent because the earliest later purchase is the only
    // candidate that could sit inside the window.
    "q204_asof_forward" -> ((s, d) => {
      val ev = Tables(s, d).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("cts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), unix_micros(col("ts")).as("pts"))
      AsOfJoin.earliestLater(clicks, purchases,
        leftKey = col("user_id"), leftTs = col("cts"),
        rightKey = col("p_user"), rightTs = col("pts"),
        rightValueCols = Seq("purchase_id", "pts"))
        .filter(col("pts").isNotNull &&
          col("pts") <= col("cts") + lit(86400000000L))
        .select(col("click_id"), col("purchase_id"),
          (col("pts") - col("cts")).as("latency_us"))
    }),

    // FIRST-touch attribution (q132 is last-touch): each purchase
    // credited to the EARLIEST click inside its trailing 24 h fence.
    // "Earliest within a window" has no carry-forward form, so the
    // scale shape is a BANDED temporal join: clicks keyed by 24 h
    // bucket, each purchase probes exactly two buckets (its own +
    // the previous), fence filter, then min((cts, click_id)) per
    // purchase — bounded fan-out of 2, no range explosion.
    // Unattributed purchases stay as rows (left join back).
    "q221_first_touch" -> ((s, d) => {
      val B = 86400000000L
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          unix_micros(col("ts")).as("cts"))
        .withColumn("bkt", expr(s"cts div $B"))
      val probes = purchases
        .withColumn("bkt", explode(array(expr(s"pts div $B"),
          expr(s"pts div $B - 1"))))
      val first = probes
        .join(clicks, col("c_user") === col("user_id") &&
          probes("bkt") === clicks("bkt") &&
          col("cts") >= col("pts") - B && col("cts") <= col("pts"))
        .groupBy(col("event_id"))
        .agg(min(struct(col("cts"), col("c_id"))).as("fc"))
        .select(col("event_id").as("m_id"), col("fc.c_id").as("click_id"))
      purchases.join(first, col("event_id") === col("m_id"), "left")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id"),
          col("click_id").isNotNull.as("attributed"))
    }),

    // Share-of-total ratio metrics over the daily aggregate: each
    // (type, day) cell's share of its day and of its type as exact
    // int/int rationals — window sums over the CELL table (days ×
    // types rows), never a second pass over the fact.
    "q222_share_ratios" -> ((s, d) => {
      val daily = Tables(s, d).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val wd = Window.partitionBy(col("day"))
      val wt = Window.partitionBy(col("event_type"))
      daily
        .withColumn("day_total", sum(col("n")).over(wd))
        .withColumn("type_total", sum(col("n")).over(wt))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          (col("n").cast("double") / col("day_total").cast("double"))
            .as("share_of_day"),
          (col("n").cast("double") / col("type_total").cast("double"))
            .as("share_of_type"))
    }),

    // Association metrics over the session baskets (q133 emits raw
    // pair counts; this adds the DECISION numbers): support,
    // confidence and lift per type pair from session-grain
    // containment counts — lift as a single division of exact
    // integer products (q124's discipline), so the doubles
    // hash-match. All joins are broadcast-sized (|types| rows).
    "q243_basket_lift" -> ((s, d) => {
      val st = withSessionIds(Tables(s, d).events)
        .select(col("user_id"), col("sid"), col("event_type")).distinct()
      val singles = st.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_single"))
      val total = st.select(col("user_id"), col("sid")).distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val a = st.select(col("user_id"), col("sid"),
        col("event_type").as("type_a"))
      val b = st.select(col("user_id"), col("sid"),
        col("event_type").as("type_b"))
      a.join(b, Seq("user_id", "sid"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_ab"))
        .join(broadcast(singles.select(col("event_type").as("type_a"),
          col("n_single").as("n_a"))), "type_a")
        .join(broadcast(singles.select(col("event_type").as("type_b"),
          col("n_single").as("n_b"))), "type_b")
        .crossJoin(broadcast(total))
        .select(col("type_a"), col("type_b"), col("n_ab"),
          (col("n_ab").cast("double") / col("n_sessions").cast("double"))
            .as("support"),
          (col("n_ab").cast("double") / col("n_a").cast("double"))
            .as("confidence"),
          ((col("n_ab") * col("n_sessions")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("lift"))
    }),

    // Weekly cohort retention matrix (q85 is the daily form): users
    // bucketed by first-seen ISO week, activity counted per
    // (cohort, week offset) — the canonical retention triangle.
    // (user, week)-distinct is the only corpus-sized shuffle.
    "q244_weekly_cohorts" -> ((s, d) => {
      val uw = Tables(s, d).events
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      uw.join(first, "user_id")
        .withColumn("offset", expr("datediff(wk, cw) div 7").cast("long"))
        .groupBy(col("cw"), col("offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("offset"), col("n_users"))
    }),

    // RFM customer segmentation: recency / frequency / monetary
    // buckets with fixed integer thresholds (no floats — cents and
    // day counts), rolled up to segment sizes — the classic
    // lifecycle-marketing cube. One aggregate per customer, one tiny
    // rollup; the global max date broadcasts as a 1-row frame.
    "q241_rfm_segments" -> ((s, d) => {
      val o = Tables(s, d).orders
      val mx = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
      o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("f"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .crossJoin(broadcast(mx))
        .withColumn("r_days", datediff(col("mx"), col("last_d")).cast("long"))
        .withColumn("r_b",
          when(col("r_days") <= 30, 1L).when(col("r_days") <= 90, 2L)
            .otherwise(3L))
        .withColumn("f_b",
          when(col("f") >= 15, 1L).when(col("f") >= 8, 2L).otherwise(3L))
        .withColumn("m_b",
          when(col("cents") >= 200000000L, 1L)
            .when(col("cents") >= 100000000L, 2L).otherwise(3L))
        .groupBy(col("r_b"), col("f_b"), col("m_b"))
        .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents"))
    }),

    // Revenue waterfall (the TPC-H pricing decomposition as a
    // report): per ship month, gross → discount → net, entirely in
    // DECIMAL with the data's exact scales (price 2dp × discount 2dp
    // → 4dp) — base-10 exact, no float accumulation anywhere.
    "q242_revenue_waterfall" -> ((s, d) => {
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(4,2)")
      Tables(s, d).lineitem
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        // STRING emission: wide decimals have no hash-stable wire form.
        .agg(sum(price).cast("decimal(38,2)").cast("string").as("gross"),
          sum(price * disc).cast("decimal(38,4)").cast("string")
            .as("discount_amt"),
          sum(price * (lit(1).cast("decimal(3,0)") - disc))
            .cast("decimal(38,4)").cast("string").as("net"))
    }),

    // k-anonymity audit (the release-side privacy gate after q76's
    // redaction and q112's pseudonymization): quasi-identifier cells
    // (coarse user bucket × day) smaller than k = 5 are flagged for
    // suppression — publishing them would isolate individuals. One
    // aggregate over the QI projection; the suppression decision is
    // an integer compare.
    "q237_k_anonymity" -> ((s, d) => {
      Tables(s, d).events
        .select(expr("user_id div 10").as("user_bucket"),
          to_date(col("ts")).as("day"))
        .groupBy(col("user_bucket"), col("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_bucket"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          (col("n") < 5).as("suppressed"))
    }),

    // Freshness / SLA audit: per-feed (event type) last-arrival lag
    // against the newest event anywhere, stale flag at a 6 h budget
    // — the data-ops check a scheduler gates downstream jobs on.
    // Tiny aggregate + broadcast of one global row; exact integer
    // microsecond lags.
    "q234_freshness_audit" -> ((s, d) => {
      val per = Tables(s, d).events
        .groupBy(col("event_type"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("n"))
      per.crossJoin(broadcast(per.agg(max(col("last_us")).as("global_us"))))
        .select(col("event_type"), col("n"),
          (col("global_us") - col("last_us")).as("lag_us"),
          (col("global_us") - col("last_us") > 6L * 3600L * 1000000L)
            .as("stale"))
    }),

    // EWMA smoothing in exact scaled-integer form: per-user
    // exponential moving average over the trailing 8 events as a
    // numerator/denominator pair — weights 2^(7-j) over lag(cents,j),
    // denominator counting only the lags that exist. Eight codegen'd
    // lag() columns, no collect_list buffer, no float accumulation —
    // the emitted (num, den) pair is the exact rational the consumer
    // divides, so it hash-matches across engines where a float EWMA
    // never would. One window shuffle on user_id; frame cost is a
    // constant 8 regardless of history length.
    "q193_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val base = Tables(s, d).events
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val lags = (0 to 7).map(j =>
        (if (j == 0) col("cents") else lag(col("cents"), j).over(w),
          1L << (7 - j)))
      val num = lags.map { case (c, wt) => coalesce(c, lit(0L)) * lit(wt) }
        .reduce(_ + _)
      val den = lags.map { case (c, wt) =>
        when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }
        .reduce(_ + _)
      base.select(col("event_id"), col("user_id"),
        num.as("ewma_num"), den.as("ewma_den"))
    }),

    // Volume-anomaly detection by an exact integer z-test: flag
    // (type, day) cells whose count sits more than 2σ above the
    // type's daily mean, evaluated WITHOUT division or floats —
    // (n·N − S)² > 4·(N·Q − S²) over DECIMAL(38,0) cross-terms, so
    // the verdict is bitwise-reproducible in any engine. Daily
    // counts are a tiny aggregate; the stats join is broadcast-size
    // (one row per type). The DECIMAL(38) headroom keeps the squares
    // exact out to ~1e15-row days — actual 100 TB territory.
    "q194_volume_anomaly" -> ((s, d) => {
      val daily = Tables(s, d).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val dn = col("n").cast("decimal(38,0)")
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("nd"),
          sum(dn).cast("decimal(38,0)").as("s"),
          sum(dn * dn).cast("decimal(38,0)").as("q"))
      daily.join(broadcast(stats), Seq("event_type"))
        .filter(dn * col("nd") > col("s") &&
          (dn * col("nd") - col("s")) * (dn * col("nd") - col("s")) >
            lit(4) * (col("nd") * col("q") - col("s") * col("s")))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"))
    }),

    // SCD Type 2 dimension build — the change-log → validity-interval
    // transform every warehouse dimension load runs: per customer,
    // the o_orderpriority stream in (date, orderkey) order collapses
    // consecutive duplicates, each surviving change opens an interval
    // [valid_from, valid_to) closed by the NEXT change (null = the
    // current row). Two customer-keyed windows (lag to collapse,
    // lead to close) — parallel at any scale, no global sort; the
    // orderkey tie-break makes the per-key order total so the
    // collapse is deterministic in both engines.
    "q332_scd2_build" -> ((s, d) => {
      val w = Window.partitionBy(col("custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      val log = Tables(s, d).orders.select(
        col("o_custkey").as("custkey"),
        // o_orderdate is NTZ since the r8 fixture regen; the LTZ cast
        // is micros-exact because the session TZ is pinned UTC
        unix_micros(col("o_orderdate").cast("timestamp")).as("valid_from"),
        col("o_orderkey"), col("o_orderpriority").as("priority"))
      log.withColumn("prev", lag(col("priority"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("priority"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .select(col("custkey"), col("priority"), col("valid_from"),
          col("valid_to"), col("valid_to").isNull.as("is_current"))
    }),

    // Data-quality expectation suite — the dbt-test / Deequ-style
    // release gate: five declarative expectations (not-null, unique,
    // accepted-values, referential integrity, range), each one
    // aggregate (RI is an anti join), unioned into a constant-shape
    // report with violation COUNTS so cleanup effort is ranked, not
    // just flagged. Every check is a single scan + key-shaped or
    // 1-row aggregate — the report costs one pass per table at any
    // scale.
    "q333_dq_expectations" -> ((s, d) => {
      val t = Tables(s, d)
      def report(name: String, checked: DataFrame): DataFrame =
        checked.select(lit(name).as("expectation"),
          col("n_checked").cast("long").as("n_checked"),
          col("n_violations").cast("long").as("n_violations"),
          (col("n_violations") === 0).as("pass"))
      val notNull = report("orders.o_custkey not_null",
        t.orders.agg(count(lit(1)).as("n_checked"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
            .as("n_violations")))
      val unique = report("orders.o_orderkey unique",
        t.orders.agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - count_distinct(col("o_orderkey")))
            .as("n_violations")))
      val accepted = report("orders.o_orderstatus accepted_values",
        t.orders.agg(count(lit(1)).as("n_checked"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("n_violations")))
      val ri = report("orders.o_custkey ref_integrity customer",
        t.orders.agg(count(lit(1)).as("n_checked")).crossJoin(
          t.orders.join(t.customer,
            col("o_custkey") === col("c_custkey"), "left_anti")
            .agg(count(lit(1)).as("n_violations"))))
      val range = report("lineitem.l_discount range",
        t.lineitem.agg(count(lit(1)).as("n_checked"),
          sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
            .otherwise(0L)).as("n_violations")))
      notNull.unionByName(unique).unionByName(accepted)
        .unionByName(ri).unionByName(range)
    }),

    // CDC MERGE apply — the upsert/delete reconciliation every lake
    // table runs on a change feed: the change set is derived
    // deterministically from the fixtures (each customer's LATEST
    // order re-prices their balance; custkey≡0 mod 7 → DELETE,
    // ≡2 mod 7 also INSERTs a shifted new key), then applied through
    // the reusable `Cdc.applyChanges` operator (ONE key-shaped
    // full-outer join, the full MERGE matrix, property-checked in
    // CdcSpec against a reference Map fold): matched deletes drop,
    // updates re-price, inserts land with a NEW segment, untouched
    // snapshot rows survive as 'kept'. The latest-order pick is a
    // max(struct) aggregate — no window, no second shuffle.
    "q334_cdc_merge" -> ((s, d) => {
      val t = Tables(s, d)
      val snap = t.customer.select(col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
      val latest = t.orders
        .select(col("o_custkey").as("custkey"), struct(
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
          col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .as("o"))
        .groupBy(col("custkey")).agg(max(col("o")).as("m"))
        .select(col("custkey"), col("m.cents").as("new_bal"))
      val upserts = latest.select(col("custkey"),
        when(col("custkey") % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("new_bal"))
      val inserts = latest.filter(col("custkey") % 7 === 2)
        .select((col("custkey") + 1000000L).as("custkey"), lit("I").as("op"),
          col("new_bal"))
      // a CDC feed carries FULL value rows: updates re-price but keep
      // the current segment (resolved here, where the feed is built),
      // inserts land with a NEW segment
      val changes = upserts.unionByName(inserts)
        .join(snap.select(col("custkey"), col("segment").as("cur_seg")),
          Seq("custkey"), "left")
        .select(col("custkey"), col("op"),
          when(col("op") === "I", lit("NEW")).otherwise(col("cur_seg"))
            .as("segment"),
          col("new_bal").as("bal_cents"))
      graft.operators.Cdc.applyChanges(snap, changes,
        "custkey", Seq("segment", "bal_cents"))
    }),

    // Table diff — the migration-reconciliation report (data-diff):
    // version B is a deterministic in-query perturbation of the
    // customer snapshot (mod-17 rows dropped, mod-11 balances bumped,
    // mod-13 segments rewritten, mod-19 keys duplicated under a
    // shifted id), and the diff is ONE key-shaped full-outer join
    // folded into a constant-shape report: rows only in A / only in
    // B, identical rows, and per-COLUMN change counts so the report
    // says what drifted, not just that something did.
    "q335_table_diff" -> ((s, d) => {
      val a = Tables(s, d).customer.select(col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
      val b0 = a.filter(col("custkey") % 17 =!= 0)
        .select(col("custkey"),
          when(col("custkey") % 13 === 0, lit("MIGRATED"))
            .otherwise(col("segment")).as("segment"),
          when(col("custkey") % 11 === 0, col("bal_cents") + 500L)
            .otherwise(col("bal_cents")).as("bal_cents"))
      val b = b0.unionByName(a.filter(col("custkey") % 19 === 0)
        .select((col("custkey") + 2000000L).as("custkey"), col("segment"),
          col("bal_cents")))
      a.select(col("custkey"), col("segment").as("seg_a"),
          col("bal_cents").as("bal_a"))
        .join(b.select(col("custkey"), col("segment").as("seg_b"),
          col("bal_cents").as("bal_b")), Seq("custkey"), "full_outer")
        .agg(
          sum(when(col("seg_b").isNull && col("seg_a").isNotNull, 1L)
            .otherwise(0L)).cast("long").as("n_only_a"),
          sum(when(col("seg_a").isNull && col("seg_b").isNotNull, 1L)
            .otherwise(0L)).cast("long").as("n_only_b"),
          sum(when(col("seg_a").isNotNull && col("seg_b").isNotNull, 1L)
            .otherwise(0L)).cast("long").as("n_common"),
          sum(when(col("seg_a").isNotNull && col("seg_b").isNotNull &&
            col("seg_a") =!= col("seg_b"), 1L).otherwise(0L))
            .cast("long").as("n_segment_changed"),
          sum(when(col("seg_a").isNotNull && col("seg_b").isNotNull &&
            col("bal_a") =!= col("bal_b"), 1L).otherwise(0L))
            .cast("long").as("n_balance_changed"),
          sum(when(col("seg_a").isNotNull && col("seg_b").isNotNull &&
            col("seg_a") === col("seg_b") && col("bal_a") === col("bal_b"),
            1L).otherwise(0L)).cast("long").as("n_identical"))
    }),

    // Retention cohort matrix — the weekly retention triangle every
    // growth dashboard starts from (q244 assigns cohorts; this is
    // the full cohort × offset matrix): cohort = a user's first
    // active epoch-week (integer div — never engine-specific week()
    // semantics), each (cohort, offset) cell counts distinct active
    // users, and retention is exact permille of the cohort's size.
    // The (user, week)-distinct is the one corpus-sized shuffle;
    // cohorts and cell counts are key-shaped; cohort sizes join back
    // by broadcast (cohort-count rows).
    "q336_retention_matrix" -> ((s, d) => {
      val uw = Tables(s, d).events
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        // integer div — Column./ is TRUE division (would go double)
        .select(col("user_id"), expr("us div 604800000000").as("week"))
        .distinct()
      val cohort = uw.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val size = cohort.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("cohort_size"))
      uw.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("offset_w"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(size), Seq("cohort_week"))
        .select(col("cohort_week"), col("offset_w"), col("n_active"),
          expr("(n_active * 1000) div cohort_size").as("retention_pm"))
    }),

    // Session-gap sensitivity sweep — how many sessions would each
    // gap threshold produce (the parameter-sizing run behind q51's
    // fixed 30-minute gap): ONE per-user lag pass computes every
    // inter-event delta, a 4-way bounded fan-out evaluates gaps
    // {5, 15, 30, 60} min, and a session starts where the delta is
    // null or >= gap (q52's end-exclusive session_window discipline).
    // Events-per-session in exact permille. The window is user-keyed;
    // the fan-out multiplies rows 4× but stays narrow.
    "q337_gap_sweep" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val deltas = Tables(s, d).events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("delta", col("us") - lag(col("us"), 1).over(w))
      deltas.select(col("delta"),
          explode(array(lit(5L), lit(15L), lit(30L), lit(60L)))
            .as("gap_min"))
        .groupBy(col("gap_min"))
        .agg(sum(when(col("delta").isNull ||
            col("delta") >= col("gap_min") * 60000000L, 1L).otherwise(0L))
            .cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .select(col("gap_min"), col("n_sessions"), col("n_events"),
          expr("(n_events * 1000) div n_sessions").as("events_per_session_pm"))
    }),

    // Join-key skew audit — the pre-flight a 100 TB join runs before
    // picking a strategy (salt? AQE skew split? broadcast?): for
    // three join-key columns, row/key counts, the heaviest key's row
    // count, the top-10 keys' combined rows, and max-over-mean in
    // exact permille (1000 = perfectly uniform). Each column costs
    // one key-shaped aggregate + a 10-row TakeOrdered; top-10 SUMs
    // are tie-safe (equal counts at the boundary sum identically).
    "q338_join_skew_audit" -> ((s, d) => {
      val t = Tables(s, d)
      def audit(name: String, keyed: DataFrame): DataFrame = {
        val counts = keyed.toDF("k")
          .groupBy(col("k")).agg(count(lit(1)).as("c"))
        val top10 = counts.orderBy(col("c").desc, col("k")).limit(10)
          .agg(sum(col("c")).as("top10_rows"))
        counts.agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
            max(col("c")).as("max_key_rows"))
          .crossJoin(top10)
          .select(lit(name).as("key_col"), col("n_rows"), col("n_keys"),
            col("max_key_rows"), col("top10_rows").cast("long").as("top10_rows"),
            expr("(max_key_rows * n_keys * 1000) div n_rows")
              .as("max_over_mean_pm"))
      }
      audit("lineitem.l_partkey", t.lineitem.select(col("l_partkey")))
        .unionByName(audit("lineitem.l_suppkey",
          t.lineitem.select(col("l_suppkey"))))
        .unionByName(audit("orders.o_custkey",
          t.orders.select(col("o_custkey"))))
    }),

    // Winsorization at exact rank fences — outlier clipping by the
    // DEFINED quantile (value at row_number ⌈n/100⌉ / ⌊99n/100⌋ under
    // a total (cents, orderkey) order — never an interpolated float
    // percentile): the global rank rides GroupedRank's two-phase
    // range exchange, the two fence rows reduce to a 1-row broadcast
    // frame, and the clip is a narrow projection. The corpus is
    // ranked once; nothing else shuffles.
    "q339_winsorize" -> ((s, d) => {
      val o = Tables(s, d).orders.select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val ranked = graft.operators.GroupedRank.withGlobalRank(o,
        Seq(col("cents"), col("o_orderkey")), "rk")
      val n = o.agg(count(lit(1)).as("n"))
      val fences = ranked.crossJoin(broadcast(n))
        .filter(col("rk") === expr("greatest((n * 1) div 100, 1L)") ||
          col("rk") === expr("greatest((n * 99) div 100, 1L)"))
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      ranked.crossJoin(broadcast(fences))
        .select(col("o_orderkey"), col("cents"),
          greatest(least(col("cents"), col("hi")), col("lo"))
            .as("clipped_cents"),
          (col("cents") < col("lo") || col("cents") > col("hi"))
            .as("was_clipped"))
    }),

    // Conjunctive keyword search (boolean AND retrieval) — the
    // posting-list intersection beside q264's phrase search: the
    // three highest-document-frequency tokens are the query
    // (deterministic tie-break), and a doc qualifies when it
    // contains ALL three. The posting lists are restricted to the
    // three terms BEFORE any shuffle (broadcast semi join), so the
    // intersection shuffles three posting lists, never the corpus;
    // per-term hit counts ride along for ranking.
    "q340_conjunctive_search" -> ((s, d) => {
      val occ = Tables(s, d).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val terms = occ.distinct().groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(3)
        .select(col("token"))
      occ.join(broadcast(terms), "token")
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("hits"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("hits")).as("total_hits"))
        .filter(col("n_terms") === 3)
        .select(col("doc_id"), col("total_hits").cast("long").as("total_hits"))
    }),

    // Time-grid resample + LOCF — the forward-fill every feature
    // store runs to align irregular events to a model's hourly grid.
    // The machinery (span-bounded sequence grid, max(struct) last-
    // observation pick, engine-portable fill-group carry) lives in
    // the reusable `Resample.locfGrid` operator, property-checked in
    // ResampleSpec against a per-key sorted-scan reference.
    "q341_locf_resample" -> ((s, d) => {
      // single-file events arrive as ONE scan partition — the grid's
      // per-slot partial aggregate would run serial without the
      // fan-out (no-op on real multi-partition inputs)
      val ev = TextOps.parallelized(Tables(s, d).events.select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents")))
      graft.operators.Resample.locfGrid(ev, "user_id", "us", "event_id",
          "cents", slotWidth = 3600000000L)
        .select(col("user_id"), col("slot").as("hour"), col("cents"),
          col("filled"))
    }),

    // Last-touch attribution — the marketing-attribution join: every
    // purchase credits the LATEST click at-or-before it (the native
    // as-of merge walk), but only within a 7-day window — stale
    // clicks attribute to 'none'. Channel is derived from the click's
    // props k (integer bucket). One as-of walk + a narrow projection;
    // the attribution report is channel-sized.
    "q342_last_touch" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          unix_micros(col("ts")).as("c_us"),
          (get_json_object(col("props"), "$.k").cast("long") % 4)
            .as("c_chan"))
      val attributed = graft.plans.NativeAsOfJoin.latestEarlier(
          purchases, clicks, "user_id", "p_us", "c_user", "c_us",
          Seq("c_id", "c_us", "c_chan"))
        .withColumn("channel",
          when(col("c_id").isNull ||
            col("p_us") - col("c_us") > 604800000000L, lit("none"))
            .otherwise(concat(lit("ch"), col("c_chan"))))
      attributed.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).cast("long").as("cents"))
    }),

    // MAD outlier summary — robust stats beside q121's quantile
    // outliers: median and MAD at exact RANK positions ((n+1) div 2
    // under a total order — rank-defined, never an interpolated
    // float), outliers flagged by the integer 4×MAD rule. Both rank
    // picks ride GroupedRank's two-phase range exchange; each fence
    // folds to a 1-row broadcast frame; the corpus is scanned thrice
    // (rank, deviation rank, flag) with no driver-side loop.
    "q343_mad_outliers" -> ((s, d) => {
      val o = Tables(s, d).orders.select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val n = o.agg(count(lit(1)).as("n"))
      def rankPick(df: DataFrame, value: String, tie: String): DataFrame =
        graft.operators.GroupedRank.withGlobalRank(df,
            Seq(col(value), col(tie)), "rk")
          .crossJoin(broadcast(n))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .agg(min(col(value)).as(s"${value}_med"))
      val med = rankPick(o, "cents", "o_orderkey")
      val dev = o.crossJoin(broadcast(med))
        .select(col("o_orderkey"),
          abs(col("cents") - col("cents_med")).as("adev"))
      val mad = rankPick(dev, "adev", "o_orderkey")
      o.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
        .agg(count(lit(1)).as("n_orders"),
          min(col("cents_med")).as("median_cents"),
          min(col("adev_med")).as("mad_cents"),
          sum(when(abs(col("cents") - col("cents_med")) >
            lit(4L) * col("adev_med"), 1L).otherwise(0L))
            .cast("long").as("n_outliers"))
    }),

    // Seasonal-naive backtest — the forecasting baseline every
    // capacity plan starts from: predict each (type, day) count with
    // the count 7 days earlier, score per type with the exact
    // integer MAPE surrogate sum|err|·1000 div sum(actual). Daily
    // counts are a tiny key-shaped aggregate; the lag-7 lookup is a
    // self-join on (type, day−7) — no window, no corpus re-shuffle.
    "q344_seasonal_backtest" -> ((s, d) => {
      val daily = Tables(s, d).events
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
        .select(col("event_type"), expr("us div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val base = daily.select(col("event_type"),
        (col("day") + 7L).as("day"), col("n").as("pred"))
      daily.join(base, Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("n") - col("pred"))).cast("long").as("sum_abs_err"),
          sum(col("n")).cast("long").as("total_actual"))
        .select(col("event_type"), col("n_days"), col("sum_abs_err"),
          col("total_actual"),
          expr("(sum_abs_err * 1000) div total_actual").as("mape_pm"))
    }),

    // A/B experiment readout — deterministic md5 arm split (q75's
    // hash-rank discipline: first hex nibble < '8' → arm A, ≈50/50),
    // per-arm user conversion (≥1 purchase), and the two-proportion
    // z-test at |z| > 2 evaluated as ONE exact integer
    // cross-multiplication over DECIMAL(38,0):
    // (cA·nB − cB·nA)²·N > 4·c·(N−c)·nA·nB — no floats, no pooled-
    // variance division, bit-identical in any engine (q194's
    // discipline). Two user-shaped aggregates; the verdict is 1 row.
    "q345_ab_ztest" -> ((s, d) => {
      val users = Tables(s, d).events
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit("A"))
            .otherwise(lit("B")))
      val arms = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      val a = arms.filter(col("arm") === "A")
        .select(col("n_users").as("na"), col("n_conv").as("ca"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n_users").as("nb"), col("n_conv").as("cb"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      a.crossJoin(b).select(
        col("na"), col("ca").cast("long").as("ca"),
        col("nb"), col("cb").cast("long").as("cb"),
        expr("(ca * 1000) div na").as("conv_a_pm"),
        expr("(cb * 1000) div nb").as("conv_b_pm"),
        (dec(col("ca") * col("nb") - col("cb") * col("na")) *
          dec(col("ca") * col("nb") - col("cb") * col("na")) *
          dec(col("na") + col("nb")) >
          dec(lit(4)) * dec(col("ca") + col("cb")) *
            dec(col("na") + col("nb") - col("ca") - col("cb")) *
            dec(col("na")) * dec(col("nb"))).as("significant"))
    }),

    // Grouped top-k WITH TIES — the rank-semantics variant q12's
    // row_number top-k cannot express: per event type, every day
    // whose count reaches the top-3 DENSE ranks (ties all included,
    // no tie-break dropped rows). dense_rank is deterministic under
    // ties by construction; the window is type-keyed and
    // WindowGroupLimit bounds its state exactly like q12's.
    "q346_topk_ties" -> ((s, d) => {
      val daily = Tables(s, d).events
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
        .select(col("event_type"), expr("us div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc)
      daily.withColumn("rk", dense_rank().over(w).cast("long"))
        .filter(col("rk") <= 3)
    }),

    // Compaction bin-packing plan — the small-files maintenance op
    // every lake runs: monthly "files" (size = row count) packed
    // into ≈8 contiguous bins by cumulative size, bin = (running−1)
    // div target. The cumulative sum is withRunningTotal's range
    // exchange (its second production call site beside q324) — the
    // planner stays parallel even over a million-file listing; the
    // per-bin fill report is bin-sized.
    "q347_compaction_plan" -> ((s, d) => {
      val files = Tables(s, d).orders
        .select(date_format(col("o_orderdate").cast("timestamp"),
          "yyyy-MM").as("file_id"))
        .groupBy(col("file_id")).agg(count(lit(1)).as("size"))
      val total = files.agg(sum(col("size")).cast("long").as("total"))
      val planned = graft.operators.GroupedRank.withRunningTotal(
          files, Seq(col("file_id")), col("size"), "running")
        .crossJoin(broadcast(total))
        .select(col("file_id"), col("size"), col("running"),
          expr("(running - 1) div ((total + 7) div 8)").as("bin"))
      planned.groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("size")).cast("long").as("bin_rows"),
          min(col("file_id")).as("first_file"),
          max(col("file_id")).as("last_file"))
    }),

    // Join-cardinality estimation study — the optimizer-statistics
    // validation a CBO ships with: the EXACT join output size
    // Σ_k cA(k)·cB(k) (computed on the count tables — distinct-key
    // sized, the join itself never runs) vs the 64-bucket hash-
    // histogram upper bound Σ_b cA_b·cB_b, overshoot in exact
    // permille. Two joins studied; everything is count-table-sized
    // after the first aggregate — the estimator costs nothing at
    // any corpus scale.
    "q348_join_cardinality" -> ((s, d) => {
      val t = Tables(s, d)
      def study(name: String, aKeys: DataFrame, bKeys: DataFrame): DataFrame = {
        val a = aKeys.toDF("k").groupBy(col("k")).agg(count(lit(1)).as("ca"))
        val b = bKeys.toDF("k").groupBy(col("k")).agg(count(lit(1)).as("cb"))
        val exact = a.join(b, "k")
          .agg(sum(col("ca") * col("cb")).cast("long").as("exact_rows"))
        // modulo buckets, not a hash: the estimator study needs the
        // SAME binning in the DuckDB oracle, and keys are integral
        val ab = a.groupBy(pmod(col("k"), lit(64)).as("bkt"))
          .agg(sum(col("ca")).as("ca"))
        val bb = b.groupBy(pmod(col("k"), lit(64)).as("bkt"))
          .agg(sum(col("cb")).as("cb"))
        val est = ab.join(bb, "bkt")
          .agg(sum(col("ca") * col("cb")).cast("long").as("bucket_est"))
        exact.crossJoin(est).select(lit(name).as("join_name"),
          col("exact_rows"), col("bucket_est"),
          expr("((bucket_est - exact_rows) * 1000) div exact_rows")
            .as("over_pm"))
      }
      study("orders-customer",
          t.orders.select(col("o_custkey")),
          t.customer.select(col("c_custkey")))
        .unionByName(study("lineitem-orders",
          t.lineitem.select(col("l_orderkey")),
          t.orders.select(col("o_orderkey"))))
    }),

    // Keyword-in-context (KWIC) snippet extraction — the search-
    // result highlighter beside q264's phrase search and q340's
    // boolean retrieval: every occurrence of the corpus's highest-df
    // term with ±2 tokens of context. The term arrives as a 1-row
    // broadcast frame; occurrence positions and the context slices
    // are pure per-document array lambdas (1-based, bounds-clipped
    // slice — never an ANSI element_at past the end); zero corpus
    // shuffles after the df pick.
    "q349_kwic" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val term = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .distinct().groupBy(col("token")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(1)
        .select(col("token").as("term"))
      docs.crossJoin(broadcast(term))
        .select(col("doc_id"), col("term"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("term"), col("toks"),
          posexplode(col("toks")).as(Seq("p0", "token")))
        .filter(col("token") === col("term"))
        .withColumn("q", col("p0") + 1)
        .select(col("doc_id"), col("q").cast("long").as("pos"),
          concat_ws(" ", slice(col("toks"),
            greatest(col("q") - 2, lit(1)),
            col("q") - greatest(col("q") - 2, lit(1)))).as("left_ctx"),
          col("term"),
          concat_ws(" ", slice(col("toks"), col("q") + 1, lit(2)))
            .as("right_ctx"))
    }),

    // Session bounce report — the web-analytics staple on top of
    // q51's sessions: per (entry event type, exit event type),
    // session counts and the single-event bounce rate in exact
    // permille. Entry/exit picks are min/max(struct) aggregates over
    // the session grain (no second window beyond session assignment);
    // the report is type²-bounded.
    "q350_bounce_report" -> ((s, d) => {
      val sess = withSessionIds(Tables(s, d).events)
        .select(col("user_id"), col("sid"),
          struct(unix_micros(col("ts")).as("us"), col("event_id"),
            col("event_type")).as("e"))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("e")).getField("event_type").as("entry_type"),
          max(col("e")).getField("event_type").as("exit_type"),
          count(lit(1)).as("n_events"))
      sess.groupBy(col("entry_type"), col("exit_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .cast("long").as("n_bounces"))
        .select(col("entry_type"), col("exit_type"), col("n_sessions"),
          col("n_bounces"),
          expr("(n_bounces * 1000) div n_sessions").as("bounce_pm"))
    }),

    // JSON-lines source round-trip — the landing-zone format beside
    // the CSV (S1-S3) and parquet surfaces: documents written as
    // lang-partitioned JSONL (the write escapes, the read unescapes —
    // content-exact round-trip), read back with an EXPLICIT schema
    // (schema inference scans a 100 TB landing zone twice; a real
    // ingest always pins the contract), aggregated to a per-(lang,
    // source) report the oracle recomputes from the parquet truth.
    "q351_jsonl_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-q351-" + Integer.toHexString(d.hashCode) +
          "-p" + ProcessHandle.current().pid()).toString
      Tables(s, d).documents
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .write.mode("overwrite").partitionBy("lang").json(dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType)))
      s.read.schema(schema).json(dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(length(col("text"))).cast("long").as("sum_text_len"))
    }),

    // l-diversity audit — q328's k-anonymity complement: a QI class
    // is safe only if its SENSITIVE attribute is diverse too, or the
    // class re-identifies by homogeneity even at k. Per (nation,
    // segment) class: distinct balance-band sensitive values; for
    // l ∈ {2, 3, 5}, classes below l and their rows at risk. Two
    // key-shaped aggregates + the bounded l fan-out — constant-shape
    // output at every SF.
    "q352_l_diversity" -> ((s, d) => {
      val cls = Tables(s, d).customer
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("cast(round(c_acctbal * 100, 0) as bigint) div 100000")
            .as("band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("band")).as("n_distinct"))
      cls.select(col("n_rows"), col("n_distinct"),
          explode(array(lit(2L), lit(3L), lit(5L))).as("l"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n_distinct") < col("l"), 1L).otherwise(0L))
            .cast("long").as("n_below_l"),
          sum(when(col("n_distinct") < col("l"), col("n_rows"))
            .otherwise(0L)).cast("long").as("n_rows_at_risk"))
    }),

    // User-accumulation curve — the growth dashboard's cumulative
    // registered-vs-active view: per active day, new users (first-
    // ever activity), cumulative known users (withRunningTotal's
    // THIRD production call site — the range-exchange prefix sum
    // stays the one cumulative primitive), same-day actives, and
    // stickiness = actives·1000 div known. First-day assignment is a
    // min aggregate; the day frame is date-cardinality-sized.
    "q353_user_accumulation" -> ((s, d) => {
      val ud = Tables(s, d).events
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .select(col("user_id"), expr("us div 86400000000").as("day"))
        .distinct()
      val firstDay = ud.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
      val newByDay = firstDay.groupBy(col("fd").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("active_users"))
      val days = dau.join(newByDay, Seq("day"), "left")
        .select(col("day"), col("active_users"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
      graft.operators.GroupedRank.withRunningTotal(days,
          Seq(col("day")), col("new_users"), "known_users")
        .select(col("day"), col("new_users"), col("active_users"),
          col("known_users"),
          expr("(active_users * 1000) div known_users").as("stickiness_pm"))
    }),

    // Interval coalescing — the overlapping-interval merge every
    // billing/uptime/coverage report runs: each event opens a 5-min
    // activity interval, overlapping intervals fuse into islands
    // (new island ⟺ start > running max of all EARLIER ends), and
    // the per-user report counts islands and exactly-covered
    // seconds. Both windows are user-keyed; the running-max frame is
    // rows-to-previous (never the current row). NOTE the merge rule
    // at touch points: an interval starting EXACTLY at the previous
    // max end fuses into the island (start > prev_max_e is false),
    // the usual uptime/billing convention — a zero-length gap is no
    // gap. The oracle encodes the same `>` rule.
    "q354_interval_coalesce" -> ((s, d) => {
      val iv = Tables(s, d).events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) + 300000000L).as("e_us"))
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("s_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("s_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val islands = iv
        .withColumn("prev_max_e", max(col("e_us")).over(wPrev))
        .withColumn("new_island",
          when(col("prev_max_e").isNull ||
            col("s_us") > col("prev_max_e"), 1L).otherwise(0L))
        .withColumn("island", sum(col("new_island")).over(wRun))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s_us")).as("is_us"), max(col("e_us")).as("ie_us"),
          count(lit(1)).as("n_events"))
      islands.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ie_us") - col("is_us")).cast("long").as("covered_us"),
          sum(col("n_events")).cast("long").as("n_events"))
        .select(col("user_id"), col("n_islands"),
          expr("covered_us div 1000000").as("covered_sec"), col("n_events"))
    }),

    // MMR diversified re-rank — search-result diversification (and
    // the diverse-exemplar pick a training-data curator runs): the
    // top-20 docs by term relevance are greedily re-ranked, each
    // pick maximizing relevance·1000 − 50·(max token overlap with
    // anything already picked) — all integer, deterministic doc_id
    // tie-break. The corpus work (hits, candidate token sets, the
    // ≤20²-pair overlap matrix) is distributed and candidate-
    // bounded; the greedy itself folds over a ≤20-row collected
    // matrix (the bounded driver-side fetch pattern of the
    // GroupedRank offsets) and returns the 5-row ranking.
    "q355_mmr_rerank" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val occ = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      val term = occ.distinct().groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(1)
        .select(col("token").as("term"))
      val hits = occ.join(broadcast(term), col("token") === col("term"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("h"))
      val cand = hits.orderBy(col("h").desc, col("doc_id")).limit(20)
      val ct = occ.join(broadcast(cand.select(col("doc_id"))), "doc_id")
        .distinct()
      val ov = ct.toDF("da", "token")
        .join(ct.toDF("db", "token"), "token")
        .filter(col("da") =!= col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ov"))
      // bounded driver-side greedy: ≤20 candidates, ≤380 pairs
      val cands = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ovMap = ov.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      val remaining = scala.collection.mutable.LinkedHashSet(cands: _*)
      while (picks.size < 5 && remaining.nonEmpty) {
        val scored = remaining.toSeq.map { case (doc, h) =>
          val pen = if (picks.isEmpty) 0L
            else picks.map(p => ovMap.getOrElse((doc, p._2), 0L)).max
          (doc, h, h * 1000L - 50L * pen)
        }
        val best = scored.minBy { case (doc, _, score) => (-score, doc) }
        picks += (((picks.size + 1).toLong, best._1, best._2, best._3))
        remaining.filterInPlace(_._1 != best._1)
      }
      import s.implicits._
      picks.toSeq.toDF("pick", "doc_id", "hits", "score")
    }),

    // RFM segmentation — the classic customer-value grid: recency
    // (latest order day), frequency (order count), monetary (total
    // cents), each cut into quintiles by EXPLICIT integer rank math
    // ((rk−1)·5 div n + 1 over a total (metric, custkey) order — the
    // q313 decile discipline, never engine-specific ntile), combined
    // into a 3-digit segment code. Three GroupedRank range exchanges
    // over the customer aggregate; the report is segment-sized.
    "q356_rfm_segments" -> ((s, d) => {
      val rfm = Tables(s, d).orders
        .select(col("o_custkey").as("custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy(col("custkey"))
        .agg(max(expr("us div 86400000000")).as("r_day"),
          count(lit(1)).as("f_n"), sum(col("cents")).as("m_cents"))
      val n = rfm.agg(count(lit(1)).as("n"))
      def quintile(df: DataFrame, metric: String, qName: String): DataFrame =
        graft.operators.GroupedRank.withGlobalRank(df,
            Seq(col(metric), col("custkey")), "rk")
          .crossJoin(broadcast(n))
          .withColumn(qName, expr("(rk - 1) * 5 div n + 1"))
          .drop("rk", "n")
      val scored = quintile(quintile(quintile(rfm,
        "r_day", "r_q"), "f_n", "f_q"), "m_cents", "m_q")
      scored.groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
          .as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("m_cents")).cast("long").as("segment_cents"))
    }),

    // Dormancy / reactivation report — the lifecycle audit behind
    // every churn model: a reactivation is a return after >2 days of
    // inactivity (gap between consecutive ACTIVE DAYS, not raw
    // events; 2 days sits inside the fixture's gap distribution —
    // max observed gap is 3/4/6 days at sf0.001/0.01/0.1, so the
    // histogram is non-degenerate at every SF, the q323 lesson).
    // One user-keyed lag over the day-distinct frame, then a
    // histogram of per-user reactivation counts — user-shaped work,
    // histogram-sized output.
    "q357_reactivation" -> ((s, d) => {
      val ud = Tables(s, d).events
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .select(col("user_id"), expr("us div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      ud.withColumn("gap", col("day") - lag(col("day"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(sum(when(col("gap") > 2L, 1L).otherwise(0L))
          .as("n_reactivations"))
        .groupBy(col("n_reactivations"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Revenue-concentration (Lorenz) curve — "what share of revenue
    // do the top k% of customers carry": customers ranked by spend
    // DESC (descending order realized as a negated-cents total order
    // — struct-based total-order checks can't carry sort directions),
    // cumulative revenue via withRunningTotal (4th call site),
    // reported at customer deciles in exact permille. The 80/20
    // headline falls out of the decile table.
    "q358_pareto_curve" -> ((s, d) => {
      val spend = Tables(s, d).orders
        .select(col("o_custkey").as("custkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy(col("custkey")).agg(sum(col("cents")).cast("long").as("cents"))
        .withColumn("negc", -col("cents"))
      val ranked = graft.operators.GroupedRank.withGlobalRank(spend,
        Seq(col("negc"), col("custkey")), "rk")
      val run = graft.operators.GroupedRank.withRunningTotal(ranked,
        Seq(col("negc"), col("custkey")), col("cents"), "cum_cents")
      val tot = spend.agg(sum(col("cents")).cast("long").as("total"),
        count(lit(1)).as("n"))
      run.crossJoin(broadcast(tot))
        .withColumn("decile", expr("(rk - 1) * 10 div n + 1"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          max(col("cum_cents")).as("max_cum"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_customers"),
          expr("(max_cum * 1000) div total").as("cum_revenue_pm"))
    }),

    // Contributor capping — the per-author contribution limit every
    // LLM corpus applies so prolific sources can't dominate training
    // (the fairness twin of q75's global shuffle): each user keeps at
    // most 40 events, selected by md5 rank (deterministic, unbiased
    // by time or type), and the report shows per-type survival in
    // exact permille. The rank window is user-keyed — parallel at
    // any user cardinality; the cap is a rank filter, never a
    // per-user collect.
    "q359_user_cap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("h"), col("event_id"))
      Tables(s, d).events
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("h", md5(col("event_id").cast("string")))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("rk") <= 40, 1L).otherwise(0L)).cast("long")
            .as("n_kept"))
        .select(col("event_type"), col("n_events"), col("n_kept"),
          expr("(n_kept * 1000) div n_events").as("keep_pm"))
    }),

    // Schema-evolution read — the source capability a long-lived
    // lake dataset forces: generation 1 was written WITHOUT the
    // quality column, generation 2 adds it; a mergeSchema read must
    // union the schemas, surface generation-1 rows with null quality,
    // and keep the partition-discovery gen column queryable. The
    // report per generation gates exactly that contract. Scratch is
    // per-process (the q326 discipline).
    "q360_schema_evolution" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-q360-" + Integer.toHexString(d.hashCode) +
          "-p" + ProcessHandle.current().pid()).toString
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$dir/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .withColumn("quality_pm",
          expr("(n_chars * 1000) div (n_chars + 100)"))
        .write.mode("overwrite").parquet(s"$dir/gen=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .groupBy(col("gen"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("quality_pm").isNull, 1L).otherwise(0L))
            .cast("long").as("n_quality_null"),
          count_distinct(col("lang")).as("n_langs"))
        .select(col("gen").cast("long").as("gen"), col("n_docs"),
          col("n_quality_null"), col("n_langs"))
    }),

    // Exact WEIGHTED median — the inventory-valuation / price-index
    // statistic plain medians get wrong: the price at which half the
    // shipped QUANTITY sits below. Defined at exact rank (first
    // price whose cumulative weight ≥ half the total — never an
    // interpolated percentile); the cumulative weight rides
    // withRunningTotal's range exchange (5th call site), the
    // crossing row is a 1-row min-aggregate pick. Reported per
    // return flag via an integer-safe 2·cum ≥ total compare.
    "q361_weighted_median" -> ((s, d) => {
      val items = Tables(s, d).lineitem
        .select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"),
          col("l_orderkey"), col("l_linenumber"))
      // per-flag totals AND each flag's preceding-flags offset come
      // from the flag-sized aggregate (the 3-row unpartitioned window
      // is a bounded aggregate frame — the documented exception);
      // the corpus-sized running weight rides the range exchange over
      // the GLOBAL (flag, cents, line) order, and per-flag cum falls
      // out by subtracting the broadcast offset
      val tot = items.groupBy(col("flag"))
        .agg(sum(col("qty")).cast("long").as("total_qty"))
      val wOff = Window.orderBy(col("flag"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = tot.withColumn("off",
        coalesce(sum(col("total_qty")).over(wOff), lit(0L)))
      val run = graft.operators.GroupedRank.withRunningTotal(items,
        Seq(col("flag"), col("cents"), col("l_orderkey"),
          col("l_linenumber")),
        col("qty"), "cum_all")
      run.select(col("flag"), col("cents"), col("cum_all"))
        .join(broadcast(offs), "flag")
        .select(col("flag"), col("cents"), col("total_qty"),
          (col("cum_all") - col("off")).as("cum"))
        .filter(lit(2L) * col("cum") >= col("total_qty"))
        .groupBy(col("flag"))
        .agg(min(col("cents")).as("weighted_median_cents"),
          min(col("total_qty")).as("total_qty"))
    }),

    // Time-to-convert distribution — the funnel-latency histogram a
    // growth team reads next to q291's step funnel: per user, the
    // FIRST view and the FIRST purchase AFTER it (min aggregates —
    // no window over events), the gap in log2-minute buckets plus a
    // never-converted bucket (−1). User-shaped work; the histogram
    // is bucket-sized. log2 via the BINARY-STRING length (q305's
    // trick — float log2 flips at power-of-two boundaries).
    "q362_time_to_convert" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("us") >= col("v_us"))
        .groupBy(col("user_id"))
        .agg(min(col("us") - col("v_us")).as("gap_us"))
      firstView.join(conv.select(col("user_id"), col("gap_us")),
          Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("gap_us").isNull, lit(-1L))
            .otherwise((length(bin(expr("gap_us div 60000000") + 1)) - 1)
              .cast("long"))
            .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_users"))
    }),

    // Manifest-pinned snapshot read (time travel) — the lakehouse
    // primitive under every AS OF query: three append commits through
    // the reusable `operators/Manifest` (immutable vN.json manifests,
    // atomic-rename publish), and a reader pinned to v2 sees EXACTLY
    // commits 1-2 — no directory listing, no torn reads from the
    // in-flight commit 3. The manifest fetch is a bounded metadata
    // read (manifest-sized, like every table format's); the data read
    // unions only the pinned files. Scratch is per-process (q326
    // discipline), rebuilt fresh per invocation (commits are
    // errorifexists — the append-only contract).
    "q363_snapshot_read" -> ((s, d) => {
      val root = freshScratch("q363", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (1 to 3).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === (k - 1)), root, s"c$k")
      }
      graft.operators.Manifest.read(s, root, 2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Compaction REPLACE commit under snapshot isolation — the
    // maintenance leg q363's time travel was missing (r9 verdict
    // item 6): the two small member files compact into one rewritten
    // file published as a REPLACE commit (new files + new manifest,
    // nothing the old versions reference is touched), and the query
    // proves the contract end-to-end by aggregating BOTH the pinned
    // pre-compaction version and the post-compaction current version
    // and joining them — `pre_post_match` is computed from the two
    // reads, not assumed. ManifestSpec proves the stronger isolation
    // property (a pinned reader materialized AFTER the rewrite still
    // sees the old file set); file-count assertions prove the
    // compaction actually shrank the member list (3 → 2).
    "q364_compaction_commit" -> ((s, d) => {
      val root = freshScratch("q364", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (1 to 3).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === (k - 1)), root, s"c$k")
      }
      val vPre = graft.operators.Manifest.currentVersion(root) // = 3
      val small = Seq(s"$root/files/c1", s"$root/files/c2")
      val rewritten = s.read.parquet(small: _*)
      val vPost = graft.operators.Manifest.commitReplace(
        rewritten, root, small, "compact1")
      // the replace must actually compact: 3 members → 2
      require(graft.operators.Manifest.members(root, vPre).size == 3 &&
        graft.operators.Manifest.members(root, vPost).size == 2,
        "q364: replace commit did not shrink the member list 3 -> 2")
      def agg(v: Int, suffix: String) =
        graft.operators.Manifest.read(s, root, v)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as(s"n_docs$suffix"),
            sum(col("n_chars")).cast("long").as(s"sum_chars$suffix"))
      agg(vPre, "").join(agg(vPost, "_post"), Seq("lang"), "full_outer")
        .select(col("lang"), col("n_docs"), col("sum_chars"),
          (col("n_docs") === col("n_docs_post") &&
            col("sum_chars") === col("sum_chars_post")).as("pre_post_match"))
    }),

    // Copy-on-write row-level DELETE — GDPR/right-to-forget against a
    // manifest table: the predicate targets rows in ONE member file
    // (lang='de' ∧ doc_id≡0 mod 3 lives only in c1), and
    // Manifest.deleteWhere rewrites ONLY that member (bounded
    // limit(1) existence probe per member — parquet stats
    // short-circuit it at scale), so at 100 TB the delete pays for
    // the affected files, never the table. The require proves the
    // COW discipline held (c2/c3 bytes untouched and still
    // referenced); the aggregate proves the rows are really gone.
    "q365_delete_commit" -> ((s, d) => {
      val root = freshScratch("q365", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (1 to 3).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === (k - 1)), root, s"c$k")
      }
      val vPost = graft.operators.Manifest.deleteWhere(s, root,
        col("lang") === "de" && col("doc_id") % 3 === 0, "del")
      val ms = graft.operators.Manifest.members(root, vPost)
      require(ms.contains(s"$root/files/c2") && ms.contains(s"$root/files/c3")
        && !ms.contains(s"$root/files/c1"),
        s"q365: COW delete must rewrite ONLY the affected member, got $ms")
      graft.operators.Manifest.read(s, root, vPost)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Deterministic stratified hash sampling — the corpus
    // downsampling step every training mix runs, made REPRODUCIBLE
    // (the q75/q359 md5 discipline): a doc survives iff its md5 first
    // hex nibble < 4 (a fixed 25% rate), so the sample is a pure
    // function of doc_id — re-runs, engines, and partitionings all
    // agree, and NO shuffle is needed to sample (a narrow filter at
    // any scale; rand()-based sampling is neither reproducible nor
    // oracle-able). Report per language: totals, sampled counts/chars,
    // achieved permille.
    "q366_stratified_sample" -> ((s, d) => {
      val keep = substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2", "3")
      Tables(s, d).documents
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).cast("long").as("n_sampled"),
          sum(when(keep, col("n_chars")).otherwise(0L)).cast("long")
            .as("sampled_chars"))
        .withColumn("sampled_permille",
          expr("n_sampled * 1000 div n_total"))
    }),

    // Idempotent keyed ingest (exactly-once append) — the landing
    // contract for at-least-once upstreams: re-delivered batches must
    // not duplicate rows OR advance the version. Batch 2 overlaps
    // batch 1 (only the odd ids are new → one key-shaped anti join
    // gates the commit), batch 3 is a FULL redelivery of batch 1 and
    // publishes nothing — the require proves the no-op, the aggregate
    // proves the table holds each document exactly once.
    "q367_idempotent_ingest" -> ((s, d) => {
      val root = freshScratch("q367", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 0), root, "b0")
      val v2 = graft.operators.Manifest.idempotentAppend(
        docs, root, "b1", "doc_id")
      val v3 = graft.operators.Manifest.idempotentAppend(
        docs.filter(col("doc_id") % 2 === 0), root, "b2", "doc_id")
      require(v2 == 2 && v3 == 2,
        s"q367: redelivery must be a version no-op, got v2=$v2 v3=$v3")
      graft.operators.Manifest.read(s, root, v3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Duplicate-3-gram repetition score — the Gopher/MassiveText
    // quality rule ("fraction of text inside repeated n-grams") that
    // catches boilerplate and template spam exact-dedup misses: per
    // doc, permille of 3-grams that are repeats of an earlier one
    // (total − distinct over total), reported per language. The gram
    // build is a per-doc array lambda (no explode — the corpus never
    // shuffles at doc grain; fan-out via the single-file guard since
    // the lambdas run interpreted); integer permille keeps the oracle
    // bitwise. Docs under 3 tokens have no 3-grams and drop (none at
    // shipped SFs — min doc is 10 tokens).
    "q368_repetition_score" -> ((s, d) => {
      TextOps.parallelized(Tables(s, d).documents)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= 3)
        .withColumn("grams", expr(
          "transform(sequence(0, size(ts) - 3), " +
            "i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"))
        .withColumn("dup_permille", expr(
          "(size(grams) - size(array_distinct(grams))) * 1000 " +
            "div size(grams)").cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(dup_permille) div count(1)").cast("long")
            .as("avg_dup3_permille"),
          max(col("dup_permille")).cast("long").as("max_dup3_permille"))
    }),

    // Cohort LTV curve — q336's retention matrix with money on it:
    // users cohorted by first-purchase week, revenue accumulated by
    // age-in-weeks, each cohort's curve in exact permille of its
    // lifetime total ("when does a cohort deliver its value"). All
    // corpus work is user-/purchase-shaped aggregates; the cumulative
    // window partitions by cohort over a week²-cardinality
    // PRE-AGGREGATED frame (≤25 rows at any corpus scale — inline-
    // justified like the q361 offset frame, not a corpus window).
    "q369_cohort_ltv" -> ((s, d) => {
      val p = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val cohort = p.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      val cells = p.join(cohort, "user_id")
        .groupBy(col("cw"), (col("wk") - col("cw")).as("age"))
        .agg(sum(col("cents")).cast("long").as("revenue_cents"))
      val wCum = Window.partitionBy(col("cw")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = cells.groupBy(col("cw"))
        .agg(sum(col("revenue_cents")).cast("long").as("cohort_cents"))
      cells
        .withColumn("cum_cents",
          sum(col("revenue_cents")).over(wCum).cast("long"))
        .join(broadcast(tot), "cw")
        .select(col("cw").as("cohort_week"), col("age"),
          col("revenue_cents"), col("cum_cents"),
          expr("cum_cents * 1000 div cohort_cents").as("ltv_permille"))
    }),

    // Manifest stats-pruned read (data skipping) — the Iceberg-shape
    // selective scan: each ADD commit embeds min/max doc_id stats in
    // its manifest line (one bounded aggregate at commit time), and a
    // range read consults the STATS to skip whole members before any
    // data IO — at 100 TB a selective query reads the manifest plus
    // the intersecting files, never the table. The require proves the
    // skip really happened (members r2/r3 never touched); the
    // row-level filter still applies to the pruned union — stats
    // pruning is an optimization, never the semantics.
    "q370_stats_pruned_read" -> ((s, d) => {
      val root = freshScratch("q370", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") < 10), root, "r1", Seq("doc_id"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") >= 10 && col("doc_id") < 20), root,
        "r2", Seq("doc_id"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") >= 20), root, "r3", Seq("doc_id"))
      val v = graft.operators.Manifest.currentVersion(root)
      val pruned = graft.operators.Manifest.prunedMembers(
        root, v, "doc_id", 5L, 8L)
      require(pruned == Seq(s"$root/files/r1"),
        s"q370: stats must prune to the single intersecting member, got $pruned")
      s.read.parquet(pruned: _*)
        .filter(col("doc_id") >= 5 && col("doc_id") <= 8)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Positional phrase search — the adjacency leg q340's conjunctive
    // (bag-of-words) search cannot express: the corpus's most frequent
    // bigram is derived first (1-row TakeOrdered broadcast — the q92
    // discipline), then matched EXACTLY via positional postings:
    // per-term posting lists are term-filtered by broadcast joins
    // BEFORE any shuffle, and the phrase hit is postings(t1) ⋈
    // postings(t2) on (doc, pos+1) — the inverted-index phrase plan,
    // never a LIKE scan over text. Report per language: matched docs
    // and total occurrences.
    "q371_phrase_search" -> ((s, d) => {
      val docs = TextOps.parallelized(Tables(s, d).documents)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ts"))
      val postings = docs
        .select(col("doc_id"), col("lang"),
          posexplode(col("ts")).as(Seq("pos", "tok")))
      val topBigram = docs
        // size >= 2 guard: sequence(0, size-2) runs DESCENDING on a
        // 1-token doc and would index ts[-1] (ANSI throws)
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> concat_ws(' ', ts[i], ts[i+1]))")).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(1)
        .select(col("bigram"),
          split(col("bigram"), " ").getItem(0).as("t1"),
          split(col("bigram"), " ").getItem(1).as("t2"))
      val p1 = postings.join(broadcast(topBigram.select(col("t1"))),
        col("tok") === col("t1")).select(col("doc_id"), col("lang"),
        col("pos").as("p1"))
      val p2 = postings.join(broadcast(topBigram.select(col("t2"))),
        col("tok") === col("t2")).select(col("doc_id").as("d2"),
        col("pos").as("p2"))
      p1.join(p2, col("doc_id") === col("d2") && col("p2") === col("p1") + 1)
        .groupBy(col("lang"))
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .crossJoin(broadcast(topBigram.select(col("bigram").as("phrase"))))
    }),

    // Linear multi-touch attribution — q342's last-touch counterpart:
    // every click in the 7 days BEFORE a purchase shares the credit
    // equally, in exact integer permille (1000 div k each, remainder
    // to the EARLIEST touch so the split sums to exactly 1000 —
    // deterministic, no floats); clickless purchases credit 'none'.
    // The window join is user-keyed (parallel at any user count), the
    // per-purchase k/earliest come from ONE purchase-keyed window
    // pass, and the report is channel-sized.
    "q372_linear_attribution" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          unix_micros(col("ts")).as("c_us"),
          concat(lit("ch"),
            get_json_object(col("props"), "$.k").cast("long") % 4)
            .as("channel"))
      val touched = purchases.join(clicks, Seq("user_id"))
        .filter(col("c_us") <= col("p_us") &&
          col("p_us") - col("c_us") <= 604800000000L)
      val wP = Window.partitionBy(col("p_id"))
      val credited = touched
        .withColumn("k", count(lit(1)).over(wP))
        .withColumn("first_c",
          min(struct(col("c_us"), col("c_id"))).over(wP))
        .withColumn("credit_pm",
          expr("1000 div k") +
            when(col("first_c") === struct(col("c_us"), col("c_id")),
              expr("1000 - k * (1000 div k)")).otherwise(lit(0L)))
      val none = purchases.join(
          touched.select(col("p_id")).distinct(), Seq("p_id"), "left_anti")
        .select(lit("none").as("channel"), lit(1000L).as("credit_pm"))
      credited.select(col("channel"), col("credit_pm"))
        .unionByName(none)
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_pm")).cast("long").as("credit_pm_total"))
    }),

    // Version-diff change feed (table_changes) — what an incremental
    // downstream consumer reads instead of the full table: commits
    // build v1..v3, a COW delete makes v4, and Manifest.diff derives
    // the row-level feed between two pinned versions with ONE
    // key-shaped full-outer join (inserted / deleted / changed;
    // unchanged rows never leave the join). The report folds the two
    // feeds (v1→v3 inserts, v3→v4 deletes) into change_type × lang
    // counts.
    "q373_version_diff" -> ((s, d) => {
      val root = freshScratch("q373", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (1 to 3).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === (k - 1)), root, s"c$k")
      }
      graft.operators.Manifest.deleteWhere(s, root,
        col("lang") === "de" && col("doc_id") % 3 === 0, "del")
      val growth = graft.operators.Manifest.diff(s, root, 1, 3,
        "doc_id", Seq("lang", "n_chars"))
      val deletion = graft.operators.Manifest.diff(s, root, 3, 4,
        "doc_id", Seq("lang", "n_chars"))
      // "diff_window", not "window": WINDOW is a SQL keyword and the
      // oracle column names must match byte-for-byte
      growth.select(lit("v1_to_v3").as("diff_window"), col("change_type"),
          col("lang"))
        .unionByName(deletion.select(lit("v3_to_v4").as("diff_window"),
          col("change_type"), col("lang")))
        .groupBy(col("diff_window"), col("change_type"), col("lang"))
        .agg(count(lit(1)).as("n_rows"))
    }),

    // Copy-on-write keyed UPSERT — the MERGE leg that completes the
    // manifest DML matrix (append q363, delete q365, now
    // insert-or-update): updates to keys ≡ 0 mod 15 (all inside
    // member c1, since c1 holds ≡ 0 mod 3) replace rows, inserts
    // with NEGATIVE keys (provably outside the doc_id ≥ 0 domain —
    // the q334-advice discipline) land as new rows, and the whole
    // MERGE publishes as ONE atomic version. The require proves the
    // COW contract: c2/c3 are untouched (their bytes stay shared
    // with every older version) because the one-pass
    // input_file_name probe found no updated key in them.
    "q374_upsert_commit" -> ((s, d) => {
      val root = freshScratch("q374", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (1 to 3).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === (k - 1)), root, s"c$k")
      }
      val upd = docs.filter(col("doc_id") % 15 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 1000).as("n_chars"))
      val ins = docs.filter(col("doc_id") % 7 === 0)
        .select((-col("doc_id") - 1).as("doc_id"), col("lang"),
          (col("n_chars") + 7).as("n_chars"))
      val v = graft.operators.Manifest.upsert(
        upd.unionByName(ins), root, "doc_id", "u1")
      val ms = graft.operators.Manifest.members(root, v)
      require(ms.contains(s"$root/files/c2") && ms.contains(s"$root/files/c3")
        && !ms.contains(s"$root/files/c1"),
        s"q374: COW upsert must rewrite ONLY the affected member, got $ms")
      graft.operators.Manifest.read(s, root, v)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Streaming CDC ingestion into the manifest table — the
    // Structured Streaming, CDC-MERGE, and table-format legs wired
    // end-to-end: a three-file change feed drains through
    // foreachBatch (maxFilesPerTrigger=1, modification-time order —
    // the upstream log's delivery order), each micro-batch lands as
    // ONE atomic COW MERGE commit, and the member-name ledger makes
    // redelivered batches a no-op (LakeIngestSpec proves that by
    // re-draining). Batch 2's U on keys batch 1 deleted exercises
    // the orphan-U no-op of the Cdc matrix; the require pins one
    // version per batch (base + 3). Final state is a pure function
    // of the feed → hash-oracled.
    "q375_stream_cdc_ingest" -> ((s, d) => {
      val root = freshScratch("q375", d)
      val feed = s"$root/feed"; val table = s"$root/table"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(docs, table, "base")
      // stage the feed as one parquet FILE per batch with pinned,
      // strictly increasing mtimes — the file source's batch order
      def stage(name: String, mtime: Long, df: DataFrame): Unit =
        graft.streaming.LakeIngest.stageBatchFile(feed, name, mtime, df)
      val opCols = Seq(col("doc_id"), col("op"), col("lang"), col("n_chars"))
      stage("b0.parquet", 1000000L, docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("U").as("op"), col("lang"),
          (col("n_chars") + 100).as("n_chars")).select(opCols: _*))
      stage("b1.parquet", 2000000L, docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), lit("D").as("op"), col("lang"),
          col("n_chars")).select(opCols: _*))
      stage("b2.parquet", 3000000L,
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), lit("U").as("op"), col("lang"),
            (col("n_chars") + 200).as("n_chars"))
          .unionByName(docs.filter(col("doc_id") % 6 === 0)
            .select((-col("doc_id") - 1).as("doc_id"), lit("I").as("op"),
              col("lang"), (col("n_chars") + 5).as("n_chars")))
          .select(opCols: _*))
      val v = graft.streaming.LakeIngest.cdcFeedToManifest(
        s, feed, s"$root/ckpt", table, "doc_id")
      require(v == 4,
        s"q375: 3 CDC batches over the base must publish v4, got v$v")
      graft.operators.Manifest.read(s, table, v)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Spearman rank correlation between doc length in chars and in
    // tokens — the drift/agreement statistic between two quality
    // signals, EXACT where Pearson can't be (its √ is irrational):
    // midranks keep ties deterministic, doubling keeps them integral
    // (GroupedRank.scaledMidranks — value-cardinality frames +
    // withRunningTotal range exchanges, call sites 6-7; corpus rows
    // never shuffle, they broadcast-join their value's midrank).
    // ρ = 1 − 6Σd²/(n(n²−1)) with the ×2 scaling folded in:
    // ρ_pm = (2n(n²−1) − 3Σd₂²)·1000 div 2n(n²−1), all DECIMAL(38,0)
    // (n³ passes BIGINT at ~2e6 docs); Σd₂² surfaces as STRING (the
    // wide-decimal oracle discipline). The d² formula with midranks
    // is the documented tie convention — both engines replay it.
    "q377_spearman" -> ((s, d) => {
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val sx = graft.operators.GroupedRank.scaledMidranks(
        docs, col("n_chars"), "sx")
      val sy = graft.operators.GroupedRank.scaledMidranks(
        docs, col("n_tokens"), "sy")
      val dd = docs.join(sx, docs("n_chars") === sx("__v")).drop("__v")
        .join(sy, col("n_tokens") === sy("__v")).drop("__v")
        .withColumn("__d", (col("sx") - col("sy")).cast("decimal(19,0)"))
      dd.agg(count(lit(1)).cast("long").as("n"),
          sum(col("__d") * col("__d")).as("sd2"))
        .select(col("n").as("n_docs"),
          col("sd2").cast("string").as("sum_d2_scaled"),
          expr("(2 * CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1)" +
            " - 3 * sd2) * 1000 div " +
            "(2 * CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1))")
            .as("rho_permille"))
    }),

    // Mann-Whitney U — the nonparametric two-sample location test
    // (are English docs longer?) next to q345's parametric z-test:
    // no normality assumption, EXACT integer arithmetic via the same
    // doubled midranks (shared machinery with q377; call site 8).
    // 2U₁ = 2R₁ − n₁(n₁+1) with 2R₁ = Σ s₂ over the en group; the
    // effect size U₁/(n₁n₂) is the common-language AUC, in exact
    // permille. Products in DECIMAL(38,0)/HUGEINT (2R₁ ≤ 2n²); U
    // itself surfaces as STRING.
    "q378_mann_whitney" -> ((s, d) => {
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val m = graft.operators.GroupedRank.scaledMidranks(
        docs, col("n_chars"), "s2")
      val a = docs.join(m, docs("n_chars") === m("__v")).drop("__v")
        .withColumn("grp",
          when(col("lang") === "en", lit("en")).otherwise(lit("other")))
        .groupBy(col("grp"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("s2").cast("decimal(19,0)")).as("r2"))
      val en = a.filter(col("grp") === "en")
        .select(col("n").as("n_en"), col("r2").as("r2_en"))
      val ot = a.filter(col("grp") === "other")
        .select(col("n").as("n_other"))
      en.crossJoin(ot).select(
        col("n_en"), col("n_other"),
        expr("CAST(r2_en - CAST(n_en AS DECIMAL(38,0)) * (n_en + 1) AS STRING)")
          .as("u2_en"),
        expr("(r2_en - CAST(n_en AS DECIMAL(38,0)) * (n_en + 1)) * 500 div " +
          "(CAST(n_en AS DECIMAL(38,0)) * n_other)").as("auc_permille"))
    }),

    // Partition-pruned manifest read — the Hive-layout leg next to
    // q370's numeric min/max skipping: per-language ADD commits tag
    // their members with part_lang, and a lang='de' read consults
    // ONLY the manifest to skip four of five members before any data
    // IO (require-proved). Untagged members are conservatively read;
    // the row-level filter still applies to the pruned union —
    // pruning is an optimization, never the semantics.
    "q379_partition_pruned_read" -> ((s, d) => {
      val root = freshScratch("q379", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      Seq("en", "es", "de", "fr", "zh").foreach { l =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("lang") === l), root, s"p-$l",
          partition = Map("lang" -> l))
      }
      val v = graft.operators.Manifest.currentVersion(root)
      val pruned = graft.operators.Manifest.prunedMembersByPartition(
        root, v, "lang", "de")
      require(pruned == Seq(s"$root/files/p-de"),
        s"q379: partition pruning must keep exactly the de member, got $pruned")
      s.read.parquet(pruned: _*)
        .filter(col("lang") === "de")
        .groupBy(expr("doc_id % 5").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Wilcoxon signed-rank — the PAIRED nonparametric test closing
    // the family (q378 Mann-Whitney = unpaired, q345 z = parametric):
    // per user, even-week minus odd-week purchase cents ("did
    // spending shift?"), zero diffs dropped (the standard
    // convention), |d| midranked with the shared doubled-midrank
    // machinery (call site 9), W⁺ = Σ ranks of positive diffs.
    // 2W⁺ surfaces as STRING (Σs₂ = n(n+1) passes BIGINT only to
    // ~3e9 pairs); W⁺/(n(n+1)/2) — the signed-rank effect size —
    // in exact permille, 500 ≈ no shift.
    "q380_wilcoxon" -> ((s, d) => {
      val du = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          when(expr("(unix_micros(ts) div 604800000000) % 2") === 0,
            round(col("value") * 100, 0).cast("long"))
            .otherwise(-(round(col("value") * 100, 0).cast("long")))
            .as("signed"))
        .groupBy(col("user_id"))
        .agg(sum(col("signed")).cast("long").as("d"))
        .filter(col("d") =!= 0)
        .withColumn("ad", abs(col("d")))
      val m = graft.operators.GroupedRank.scaledMidranks(
        du, col("ad"), "s2")
      du.join(m, du("ad") === m("__v")).drop("__v")
        .agg(count(lit(1)).cast("long").as("n"),
          coalesce(sum(when(col("d") > 0, col("s2").cast("decimal(19,0)"))),
            lit(0).cast("decimal(19,0)")).as("w2"),
          sum(when(col("d") > 0, 1L).otherwise(0L)).cast("long").as("np"))
        .select(col("n").as("n_pairs"), col("np").as("n_pos"),
          col("w2").cast("decimal(38,0)").cast("string").as("w2_plus"),
          expr("CASE WHEN n = 0 THEN NULL ELSE CAST(w2 AS DECIMAL(38,0)) " +
            "* 1000 div (CAST(n AS DECIMAL(38,0)) * (n + 1)) END")
            .as("wplus_permille"))
    }),

    // Change-feed incremental view maintenance — the mutation leg
    // q202/q302's append-only IVM cannot express: a per-lang
    // aggregate maintained from v1 by applying Manifest.diffBoth
    // deltas across an upsert (v2: updates that MOVE rows to a new
    // lang group + inserts) and a COW delete (v3). Both row images
    // matter: a changed row subtracts (old_lang, old_chars) and adds
    // (new_lang, new_chars) — one-sided feeds cannot maintain a
    // group-keyed aggregate under group moves. `ivm_match` is
    // COMPUTED by joining the maintained aggregate against the
    // direct v3 recompute (the q364 parity discipline); zero-count
    // groups drop like the recompute drops them.
    "q381_ivm_changefeed" -> ((s, d) => {
      val root = freshScratch("q381", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(docs, root, "base") // v1
      val upd = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"), lit("zz").as("lang"),
          (col("n_chars") + 50).as("n_chars"))
      val ins = docs.filter(col("doc_id") % 11 === 0)
        .select((-col("doc_id") - 1).as("doc_id"), col("lang"),
          (col("n_chars") + 3).as("n_chars"))
      graft.operators.Manifest.upsert(
        upd.unionByName(ins), root, "doc_id", "u1")          // v2
      graft.operators.Manifest.deleteWhere(s, root,
        col("doc_id") % 8 === 0 && col("doc_id") >= 0, "del") // v3
      val agg1 = graft.operators.Manifest.read(s, root, 1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("sc"))
      def delta(vf: Int, vt: Int): DataFrame = {
        val f = graft.operators.Manifest.diffBoth(
          s, root, vf, vt, "doc_id", Seq("lang", "n_chars"))
        f.filter(col("change_type").isin("deleted", "changed"))
          .select(col("old_lang").as("lang"), lit(-1L).as("n"),
            (-col("old_n_chars")).cast("long").as("sc"))
          .unionByName(
            f.filter(col("change_type").isin("inserted", "changed"))
              .select(col("new_lang").as("lang"), lit(1L).as("n"),
                col("new_n_chars").cast("long").as("sc")))
      }
      val maintained = agg1.unionByName(delta(1, 2)).unionByName(delta(2, 3))
        .groupBy(col("lang"))
        .agg(sum(col("n")).cast("long").as("n_docs_ivm"),
          sum(col("sc")).cast("long").as("sum_chars_ivm"))
        .filter(col("n_docs_ivm") > 0)
      val direct = graft.operators.Manifest.read(s, root, 3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
      direct.join(maintained, Seq("lang"), "full_outer")
        .select(col("lang"), col("n_docs"), col("sum_chars"),
          (col("n_docs") === col("n_docs_ivm") &&
            col("sum_chars") === col("sum_chars_ivm")).as("ivm_match"))
    }),

    // Bloom-pruned point lookup — the skipping leg min/max stats
    // structurally CANNOT serve: members split by doc_id mod 3
    // interleave, so every member's [min,max] covers every interior
    // key (require-proved: the stats prune keeps all 3), but each
    // member's bloom sidecar (commit-time distributed build,
    // deterministic seed, Iceberg-puffin shape) answers "definitely
    // not here". No false negatives — each key's true member is
    // always kept (require-proved); ~1% false positives survive the
    // prune and the row-level filter drops their rows, so the RESULT
    // is exact whatever the bloom answers. Three point reads union
    // into the report.
    "q382_bloom_pruned_read" -> ((s, d) => {
      val root = freshScratch("q382", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (1 to 3).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === (k - 1)), root, s"c$k",
          statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      }
      val v = graft.operators.Manifest.currentVersion(root)
      // interior key: the interleaved layout defeats min/max pruning
      require(graft.operators.Manifest
        .prunedMembers(root, v, "doc_id", 34, 34).size == 3,
        "q382: interleaved members must defeat min/max stats pruning")
      Seq(33L, 34L, 35L).map { k =>
        val pruned = graft.operators.Manifest
          .prunedMembersByKey(root, v, "doc_id", k)
        require(pruned.contains(s"$root/files/c${k % 3 + 1}"),
          s"q382: bloom pruning lost key $k's member (false negative)")
        s.read.parquet(pruned: _*).filter(col("doc_id") === k)
      }.reduce(_ unionByName _)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // Content-defined chunk dedup — the STORAGE dedup shape (rsync/
    // LBFS/backup dedup) next to the shingle family: chunk boundaries
    // fall where a content hash of the local 4-gram has a fixed
    // prefix (md5 first nibble '0', rate 1/16 → ~16-char expected
    // chunks), so an insertion re-chunks only its neighborhood —
    // fixed-width chunking would shift every later boundary and
    // defeat dedup. Boundaries and chunk digests are per-doc array
    // lambdas (interpreted → parallelized() fan-out; the corpus
    // never shuffles at doc grain); only (lang, digest) pairs explode
    // into the distinct count. md5 is the boundary hash because both
    // engines share it bit-for-bit (xxhash64 has no DuckDB twin).
    "q383_cdc_chunk_dedup" -> ((s, d) => {
      TextOps.parallelized(Tables(s, d).documents)
        .select(col("lang"), col("text"))
        // greatest(…, 2) + the i <= length guard: Spark's sequence
        // REVERSES when start > stop (sequence(2,1) = [2,1]) while
        // DuckDB's range(2,2) is empty — without the guard a 1-char
        // text would diverge between the engines (latent at shipped
        // fixtures, min doc ≈ 19 chars)
        .withColumn("bs", expr(
          "concat(array(1), " +
            "filter(sequence(2, greatest(length(text), 2)), " +
            "i -> i <= length(text) " +
            "AND startswith(md5(substring(text, i, 4)), '0')), " +
            "array(length(text) + 1))"))
        .withColumn("dg", explode(expr(
          "transform(sequence(1, size(bs) - 1), " +
            "j -> md5(substring(text, element_at(bs, j), " +
            "element_at(bs, j + 1) - element_at(bs, j))))")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_chunks"),
          count_distinct(col("dg")).as("n_distinct"),
          expr("(count(1) - count(DISTINCT dg)) * 1000 div count(1)")
            .cast("long").as("dup_permille"))
    }),

    // t-closeness audit — the distribution leg of the privacy family
    // (q352's l-diversity counts distinct sensitive values; this
    // measures how far each quasi-group's sensitive DISTRIBUTION
    // drifts from the global one): per source, the L1 distance
    // between its lang distribution and the corpus's, in exact
    // permille (Σ_c |n_gc·n − n_c·n_g| · 1000 div (n_g·n) — common
    // denominator, no floats). The grid is (source × lang)-bounded
    // with absent cells at 0 (they still contribute |0 − p(c)|);
    // corpus work is ONE cell-grain aggregate, everything after runs
    // on ≤25-row frames. DECIMAL(38,0) keeps n_gc·n exact past ~3e9.
    "q384_t_closeness" -> ((s, d) => {
      val cell = Tables(s, d).documents
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("ngc"))
      tClosenessReport(cell)
    }),

    // Rank-ANOVA readout (the Kruskal-Wallis per-group view): each
    // language's average doubled midrank of doc length against its
    // expectation — Σ_rows s₂ = n(n+1) exactly, so a group's
    // expected Σ is n_i·(n+1) and the deviation permille is pure
    // integer arithmetic (positive = longer-than-corpus docs).
    // Shares the q377/q378/q380 midrank machinery (call site 10);
    // group sums are lang-cardinality frames, the corpus only pays
    // the one value-grain pass. Emitting per-group deviations
    // instead of the single H statistic keeps the math exact (H's
    // 12/(n(n+1)) Σ R²/n_i denominators have no common integer
    // form) and is the actionable readout anyway.
    "q386_rank_anova" -> ((s, d) => {
      val docs = Tables(s, d).documents.select(col("lang"), col("n_chars"))
      val m = graft.operators.GroupedRank.scaledMidranks(
        docs, col("n_chars"), "s2")
      val tot = docs.agg(count(lit(1)).cast("long").as("n"))
      docs.join(m, docs("n_chars") === m("__v")).drop("__v")
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("s2").cast("decimal(19,0)")).as("s2sum"))
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          col("s2sum").cast("decimal(38,0)").cast("string").as("s2_sum"),
          expr("(s2sum - CAST(n_docs AS DECIMAL(38,0)) * (n + 1)) * 1000 " +
            "div (CAST(n_docs AS DECIMAL(38,0)) * (n + 1))")
            .as("dev_permille"))
    }),

    // Kendall concordance sufficient statistics — the pair-ordering
    // agreement between chars and tokens, complementing q377's
    // Spearman (Kendall weighs each discordant pair once where
    // Spearman squares rank gaps): concordant/discordant counted on
    // the (x, y) VALUE GRID, so the quadratic pair space collapses
    // to grid-cell pairs (cells² work, corpus-independent once
    // aggregated; the corpus pays one cell-grain pass). τ_b's √ is
    // irrational, so the exact integers C, D, tied_x, tied_y ship
    // as STRINGs (the q203 sufficient-statistics discipline) with
    // τ_a = (C−D)/n₀ in exact permille.
    "q387_kendall_stats" -> ((s, d) => {
      val cells = Tables(s, d).documents
        .select(col("n_chars").as("x"),
          size(split(col("text"), " ")).cast("long").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cnt"))
      val a = cells.select(col("x").as("x1"), col("y").as("y1"),
        col("cnt").cast("decimal(19,0)").as("c1"))
      val b = cells.select(col("x").as("x2"), col("y").as("y2"),
        col("cnt").cast("decimal(19,0)").as("c2"))
      val cd = a.join(b, col("x2") > col("x1"))
        .agg(
          coalesce(sum(when(col("y2") > col("y1"), col("c1") * col("c2"))),
            lit(0).cast("decimal(38,0)")).as("cc"),
          coalesce(sum(when(col("y2") < col("y1"), col("c1") * col("c2"))),
            lit(0).cast("decimal(38,0)")).as("dd"))
      def tieSum(key: String) = cells.groupBy(col(key))
        .agg(sum(col("cnt")).as("m"))
        .agg(coalesce(sum(expr(
          "CAST(m AS DECIMAL(19,0)) * (m - 1) div 2").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as(s"t_$key"))
      val tot = Tables(s, d).documents.agg(count(lit(1)).cast("long").as("n"))
      cd.crossJoin(broadcast(tieSum("x"))).crossJoin(broadcast(tieSum("y")))
        .crossJoin(broadcast(tot))
        .select(col("n").as("n_docs"),
          col("cc").cast("string").as("concordant"),
          col("dd").cast("string").as("discordant"),
          col("t_x").cast("string").as("tied_x"),
          col("t_y").cast("string").as("tied_y"),
          expr("(cc - dd) * 2000 div (CAST(n AS DECIMAL(38,0)) * (n - 1))")
            .as("tau_a_permille"))
    }),

    // Chi-squared independence (source × lang) — the categorical leg
    // of the test family (q345 compares two proportions; this tests
    // the whole contingency table at once). Exact integer identity:
    // (O − RC/N)²/(RC/N) = (O·N − R·C)² / (N·R·C), so each cell's
    // contribution ships in micro units via one floor-division —
    // per-cell floor THEN sum is the DEFINED statistic, identical in
    // both engines. Same shape as q384: ONE cell-grain corpus
    // aggregate, then margins + the absent-cells-at-0 grid on
    // ≤100-row frames; DECIMAL(38,0) keeps (O·N − R·C)² exact (the
    // square passes int64 at ~N > 55k). The χ²_micro total and the
    // (r−1)(c−1) dof ride every row from 1-row broadcast frames.
    "q389_chi2_independence" -> ((s, d) => {
      val cell = Tables(s, d).documents
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      val rm = cell.groupBy(col("source")).agg(sum(col("o")).as("r"))
      val cm = cell.groupBy(col("lang")).agg(sum(col("o")).as("c"))
      val n = cell.agg(sum(col("o")).as("n"))
      val grid = rm.crossJoin(cm)
        .join(cell, Seq("source", "lang"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(n))
        .withColumn("contrib_micro", expr(
          "((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c) " +
            "* (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c) " +
            "* 1000000) div (CAST(n AS DECIMAL(38,0)) * r * c)"))
      val tot = grid.agg(sum(col("contrib_micro")).as("chi2_micro"))
      val dof = cell.agg(expr(
        "(count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)")
        .cast("long").as("dof"))
      grid.select(col("source"), col("lang"), col("o").as("o_count"),
          col("contrib_micro"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(dof))
    }),

    // McNemar paired test — did the purchase PROPENSITY of the same
    // user population change across the cutoff? (q345's z-test
    // compares two independent arms; McNemar conditions on the
    // paired before/after outcomes of EACH user, so concordant users
    // drop out and only the b/c discordant cells carry signal.)
    // Statistic (b−c)²·1000 div (b+c) in exact permille (χ²₁-
    // distributed; continuity correction deliberately omitted — it
    // subtracts a float ½). ONE user-keyed aggregate over the
    // purchase stream builds the pair table; everything after is
    // 1-row arithmetic.
    "q390_mcnemar" -> ((s, d) => {
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(when(col("ts") < cutoff, 1L).otherwise(0L)).as("bef"),
          max(when(col("ts") >= cutoff, 1L).otherwise(0L)).as("aft"))
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum(when(col("bef") === 1 && col("aft") === 1, 1L).otherwise(0L))
            .as("both_cnt"),
          sum(when(col("bef") === 1 && col("aft") === 0, 1L).otherwise(0L))
            .as("before_only"),
          sum(when(col("bef") === 0 && col("aft") === 1, 1L).otherwise(0L))
            .as("after_only"))
        .withColumn("mcnemar_permille", expr(
          "CASE WHEN before_only + after_only = 0 THEN 0 ELSE " +
            "((before_only - after_only) * (before_only - after_only) " +
            "* 1000) div (before_only + after_only) END"))
    }),

    // A-priori frequent triples over order→brand baskets — the
    // classic market-basket miner one level above q312's pairs.
    // Relative 5‰ support via integer cross-multiplication (never a
    // ratio). The SCALE point is downward closure: items below
    // minsup leave the stream before any self-join (broadcast L1
    // semi-join), and triple candidates must contain three frequent
    // pairs (broadcast L2 semi-joins) BEFORE the count — per-basket
    // work is bounded by the frequent-item subset, not raw basket
    // width. The count itself is unaffected (a frequent triple's
    // sub-pairs are frequent by closure), so the oracle states the
    // direct HAVING form. All joins are order-keyed shuffles.
    "q391_apriori_triples" -> ((s, d) => {
      val t = Tables(s, d)
      val baskets = t.lineitem
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("br"))
        .distinct()
      val n = baskets.agg(countDistinct(col("o")).as("n_orders"))
      val l1 = baskets.groupBy(col("br")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(expr("cnt * 1000 >= 5 * n_orders")).select(col("br"))
      val fb = baskets.join(broadcast(l1), Seq("br")).select("o", "br")
      val pocc = fb.select(col("o"), col("br").as("b1"))
        .join(fb.select(col("o"), col("br").as("b2")), Seq("o"))
        .filter(col("b2") > col("b1"))
      val l2 = pocc.groupBy(col("b1"), col("b2"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(expr("cnt * 1000 >= 5 * n_orders")).select("b1", "b2")
      val cand = pocc.join(broadcast(l2), Seq("b1", "b2"), "left_semi")
        .join(fb.select(col("o"), col("br").as("b3")), Seq("o"))
        .filter(col("b3") > col("b2"))
        .join(broadcast(l2.select(col("b1"), col("b2").as("b3"))),
          Seq("b1", "b3"), "left_semi")
        .join(broadcast(l2.select(col("b1").as("b2"), col("b2").as("b3"))),
          Seq("b2", "b3"), "left_semi")
      cand.groupBy(col("b1"), col("b2"), col("b3"))
        .agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(n))
        .filter(expr("support * 1000 >= 5 * n_orders"))
        .select(col("b1"), col("b2"), col("b3"), col("support"),
          expr("(support * 1000) div n_orders").as("support_permille"))
    }),

    // MERGE-ON-READ equality delete — the write-cheap half of the
    // delete matrix (q365 is copy-on-write): the delete commit
    // writes ONLY the key batch as an Iceberg-v2-style delete file;
    // no data member is probed or rewritten (require-proved), so at
    // 100 TB a small RTBF/CDC delete costs its keys, not a file
    // rewrite. Readers subtract the debt with one broadcast anti-
    // join (delete files are batch-sized; the data side streams
    // through unshuffled). The aggregate proves the rows are gone
    // from the MOR view even though every data byte still exists.
    "q392_mor_delete" -> ((s, d) => {
      val root = freshScratch("q392", d)
      val orders = Tables(s, d).orders
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      (0 to 2).foreach { k =>
        graft.operators.Manifest.commitAdd(
          orders.filter(col("o_orderkey") % 3 === k), root, s"m$k")
      }
      val v3 = graft.operators.Manifest.currentVersion(root)
      val dataPre = graft.operators.Manifest.dataMembers(root, v3)
      val v4 = graft.operators.Manifest.commitEqualityDelete(
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")),
        root, "del-urgent", "o_orderkey")
      require(graft.operators.Manifest.dataMembers(root, v4) == dataPre &&
        graft.operators.Manifest.deleteMembers(root, v4).size == 1,
        "q392: MOR delete must add one delete file and rewrite nothing")
      graft.operators.Manifest.readMor(s, root, v4)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).cast("long").as("sum_cents"))
    }),

    // MOR delete COMPACTION — settling q392's read-side debt: every
    // delete file folds into its affected data members in ONE
    // replace-shaped commit (rewritten minus keys, delete members
    // leave the manifest — require-proved empty after), while a
    // reader still pinned to the debt version sees the pre-
    // compaction files bit-identically (nothing is mutated — the
    // maintenance-under-isolation discipline of q364, now for the
    // delete path). The emitted parity column COMPUTES debt ≡
    // settled instead of assuming it: the v-debt MOR read and the
    // v-settled plain read must agree group for group.
    "q393_delete_compaction" -> ((s, d) => {
      val root = freshScratch("q393", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (0 to 2).foreach { k =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 3 === k), root, s"m$k")
      }
      val vDebt = graft.operators.Manifest.commitEqualityDelete(
        docs.filter(col("n_chars") < 200).select(col("doc_id")),
        root, "del-short", "doc_id")
      val vSettled = graft.operators.Manifest.compactDeletes(s, root, "settle")
      require(
        graft.operators.Manifest.deleteMembers(root, vSettled).isEmpty &&
          vSettled > vDebt,
        "q393: compaction must clear the delete debt in a new version")
      def agg(df: DataFrame, sfx: String) = df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs" + sfx),
          sum(col("n_chars")).cast("long").as("sum_chars" + sfx))
      agg(graft.operators.Manifest.readMor(s, root, vDebt), "")
        .join(agg(graft.operators.Manifest.read(s, root, vSettled), "_post"),
          Seq("lang"), "full_outer")
        .select(col("lang"), col("n_docs"), col("sum_chars"),
          (col("n_docs") === col("n_docs_post") &&
            col("sum_chars") === col("sum_chars_post"))
            .as("debt_settled_match"))
    }),

    // Entity resolution with survivorship — the CLUSTER half q102's
    // blocked pair matching stops short of: edit-distance matches
    // (levenshtein ≤ 2) become connected components
    // (Dedup.duplicateClusters — min-label propagation, the q43/q68
    // machinery), and each cluster elects a GOLDEN RECORD by
    // survivorship rules (canonical name from the min-key member,
    // max price, min size, membership counts). Scale shape: the
    // match space is the identical-name collapse first (one
    // name-grain aggregate — the q35/q41 discipline), then
    // EntityBlocking.edCandidatePairs generates a LOSSLESS blocked
    // candidate set (q-gram count filtering + DF-ordered AllPairs
    // prefixes + length window — equi-joins only, sub-quadratic
    // growth pinned by ErScaleGuardSpec) and the banded levenshtein
    // verifies candidates only — never name × name. CC
    // shuffles (id, label) pairs only; payloads re-join at the end.
    "q394_entity_resolution" -> ((s, d) => {
      val parts = Tables(s, d).part.select(col("p_partkey"), col("p_name"),
        round(col("p_retailprice") * 100, 0).cast("long").as("cents"),
        col("p_size").cast("long").as("psize"))
      val names = parts.groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("rep"))
      val pairs = erMatchPairs(names)
      val clusters = graft.operators.Dedup
        .duplicateClusters(pairs, names.select(col("rep")))
        .withColumnRenamed("doc_id", "rep")
      val canon = names.join(clusters, Seq("rep"))
        .filter(col("rep") === col("cluster_id"))
        .select(col("cluster_id"), col("p_name").as("canonical_name"))
      parts.join(names, Seq("p_name")).join(clusters, Seq("rep"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("p_name")).as("n_names"),
          max(col("cents")).as("max_price_cents"),
          min(col("psize")).as("min_size"))
        .join(canon, Seq("cluster_id"))
    }),

    // Windowed sequential-pattern support (the SPAM / windowed-
    // PrefixSpan counting step): for every ordered event-type triple,
    // how many users exhibit it as a SUBSEQUENCE completing within
    // 6 h? Distinct from q260 (strict adjacency) and q291 (fixed
    // funnel): all 125 patterns at once, gaps allowed, span bounded.
    // Per user the check is exact greedy earliest-completion — from
    // each t1 occurrence take the first t2 after it, then the first
    // t3 after that; if ANY start completes inside the window the
    // pattern is supported (greedy is optimal for a fixed window:
    // any witness's t1 start admits an earliest-completion witness
    // no longer than it). Shape: one (user, type) aggregate holds
    // sorted µs arrays; the type³ fan-out is 125 bounded rows per
    // user; the lambdas are interpreted but per-user work is
    // |history|²-bounded and embarrassingly user-parallel — no
    // corpus-grain shuffle after the first aggregate.
    "q395_seq_support" -> ((s, d) => {
      val big = Long.MaxValue
      val win = 6L * 3600L * 1000000L
      val ut = Tables(s, d).events
        .groupBy(col("user_id"), col("event_type"))
        .agg(sort_array(collect_list(unix_micros(col("ts")))).as("a"))
      val x1 = ut.select(col("user_id"), col("event_type").as("t1"),
        col("a").as("a1"))
      val x2 = ut.select(col("user_id"), col("event_type").as("t2"),
        col("a").as("a2"))
      val x3 = ut.select(col("user_id"), col("event_type").as("t3"),
        col("a").as("a3"))
      val n = Tables(s, d).events
        .agg(countDistinct(col("user_id")).as("n_users"))
      x1.join(x2, Seq("user_id")).join(x3, Seq("user_id"))
        .withColumn("ok", expr(
          s"exists(a1, s -> coalesce(array_min(filter(a3, z -> z > " +
            s"coalesce(array_min(filter(a2, y -> y > s)), ${big}L))), " +
            s"${big}L) - s <= ${win}L)"))
        .filter(col("ok"))
        .groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("support_users"))
        .crossJoin(broadcast(n))
        .select(col("t1"), col("t2"), col("t3"), col("support_users"),
          expr("(support_users * 1000) div n_users").as("support_permille"))
    }),

    // Kaplan-Meier survival curve for time-to-first-purchase with
    // right censoring (q362 histograms the converters only; KM is
    // the estimator that uses NON-converters correctly — censored at
    // their last observed day, they leave the risk set without
    // counting as events). S(t) = ∏_{steps ≤ t} (n_u − d_u)/n_u in
    // ppm fixed point, FLOORED AT EACH STEP — the defined statistic,
    // identical in both engines (a float product would drift).
    // Shape: one user-keyed aggregate builds (T, event); everything
    // after runs at duration-day grain (≤ observation-window rows —
    // the unpartitioned risk-set window is over that bounded frame);
    // the prefix products fold a broadcast packed-long step array
    // (n_risk·10⁹ + d), slice-per-step, O(steps²) on ≤31 rows.
    "q396_kaplan_meier" -> ((s, d) => {
      val u = Tables(s, d).events.groupBy(col("user_id")).agg(
        min(col("ts")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
        max(col("ts")).as("tl"))
      val dur = u.select(
        when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
          .otherwise(datediff(col("tl"), col("t0"))).cast("long").as("t"),
        col("tp").isNotNull.cast("long").as("ev"))
      val byt = dur.groupBy(col("t")).agg(sum(col("ev")).as("d"),
        sum(lit(1L) - col("ev")).as("c"), count(lit(1)).as("cnt"))
      val tot = dur.agg(count(lit(1)).as("n"))
      val wRisk = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = byt.crossJoin(broadcast(tot)) // duration-day grain frame
        .withColumn("n_risk", col("n") - sum(col("cnt")).over(wRisk) + col("cnt"))
      val steps = risk.filter(col("d") > 0)
        .withColumn("idx", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("t"))))
        .withColumn("pack", col("n_risk") * 1000000000L + col("d"))
      val arr = steps.agg(expr(
        "transform(sort_array(collect_list(struct(t, pack))), x -> x.pack)")
        .as("a"))
      steps.crossJoin(broadcast(arr))
        .select(col("t").as("t_days"), col("n_risk"), col("d").as("d_events"),
          col("c").as("censored_here"),
          expr("aggregate(slice(a, 1, CAST(idx AS INT)), 1000000L, " +
            "(acc, x) -> (acc * ((x div 1000000000L) - (x % 1000000000L))) " +
            "div (x div 1000000000L))").as("surv_ppm"))
    }),

    // Classic one-way ANOVA sufficient statistics (cents by return
    // flag) — the parametric sibling of q386's rank ANOVA, shipped
    // as the q203/q387 sufficient-statistics discipline: n_i, ΣX,
    // ΣX² per group reconstruct SSB/SSW/F exactly, while F itself
    // has no common integer form. ΣX² needs DECIMAL(38,0) (cents²
    // sums pass int64 fast) and ships as STRING; the actionable
    // per-group readout is the mean deviation from the grand mean in
    // exact permille via cross-multiplication. ONE map-side-combined
    // aggregate over the fact table; the grand totals are a 1-row
    // broadcast.
    "q397_anova_stats" -> ((s, d) => {
      val li = Tables(s, d).lineitem.select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      val g = li.groupBy(col("flag")).agg(
        count(lit(1)).as("n_i"),
        sum(col("cents")).as("s_i"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("q_i"))
      val tot = g.agg(sum(col("n_i")).as("n"), sum(col("s_i")).as("s"))
      g.crossJoin(broadcast(tot))
        .select(col("flag"), col("n_i"),
          col("s_i").cast("string").as("sum_cents"),
          col("q_i").cast("decimal(38,0)").cast("string").as("sumsq_cents"),
          expr("(CAST(s_i AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) " +
            "* n_i) * 1000 div (CAST(s AS DECIMAL(38,0)) * n_i)")
            .as("mean_dev_permille"))
    }),

    // Deterministic WEIGHTED priority sampling — q60/q366 sample
    // uniformly; here longer documents must be proportionally MORE
    // likely (token-budget curation samples by content mass, not doc
    // count). Priority = md5₂₄(doc_id)·10⁶ div n_chars: the md5 int
    // is a fixed uniform draw, dividing by the weight shrinks heavy
    // docs' priorities (the integer determinization of weighted
    // bottom-k / Efraimidis-Spirakis priority sampling — inclusion
    // is monotone in weight, reproducible across engines, re-runs
    // and partitionings, where rand()-based weighted sampling is
    // none of those). Bottom-10 per source via a source-keyed window
    // (never a global sort); the sampled-mass permille rides a
    // broadcast of source totals + a 10-row bounded window.
    "q398_weighted_sample" -> ((s, d) => {
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("source"), col("n_chars"))
      val tot = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("w_src"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("pri"), col("doc_id"))
      val sampled = docs
        .withColumn("pri", expr(
          "(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) " +
            "AS BIGINT) * 1000000) div n_chars"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
      sampled.join(broadcast(tot), Seq("source"))
        .withColumn("sample_w",
          sum(col("n_chars")).over(Window.partitionBy(col("source"))))
        .select(col("source"), col("doc_id"), col("n_chars"), col("pri"),
          col("rk"), expr("(sample_w * 1000) div w_src").as("sampled_mass_pm"))
    }),

    // WRITE-AUDIT-PUBLISH — the Iceberg branch workflow on Manifest
    // refs: writers commit staging versions freely at the HEAD, a
    // bounded audit (1-row aggregate verdict) gates the atomic swing
    // of the `main` ref, and downstream readers — who follow the ref,
    // never the head — cannot observe an unaudited commit. A failed
    // audit costs nothing to roll back: the ref simply never moves.
    // The require proves the protocol (ref at base while staged, at
    // the staged version only after the audit passed); the aggregate
    // is computed through readRef, the reader's actual path.
    "q399_wap_publish" -> ((s, d) => {
      val root = freshScratch("q399", d)
      val orders = Tables(s, d).orders
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      graft.operators.Manifest.commitAdd(
        orders.filter(col("o_orderkey") % 3 === 0), root, "m0")
      val vBase = graft.operators.Manifest.commitAdd(
        orders.filter(col("o_orderkey") % 3 === 1), root, "m1")
      graft.operators.Manifest.setRef(root, "main", vBase)
      val staged = orders.filter(col("o_orderkey") % 3 === 2)
      val vStaged = graft.operators.Manifest.commitAdd(staged, root, "m2")
      require(graft.operators.Manifest.refVersion(root, "main")
        .contains(vBase),
        "q399: the ref must stay at base while the commit is staged")
      // the audit verdict is a bounded 1-row collect (the q355/q363
      // discipline): nonempty batch, no null keys, no negative cents
      val a = staged.agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("nulls"),
        sum(when(col("cents") < 0L, 1L).otherwise(0L)).as("neg"))
        .collect()(0)
      val pass = a.getLong(0) > 0 && a.getLong(1) == 0 && a.getLong(2) == 0
      if (pass) graft.operators.Manifest.setRef(root, "main", vStaged)
      require(graft.operators.Manifest.refVersion(root, "main")
        .contains(if (pass) vStaged else vBase),
        "q399: ref must move exactly when the audit passes")
      graft.operators.Manifest.readRef(s, root, "main")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).cast("long").as("sum_cents"))
        .withColumn("audit_passed", lit(pass))
    }),

    // Exact linear-regression sufficient statistics (chars → tokens
    // per language): n, Σx, Σy, Σxy, Σx² reconstruct the OLS fit
    // exactly (the q397 discipline applied to regression), and the
    // actionable readouts — slope and intercept in exact permille —
    // are pure DECIMAL(38,0) cross-multiplications:
    //   slope·10³    = (n·Σxy − Σx·Σy)·1000 div (n·Σx² − Σx·Σx)
    //   intercept·10³ = (Σy·Σx² − Σx·Σxy)·1000 div (n·Σx² − Σx·Σx)
    // ONE map-side-combined aggregate over the corpus; no floats, so
    // the fit hash-matches (float OLS accumulates in engine-specific
    // order).
    "q400_linreg_stats" -> ((s, d) => {
      Tables(s, d).documents
        .select(col("lang"), col("n_chars").as("x"),
          size(split(col("text"), " ")).cast("long").as("y"))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select(col("lang"), col("n"), col("sx"), col("sy"),
          col("sxy").cast("decimal(38,0)").cast("string").as("sum_xy"),
          col("sxx").cast("decimal(38,0)").cast("string").as("sum_xx"),
          expr("(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000 " +
            "div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)")
            .as("slope_permille"),
          expr("(CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS " +
            "DECIMAL(38,0)) * sxy) * 1000 div (n * sxx - " +
            "CAST(sx AS DECIMAL(38,0)) * sx)").as("intercept_permille"))
    }),

    // Price-volume bridge (the BI revenue-change decomposition):
    // each brand's 1996→1997 revenue delta splits into a VOLUME
    // effect ((V₂−V₁)·r₁ — what changing unit volume alone would
    // have done at the old rate) and a PRICE/RATE effect (the exact
    // remainder), with rate r₁ = R₁/V₁ applied by cross-
    // multiplication: volume_effect = (V₂−V₁)·R₁ div V₁, floored —
    // and integer division truncates toward zero identically in both
    // engines for the negative deltas, so no sign-splitting (the
    // q257-note discipline). The identity Δ = volume + price holds
    // BY CONSTRUCTION (price is the remainder). One brand×year
    // aggregate is the only corpus shuffle; the bridge joins two
    // ≤|brands|-row frames (defined on brands present in both years).
    "q401_price_volume_bridge" -> ((s, d) => {
      val t = Tables(s, d)
      val li = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(year(col("l_shipdate")).isin(1996, 1997))
        .select(col("p_brand").as("brand"), year(col("l_shipdate")).as("yr"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"))
      val g = li.groupBy(col("brand"), col("yr"))
        .agg(sum(col("cents")).as("r"), sum(col("qty")).as("v"))
      val y1 = g.filter(col("yr") === 1996)
        .select(col("brand"), col("r").as("r1"), col("v").as("v1"))
      val y2 = g.filter(col("yr") === 1997)
        .select(col("brand"), col("r").as("r2"), col("v").as("v2"))
      y1.join(y2, Seq("brand"))
        .withColumn("delta_cents", col("r2") - col("r1"))
        .withColumn("volume_effect_cents",
          expr("((v2 - v1) * r1) div v1"))
        .select(col("brand"), col("r1"), col("v1"), col("r2"), col("v2"),
          col("delta_cents"), col("volume_effect_cents"),
          (col("delta_cents") - col("volume_effect_cents"))
            .as("price_effect_cents"))
    }),

    // Half-life–decayed attribution — the missing member of the
    // credit family (q132 last-touch, q221 first-touch, q372 linear):
    // each purchase credits its trailing-7-day clicks with weight
    // 2^(7−age_days), so yesterday's click earns twice last week's.
    // Credit per click = cents·w div Σw, FLOORED (the q372 integer-
    // credit discipline — remainders deliberately unassigned, the
    // defined statistic in both engines); weights are exact powers
    // of two via shiftleft, never a float exp(). Join shape: the
    // user-keyed purchase×click equi-join + day-range filter (the
    // q372 window), credit grouped to the age histogram.
    "q402_decay_attribution" -> ((s, d) => {
      val ev = Tables(s, d).events
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          to_date(col("ts")).as("pd"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), to_date(col("ts")).as("cd"))
      val touches = p.join(c, Seq("user_id"))
        .withColumn("age", datediff(col("pd"), col("cd")).cast("long"))
        .filter(col("age") >= 0 && col("age") <= 7)
        .withColumn("w", expr("shiftleft(1L, CAST(7 - age AS INT))"))
      val byP = touches.groupBy(col("pid"), col("cents"))
        .agg(sum(col("w")).as("sumw"))
      touches.join(byP.select(col("pid"), col("sumw")), Seq("pid"))
        .withColumn("credit", expr("(cents * w) div sumw"))
        .groupBy(col("age"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit")).cast("long").as("credited_cents"))
    }),

    // k-anonymity GENERALIZATION ladder — q328 audits violations;
    // this EXECUTES the fix: (source, lang) groups under k = 5
    // coarsen source→'*' (level 1), still-small groups coarsen
    // lang→'*' too (level 2), so every published group either meets
    // k or is fully generalized. Two bounded rounds over the
    // ≤|source×lang| cell grid (the corpus pays ONE cell aggregate);
    // membership is decided per ORIGINAL cell, then sizes re-
    // aggregate per output group — the ladder is deterministic, no
    // row ever visits two levels.
    "q403_kanon_generalize" -> ((s, d) => {
      val k = 5L
      val cell = Tables(s, d).documents
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n0"))
      val l1 = cell.withColumn("ok0", col("n0") >= k)
      // level-1 candidate sizes: lang totals over the SMALL cells only
      val small = l1.filter(!col("ok0"))
      val langTot = small.groupBy(col("lang")).agg(sum(col("n0")).as("n1"))
      val routed = l1.join(langTot, Seq("lang"), "left")
        .withColumn("lvl",
          when(col("ok0"), 0L)
            .when(col("n1") >= k, 1L)
            .otherwise(2L))
        .select(
          when(col("lvl") === 0L, col("source")).otherwise(lit("*"))
            .as("source_out"),
          when(col("lvl") <= 1L, col("lang")).otherwise(lit("*"))
            .as("lang_out"),
          col("lvl"), col("n0"))
      routed.groupBy(col("source_out"), col("lang_out"), col("lvl"))
        .agg(sum(col("n0")).as("group_size"),
          count(lit(1)).as("n_cells_merged"))
    }),

    // Bellman-Ford bounded-hop cheapest path — the WEIGHTED sibling
    // of q131's BFS on the token-transition graph: edge cost
    // 1 + 10⁶ div c(a→b) makes rare transitions expensive (the
    // integer stand-in for −log p without libm), and four relax
    // rounds give the exact ≤4-hop cheapest cost from the minimum
    // token. Each round is one edge⋈labels join + a per-node min —
    // (tok, dist) pairs only, localCheckpoint truncating lineage
    // (the q131/q257 loop shape); the oracle replays the rounds as
    // MATERIALIZED CTEs. Deterministic converged or not: the output
    // is DEFINED as the round-4 state.
    "q404_bellman_ford" -> ((s, d) => {
      val docs = TextOps.parallelized(Tables(s, d).documents)
        .select(split(col("text"), " ").as("ws"))
      val edges = docs.select(explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (x, y) -> struct(x AS a, y AS b))")).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .filter(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .select(col("a"), col("b"), expr("1 + 1000000 div c").as("w"))
        .localCheckpoint()
      var labels = edges.agg(min(col("a")).as("tok"))
        .select(col("tok"), lit(0L).as("dist")).localCheckpoint()
      for (_ <- 1 to 4) {
        val relaxed = edges.join(labels.withColumnRenamed("tok", "a"), "a")
          .select(col("b").as("tok"), (col("dist") + col("w")).as("dist"))
        labels = labels.unionByName(relaxed)
          .groupBy(col("tok")).agg(min(col("dist")).as("dist"))
          .localCheckpoint()
      }
      labels
    }),

    // Streaming merge-on-read delete ingestion — the RTBF/CDC-delete
    // queue as a STREAM (q375 streams upserts copy-on-write; deletes
    // deserve the cheap path): each micro-batch of doomed keys
    // commits ONE equality-delete file (no data member probed or
    // rewritten), the batch-id member-name ledger makes redelivery
    // exactly-once, and a reader following readMor converges to the
    // fully-deleted view. The require pins the protocol (3 delete
    // commits on top of the base version, all data members
    // untouched); the aggregate reads through readMor and oracles as
    // the plain NOT-IN filter.
    "q405_stream_mor_deletes" -> ((s, d) => {
      val root = freshScratch("q405", d)
      val feed = s"$root/feed"; val table = s"$root/table"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(docs, table, "base")
      val dataPre = graft.operators.Manifest.dataMembers(table, 1)
      def stage(name: String, mtime: Long, df: DataFrame): Unit =
        graft.streaming.LakeIngest.stageBatchFile(feed, name, mtime, df)
      stage("k0.parquet", 1000000L,
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
      stage("k1.parquet", 2000000L,
        docs.filter(col("doc_id") % 5 === 0).select(col("doc_id")))
      stage("k2.parquet", 3000000L,
        docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
      val v = graft.streaming.LakeIngest.deleteFeedToMor(
        s, feed, s"$root/ckpt", table, "doc_id")
      require(v == 4 &&
        graft.operators.Manifest.dataMembers(table, v) == dataPre &&
        graft.operators.Manifest.deleteMembers(table, v).size == 3,
        "q405: 3 delete batches must commit 3 delete files, rewrite nothing")
      graft.operators.Manifest.readMor(s, table, v)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Partition-SPEC evolution — the Iceberg behavior q379's static
    // pruning stops short of: the table starts life UNPARTITIONED
    // (one untagged gen-1 member), the spec later evolves to (lang),
    // and gen-2 commits tag their members. A lang='de' read prunes
    // gen-2 down to its de member while conservatively keeping the
    // pre-evolution member (no tag → must read) — old files NEVER
    // rewrite on a spec change, and the row-level filter on the
    // pruned union keeps the answer exact. The require pins the
    // pruning outcome (4 of 5 gen-2 members skipped, gen-1 kept).
    "q408_partition_evolution" -> ((s, d) => {
      val root = freshScratch("q408", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 0), root, "g1-all")
      Seq("de", "en", "es", "fr", "zh").foreach { l =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 2 === 1 && col("lang") === l),
          root, s"g2-$l", partition = Map("lang" -> l))
      }
      val v = graft.operators.Manifest.currentVersion(root)
      val pruned = graft.operators.Manifest.prunedMembersByPartition(
        root, v, "lang", "de")
      require(pruned.toSet ==
          Set(s"$root/files/g1-all", s"$root/files/g2-de"),
        s"q408: must keep the untagged gen-1 member + the de gen-2 " +
          s"member, got $pruned")
      s.read.parquet(pruned: _*)
        .filter(col("lang") === "de")
        .groupBy(expr("doc_id % 7").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Metadata-only COUNT(*) — the Iceberg scan-free aggregate: every
    // writer records each member's footer-exact `rows` stat at commit
    // (Manifest.rowsJson), so per-language counts are a MANIFEST
    // PARSE — the answer never touches a data page, which at 100 TB
    // is the difference between milliseconds and a full-table scan.
    // The result frame is built from driver-side metadata alone
    // (require-proved: one member per language, counts summing to the
    // committed total); the oracle recomputes from the rows.
    "q409_metadata_count" -> ((s, d) => {
      val root = freshScratch("q409", d)
      val docs = Tables(s, d).documents.select(col("doc_id"), col("lang"))
      Seq("de", "en", "es", "fr", "zh").foreach { l =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("lang") === l), root, s"p-$l",
          partition = Map("lang" -> l))
      }
      val v = graft.operators.Manifest.currentVersion(root)
      val stats = graft.operators.Manifest.metadataRowCounts(root, v)
      require(stats.size == 5 && stats.forall(_._2.contains("lang")),
        s"q409: expected 5 lang-tagged members, got $stats")
      import s.implicits._
      stats.map { case (_, tags, n) => (tags("lang"), n) }
        .toDF("lang", "n_docs")
    }),

    // Incremental maintenance of a NON-algebraic aggregate — the
    // textbook-hard IVM case q381's count/sum feed sidesteps: MIN
    // cannot fold deletes. Inserts stay algebraic (least of view and
    // batch mins, no base access); a delete touches the view only
    // when it removes a group's CURRENT min — those DIRTY groups
    // (deleted-min == view-min, conservative) recompute over
    // base∖deletes restricted by a broadcast semi-join, so at 100 TB
    // the recompute scans the dirty groups' slice, never the table.
    // New-group inserts ride the full-outer merge. The maintained
    // view IS the result — the oracle recomputes the final state
    // from scratch, so a wrong maintenance path hash-mismatches.
    "q410_ivm_min_deletes" -> ((s, d) => {
      val base = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      // the standing materialized view: per-lang min + count
      val view = base.groupBy(col("lang"))
        .agg(min(col("n_chars")).as("mn"), count(lit(1)).as("n"))
      val dels = base.filter(col("doc_id") % 6 === 0)
      val ins = base.filter(col("doc_id") % 13 === 0)
        .select((-col("doc_id") - 1).as("doc_id"),
          when(col("doc_id") % 2 === 0, col("lang")).otherwise(lit("xx"))
            .as("lang"),
          (col("n_chars") - 7).as("n_chars"))
      val dsum = dels.groupBy(col("lang"))
        .agg(min(col("n_chars")).as("dmn"), count(lit(1)).as("dn"))
      val isum = ins.groupBy(col("lang"))
        .agg(min(col("n_chars")).as("imn"), count(lit(1)).as("in_n"))
      // dirty groups: a deleted row carried the group's current min
      val dirty = view.join(dsum, "lang")
        .filter(col("dmn") === col("mn")).select(col("lang"))
      // targeted recompute: ONLY the dirty groups' surviving base rows
      val rec = base.join(dels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .join(broadcast(dirty), Seq("lang"), "left_semi")
        .groupBy(col("lang")).agg(min(col("n_chars")).as("rmn"))
      view
        .join(dsum, Seq("lang"), "full_outer")
        .join(isum, Seq("lang"), "full_outer")
        .join(rec, Seq("lang"), "full_outer")
        .withColumn("recomputed", col("rmn").isNotNull ||
          (col("dmn").isNotNull && col("dmn") === col("mn")))
        .withColumn("n_docs", coalesce(col("n"), lit(0L)) -
          coalesce(col("dn"), lit(0L)) + coalesce(col("in_n"), lit(0L)))
        .filter(col("n_docs") > 0)
        // survivor min: recomputed groups take rmn (null = emptied by
        // deletes), clean groups keep mn; inserts fold via least
        .withColumn("smn",
          when(col("recomputed"), col("rmn")).otherwise(col("mn")))
        .withColumn("min_chars",
          least(coalesce(col("smn"), col("imn")),
            coalesce(col("imn"), col("smn"))).cast("long"))
        .select(col("lang"), col("n_docs"), col("min_chars"),
          col("recomputed"))
    }),

    // Cross-table ATOMIC transaction — the consistency leg
    // single-table formats lack: a dim table and a stats table must
    // move together or a reader's join sees torn state. The writer
    // commits each table's v2 SEPARATELY (dim first); between those
    // commits the raw table heads ARE torn (require-proved: dim head
    // has more rows than stats v1), but a reader resolving versions
    // through txn 1 still sees the old CONSISTENT pair — the join
    // invariant (equal row counts) holds at every txn, never in
    // between. The result is the txn-2 join; operators.Txn publishes
    // one atomic metadata record per transaction.
    "q412_cross_table_txn" -> ((s, d) => {
      val root = freshScratch("q412", d)
      val dimT = s"$root/dim"; val statT = s"$root/stats"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val half = docs.filter(col("doc_id") % 2 === 0)
      graft.operators.Manifest.commitAdd(
        half.select(col("doc_id"), col("lang")), dimT, "b1")
      graft.operators.Manifest.commitAdd(
        half.select(col("doc_id"), col("n_chars")), statT, "b1")
      val t1 = graft.operators.Txn.commit(root,
        Map(dimT -> 1, statT -> 1))
      // the interleaved writer: dim's v2 lands FIRST...
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang")), dimT, "b2")
      // ...and at THIS instant the raw heads are torn, but the txn
      // reader is not (the whole point):
      val a1 = graft.operators.Txn.readAt(s, root, t1, dimT).count()
      val b1 = graft.operators.Txn.readAt(s, root, t1, statT).count()
      val tornHead = graft.operators.Manifest.read(s, dimT,
        graft.operators.Manifest.currentVersion(dimT)).count()
      require(a1 == b1 && tornHead > b1,
        s"q412: txn read must stay consistent ($a1 vs $b1) while the " +
          s"raw head is torn ($tornHead)")
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("n_chars")), statT, "b2")
      val t2 = graft.operators.Txn.commit(root,
        Map(dimT -> 2, statT -> 2))
      graft.operators.Txn.readAt(s, root, t2, dimT)
        .join(graft.operators.Txn.readAt(s, root, t2, statT), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Three-way BRANCH MERGE — the lakeFS/dolt operation q399's
    // linear WAP refs can't express: main and a branch diverge from
    // the same base (main: +10 to every 5th doc, deletes every 11th
    // non-5th; branch: +100 to every 7th, inserts a new doc per
    // 17th), then the branch merges back with git key semantics.
    // Conflicts = keys both sides touched with DIFFERENT outcomes
    // (%35 edit/edit, %7∧%11∖%5 edit/delete); policy main-wins keeps
    // main's image. Cost: two key-shaped diffs + one CDC apply whose
    // rewrite touches only members holding merged keys. Output: the
    // merged per-lang state plus the conflict count — the oracle
    // recomputes both from the rules, so a wrong merge matrix
    // hash-mismatches.
    "q413_branch_merge" -> ((s, d) => {
      val root = freshScratch("q413", d)
      val mainT = s"$root/main"; val branchT = s"$root/branch"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(docs, mainT, "base")
      graft.operators.Manifest.commitAdd(docs, branchT, "base")
      val mainCh = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 10).as("n_chars"), lit("U").as("op"))
        .unionByName(
          docs.filter(col("doc_id") % 11 === 0 && col("doc_id") % 5 =!= 0)
            .select(col("doc_id"), col("lang"), col("n_chars"),
              lit("D").as("op")))
      graft.operators.Manifest.applyCdcBatch(mainCh, mainT, "doc_id", "m2")
      val brCh = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 100).as("n_chars"), lit("U").as("op"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((-col("doc_id") - 1).as("doc_id"), col("lang"),
            (col("n_chars") + 3).as("n_chars"), lit("I").as("op")))
      graft.operators.Manifest.applyCdcBatch(brCh, branchT, "doc_id", "b2")
      val (vm, conflicts) = graft.operators.Manifest.mergeBranch(
        s, mainT, 1, branchT, 1, "doc_id", Seq("lang", "n_chars"), "mrg")
      val conf = conflicts
        .groupBy(coalesce(col("main_lang"), col("branch_lang")).as("lang"))
        .agg(count(lit(1)).cast("long").as("n_conflicts"))
      graft.operators.Manifest.read(s, mainT, vm)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .join(conf, Seq("lang"), "left")
        .withColumn("n_conflicts", coalesce(col("n_conflicts"), lit(0L)))
    }),

    // Schema evolution UNDER row-level maintenance — the interplay
    // q360's mergeSchema read and q366's COW delete each show alone:
    // gen-1 members predate the n_chars column, gen-2 members carry
    // it, old files never rewrite when the column arrives, and a COW
    // delete then probes and rewrites members INDIVIDUALLY — each
    // under its OWN generation's schema. Manifest.readEvolved
    // resolves the union schema from every member footer
    // (metadata-scale), so gen-1 rows surface NULL n_chars instead
    // of depending on which file the reader sampled. Output: per
    // lang, surviving docs, docs with a known n_chars, their sum.
    "q418_evolving_maintenance" -> ((s, d) => {
      val root = freshScratch("q418", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang")), root, "gen1")
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 1), root, "gen2")
      // %5 hits both parities → BOTH generations' members rewrite
      graft.operators.Manifest.deleteWhere(s, root,
        col("doc_id") % 5 === 3, "del")
      val v = graft.operators.Manifest.currentVersion(root)
      graft.operators.Manifest.readEvolved(s, root, v)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          count(col("n_chars")).cast("long").as("n_with_chars"),
          coalesce(sum(col("n_chars")), lit(0L)).cast("long")
            .as("sum_chars"))
    }),

    // JOIN incremental view maintenance across a cross-table
    // transaction — the hard IVM case (q381 maintains one table,
    // q410 a non-algebraic aggregate; a JOIN view needs the
    // two-sided delta rule ΔJ = ΔA⋈B₂ ∪ A₁⋈ΔB, which counts every
    // new pair exactly once incl. ΔA⋈ΔB). Deltas are FREE here:
    // both tables are append-only between txn 1 and txn 2, so
    // Manifest.addedRows reads exactly the member files the later
    // commits added — O(delta) IO, no key diffing, no snapshot
    // rescan — and the Txn pins make the two tables' versions
    // consistent at both ends. The maintained view IS the result;
    // the oracle computes the t2 join from scratch, so a wrong
    // delta rule hash-mismatches.
    "q419_join_ivm_txn" -> ((s, d) => {
      val root = freshScratch("q419", d)
      val dimT = s"$root/dim"; val statT = s"$root/stats"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang")), dimT, "b1")
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("n_chars")), statT, "b1")
      val t1 = graft.operators.Txn.commit(root, Map(dimT -> 1, statT -> 1))
      // neither side becomes exhaustive — the t2 join is a proper
      // subset of the corpus, so the delta rule has to be RIGHT
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("lang")), dimT, "b2")
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("n_chars")), statT, "b2")
      val t2 = graft.operators.Txn.commit(root, Map(dimT -> 2, statT -> 2))
      val p1 = graft.operators.Txn.pins(root, t1)
      val p2 = graft.operators.Txn.pins(root, t2)
      // the standing view at txn 1
      val j1 = graft.operators.Txn.readAt(s, root, t1, dimT)
        .join(graft.operators.Txn.readAt(s, root, t1, statT), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sc"))
      // two-sided delta: ΔA ⋈ B₂ (new dims × the FULL new stats)
      // ∪ A₁ ⋈ ΔB (OLD dims × new stats) — ΔA⋈ΔB pairs land in the
      // first leg only, so nothing double-counts
      val dA = graft.operators.Manifest.addedRows(
        s, dimT, p1(dimT), p2(dimT))
      val dB = graft.operators.Manifest.addedRows(
        s, statT, p1(statT), p2(statT))
      val leg1 = dA.join(
        graft.operators.Txn.readAt(s, root, t2, statT), "doc_id")
      val leg2 = graft.operators.Txn.readAt(s, root, t1, dimT).join(dB, "doc_id")
      val delta = leg1.unionByName(leg2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sc"))
      j1.unionByName(delta)
        .groupBy(col("lang"))
        .agg(sum(col("n")).cast("long").as("n_pairs"),
          sum(col("sc")).cast("long").as("sum_chars"))
    }),

    // Streaming maintenance COMPOSITION (r10 verdict item 6): q405
    // streams MOR delete commits, q393 settles debt offline — here
    // the stream settles its OWN debt mid-flight: four delete
    // batches drain with maxDeleteDebt=2, so batches 2 and 4 each
    // trip an in-stream compactDeletes (the require pins the event
    // log exactly: compactions after b1 and b3, none elsewhere, zero
    // debt at head). The isolation proof rides the result itself:
    // the mid-stream pin (the version holding deletes b0+b1, taken
    // BEFORE the first compaction) is read through readMor AFTER
    // both compactions rewrote every data member it references —
    // the pinned aggregate must still equal the exact b0+b1 delete
    // state (the oracle's mid CTE), or the compaction broke snapshot
    // isolation. Final state oracles as the all-batches NOT-IN.
    "q421_stream_auto_compact" -> ((s, d) => {
      val root = freshScratch("q421", d)
      val feed = s"$root/feed"; val table = s"$root/table"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      // two base members so compaction exercises multi-member rewrites
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 0), table, "base-even")
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 1), table, "base-odd")
      def stage(name: String, mtime: Long, df: DataFrame): Unit =
        graft.streaming.LakeIngest.stageBatchFile(feed, name, mtime, df)
      stage("k0.parquet", 1000000L,
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
      stage("k1.parquet", 2000000L,
        docs.filter(col("doc_id") % 5 === 0).select(col("doc_id")))
      stage("k2.parquet", 3000000L,
        docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
      stage("k3.parquet", 4000000L,
        docs.filter(col("doc_id") % 11 === 0).select(col("doc_id")))
      val events = graft.streaming.LakeIngest.deleteFeedToMorAutoCompact(
        s, feed, s"$root/ckpt", table, "doc_id", maxDeleteDebt = 2)
      val head = graft.operators.Manifest.currentVersion(table)
      require(events.map(_.compactedTo.isDefined) ==
          Seq(false, true, false, true) &&
          events(1).compactedTo.contains(events(1).deleteVersion + 1) &&
          head == events(3).compactedTo.get &&
          graft.operators.Manifest.deleteMembers(table, head).isEmpty,
        s"q421: expected compactions exactly after b1 and b3 with zero " +
          s"debt at head, got $events (head $head)")
      val midPin = events(1).deleteVersion // b0+b1 deletes, pre-compaction
      val mid = graft.operators.Manifest.readMor(s, table, midPin)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_mid"),
          sum(col("n_chars")).cast("long").as("chars_mid"))
      val fin = graft.operators.Manifest.readMor(s, table, head)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_final"),
          sum(col("n_chars")).cast("long").as("chars_final"))
      mid.join(fin, Seq("lang"), "left")
        .select(col("lang"), col("n_mid").cast("long").as("n_mid"),
          col("chars_mid"),
          coalesce(col("n_final"), lit(0L)).cast("long").as("n_final"),
          coalesce(col("chars_final"), lit(0L)).as("chars_final"))
    }),

    // CLUSTERED WRITE × manifest stats — the composition q125
    // (z-order zone maps) and q370 (stats-pruned reads) each show
    // half of: members are written as MORTON-ORDER OCTILES over
    // (n_chars, n_tokens), so each member's per-column min/max
    // stats are narrow on BOTH dims, and a 2-D box query prunes
    // members on the manifest alone. The same corpus written as
    // HASH buckets (every member spans the full range) prunes
    // NOTHING — the require pins clustered < unclustered pruned
    // counts, the measurable "clustering buys skipping" claim
    // (Delta/Iceberg OPTIMIZE ZORDER's whole point). The row-level
    // filter on the pruned union keeps the answer exact, so the
    // aggregate oracles as the plain box filter. The octile split
    // rides GroupedRank.withGlobalRank (range exchange, no
    // single-task sort); the corpus count is one bounded scalar.
    "q423_clustered_commit" -> ((s, d) => {
      val root = freshScratch("q423", d)
      val clus = s"$root/clustered"; val rand = s"$root/hashed"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .localCheckpoint()
      val coded = docs.withColumn("mz", graft.operators.ZOrder.morton16(
        col("n_chars").cast("int"), col("n_tokens").cast("int")))
      val n = docs.count()
      val ranked = graft.operators.GroupedRank.withGlobalRank(
        coded, Seq(col("mz"), col("doc_id")), "rk")
        .withColumn("bucket", expr(s"((rk - 1) * 8) div $n"))
        .localCheckpoint()
      for (b <- 0 until 8) {
        graft.operators.Manifest.commitAdd(
          ranked.filter(col("bucket") === b)
            .select(col("doc_id"), col("lang"), col("n_chars"),
              col("n_tokens")),
          clus, s"m$b", statsCols = Seq("n_chars", "n_tokens"))
        graft.operators.Manifest.commitAdd(
          docs.filter(pmod(xxhash64(col("doc_id")), lit(8)) === b),
          rand, s"m$b", statsCols = Seq("n_chars", "n_tokens"))
      }
      def pruned(t: String): Seq[String] =
        graft.operators.Manifest.prunedMembers(t, 8, "n_chars", 0L, 200L)
          .intersect(graft.operators.Manifest
            .prunedMembers(t, 8, "n_tokens", 0L, 40L))
      val (pc, pr) = (pruned(clus), pruned(rand))
      require(pc.nonEmpty && pc.size < pr.size,
        s"q423: clustering must buy member skipping — clustered keeps " +
          s"${pc.size}, hashed keeps ${pr.size}")
      s.read.parquet(pc: _*)
        .filter(col("n_chars") <= 200 && col("n_tokens") <= 40)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"))
    }),

    // Exact PERMUTATION TEST (resampling inference) — the
    // distribution-free sibling of q345's z-test: is the observed
    // arm difference in conversion larger than chance relabelings
    // produce? 64 deterministic permutations reassign every user by
    // md5(salt p ‖ user); the extremeness compare is exact rational
    // cross-multiplication in DECIMAL(38,0) — |ca/na − cb/nb| ≥
    // |cA/nA − cB/nB| without ever dividing, so varying arm sizes
    // per permutation cost no precision. Shape: one user-grain
    // aggregate, a 64-way bounded fan-out (explode over a literal
    // sequence), one (p, arm) aggregate — never a corpus-sized
    // shuffle beyond the first; the p-value is the add-one permille
    // (n_extreme+1)/(P+1).
    "q424_permutation_test" -> ((s, d) => {
      val users = Tables(s, d).events
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .localCheckpoint()
      def armOf(salt: Column) = when(
        substring(md5(concat(salt, lit("|"), col("user_id").cast("string"))),
          1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
        .otherwise("B")
      // column names must differ from the per-permutation na/ca/nb/cb
      // in more than case — Spark resolves case-insensitively
      val obs = users.withColumn("arm", armOf(lit("obs")))
        .groupBy()
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("obs_na"),
          sum(when(col("arm") === "A", col("conv")).otherwise(0L))
            .as("obs_ca"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("obs_nb"),
          sum(when(col("arm") === "B", col("conv")).otherwise(0L))
            .as("obs_cb"))
      val perms = users
        .select(col("user_id"), col("conv"),
          explode(sequence(lit(0), lit(63))).as("p"))
        .withColumn("arm", armOf(col("p").cast("string")))
        .groupBy(col("p"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("ca"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("cb"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      perms.crossJoin(broadcast(obs))
        .withColumn("extreme",
          abs(dec(col("ca") * col("nb") - col("cb") * col("na"))) *
            dec(col("obs_na") * col("obs_nb")) >=
            abs(dec(col("obs_ca") * col("obs_nb") -
              col("obs_cb") * col("obs_na"))) *
              dec(col("na") * col("nb")))
        .groupBy()
        .agg(count(lit(1)).cast("long").as("n_perms"),
          sum(when(col("extreme"), 1L).otherwise(0L)).cast("long")
            .as("n_extreme"),
          max(expr("(obs_ca * 1000) div obs_na - (obs_cb * 1000) div obs_nb"))
            .cast("long").as("obs_diff_permille"))
        .withColumn("p_permille",
          expr("((n_extreme + 1) * 1000) div (n_perms + 1)"))
    }),

    // Incrementally-MAINTAINED inverted index — q233's search index
    // made a lakehouse citizen: the postings table (bigram → doc_id)
    // is itself a Manifest table, and when the base table grows, the
    // index maintenance pays O(delta) — postings are extracted from
    // Manifest.addedRows' member files alone, never by re-shingling
    // the standing corpus (the q415 discipline applied to index
    // builds). The postings commit KEY-BUCKETED on the term (r14),
    // so the point LOOKUP reads only the term's bucket members
    // (BucketedIndex.prunedRead — the serving IO a search index
    // exists for; the term-derivation aggregate still reads the full
    // index, but that is offline term statistics, not the lookup).
    // The term derives deterministically (min bigram with document
    // frequency in [5, 50]) so the oracle recomputes the same search
    // from scratch. At 100 TB the daily index bill is the new
    // documents' postings plus one bucketed manifest commit, and a
    // lookup opens a couple of bucket files.
    "q425_incremental_index" -> ((s, d) => {
      val root = freshScratch("q425", d)
      val base = s"$root/docs"; val idx = s"$root/index"
      val kb = 16
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      def postings(df: DataFrame): DataFrame = df
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1)," +
            " slice(split(text, ' '), 2, size(split(text, ' ')) - 1)," +
            " (x, y) -> concat(x, ' ', y))")).as("bg"))
        .distinct()
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 0), base, "b1")
      graft.operators.BucketedIndex.commitBucketed(
        postings(graft.operators.Manifest.read(s, base, 1)), idx, "b1",
        Seq("bg"), kb)
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 2 === 1), base, "b2")
      graft.operators.BucketedIndex.commitBucketed(
        postings(graft.operators.Manifest.addedRows(s, base, 1, 2)),
        idx, "b2", Seq("bg"), kb)
      val iv = graft.operators.Manifest.currentVersion(idx)
      val index = graft.operators.Manifest.read(s, idx, iv)
      val term = index.groupBy(col("bg"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df").between(5, 50))
        .agg(min(col("bg")).as("bg"))
        .localCheckpoint() // 1 row; feeds the pruning keys + the join
      val hits = graft.operators.BucketedIndex.prunedRead(s, idx, iv,
          term.select(col("bg")), Seq("bg"), kb)
        .join(broadcast(term), Seq("bg"))
        .select(col("bg"), col("doc_id")).distinct()
      graft.operators.Manifest.read(s, base, 2)
        .join(hits, Seq("doc_id"))
        .groupBy(col("bg"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Theil–Sen ROBUST trend — the estimator OLS (q400) is not:
    // the median of all pairwise day-count slopes shrugs off the
    // outlier days that drag a least-squares line. Slopes stay
    // EXACT rationals (num, den): the order key is the IEEE double
    // num/den (bit-identical across engines for identical long
    // inputs) with (num, den) tie-breaks — a deterministic total
    // order without rational arithmetic in the sort. The pair grid
    // and the median window run over the day-grain aggregate
    // (≤ C(31,2) rows at every sf — bounded, pre-aggregated frame,
    // the q1562-style justification for the unpartitioned window).
    "q426_theil_sen" -> ((s, d) => {
      val daily = Tables(s, d).events
        .select(expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n"))
      val pairs = daily.as("a")
        .join(daily.as("b"), col("b.day") > col("a.day"))
        .select((col("b.n") - col("a.n")).cast("long").as("num"),
          (col("b.day") - col("a.day")).cast("long").as("den"))
      val np = pairs.agg(count(lit(1)).cast("long").as("n_pairs"))
      val w = Window.orderBy(col("slope"), col("num"), col("den"))
      pairs
        .withColumn("slope",
          col("num").cast("double") / col("den").cast("double"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .crossJoin(broadcast(np))
        .filter(col("rk") === expr("(n_pairs + 1) div 2"))
        .select(col("num").as("med_num"), col("den").as("med_den"),
          col("n_pairs"),
          expr("(num * 1000) div den").as("slope_permille"))
    }),

    // ROLLBACK / RESTORE — time travel made WRITABLE (the q363
    // family reads old versions; this resumes writing from one): a
    // bad commit lands, an audit catches it, Manifest.rollbackTo
    // republishes the last good member list as a new head
    // (metadata-only — no data file moves), and ingestion continues
    // on top. The bad version STAYS readable (auditable) — the
    // require pins the whole protocol: head numbering, the restored
    // state matching v2 exactly, and the bad batch still visible at
    // v3. The final aggregate oracles as good-batches-only; the bad
    // batch's row count rides along as an audit column.
    "q427_rollback_restore" -> ((s, d) => {
      val root = freshScratch("q427", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 3 === 0), root, "c1")
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 3 === 1), root, "c2")
      // the BAD batch: re-delivers c1's rows (a duplicate-ingest bug)
      graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 3 === 0), root, "bad")
      val badRows = graft.operators.Manifest.read(s, root, 3).count() -
        graft.operators.Manifest.read(s, root, 2).count()
      val v4 = graft.operators.Manifest.rollbackTo(root, 2)
      val v5 = graft.operators.Manifest.commitAdd(
        docs.filter(col("doc_id") % 3 === 2), root, "c3")
      require(v4 == 4 && v5 == 5 &&
        graft.operators.Manifest.members(root, 4) ==
          graft.operators.Manifest.members(root, 2) &&
        graft.operators.Manifest.members(root, 3)
          .exists(_.endsWith("/bad")),
        "q427: restore must republish v2's exact member list and " +
          "leave the bad version readable")
      graft.operators.Manifest.read(s, root, v5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .withColumn("bad_rows_quarantined", lit(badRows).cast("long"))
    }),

    // ATOMIC quarantine ingest — validation routing made a
    // TRANSACTION: each batch splits into valid rows (main table)
    // and rule-violating rows (quarantine table, carrying the rule
    // name), and a cross-table Txn pins BOTH commits, so a reader
    // resolving through the txn can never see accepted rows without
    // their quarantine complement (the torn-audit state ad-hoc
    // dual-writes allow). Rule here: n_chars < 100 → quarantined.
    // Two batches, two txns; the result reads both tables AT txn 2
    // and oracles as plain rule filters.
    "q428_quarantine_ingest" -> ((s, d) => {
      val root = freshScratch("q428", d)
      val main = s"$root/main"; val quar = s"$root/quarantine"
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      def ingest(batch: DataFrame, tag: String): Int = {
        graft.operators.Manifest.commitAdd(
          batch.filter(col("n_chars") >= 100), main, tag)
        graft.operators.Manifest.commitAdd(
          batch.filter(col("n_chars") < 100)
            .withColumn("rule", lit("min_chars_100")),
          quar, tag)
        graft.operators.Txn.commit(root,
          Map(main -> graft.operators.Manifest.currentVersion(main),
            quar -> graft.operators.Manifest.currentVersion(quar)))
      }
      ingest(docs.filter(col("doc_id") % 2 === 0), "b1")
      val t2 = ingest(docs.filter(col("doc_id") % 2 === 1), "b2")
      val ok = graft.operators.Txn.readAt(s, root, t2, main)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_valid"),
          sum(col("n_chars")).cast("long").as("chars_valid"))
      val bad = graft.operators.Txn.readAt(s, root, t2, quar)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_quarantined"))
      ok.join(bad, Seq("lang"), "full")
        .select(col("lang"),
          coalesce(col("n_valid"), lit(0L)).cast("long").as("n_valid"),
          coalesce(col("chars_valid"), lit(0L)).cast("long")
            .as("chars_valid"),
          coalesce(col("n_quarantined"), lit(0L)).cast("long")
            .as("n_quarantined"))
    }),

    // Mann–Kendall trend TEST — q426's Theil–Sen slope says how
    // steep; this says whether a monotone trend EXISTS: S = Σ_{i<j}
    // sign(n_j − n_i) over the day order, variance with the exact
    // tie correction (18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over
    // tied-count groups), and the 95% verdict by the continuity-
    // corrected compare 625·18·(|S|−1)² > 2401·V18 — the z > 1.96
    // test as pure integer cross-multiplication (1.96 = 49/25,
    // squared), no sqrt, no floats. τ_a = S/C(n,2) rides along in
    // permille. All frames are the bounded day-grain aggregate.
    "q429_mann_kendall" -> ((s, d) => {
      val daily = Tables(s, d).events
        .select(expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val sStat = daily.as("a")
        .join(daily.as("b"), col("b.day") > col("a.day"))
        .agg(sum(signum(col("b.n") - col("a.n")).cast("long")).as("s_stat"))
      val base = daily.agg(count(lit(1)).as("nd"))
        .select(col("nd"),
          expr("nd * (nd - 1) * (2 * nd + 5)").as("vbase"))
      val ties = daily.groupBy(col("n")).agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
          .as("vties"))
      sStat.crossJoin(broadcast(base)).crossJoin(broadcast(ties))
        .select(col("nd").cast("long").as("n_days"),
          col("s_stat").cast("long").as("s_stat"),
          (col("vbase") - col("vties")).cast("long").as("v18"),
          expr("(s_stat * 2000) div (nd * (nd - 1))").cast("long")
            .as("tau_permille"))
        .withColumn("trend_significant",
          expr("CAST(11250 AS DECIMAL(38,0)) * (abs(s_stat) - 1) " +
            "* (abs(s_stat) - 1) > CAST(2401 AS DECIMAL(38,0)) * v18"))
    }),

    // INCREMENTAL entity resolution — the daily-MDM shape q394's
    // self-match stops short of: a new batch of records matched
    // against the standing MASTER without ever re-pairing
    // master×master (the q406 delta-vs-base discipline applied to
    // edit distance). Candidates come from
    // EntityBlocking.edCandidatePairsCross — both sides' q-gram
    // prefixes under ONE union-derived DF order, so the blocking
    // stays lossless cross-side — and the banded levenshtein
    // verifies candidates only. Output: the match-multiplicity
    // histogram (0 matches = a NEW entity entering the master; 2+ =
    // a merge candidate needing review), the triage every MDM
    // ingest runs. Oracle replays the brute-force grid.
    "q430_incremental_er" -> ((s, d) => {
      val parts = Tables(s, d).part.select(col("p_partkey"), col("p_name"))
      val master = parts.filter(col("p_partkey") % 3 =!= 0)
        .groupBy(col("p_name")).agg(min(col("p_partkey")).as("rep"))
      val batch = parts.filter(col("p_partkey") % 3 === 0)
        .groupBy(col("p_name")).agg(min(col("p_partkey")).as("rep"))
      val cand = graft.operators.EntityBlocking.edCandidatePairsCross(
        batch, master, "rep", "p_name")
      val matches = cand
        .select(col("a_id").cast("long").as("b_rep"),
          col("b_id").cast("long").as("m_rep"))
        .join(batch.select(col("rep").as("b_rep"),
          col("p_name").as("b_name")), "b_rep")
        .join(master.select(col("rep").as("m_rep"),
          col("p_name").as("m_name")), "m_rep")
        .filter(levenshtein(col("b_name"), col("m_name"), 2) >= 0)
      batch.select(col("rep").as("b_rep"))
        .join(matches.groupBy(col("b_rep")).agg(count(lit(1)).as("nm")),
          Seq("b_rep"), "left")
        .withColumn("nm", coalesce(col("nm"), lit(0L)))
        .groupBy(col("nm").cast("long").as("n_matches"))
        .agg(count(lit(1)).cast("long").as("n_entities"))
    }),

    // Metadata-only MIN/MAX — metadataRowCounts' (q409) sibling:
    // per-member column stats land in the manifest at commit, so
    // table-level extrema (and the row count) fold from manifest
    // lines alone — ZERO data IO, the Iceberg scan-free aggregate.
    // Six members make the fold non-trivial; the emitted row is
    // built from driver-held metadata and oracles as the plain
    // SELECT min/max/count.
    "q431_metadata_minmax" -> ((s, d) => {
      val root = freshScratch("q431", d)
      val docs = Tables(s, d).documents.select(col("doc_id"), col("n_chars"))
      for (b <- 0 until 6)
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 6 === b), root, s"m$b",
          statsCols = Seq("n_chars"))
      val (mn, mx) = graft.operators.Manifest.metadataMinMax(root, 6, "n_chars")
      val rows = graft.operators.Manifest.metadataRowCounts(root, 6)
        .map(_._3).sum
      import s.implicits._
      Seq((mn, mx, rows)).toDF("min_chars", "max_chars", "n_rows")
    }),

    // Conjunctive (AND) search — q371's phrase lookup generalized to
    // multi-term boolean retrieval: three query terms derive
    // deterministically (the 1st/3rd/5th RAREST tokens by document
    // frequency — the rarest-first order is also the execution
    // discipline: real engines intersect postings starting from the
    // shortest list), and a document qualifies iff it contains ALL
    // three. The conjunction is one distinct-postings pass + a
    // broadcast term join + a doc-grain count==3 filter — never a
    // per-term corpus rescan. The term-ranking window runs over the
    // bounded vocabulary aggregate.
    "q432_conjunctive_search" -> ((s, d) => {
      val docs = Tables(s, d).documents
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val dfr = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.orderBy(col("df"), col("tok")) // vocab-sized frame
      // 3 rows, materialized once — both consumers (the postings
      // join and the label column) would otherwise re-derive it and
      // re-scan the corpus
      val terms = dfr.withColumn("rk", row_number().over(w))
        .filter(col("rk").isin(1, 3, 5)).select(col("tok"))
        .localCheckpoint()
      val termList = terms.agg(
        concat_ws(",", sort_array(collect_list(col("tok")))).as("terms"))
      toks.join(broadcast(terms), Seq("tok"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("k"))
        .filter(col("k") === 3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .crossJoin(broadcast(termList))
    }),

    // Fano factor (burstiness) of daily event arrivals per type —
    // variance-to-mean as an EXACT rational: with n days, s = Σc,
    // q = Σc², sample Var/mean = (n·q − s²) / ((n−1)·s), emitted in
    // permille by integer division. F ≈ 1000 is Poisson-like
    // arrivals; far above = bursty days — the traffic-shape audit
    // behind capacity planning and bot screens. One (type, day)
    // aggregate then a type-grain fold; no floats anywhere.
    "q433_fano_burstiness" -> ((s, d) => {
      val daily = Tables(s, d).events
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("q"))
        .select(col("event_type"), col("n_days").cast("long").as("n_days"),
          col("s").cast("long").as("total_events"),
          expr("(1000 * (n_days * q - s * s)) div ((n_days - 1) * s)")
            .cast("long").as("fano_permille"))
    }),

    // l-DIVERSITY audit — the third leg of the privacy trio (q217
    // k-anonymity: cell size; q384 t-closeness: distribution drift;
    // here: a quasi-identifier cell is safe only if its SENSITIVE
    // attribute takes at least l distinct values — a k-anonymous
    // cell where everyone shares one sensitive value still leaks).
    // Quasi-identifiers: (lang, source); sensitive: the document
    // length class. Per cell: size and distinct sensitive values;
    // the verdict column flags l >= 3. One two-key aggregate.
    "q434_l_diversity" -> ((s, d) => {
      val docs = Tables(s, d).documents
        .select(col("lang"), col("source"),
          when(col("n_chars") < 150, "short")
            .when(col("n_chars") < 300, "medium")
            .otherwise("long").as("len_class"))
      docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).cast("long").as("cell_size"),
          countDistinct(col("len_class")).cast("long").as("l_distinct"))
        .withColumn("diverse_l3", col("l_distinct") >= 3)
    }),

    // Layout-health AUDIT from metadata alone — the OPTIMIZE advisor
    // every table service runs: member count, extrema and skew of
    // per-member row counts, all folded from manifest `rows` stats
    // (zero data IO — the q409/q431 discipline applied to layout
    // health). Members here are the per-lang partitions, so their
    // sizes — and the audit's every number — replay exactly from the
    // documents table in the oracle. skew = 1000·max·n/total (1000 =
    // perfectly balanced).
    "q435_layout_audit" -> ((s, d) => {
      val root = freshScratch("q435", d)
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
      Seq("de", "en", "es", "fr", "zh").foreach { l =>
        graft.operators.Manifest.commitAdd(
          docs.filter(col("lang") === l), root, s"p-$l",
          partition = Map("lang" -> l))
      }
      val counts = graft.operators.Manifest
        .metadataRowCounts(root, 5).map(_._3)
      import s.implicits._
      Seq((counts.size.toLong, counts.min, counts.max, counts.sum,
        1000L * counts.max * counts.size / counts.sum))
        .toDF("n_members", "min_rows", "max_rows", "total_rows",
          "skew_permille")
    }),

    // Out-of-orderness audit — the measurement that SIZES a
    // streaming watermark: per user, each event's lateness is the
    // gap to the maximum event-time seen so far (the running max a
    // stream's state would hold); the histogram of lateness tells
    // you what delay bound loses which fraction of events. Running
    // max is a user-keyed cumulative window (key-partitioned — no
    // global window); lateness buckets by powers of ~an hour; exact
    // µs integers throughout.
    "q436_out_of_order_audit" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      // ARRIVAL order is event_id (the log's append sequence);
      // ordering by ts would make every event trivially in-order
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val late = ev
        .withColumn("prior_max", max(col("us")).over(w))
        .withColumn("lateness_us",
          greatest(coalesce(col("prior_max") - col("us"), lit(0L)), lit(0L)))
      late.select(
          when(col("lateness_us") === 0, "in_order")
            .when(col("lateness_us") <= 3600000000L, "lt_1h")
            .when(col("lateness_us") <= 21600000000L, "lt_6h")
            .otherwise("gt_6h").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_events"))
    }),

    // Benjamini–Hochberg FDR over a FAMILY of permutation tests —
    // the multiple-testing discipline q424's single test stops short
    // of: one q424-style permutation test per event type (does the
    // md5 arm assignment shift that type's per-user event RATE?),
    // then BH at FDR 10%: rank p-values ascending, k* = max k with
    // p_(k)·m ≤ k·100‰, reject ranks ≤ k*. Every quantity is exact
    // integer/DECIMAL (cross-multiplied extremeness, add-one
    // permille p-values, the BH inequality in permille), and the BH
    // window runs over the m-row type frame (bounded). Shape: one
    // (user,type) count aggregate, a 32-way bounded fan-out, arm
    // sizes computed once per permutation from the distinct-user
    // frame.
    "q441_bh_fdr" -> ((s, d) => {
      val ev = Tables(s, d).events
      val users = ev.select(col("user_id")).distinct().localCheckpoint()
      val ut = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c")).localCheckpoint()
      def armOf(salt: Column) = when(
        substring(md5(concat(salt, lit("|"), col("user_id").cast("string"))),
          1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
        .otherwise("B")
      val sizes = users
        .select(col("user_id"), explode(sequence(lit(0), lit(31))).as("p"))
        .withColumn("arm", armOf(col("p").cast("string")))
        .groupBy(col("p"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
      val obsSizes = users.withColumn("arm", armOf(lit("obs")))
        .groupBy()
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("obs_na"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("obs_nb"))
      val permCounts = ut
        .select(col("user_id"), col("event_type"), col("c"),
          explode(sequence(lit(0), lit(31))).as("p"))
        .withColumn("arm", armOf(col("p").cast("string")))
        .groupBy(col("event_type"), col("p"))
        .agg(sum(when(col("arm") === "A", col("c")).otherwise(0L)).as("ca"),
          sum(when(col("arm") === "B", col("c")).otherwise(0L)).as("cb"))
      val obsCounts = ut.withColumn("arm", armOf(lit("obs")))
        .groupBy(col("event_type"))
        .agg(sum(when(col("arm") === "A", col("c")).otherwise(0L))
          .as("obs_ca"),
          sum(when(col("arm") === "B", col("c")).otherwise(0L)).as("obs_cb"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val pvals = permCounts.join(broadcast(sizes), "p")
        .join(broadcast(obsCounts), "event_type")
        .crossJoin(broadcast(obsSizes))
        .withColumn("extreme",
          abs(dec(col("ca") * col("nb") - col("cb") * col("na"))) *
            dec(col("obs_na") * col("obs_nb")) >=
            abs(dec(col("obs_ca") * col("obs_nb") -
              col("obs_cb") * col("obs_na"))) * dec(col("na") * col("nb")))
        .groupBy(col("event_type"))
        .agg(sum(when(col("extreme"), 1L).otherwise(0L)).as("ne"))
        .withColumn("p_permille", expr("((ne + 1) * 1000) div 33"))
        .drop("ne")
      val mF = pvals.agg(count(lit(1)).cast("long").as("m"))
      // the BH walk runs over the m-row per-type frame — bounded
      val w = Window.orderBy(col("p_permille"), col("event_type"))
      val ranked = pvals.crossJoin(broadcast(mF))
        .withColumn("bh_rank", row_number().over(w).cast("long"))
        .withColumn("ok", col("p_permille") * col("m") <=
          col("bh_rank") * 100)
      val kmax = ranked.filter(col("ok"))
        .agg(coalesce(max(col("bh_rank")), lit(0L)).as("kmax"))
      ranked.crossJoin(broadcast(kmax))
        .select(col("event_type"), col("p_permille").cast("long")
          .as("p_permille"), col("bh_rank"),
          (col("bh_rank") <= col("kmax")).as("rejected"))
    }),

    // Version-history TIMELINE from metadata alone — the table's
    // growth curve (version → member count, cumulative rows) folded
    // from each published manifest's `rows` stats, zero data IO at
    // any version (q409/q431/q435's discipline extended across the
    // whole history — the "how did this table grow" audit every
    // catalog UI renders). Four residue-class commits make the
    // curve; the oracle replays it as cumulative residue counts.
    "q442_version_timeline" -> ((s, d) => {
      val root = freshScratch("q442", d)
      val docs = Tables(s, d).documents.select(col("doc_id"), col("n_chars"))
      for (b <- 0 until 4)
        graft.operators.Manifest.commitAdd(
          docs.filter(col("doc_id") % 4 === b), root, s"m$b")
      import s.implicits._
      (1 to 4).map { v =>
        val counts = graft.operators.Manifest.metadataRowCounts(root, v)
        (v.toLong, counts.size.toLong, counts.map(_._3).sum)
      }.toDF("version", "n_members", "total_rows")
    }),

    // First-order MARKOV transition matrix over each user's event
    // stream — the behavioral-LM building block (and the q83 bigram
    // table's event-space twin): per (prev → next) event-type pair
    // the count and the Laplace-smoothed transition probability in
    // permille, (c+1)·1000 div (row_total + |types|) — integer
    // exact, so the whole matrix hash-matches. One user-keyed lag
    // window (event-time order, event_id tie-break), one pair
    // aggregate; the type universe is a broadcast scalar.
    "q443_markov_transitions" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val pairs = ev.withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("c"))
        // |types|²-bounded, read by the row totals and the final
        // join — the lag window never re-runs
        .localCheckpoint()
      val k = ev.agg(countDistinct(col("event_type")).as("k"))
      val rt = pairs.groupBy(col("prev")).agg(sum(col("c")).as("rt"))
      pairs.join(rt, "prev").crossJoin(broadcast(k))
        .select(col("prev"), col("next"), col("c").cast("long").as("c"),
          expr("((c + 1) * 1000) div (rt + k)").cast("long")
            .as("p_permille"))
    }),

    // Frequent session-opening PATHS — the path-mining readout
    // behind onboarding/funnel design: each (user, day) session's
    // first three event types (event-time order, id tie-break) form
    // a path string; the top-10 paths by support with a
    // deterministic tie-break. Sessions shorter than 3 events are
    // excluded (no partial paths). Per-session work is one
    // key-partitioned window + one max-struct-free aggregate; the
    // top-10 is TakeOrdered, never a global sort.
    "q444_session_paths" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("day", expr("us div 86400000000"))
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("us"), col("event_id"))
      val paths = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"),
          concat_ws(">", sort_array(collect_list(
            struct(col("rn"), col("event_type")))).getField("event_type"))
            .as("path"))
        .filter(col("n") === 3)
      paths.groupBy(col("path"))
        .agg(count(lit(1)).cast("long").as("support"))
        .orderBy(col("support").desc, col("path"))
        .limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("support").desc, col("path"))).cast("long"))
    }),

    // Lag-k AUTOCORRELATION of the daily event-count series (lags
    // 1–7) — the time-series diagnostic that finds weekly seasonality
    // before anyone fits a model (q344's seasonal-naive baseline owes
    // its lag-7 choice to exactly this readout). Exact integer
    // throughout: centering is scaled through by n
    // (cₜ = n·xₜ − Σx, a long), the Σ cₜ·cₜ₊ₖ numerators and the
    // Σ cₜ² denominator accumulate in DECIMAL(38,0) (c² ~ 1e28 at
    // 100 TB daily volumes — past int64, inside HUGEINT/DECIMAL38),
    // and the permille ratio is integral division (truncation toward
    // zero agrees across engines for negative numerators — pinned in
    // the working notes). Scale shape: ONE corpus pass builds the
    // day-grain counts; everything after runs on the tiny day frame
    // (self-join on day+k via a broadcast 7-row lag spine, 1-row
    // broadcast totals) — gaps in the calendar simply contribute no
    // pair.
    "q446_acf_daily" -> ((s, d) => {
      val daily = Tables(s, d).events
        .select(expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("x"))
        // day-grain and referenced by totals, the centered frame and
        // both sides of every lag join — materialize the one corpus
        // pass
        .localCheckpoint()
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val c = daily.crossJoin(broadcast(tot)) // 1 row
        .select(col("day"), expr("n * x - sx").as("c"))
      val den = c.agg(
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("den"))
      val lags = s.range(1)
        .select(explode(expr("sequence(1, 7)")).as("lag"))
      c.crossJoin(broadcast(lags))
        .withColumn("jday", col("day") + col("lag"))
        .join(c.select(col("day").as("jday"), col("c").as("c2")), "jday")
        .groupBy(col("lag"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c2")).as("num"),
          count(lit(1)).cast("long").as("n_pairs"))
        .crossJoin(broadcast(den)) // 1 row
        .select(col("lag").cast("long").as("lag"), col("n_pairs"),
          expr("(1000 * num) div den").cast("long").as("acf_permille"))
    }),

    // Off-policy REPLAY evaluation (Li et al.'s replay method) — the
    // offline answer to "how good would this recommender have been"
    // before any A/B test: the target policy (recommend each user's
    // modal event type over STRICTLY EARLIER days, ties to the
    // lexicographically smallest type) is replayed against the log;
    // per day, how many logged events the policy would have matched,
    // in exact permille. First-active-day events have no history and
    // drop out via the inner join — the estimator only scores days
    // where the policy is defined. Scale shape (r11 rewrite — the
    // triangular self-join is gone): the corpus collapses to
    // (user, type, day) counts in ONE pass; history is a RUNNING
    // cumulative count per (user, type) over the user's active-day ×
    // type grid — O(days · types) rows per user instead of the old
    // O(days² · types) self-join intermediate, and the window is
    // (user, type)-partitioned, so heavy users parallelize by type
    // and never re-pair their own history; the argmax is a
    // (user, day)-keyed window over the same bounded frame.
    "q449_policy_replay" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
      val cnt = ev.groupBy(col("user_id"), col("event_type"), col("day"))
        .agg(count(lit(1)).as("c"))
        // (user, type, day)-grain, read by the spine, the type set
        // and the grid fill — one corpus pass, materialized
        .localCheckpoint()
      val spine = cnt.select(col("user_id"), col("day")).distinct()
      val types = cnt.select(col("user_id"), col("event_type")).distinct()
      // every (active day × ever-seen type) cell, zero-filled where
      // the type didn't fire that day: the cumulative fold needs the
      // cell to EXIST to carry history forward to later days
      val grid = spine.join(types, Seq("user_id"))
        .join(cnt, Seq("user_id", "event_type", "day"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val wCum = Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // strictly-earlier history = inclusive running sum minus today;
      // hc > 0 keeps exactly the types with >=1 earlier occurrence
      // (the old inner-join semantics)
      val hist = grid
        .withColumn("hc", sum(col("c")).over(wCum) - col("c"))
        .filter(col("hc") > 0)
      val pred = hist.withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("hc").desc, col("event_type"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("day"), col("event_type").as("pred"))
      ev.join(pred, Seq("user_id", "day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as("n_eval"),
          sum(when(col("event_type") === col("pred"), 1L).otherwise(0L))
            .cast("long").as("n_matched"))
        .withColumn("match_permille",
          expr("(n_matched * 1000) div n_eval"))
    }),

    // RENDEZVOUS (highest-random-weight) hashing reshard audit — the
    // capacity-planning readout before a shard-count change: growing
    // 16 → 20 shards, what fraction of keys MOVE under HRW
    // (argmax over shards of md5(key # shard) — Thaler/Ravishankar's
    // guarantee: only keys whose new argmax is a NEW shard move,
    // ≈ 4/20) vs naive mod hashing (≈ 19/20 move — the reshard
    // stampede HRW exists to avoid). The argmax compares the fixed-
    // width lowercase-hex md5 STRINGS directly (byte-lexicographic in
    // both engines — no integer conversion needed) via one max-struct
    // aggregate. Scale shape: keys fan out ×36 against a broadcast
    // (config, shard) spine, then collapse in the same key-keyed
    // aggregate — key-shaped, no window, no shuffle beyond the one
    // aggregate.
    "q451_rendezvous_reshard" -> ((s, d) => {
      val keys = Tables(s, d).customer.select(col("c_custkey").as("k"))
      val spine = s.range(1).select(explode(expr(
        "flatten(transform(array(16, 20), " +
          "n -> transform(sequence(0, n - 1), " +
          "sh -> struct(n AS cfg, sh AS sh))))")).as("p"))
        .select(col("p.cfg").as("cfg"), col("p.sh").as("sh"))
      val hrw = keys.crossJoin(broadcast(spine))
        .withColumn("h",
          md5(concat(col("k").cast("string"), lit("#"),
            col("sh").cast("string"))))
        .groupBy(col("k"), col("cfg"))
        .agg(max(struct(col("h"), col("sh"))).as("top"))
        .groupBy(col("k"))
        .agg(max(when(col("cfg") === 16, col("top.sh"))).as("hrw16"),
          max(when(col("cfg") === 20, col("top.sh"))).as("hrw20"))
      val audit = hrw
        .withColumn("mod16", col("k") % 16)
        .withColumn("mod20", col("k") % 20)
        .agg(count(lit(1)).cast("long").as("n_keys"),
          sum(when(col("hrw16") =!= col("hrw20"), 1L).otherwise(0L))
            .cast("long").as("hrw_moved"),
          sum(when(col("mod16") =!= col("mod20"), 1L).otherwise(0L))
            .cast("long").as("mod_moved"))
      audit.select(
        explode(array(
          struct(lit("hrw").as("method"), col("n_keys"),
            col("hrw_moved").as("n_moved"),
            expr("(hrw_moved * 1000) div n_keys").as("moved_permille")),
          struct(lit("mod").as("method"), col("n_keys"),
            col("mod_moved").as("n_moved"),
            expr("(mod_moved * 1000) div n_keys").as("moved_permille"))))
          .as("r"))
        .select(col("r.method"), col("r.n_keys"), col("r.n_moved"),
          col("r.moved_permille"))
    }),

    // Integer HITS (Kleinberg hubs/authorities) on the user → type
    // bipartite engagement graph — the OTHER eigenvector ranking next
    // to q129's PageRank, run UN-normalized for two exact iterations
    // (a¹ = Wᵀ·1, h¹ = W·a¹, a² = Wᵀ·h¹ — pure integer matrix-vector
    // products; normalization only rescales, so the RANKING is the
    // true HITS ranking and the raw scores stay hash-exact).
    // Magnitudes cube with corpus size → a² rides DECIMAL(38,0) and
    // is emitted as STRING (wide-decimal oracle discipline). Scale
    // shape: W collapses to (user, type, w) counts in one pass; each
    // iteration is a key-shaped aggregate against the type-bounded
    // authority vector (broadcast).
    "q452_hits_scores" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Tables(s, d).events
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("w"))
        // (user, type)-grain W feeds every iteration — one corpus
        // pass, materialized
        .localCheckpoint()
      val a1 = w.groupBy(col("event_type"))
        .agg(sum(col("w")).as("a1"))
      val h1 = w.join(broadcast(a1), "event_type")
        .groupBy(col("user_id"))
        .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * a1")).as("h1"))
      val a2 = w.join(h1, "user_id")
        .groupBy(col("event_type"))
        .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * h1")).as("a2"))
      a2.join(broadcast(a1), "event_type")
        .withColumn("rk", row_number().over(
          Window.orderBy(col("a2").desc, col("event_type"))).cast("long"))
        .select(col("event_type"), col("a1").cast("long").as("a1"),
          col("a2").cast("decimal(38,0)").cast("string").as("a2"),
          col("rk"))
    }),

    // Two-sample KOLMOGOROV–SMIRNOV drift statistic — the
    // distribution-shift detector every training/serving-skew monitor
    // runs: D = max_x |F₁(x) − F₂(x)| between the click and purchase
    // value distributions, computed EXACTLY by cross-multiplying the
    // cumulative counts through both sample sizes
    // (D_scaled = max |n₂·cum₁ − n₁·cum₂|, all integers on the 2dp
    // cents grid; D_permille = 1000·D_scaled div (n₁·n₂) with the
    // products in DECIMAL(38,0) — n₁·n₂ passes int64 near 10⁹ rows
    // per side). Reports the statistic AND the value where the gap
    // peaks (min cents among maximizers). Scale shape: one corpus
    // pass to per-cents counts; the cumulative walk is an
    // unpartitioned window over the DISTINCT-CENTS support frame —
    // value-grid-bounded, never event-sized.
    "q453_ks_drift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, d).events
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val counts = ev.groupBy(col("cents"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c2"))
        // support-grid-bounded, referenced by totals and the
        // cumulative walk — one corpus pass, materialized
        .localCheckpoint()
      val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val wOrd = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts
        .withColumn("cum1", sum(col("c1")).over(wOrd))
        .withColumn("cum2", sum(col("c2")).over(wOrd))
        .crossJoin(broadcast(tot)) // 1 row
        .withColumn("d", expr(
          "abs(CAST(n2 AS DECIMAL(38,0)) * cum1" +
            " - CAST(n1 AS DECIMAL(38,0)) * cum2)"))
      cum.orderBy(col("d").desc, col("cents")).limit(1)
        .select(col("n1").cast("long").as("n1"),
          col("n2").cast("long").as("n2"),
          col("cents").as("d_at_cents"),
          expr("(1000 * d) div (CAST(n1 AS DECIMAL(38,0)) * n2)")
            .cast("long").as("d_permille"))
    }),

    // CUPED variance-reduced experiment readout (Deng et al.) — the
    // estimator every mature experimentation platform applies before
    // calling a winner: users md5-split 50/50 into arms, the metric
    // (second-half spend cents) adjusted by the pre-experiment
    // covariate (first-half spend) via θ = cov(x,y)/var(x). Every
    // moment is an integer cross-product (θ's numerator n·Σxy−Σx·Σy
    // and denominator n·Σx²−(Σx)² in DECIMAL(38,0)); the raw and
    // adjusted arm differences are exact rationals reduced over the
    // common denominator nA·nB (and ·den for the adjusted one), so
    // the milli-cent outputs are single truncating divisions — no
    // float ever forms. At 10⁹-user scale the adjusted-diff cross
    // product wants DECIMAL(76) or a gcd reduction — noted, int128-
    // safe here. Scale shape: ONE corpus pass to per-user (x, y),
    // then 1-row aggregates; nothing beyond the user-keyed reduce.
    "q454_cuped_lift" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val split = ev.agg(expr("(min(day) + max(day) + 1) div 2")
        .as("split_day"))
      val peruser = ev.crossJoin(broadcast(split)) // 1 row
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < col("split_day"), col("cents"))
          .otherwise(0L)).as("x"),
          sum(when(col("day") >= col("split_day"), col("cents"))
            .otherwise(0L)).as("y"))
        .withColumn("arm", when(substring(
          md5(concat(lit("cuped"), col("user_id").cast("string"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
      val m = peruser.agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === "A", col("x")).otherwise(0L)).as("sxa"),
        sum(when(col("arm") === "B", col("x")).otherwise(0L)).as("sxb"),
        sum(when(col("arm") === "A", col("y")).otherwise(0L)).as("sya"),
        sum(when(col("arm") === "B", col("y")).otherwise(0L)).as("syb"))
      // the adjusted-diff CROSS PRODUCT (ydiff·varx − covxy·xdiff) is
      // the expression that outgrows DECIMAL(38,0) at 10⁹-user scale
      // — every factor passes the named 1e17 envelope first (r11
      // item 8: loud failure with a remedy, not an ANSI surprise)
      m.withColumn("ydiff", expr("CAST(sya AS DECIMAL(38,0)) * nb" +
          " - CAST(syb AS DECIMAL(38,0)) * na"))
        .withColumn("xdiff", expr("CAST(sxa AS DECIMAL(38,0)) * nb" +
          " - CAST(sxb AS DECIMAL(38,0)) * na"))
        .withColumn("varx", expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("covxy", expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
        .withColumn("gy", decimalEnvelope(col("ydiff"), "q454_cuped_lift"))
        .withColumn("gx", decimalEnvelope(col("xdiff"), "q454_cuped_lift"))
        .withColumn("gv", decimalEnvelope(col("varx"), "q454_cuped_lift"))
        .withColumn("gc", decimalEnvelope(col("covxy"), "q454_cuped_lift"))
        .select(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          expr("(1000 * covxy) div varx")
            .cast("long").as("theta_permille"),
          expr("(1000 * ydiff) div (CAST(na AS DECIMAL(38,0)) * nb)")
            .cast("long").as("raw_diff_milli"),
          expr("(1000 * (gy * gv - gc * gx))" +
            " div ((CAST(na AS DECIMAL(38,0)) * nb) * varx)")
            .cast("long").as("cuped_diff_milli"))
    }),

    // Group-aware STRATIFIED K-fold audit — the leakage-safe CV
    // split (GroupKFold) plus the balance readout that decides
    // whether it is USABLE: every event of a user lands in the
    // user's fold (fold = first-two-hex-chars of md5 % 5 — the same
    // arithmetic both engines can state, so assignment is part of
    // the oracle), and per fold the audit reports user/event counts
    // plus the worst per-type composition deviation from the global
    // mix in permille (the stratification check; group splits
    // CANNOT stratify exactly — this measures how far off this one
    // is). Scale shape: one pass to (fold, type) counts; the
    // deviation fold runs on the 5×|types| frame; leakage is zero by
    // construction — the audit recomputes it anyway (distinct
    // (user, fold) pairs vs distinct users) so a broken assignment
    // goes loud.
    "q455_groupkfold_audit" -> ((s, d) => {
      val hexv = "(instr('0123456789abcdef', substring(h, 1, 1)) - 1)" +
        " * 16 + (instr('0123456789abcdef', substring(h, 2, 1)) - 1)"
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"))
        .withColumn("h",
          md5(concat(lit("fold"), col("user_id").cast("string"))))
        .withColumn("fold", expr(s"($hexv) % 5").cast("long"))
      // ONE corpus pass to the (fold, type, user) grain — user-
      // bounded, far below event grain at 100 TB — then every
      // downstream readout (composition, user counts, leakage
      // recount) folds this materialized frame, never the events
      val ftu = ev.groupBy(col("fold"), col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val ft = ftu.groupBy(col("fold"), col("event_type"))
        .agg(sum(col("c")).as("c"))
        .localCheckpoint() // 5 x |types| rows, read four times
      val fsum = ft.groupBy(col("fold"))
        .agg(sum(col("c")).as("nf"))
      val tsum = ft.groupBy(col("event_type"))
        .agg(sum(col("c")).as("nt"))
      val tot = ft.agg(sum(col("c")).as("n"))
      val users = ftu.select(col("fold"), col("user_id")).distinct()
        .groupBy(col("fold")).agg(count(lit(1)).as("n_users"))
      val leak = ftu.select(col("user_id"), col("fold")).distinct()
        .groupBy(col("user_id")).agg(count(lit(1)).as("nf"))
        .agg(sum(when(col("nf") > 1, 1L).otherwise(0L)).as("leaked"))
      ft.join(fsum, "fold").join(broadcast(tsum), "event_type")
        .crossJoin(broadcast(tot)) // 1 row
        .withColumn("dev", abs(expr("(1000 * c) div nf")
          - expr("(1000 * nt) div n")))
        .groupBy(col("fold"))
        .agg(max(col("dev")).cast("long").as("max_type_dev_permille"))
        .join(users, "fold").join(fsum, "fold")
        .crossJoin(broadcast(leak)) // 1 row
        .select(col("fold"), col("n_users").cast("long").as("n_users"),
          col("nf").cast("long").as("n_events"),
          col("max_type_dev_permille"),
          col("leaked").cast("long").as("leaked_users"))
    }),

    // Tokenizer FERTILITY audit — the multilingual cost readout
    // (tokens-per-word drives training cost per language; high-
    // fertility languages pay more per word): a fixed-stride 4-char
    // subword splitter stands in for the tokenizer (deterministic,
    // oracle-stateable — q141's trained BPE has no SQL twin), so per
    // language the audit reports words, subword tokens
    // (Σ ceil(len/4) = (len+3) div 4 per word), fertility in
    // permille, and chars-per-token in centi. ONE narrow corpus pass
    // (explode words, two integer folds), language-bounded output.
    "q456_fertility_audit" -> ((s, d) => {
      val words = Tables(s, d).documents
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(col("lang"), length(col("w")).cast("long").as("len"))
      words.groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(expr("(len + 3) div 4")).cast("long").as("n_subtokens"),
          sum(col("len")).cast("long").as("n_chars"))
        .withColumn("fertility_permille",
          expr("(1000 * n_subtokens) div n_words"))
        .withColumn("chars_per_token_centi",
          expr("(100 * n_chars) div n_subtokens"))
    }),

    // Split-CONFORMAL prediction calibration + coverage audit
    // (Vovk; Lei et al.) — the distribution-free uncertainty
    // machinery ML platforms bolt onto any point predictor: per
    // event type, a rank-exact calibration median (even days) is the
    // predictor; nonconformity = |cents − median|; the conformal
    // quantile q̂ is the ⌈0.9·(n+1)⌉-th smallest calibration score
    // (capped at n — the finite-sample rule), and the audit reports
    // the empirical coverage of median ± q̂ on the held-out odd days
    // — the ≥90% guarantee made checkable. Every rank pick walks a
    // CUMULATIVE COUNT over the per-(type, score) grid (q453's
    // discipline) — support-bounded, never an event-sized sort.
    "q457_conformal_coverage" -> ((s, d) => {
      // ONE corpus pass to the (type, cents, split) count grid —
      // support-bounded and materialized; the median pick, the score
      // grid, the conformal quantile AND the holdout coverage all
      // fold this grid, never the events
      val grid = Tables(s, d).events
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .withColumn("is_cal", col("day") % 2 === 0)
        .groupBy(col("event_type"), col("cents"), col("is_cal"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val calGrid = grid.filter(col("is_cal"))
        .select(col("event_type"), col("cents"), col("c"))
      val calN = calGrid.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_cal"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = calGrid.withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(calN), "event_type")
        .filter(col("cum") >= expr("(n_cal + 1) div 2"))
        .groupBy(col("event_type")).agg(min(col("cents")).as("med"))
      val scoreGrid = calGrid
        .join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("cents") - col("med")).as("sc"),
          col("c"))
        .groupBy(col("event_type"), col("sc")).agg(sum(col("c")).as("c"))
      val wSc = Window.partitionBy(col("event_type")).orderBy(col("sc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qhat = scoreGrid.withColumn("cum", sum(col("c")).over(wSc))
        .join(broadcast(calN), "event_type")
        .filter(col("cum") >=
          expr("least((9 * (n_cal + 1) + 9) div 10, n_cal)"))
        .groupBy(col("event_type")).agg(min(col("sc")).as("qhat"))
      grid.filter(!col("is_cal"))
        .join(broadcast(med), "event_type")
        .join(broadcast(qhat), "event_type")
        .join(broadcast(calN), "event_type")
        .groupBy(col("event_type"), col("n_cal"), col("med"), col("qhat"))
        .agg(sum(col("c")).cast("long").as("n_test"),
          sum(when(abs(col("cents") - col("med")) <= col("qhat"),
            col("c")).otherwise(0L)).cast("long").as("n_covered"))
        .select(col("event_type"), col("n_cal").cast("long").as("n_cal"),
          col("n_test"), col("med").cast("long").as("med_cents"),
          col("qhat").cast("long").as("qhat"),
          expr("(n_covered * 1000) div n_test").as("coverage_permille"))
    }),

    // QUANTILE NORMALIZATION by exact rank mapping — the
    // feature-alignment transform (microarray lineage, now every
    // cross-domain feature store): map the purchase-value
    // distribution onto the click-value distribution by matching
    // ranks, read out at the deciles. For decile k, the purchase
    // value at rank ⌈k·n_p/10⌉ and the click value at the
    // proportionally mapped rank ⌈r·n_c/n_p⌉ — every pick a minimum
    // over a cumulative-count walk on the per-cents grid (support-
    // bounded, never an event sort), every rank integer ceil
    // division. Scale shape: one corpus pass to the two grids; the
    // decile spine is a broadcast 10-row fan-out.
    "q458_quantile_normalize" -> ((s, d) => {
      val ev = Tables(s, d).events
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      // each grid is support-bounded and referenced by the totals,
      // the decile pick and the rank mapping — one corpus pass each,
      // materialized
      def grid(t: String) = ev.filter(col("event_type") === t)
        .groupBy(col("cents")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint()
      val pg = grid("purchase")
      val cg = grid("click")
      val np = pg.agg(max(col("cum")).as("n_p"))
      val nc = cg.agg(max(col("cum")).as("n_c"))
      val deciles = s.range(1)
        .select(explode(expr("sequence(1, 10)")).as("dec"))
        .crossJoin(broadcast(np)).crossJoin(broadcast(nc))
        .withColumn("r_p", expr("(dec * n_p + 9) div 10"))
        .withColumn("r_c", expr("(r_p * n_c + n_p - 1) div n_p"))
      val pval = deciles.join(pg, col("cum") >= col("r_p"))
        .groupBy(col("dec"), col("r_p"), col("r_c"))
        .agg(min(col("cents")).as("purchase_cents"))
      pval.join(cg, col("cum") >= col("r_c"))
        .groupBy(col("dec"), col("purchase_cents"))
        .agg(min(col("cents")).as("normalized_click_cents"))
        .select(col("dec").cast("long").as("dec"), col("purchase_cents"),
          col("normalized_click_cents"))
    }),

    // Nearest-covariate MATCHING (propensity-score-matching shape,
    // with replacement) — the observational-causal estimator run
    // when there is no experiment: treated = users whose first-half
    // MAX purchase reaches the user-grain median of that statistic
    // (a rank-exact, two-sided-by-construction exposure split —
    // "ever purchases" degenerates on this corpus where every user
    // does); covariate = first-half activity count; outcome =
    // second-half spend cents. Each treated user matches the control
    // with the nearest covariate (backward/forward nearest via the
    // q204 union+window walk over the covariate axis — running
    // last-control IGNORE NULLS under each direction's total order,
    // closer side wins, |diff| ties to the backward match, same-cov
    // control ties resolved by the walk's id order), and the
    // readout contrasts the
    // naive treated−control mean gap with the matched ATT, both as
    // exact single-division milli-cents. Scale shape (r11 fix): one
    // corpus pass to user grain; the matching walk runs over the
    // cov-SUPPORT grid (one row per distinct covariate value — the
    // q453/q457 support-grid discipline), never a window over the
    // user grain; treated users join their match back by cov
    // equality against the broadcast grid; all sums DECIMAL(38,0).
    "q462_covariate_matching" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val split = ev.agg(expr("(min(day) + max(day) + 1) div 2")
        .as("split_day"))
      val users0 = ev.crossJoin(broadcast(split)) // 1 row
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < col("split_day"), 1L).otherwise(0L))
          .as("cov"),
          sum(when(col("day") >= col("split_day"), col("cents"))
            .otherwise(0L)).as("y"),
          max(when(col("event_type") === "purchase"
            && col("day") < col("split_day"), col("cents"))
            .otherwise(0L)).as("mp"))
        .localCheckpoint() // user grain, walked twice + folded
      val mGrid = users0.groupBy(col("mp")).agg(count(lit(1)).as("c"))
      val mTot = mGrid.agg(sum(col("c")).as("n"))
      val mMed = mGrid.withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("mp"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(mTot))
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("mp")).as("mp_med"))
      val users = users0.crossJoin(broadcast(mMed)) // 1 row
        .withColumn("treated",
          when(col("mp") >= col("mp_med"), 1L).otherwise(0L))
        .localCheckpoint() // user grain, read by grid + matched + naive
      // cov-SUPPORT-GRID walk (the r11 rewrite): the match depends
      // only on the treated user's cov — under the (cov, side, id)
      // total order every same-cov control precedes every same-cov
      // treated, so the backward nearest is "the max-id control at
      // the largest control-cov <= c" and the forward nearest (the
      // reverse order) "the min-id control at the smallest
      // control-cov > c". Collapse controls to ONE row per cov value
      // carrying both direction representatives (the walk's id tie
      // rules preserved exactly), run the two IGNORE-NULLS lasts
      // over the combined cov support — a value-bounded grid, never
      // an unpartitioned window over the user grain — and join
      // treated users back by cov equality (grid broadcast:
      // activity-count support, orders of magnitude under user
      // cardinality).
      val ctlGrid = users.filter(col("treated") === 0)
        .groupBy(col("cov"))
        .agg(max(struct(col("user_id"), col("y"))).as("cb"),
          min(struct(col("user_id"), col("y"))).as("cf"))
      val support = users.filter(col("treated") === 1)
        .select(col("cov")).distinct()
        .unionByName(ctlGrid.select(col("cov"))).distinct()
        .join(ctlGrid, Seq("cov"), "left")
      val wB = Window.orderBy(col("cov"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // strictly-greater cov: under the reverse order same-cov
      // controls sort AFTER same-cov treated rows, so the forward
      // window excludes the current grid row
      val wF = Window.orderBy(col("cov").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val walked = support
        .withColumn("b", last(when(col("cb").isNotNull,
          struct(col("cov"), col("cb.user_id").as("user_id"),
            col("cb.y").as("y"))), ignoreNulls = true).over(wB))
        .withColumn("f", last(when(col("cf").isNotNull,
          struct(col("cov"), col("cf.user_id").as("user_id"),
            col("cf.y").as("y"))), ignoreNulls = true).over(wF))
        .select(col("cov"), col("b"), col("f"))
      val matched = users.filter(col("treated") === 1)
        .join(broadcast(walked), Seq("cov"))
        .withColumn("m", when(col("f").isNull, col("b"))
          .when(col("b").isNull, col("f"))
          .when(abs(col("f.cov") - col("cov"))
            < abs(col("cov") - col("b.cov")), col("f"))
          .otherwise(col("b")))
        .filter(col("m").isNotNull)
      val naive = users.agg(
        sum(when(col("treated") === 1, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("treated") === 0, col("y")).otherwise(0L)).as("syc"),
        sum(col("treated")).as("nt"),
        sum(lit(1L) - col("treated")).as("nc"))
      val att = matched.agg(
        count(lit(1)).as("n_matched"),
        sum(expr("CAST(y - m.y AS DECIMAL(38,0))")).as("sdiff"))
      att.crossJoin(broadcast(naive)) // 1 row
        .select(col("nt").cast("long").as("n_treated"),
          col("nc").cast("long").as("n_control"),
          col("n_matched").cast("long").as("n_matched"),
          expr("(1000 * (CAST(syt AS DECIMAL(38,0)) * nc" +
            " - CAST(syc AS DECIMAL(38,0)) * nt))" +
            " div (CAST(nt AS DECIMAL(38,0)) * nc)")
            .cast("long").as("naive_diff_milli"),
          expr("(1000 * sdiff) div n_matched").cast("long")
            .as("att_milli"))
    }),

    // BLOCK-BOOTSTRAP confidence interval for mean daily spend —
    // the uncertainty band every metrics dashboard should draw and
    // almost none compute exactly: 32 deterministic bootstrap
    // replicas resample the DAY blocks with replacement (draw (b, i)
    // picks day-rank md5-hex('boot'·b·'#'·i) % n — hash-seeded, so
    // the whole CI is replayable bit-for-bit in the oracle), each
    // replica's mean is an exact single division, and the 90% band
    // reads the 2nd / 31st order statistics of the 32 replica means.
    // Scale shape: ONE corpus pass to the day grain; the resample
    // fan-out is 32 × n_days rows of (rank, day-total) — calendar-
    // bounded, never event-sized.
    "q463_bootstrap_ci" -> ((s, d) => {
      val hexAt = (src: String, i: Int) =>
        s"(instr('0123456789abcdef', substring($src, $i, 1)) - 1)"
      val daily = Tables(s, d).events
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("t"))
        .withColumn("r", row_number().over(
          Window.orderBy(col("day"))).cast("long") - 1)
        .localCheckpoint() // day grain, read by draws + point est
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("t")).as("st"))
      val reps = s.range(1)
        .select(explode(expr("sequence(0, 31)")).as("b"))
      val draws = daily.select(col("r").as("i"))
        .crossJoin(broadcast(reps))
        .crossJoin(broadcast(tot)) // 1 row
        .withColumn("h", md5(concat(lit("boot"), col("b").cast("string"),
          lit("#"), col("i").cast("string"))))
        .withColumn("idx", expr(
          s"((${hexAt("h", 1)} * 256 + ${hexAt("h", 2)} * 16" +
            s" + ${hexAt("h", 3)}) % n)"))
      val means = draws
        .join(daily.select(col("r").as("idx"), col("t")), "idx")
        .groupBy(col("b"))
        .agg(expr("(1000 * sum(t)) div count(1)").as("mean_milli"))
      val band = means
        .withColumn("rk", row_number().over(
          Window.orderBy(col("mean_milli"), col("b"))))
        .agg(min(when(col("rk") === 2, col("mean_milli"))).as("lo"),
          min(when(col("rk") === 31, col("mean_milli"))).as("hi"),
          count(lit(1)).as("n_replicas"))
      band.crossJoin(broadcast(tot)) // 1 row
        .select(col("n").cast("long").as("n_days"),
          col("n_replicas").cast("long").as("n_replicas"),
          expr("(1000 * st) div n").cast("long").as("point_milli"),
          col("lo").cast("long").as("boot_lo_milli"),
          col("hi").cast("long").as("boot_hi_milli"))
    }),

    // LEAD–LAG cross-correlation (CCF) between the click and
    // purchase daily series — q446's ACF twin and the detector
    // behind "purchases follow clicks by k days" claims: for lags
    // −7…7, the centered cross products Σ aₜ·bₜ₊ₖ (both series
    // centered by the scale-through n·x − Σx trick, all integral),
    // normalized without any sqrt as the SQUARED correlation in ppm
    // — 10⁶·num² div (Σa²·Σb²) — with the sign carried separately,
    // plus the strength rank across lags. Scale shape: one corpus
    // pass to the (day, click, purchase) grain; lag joins ride a
    // broadcast 15-row spine against the day frame.
    "q464_leadlag_ccf" -> ((s, d) => {
      val daily = Tables(s, d).events
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
        .localCheckpoint() // day grain
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"))
      val c = daily.crossJoin(broadcast(tot)) // 1 row
        .select(col("day"), expr("n * x - sx").as("a"),
          expr("n * y - sy").as("b"))
        .localCheckpoint() // referenced by both lag sides + denoms
      val den = c.agg(
        sum(expr("CAST(a AS DECIMAL(38,0)) * a")).as("saa"),
        sum(expr("CAST(b AS DECIMAL(38,0)) * b")).as("sbb"))
      val lags = s.range(1)
        .select(explode(expr("sequence(-7, 7)")).as("lag"))
      val num = c.crossJoin(broadcast(lags))
        .withColumn("jday", col("day") + col("lag"))
        .join(c.select(col("day").as("jday"), col("b").as("b2")), "jday")
        .groupBy(col("lag"))
        .agg(sum(expr("CAST(a AS DECIMAL(38,0)) * b2")).as("num"),
          count(lit(1)).cast("long").as("n_pairs"))
      num.crossJoin(broadcast(den)) // 1 row
        .select(col("lag").cast("long").as("lag"), col("n_pairs"),
          signum(col("num")).cast("long").as("sign"),
          expr("(1000000 * num * num) div (saa * sbb)").cast("long")
            .as("r2_ppm"))
        .withColumn("strength_rank", row_number().over(
          Window.orderBy(col("r2_ppm").desc, col("lag"))).cast("long"))
    }),

    // Index-of-DISPERSION (Fano factor) burstiness audit — the
    // one-number overdispersion check capacity planners run on every
    // arrival series (Poisson traffic sits at 1000‰; bursty traffic
    // blows past it and breaks per-day autoscaling assumptions):
    // per event type, D = var/mean of the daily counts as the exact
    // integral form 1000·(n·Σx² − S²) div (n·S) — population
    // variance scaled through by n², no float moment anywhere;
    // ≥1500‰ flags the type as bursty. One corpus pass to the
    // (type, day) grain, type-bounded output.
    "q467_dispersion_index" -> ((s, d) => {
      Tables(s, d).events
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          col("s").cast("long").as("total"),
          expr("(1000 * (n * sxx - CAST(s AS DECIMAL(38,0)) * s))" +
            " div (n * CAST(s AS DECIMAL(38,0)))").cast("long")
            .as("d_permille"))
        .withColumn("bursty", col("d_permille") >= 1500)
    }),

    // MIX-SHIFT decomposition (Oaxaca–Blinder shape) — the "why did
    // the metric move" analysis every metrics review runs by hand:
    // the period-over-period change in mean event value splits, per
    // segment (event type), into a MIX effect (the segment's traffic
    // share moved), a RATE effect (the segment's own mean moved) and
    // the interaction — Δ = Σ_seg (mix + rate + inter) by algebra.
    // Every effect is one exact integer cross-multiplication over
    // the common denominator (shares n_sp/n_p, rates s_sp/n_sp; the
    // four-way product wants DECIMAL(76) at 10⁹-row segments —
    // noted, int128-safe here), floored once to milli-cents. One
    // corpus pass to (segment, period) sums; the decomposition folds
    // the segment-bounded frame.
    "q468_mix_decomposition" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val split = ev.agg(expr("(min(day) + max(day) + 1) div 2")
        .as("split_day"))
      val seg = ev.crossJoin(broadcast(split)) // 1 row
        .groupBy(col("event_type"))
        .agg(sum(when(col("day") < col("split_day"), 1L).otherwise(0L))
          .as("ns1"),
          sum(when(col("day") >= col("split_day"), 1L).otherwise(0L))
            .as("ns2"),
          sum(when(col("day") < col("split_day"), col("cents"))
            .otherwise(0L)).as("ss1"),
          sum(when(col("day") >= col("split_day"), col("cents"))
            .otherwise(0L)).as("ss2"))
        .localCheckpoint() // segment-bounded, read by totals + fold
      val tot = seg.agg(sum(col("ns1")).as("n1"), sum(col("ns2")).as("n2"))
      // the share-diff × value-sum and share-diff × rate-diff
      // four-way products outgrow DECIMAL(38,0) at 10⁹-row segments
      // — every product factor (numerator AND denominator) passes
      // the named 1e17 envelope first (r11 item 8)
      seg.crossJoin(broadcast(tot)) // 1 row
        .withColumn("sharediff", expr("CAST(ns2 AS DECIMAL(38,0)) * n1" +
          " - CAST(ns1 AS DECIMAL(38,0)) * n2"))
        .withColumn("ratediff", expr("CAST(ss2 AS DECIMAL(38,0)) * ns1" +
          " - CAST(ss1 AS DECIMAL(38,0)) * ns2"))
        .withColumn("gsh", decimalEnvelope(col("sharediff"),
          "q468_mix_decomposition"))
        .withColumn("grt", decimalEnvelope(col("ratediff"),
          "q468_mix_decomposition"))
        .withColumn("gs1", decimalEnvelope(
          expr("CAST(ss1 AS DECIMAL(38,0))"), "q468_mix_decomposition"))
        .withColumn("gnp", decimalEnvelope(
          expr("CAST(n1 AS DECIMAL(38,0)) * n2"), "q468_mix_decomposition"))
        .withColumn("gnsp", decimalEnvelope(
          expr("CAST(ns1 AS DECIMAL(38,0)) * ns2"), "q468_mix_decomposition"))
        .select(col("event_type"),
          col("ns1").cast("long").as("n_events_p1"),
          col("ns2").cast("long").as("n_events_p2"),
          expr("(1000 * gsh * gs1) div (gnp * ns1)")
            .cast("long").as("mix_milli"),
          expr("(1000 * (CAST(ns1 AS DECIMAL(38,0)) * ss2" +
            " - CAST(ss1 AS DECIMAL(38,0)) * ns2))" +
            " div (CAST(n1 AS DECIMAL(38,0)) * ns2)")
            .cast("long").as("rate_milli"),
          expr("(1000 * gsh * grt) div (gnp * gnsp)")
            .cast("long").as("interaction_milli"))
    }),

    // SAMPLE-RATIO-MISMATCH check — the first sanity gate every
    // experimentation platform runs before reading ANY metric (a
    // broken randomizer invalidates everything downstream): the q454
    // md5 arms against the designed 50/50, the one-degree χ² for
    // equal proportions in exact milli ((n_a − n_b)²·1000 div
    // (n_a + n_b)) and the 3.841-critical-value flag. One user-grain
    // distinct + one 1-row fold.
    "q469_srm_check" -> ((s, d) => {
      Tables(s, d).events
        .select(col("user_id")).distinct()
        .withColumn("arm", when(substring(
          md5(concat(lit("cuped"), col("user_id").cast("string"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
        .select(col("n_a").cast("long").as("n_a"),
          col("n_b").cast("long").as("n_b"),
          expr("((n_a - n_b) * (n_a - n_b) * 1000) div (n_a + n_b)")
            .cast("long").as("chi2_milli"))
        .withColumn("srm_detected", col("chi2_milli") > 3841)
    }),

    // SIMPSON'S-PARADOX reversal detector — the segment audit that
    // catches a pooled readout contradicting every segment it is
    // made of (the mix, not the treatment, moved the metric): per
    // event type, the SIGN of the arm difference in mean value
    // (exact cross-multiplication sya·nb − syb·na, never a
    // division), beside the pooled sign; reversed = the segment
    // disagrees with the pooled direction. One corpus pass to
    // (segment, arm) sums; signs fold segment-bounded frames.
    "q470_simpson_detector" -> ((s, d) => {
      val ev = Tables(s, d).events
        .select(col("event_type"), col("user_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .withColumn("arm", when(substring(
          md5(concat(lit("cuped"), col("user_id").cast("string"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
      val seg = ev.groupBy(col("event_type"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === "A", col("cents")).otherwise(0L))
            .as("sya"),
          sum(when(col("arm") === "B", col("cents")).otherwise(0L))
            .as("syb"))
        .localCheckpoint() // segment-bounded
      val pooled = seg.agg(sum(col("na")).as("pna"),
        sum(col("nb")).as("pnb"), sum(col("sya")).as("psya"),
        sum(col("syb")).as("psyb"))
        .select(signum(expr("CAST(psya AS DECIMAL(38,0)) * pnb" +
          " - CAST(psyb AS DECIMAL(38,0)) * pna")).cast("long")
          .as("pooled_sign"))
      seg.crossJoin(broadcast(pooled)) // 1 row
        .select(col("event_type"), col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          signum(expr("CAST(sya AS DECIMAL(38,0)) * nb" +
            " - CAST(syb AS DECIMAL(38,0)) * na")).cast("long")
            .as("segment_sign"),
          col("pooled_sign"))
        .withColumn("reversed", col("segment_sign") =!= 0
          && col("segment_sign") =!= col("pooled_sign"))
    })
  )

  /** q394's candidate+verify stage, factored for the PlanSpec gate —
    * q394's own final plan is the post-checkpoint RDD scan (the CC
    * operator checkpoints per round), so the match join must be
    * introspected here, pre-checkpoint. `names` is the identical-name
    * collapse (p_name, rep). Candidates come from
    * [[graft.operators.EntityBlocking.edCandidatePairs]] — lossless
    * q-gram count filtering + DF-ordered AllPairs prefix join +
    * length window, never a cross join over the name grid (the r10
    * distinct-name cross join was still O(distinct²), and TPC-H part
    * names are near-unique, so "distinct" ≈ the part table — the
    * blocked join is the 100×-safe shape). The 3-arg levenshtein
    * VERIFY runs the BANDED DP (O(len·k), early exit, -1 past the
    * threshold) — same predicate as `<= 2`, cheaper per pair — over
    * candidates only.
    */
  private[graft] def erMatchPairs(names: DataFrame): DataFrame = {
    val cand = graft.operators.EntityBlocking
      .edCandidatePairs(names, "rep", "p_name", maxEdits = 2)
    cand
      .join(names.select(col("rep").as("a_id"), col("p_name").as("a_name")),
        "a_id")
      .join(names.select(col("rep").as("b_id"), col("p_name").as("b_name")),
        "b_id")
      .filter(levenshtein(col("a_name"), col("b_name"), 2) >= 0)
      .select(col("a_id").as("a_rep"), col("b_id").as("b_rep"))
  }

  /** q384's report body, factored so the query map entry stays at
    * altitude: margins, the bounded grid with absent cells at 0, and
    * the common-denominator L1 permille.
    */
  private def tClosenessReport(cell: DataFrame): DataFrame = {
      val g = cell.groupBy(col("source")).agg(sum(col("ngc")).as("ng"))
      val c = cell.groupBy(col("lang")).agg(sum(col("ngc")).as("nc"))
      val n = cell.agg(sum(col("ngc")).as("n"))
      g.crossJoin(c)
        .join(cell, Seq("source", "lang"), "left")
        .withColumn("ngc", coalesce(col("ngc"), lit(0L)))
        .crossJoin(broadcast(n))
        .groupBy(col("source"))
        .agg(max(col("ng")).cast("long").as("n_rows"),
          expr("sum(abs(CAST(ngc AS DECIMAL(38,0)) * n " +
            "- CAST(nc AS DECIMAL(38,0)) * ng)) * 1000 " +
            "div (max(CAST(ng AS DECIMAL(38,0))) * max(n))")
            .as("l1_permille"))
  }

  /** Per-process scratch root, wiped and recreated on every call —
    * the Manifest queries re-run inside one JVM (bench min-of-2,
    * ReproSpec's double run) and their commits are deliberately
    * errorifexists, so each invocation starts from an empty table.
    */
  private def freshScratch(tag: String, d: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-" + Integer.toHexString(d.hashCode) +
        "-p" + ProcessHandle.current().pid())
    graft.util.Fs.deleteRecursively(p)
    p.toString
  }

  /** Five unrolled BFS rounds sharing one recurrence with the Spark
    * loop.
    */
  private val bfsIters: String = (1 to 5).map { i =>
    s"""d$i AS (
           SELECT tok, min(hops)::BIGINT AS hops FROM (
             SELECT tok, hops FROM d${i - 1}
             UNION ALL
             SELECT e.w2 AS tok, x.hops + 1 AS hops
             FROM edges e JOIN d${i - 1} x ON e.w1 = x.tok)
           GROUP BY 1)"""
  }.mkString(",\n         ")

  def oracleSql: Map[String, String] = Map(
    "q248_scd2_history" ->
      """WITH o AS (
           SELECT user_id, ts, event_id, event_type AS attr,
                  CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                       THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         v AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                     AS version
           FROM o),
         g AS (
           SELECT user_id, version, min(ts) AS vf, min(attr) AS attr,
                  count(*) AS n_events
           FROM v GROUP BY 1, 2)
         SELECT user_id, version::BIGINT AS version, attr,
                strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
                strftime(lead(vf) OVER wv, '%Y-%m-%d %H:%M:%S') AS valid_to,
                lead(vf) OVER wv IS NULL AS is_current, n_events
         FROM g
         WINDOW wv AS (PARTITION BY user_id ORDER BY version)""",
    "q251_triangle_count" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         o AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         adj AS (SELECT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b
                 FROM o x JOIN o y
                   ON y.doc_id = x.doc_id AND y.ord = x.ord + 1
                 WHERE x.tok <> y.tok),
         e AS (SELECT DISTINCT a, b FROM adj),
         deg AS (SELECT n, count(*) AS d FROM (
                   SELECT a AS n FROM e UNION ALL SELECT b FROM e)
                 GROUP BY 1),
         ori AS (SELECT CASE WHEN da.d < db.d
                               OR (da.d = db.d AND e.a < e.b)
                             THEN e.a ELSE e.b END AS u,
                        CASE WHEN da.d < db.d
                               OR (da.d = db.d AND e.a < e.b)
                             THEN e.b ELSE e.a END AS v
                 FROM e JOIN deg da ON da.n = e.a
                        JOIN deg db ON db.n = e.b),
         w AS (SELECT o1.v AS v, o2.v AS w FROM ori o1 JOIN ori o2
               ON o1.u = o2.u AND o1.v < o2.v),
         tri AS (SELECT count(*) AS n_triangles FROM w JOIN e
                 ON e.a = least(w.v, w.w) AND e.b = greatest(w.v, w.w))
         SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
                (SELECT count(*) FROM e)::BIGINT AS n_edges,
                (SELECT sum(d * (d - 1) // 2) FROM deg)::BIGINT AS n_wedges,
                n_triangles::BIGINT AS n_triangles
         FROM tri""",
    "q257_kcore_peel" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         o AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         adj AS (SELECT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b
                 FROM o x JOIN o y
                   ON y.doc_id = x.doc_id AND y.ord = x.ord + 1
                 WHERE x.tok <> y.tok),
         e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM adj),
         k1 AS MATERIALIZED (
           SELECT n FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
           GROUP BY 1 HAVING count(*) >= 3),
         e1 AS MATERIALIZED (
           SELECT e.a, e.b FROM e0 e JOIN k1 x ON x.n = e.a
                                     JOIN k1 y ON y.n = e.b),
         k2 AS MATERIALIZED (
           SELECT n FROM (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1)
           GROUP BY 1 HAVING count(*) >= 3),
         e2 AS MATERIALIZED (
           SELECT e.a, e.b FROM e1 e JOIN k2 x ON x.n = e.a
                                     JOIN k2 y ON y.n = e.b),
         k3 AS MATERIALIZED (
           SELECT n FROM (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2)
           GROUP BY 1 HAVING count(*) >= 3),
         e3 AS MATERIALIZED (
           SELECT e.a, e.b FROM e2 e JOIN k3 x ON x.n = e.a
                                     JOIN k3 y ON y.n = e.b),
         k4 AS MATERIALIZED (
           SELECT n FROM (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3)
           GROUP BY 1 HAVING count(*) >= 3),
         e4 AS MATERIALIZED (
           SELECT e.a, e.b FROM e3 e JOIN k4 x ON x.n = e.a
                                     JOIN k4 y ON y.n = e.b),
         k5 AS MATERIALIZED (
           SELECT n FROM (SELECT a AS n FROM e4 UNION ALL SELECT b FROM e4)
           GROUP BY 1 HAVING count(*) >= 3),
         e5 AS MATERIALIZED (
           SELECT e.a, e.b FROM e4 e JOIN k5 x ON x.n = e.a
                                     JOIN k5 y ON y.n = e.b)
         SELECT n AS tok, count(*)::BIGINT AS deg
         FROM (SELECT a AS n FROM e5 UNION ALL SELECT b FROM e5)
         GROUP BY 1""",
    "q258_pareto_skyline" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
                           round(o_totalprice * 100, 0)::BIGINT AS cents
                    FROM orders),
         c AS (SELECT odate, min(cents) AS cents FROM o GROUP BY 1),
         sky AS (SELECT * FROM c t WHERE NOT EXISTS (
                   SELECT 1 FROM c u
                   WHERE u.odate >= t.odate AND u.cents <= t.cents
                     AND (u.odate > t.odate OR u.cents < t.cents)))
         SELECT o.o_orderkey, strftime(o.odate, '%Y-%m-%d') AS order_date,
                o.cents
         FROM o JOIN sky USING (odate, cents)""",
    "q260_sequence_match" ->
      """WITH sq AS (
           SELECT user_id,
                  string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS seq
           FROM events GROUP BY 1)
         SELECT user_id, seq FROM sq
         WHERE regexp_matches(seq, 'vc+p')""",
    "q266_item_cooccurrence" ->
      """WITH bask AS (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         p AS (SELECT a.part AS pa, b.part AS pb, count(*)::BIGINT AS n_co
               FROM bask a JOIN bask b
                 ON b.cust = a.cust AND a.part < b.part
               GROUP BY 1, 2),
         sym AS (SELECT pa, pb, n_co FROM p
                 UNION ALL SELECT pb, pa, n_co FROM p),
         r AS (SELECT pa AS item, pb AS rec, n_co,
                 row_number() OVER (PARTITION BY pa
                   ORDER BY n_co DESC, pb)::BIGINT AS rk
               FROM sym)
         SELECT item, rec, n_co, rk FROM r WHERE rk <= 3""",
    "q267_twap" ->
      """WITH b AS (
           SELECT user_id, event_id, ts,
                  round(value * 100, 0)::BIGINT AS cents,
                  epoch_us(ts) AS us
           FROM events),
         l AS (SELECT *, (lead(us) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) - us) // 1000000 AS dt
               FROM b),
         a AS (SELECT user_id, sum(cents * dt)::BIGINT AS num,
                      sum(dt)::BIGINT AS den
               FROM l WHERE dt IS NOT NULL GROUP BY 1)
         SELECT user_id, num, den, (num // den)::BIGINT AS twap_floor
         FROM a WHERE den > 0""",
    "q269_hierarchy_share" ->
      """WITH rev AS (
           SELECT c.c_nationkey,
                  sum(round(o.o_totalprice * 100, 0)::BIGINT)::BIGINT AS nation_cents
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1),
         bn AS (SELECT r.r_name AS region, n.n_name AS nation,
                       rev.nation_cents
                FROM rev JOIN nation n ON n.n_nationkey = rev.c_nationkey
                         JOIN region r ON r.r_regionkey = n.n_regionkey),
         br AS (SELECT region, sum(nation_cents)::BIGINT AS region_cents
                FROM bn GROUP BY 1)
         SELECT bn.region, bn.nation, bn.nation_cents, br.region_cents,
                ((bn.nation_cents * 1000) // br.region_cents)::BIGINT AS share_pm
         FROM bn JOIN br USING (region)""",
    "q262_ri_audit" ->
      """SELECT 'lineitem.l_orderkey -> orders' AS relationship,
                (SELECT count(*) FROM lineitem)::BIGINT AS n_child,
                (SELECT count(*) FROM lineitem l
                 LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                   ON o.o_orderkey = l.l_orderkey
                 WHERE o.o_orderkey IS NULL)::BIGINT AS n_orphans
         UNION ALL
         SELECT 'orders.o_custkey -> customer',
                (SELECT count(*) FROM orders)::BIGINT,
                (SELECT count(*) FROM orders r
                 LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                   ON c.c_custkey = r.o_custkey
                 WHERE c.c_custkey IS NULL)::BIGINT
         UNION ALL
         SELECT 'customer.c_nationkey -> nation',
                (SELECT count(*) FROM customer)::BIGINT,
                (SELECT count(*) FROM customer c
                 LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
                   ON n.n_nationkey = c.c_nationkey
                 WHERE n.n_nationkey IS NULL)::BIGINT""",
    "q265_golden_record" ->
      """WITH prof AS (
           SELECT user_id,
                  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
                  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
                  count(*)::BIGINT AS n_events,
                  sum(round(value * 100, 0)::BIGINT)::BIGINT AS value_cents
           FROM events GROUP BY 1),
         m AS (SELECT user_id, event_type, count(*) AS n
               FROM events GROUP BY 1, 2),
         r AS (SELECT user_id, event_type AS modal_type,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY n DESC, event_type) AS rk
               FROM m)
         SELECT p.user_id, p.first_seen, p.last_seen, p.n_events,
                p.value_cents, r.modal_type
         FROM prof p JOIN r ON r.user_id = p.user_id AND r.rk = 1""",
    "q309_identity_stitch" ->
      """WITH RECURSIVE u AS (
           SELECT DISTINCT user_id, user_id // 3 AS device_id FROM events),
         p AS (SELECT a.user_id AS u1, b.user_id AS u2
               FROM u a JOIN u b
                 ON b.device_id = a.device_id AND a.user_id < b.user_id),
         e AS (SELECT u1 AS s, u2 AS d FROM p
               UNION SELECT u2, u1 FROM p),
         reach AS (
           SELECT user_id AS s, user_id AS d FROM u
           UNION
           SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s)
         SELECT s AS user_id, min(d) AS person_id,
                count(*)::BIGINT AS cluster_size
         FROM reach GROUP BY s""",
    "q310_bom_rollup" ->
      """WITH RECURSIVE o AS (
           SELECT o_orderkey AS k,
                  round(o_totalprice * 100, 0)::BIGINT AS cents
           FROM orders),
         anc AS (
           SELECT k, cents, k AS node FROM o
           UNION ALL
           SELECT k, cents, (node - 1) // 4 AS node
           FROM anc WHERE node > 0)
         SELECT node, sum(cents)::BIGINT AS subtree_cents,
                count(*)::BIGINT AS n_desc
         FROM anc GROUP BY 1""",
    "q304_local_time_rollup" ->
      """SELECT (epoch_us(ts) + ((user_id % 24) - 12) * 3600000000)
                // 86400000000 AS local_epoch_day,
                count(*)::BIGINT AS n_events,
                count(DISTINCT user_id)::BIGINT AS n_users
         FROM events GROUP BY 1""",
    "q305_log2_histogram" ->
      """WITH b AS (
           SELECT event_type, round(value * 100, 0)::BIGINT AS cents
           FROM events WHERE round(value * 100, 0) > 0),
         k AS (SELECT event_type, cents,
                 (length(printf('%b', cents)) - 1)::BIGINT AS bucket
               FROM b)
         SELECT event_type, bucket, count(*)::BIGINT AS n,
                min(cents)::BIGINT AS lo_seen, max(cents)::BIGINT AS hi_seen,
                pow(2, bucket)::BIGINT AS lo_edge
         FROM k GROUP BY 1, 2""",
    "q306_id_gaps" ->
      """WITH k AS (
           SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0),
         l AS (SELECT o_orderkey,
                 lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev
               FROM k)
         SELECT (prev + 1)::BIGINT AS gap_from,
                (o_orderkey - 1)::BIGINT AS gap_to,
                (o_orderkey - prev - 1)::BIGINT AS gap_width
         FROM l WHERE prev IS NOT NULL AND o_orderkey - prev > 1""",
    "q323_ooo_audit" ->
      """WITH p AS (
           SELECT user_id, event_id,
                  epoch_us(ts) - CASE WHEN event_id % 97 = 0
                    THEN (event_id % 1000 + 1) * 60000000 ELSE 0 END AS us
           FROM events),
         h AS (SELECT us, max(us) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
               FROM p),
         l AS (SELECT CASE WHEN hwm IS NULL OR hwm <= us THEN -1
                        ELSE (hwm - us) // 1000000 END AS late_s
               FROM h)
         SELECT CASE WHEN late_s <= 0 THEN -1
                  ELSE length(printf('%b', late_s)) - 1 END::BIGINT AS bucket,
                count(*)::BIGINT AS n_events,
                max(late_s)::BIGINT AS max_late_s
         FROM l GROUP BY 1""",
    "q324_session_concurrency" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (SELECT user_id, tsu, event_id,
                 CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                      THEN 1 ELSE 0 END AS new_s
               FROM x),
         s0 AS (SELECT user_id, tsu,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT
                    AS sid
                FROM f),
         iv AS (SELECT user_id, sid, min(tsu) AS s_us, max(tsu) + 1 AS e_us
                FROM s0 GROUP BY 1, 2),
         ed AS (SELECT s_us AS t_us, 1 AS delta, user_id, sid FROM iv
                UNION ALL
                SELECT e_us, -1, user_id, sid FROM iv),
         r AS (SELECT t_us,
                 sum(delta) OVER (ORDER BY t_us, delta, user_id, sid
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS conc
               FROM ed)
         SELECT t_us // 86400000000 AS epoch_day,
                max(conc)::BIGINT AS max_concurrent,
                count(*)::BIGINT AS n_edges
         FROM r GROUP BY 1""",
    "q325_type_gini" ->
      """WITH c AS (
           SELECT user_id, event_type, count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
         g AS (SELECT user_id, sum(c)::BIGINT AS n, sum(c * c)::BIGINT AS ss
               FROM c GROUP BY 1),
         p AS (SELECT (((n * n - ss) * 1000) // (n * n))::BIGINT AS gini_pm
               FROM g)
         SELECT (gini_pm // 10)::BIGINT AS bucket,
                count(*)::BIGINT AS n_users,
                min(gini_pm)::BIGINT AS min_pm,
                max(gini_pm)::BIGINT AS max_pm
         FROM p GROUP BY 1""",
    "q326_incremental_agg" ->
      """SELECT o_custkey, count(*)::BIGINT AS n_orders,
                sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS cents
         FROM orders GROUP BY 1""",
    "q329_lang_source_matrix" ->
      """WITH o AS (
           SELECT lang, source, count(*)::BIGINT AS o
           FROM documents GROUP BY 1, 2),
         r AS (SELECT lang, sum(o)::BIGINT AS r FROM o GROUP BY 1),
         c AS (SELECT source, sum(o)::BIGINT AS c FROM o GROUP BY 1),
         n AS (SELECT sum(o)::BIGINT AS n FROM o)
         SELECT o.lang, o.source, o.o,
                (((o.o * n.n - r.r * c.c) * 1000)
                  // (r.r * c.c))::BIGINT AS dev_pm
         FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n""",
    "q363_snapshot_read" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents WHERE doc_id % 3 IN (0, 1) GROUP BY 1""",
    "q364_compaction_commit" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars,
                true AS pre_post_match
         FROM documents GROUP BY 1""",
    "q365_delete_commit" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents
         WHERE NOT (lang = 'de' AND doc_id % 3 = 0) GROUP BY 1""",
    "q366_stratified_sample" ->
      """SELECT lang, count(*)::BIGINT AS n_total,
                sum(CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1)
                      IN ('0', '1', '2', '3') THEN 1 ELSE 0 END)::BIGINT
                  AS n_sampled,
                sum(CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1)
                      IN ('0', '1', '2', '3') THEN n_chars ELSE 0 END)::BIGINT
                  AS sampled_chars,
                (sum(CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1)
                      IN ('0', '1', '2', '3') THEN 1 ELSE 0 END) * 1000
                  // count(*))::BIGINT AS sampled_permille
         FROM documents GROUP BY 1""",
    "q367_idempotent_ingest" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents GROUP BY 1""",
    "q368_repetition_score" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
                    FROM documents),
         e AS (SELECT doc_id, lang, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         g AS (SELECT a.doc_id, a.lang,
                      a.tok || ' ' || b.tok || ' ' || c.tok AS gram
               FROM e a
               JOIN e b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
               JOIN e c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2),
         pd AS (SELECT doc_id, lang, count(*) AS total,
                       count(DISTINCT gram) AS dist
                FROM g GROUP BY 1, 2),
         dp AS (SELECT lang,
                       ((total - dist) * 1000 // total)::BIGINT
                         AS dup_permille
                FROM pd)
         SELECT lang, count(*)::BIGINT AS n_docs,
                (sum(dup_permille) // count(*))::BIGINT AS avg_dup3_permille,
                max(dup_permille)::BIGINT AS max_dup3_permille
         FROM dp GROUP BY 1""",
    "q370_stats_pruned_read" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents WHERE doc_id BETWEEN 5 AND 8 GROUP BY 1""",
    "q371_phrase_search" ->
      """WITH t AS MATERIALIZED (
           SELECT doc_id, lang, string_split(text, ' ') AS ws
           FROM documents),
         e AS MATERIALIZED (
           SELECT doc_id, lang, unnest(ws) AS tok,
                  generate_subscripts(ws, 1) AS ord FROM t),
         bg AS (SELECT a.tok || ' ' || b.tok AS bigram, count(*) AS n
                FROM e a
                JOIN e b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
                GROUP BY 1),
         top1 AS MATERIALIZED (
           SELECT bigram FROM bg ORDER BY n DESC, bigram LIMIT 1),
         hits AS (SELECT a.doc_id, a.lang
                  FROM e a
                  JOIN e b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
                  JOIN top1 ON a.tok || ' ' || b.tok = top1.bigram)
         SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
                count(*)::BIGINT AS n_occurrences,
                (SELECT bigram FROM top1) AS phrase
         FROM hits GROUP BY 1""",
    "q372_linear_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us,
                      'ch' || (json_extract_string(props, '$.k')::BIGINT
                        % 4)::VARCHAR AS channel
               FROM events WHERE event_type = 'click'),
         m AS (SELECT p.p_id, c.c_id, c.c_us, c.channel
               FROM p JOIN c ON c.user_id = p.user_id
                 AND c.c_us <= p.p_us
                 AND p.p_us - c.c_us <= 604800000000),
         m2 AS (SELECT m.*, count(*) OVER (PARTITION BY p_id) AS k,
                       row_number() OVER (PARTITION BY p_id
                         ORDER BY c_us, c_id) AS rn
                FROM m),
         cr AS (SELECT channel,
                       (1000 // k) + CASE WHEN rn = 1
                         THEN 1000 - k * (1000 // k) ELSE 0 END
                         AS credit_pm
                FROM m2
                UNION ALL
                SELECT 'none' AS channel, 1000 AS credit_pm
                FROM p WHERE p_id NOT IN (SELECT p_id FROM m))
         SELECT channel, count(*)::BIGINT AS n_touches,
                sum(credit_pm)::BIGINT AS credit_pm_total
         FROM cr GROUP BY 1""",
    "q373_version_diff" ->
      """SELECT 'v1_to_v3' AS diff_window, 'inserted' AS change_type,
                lang, count(*)::BIGINT AS n_rows
         FROM documents WHERE doc_id % 3 IN (1, 2) GROUP BY 3
         UNION ALL
         SELECT 'v3_to_v4' AS diff_window, 'deleted' AS change_type,
                lang, count(*)::BIGINT AS n_rows
         FROM documents WHERE lang = 'de' AND doc_id % 3 = 0 GROUP BY 3""",
    "q374_upsert_commit" ->
      """WITH merged AS (
           SELECT lang,
                  CASE WHEN doc_id % 15 = 0 THEN n_chars + 1000
                       ELSE n_chars END AS n_chars
           FROM documents
           UNION ALL
           SELECT lang, n_chars + 7 AS n_chars
           FROM documents WHERE doc_id % 7 = 0)
         SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM merged GROUP BY 1""",
    "q375_stream_cdc_ingest" ->
      """WITH merged AS (
           SELECT lang,
                  CASE WHEN doc_id % 10 = 0 THEN n_chars + 200
                       ELSE n_chars END AS n_chars
           FROM documents WHERE doc_id % 4 <> 0
           UNION ALL
           SELECT lang, n_chars + 5 AS n_chars
           FROM documents WHERE doc_id % 6 = 0)
         SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM merged GROUP BY 1""",
    "q377_spearman" ->
      """WITH d AS (SELECT doc_id, n_chars,
                           len(string_split(text, ' '))::BIGINT AS n_tokens
                    FROM documents),
         vx AS (SELECT n_chars AS v, count(*)::BIGINT AS cnt
                FROM d GROUP BY 1),
         mx AS (SELECT v, 2 * sum(cnt) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cnt + 1 AS s
                FROM vx),
         vy AS (SELECT n_tokens AS v, count(*)::BIGINT AS cnt
                FROM d GROUP BY 1),
         my AS (SELECT v, 2 * sum(cnt) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cnt + 1 AS s
                FROM vy),
         j AS (SELECT x.s::HUGEINT - y.s::HUGEINT AS dd
               FROM d JOIN mx x ON x.v = d.n_chars
                      JOIN my y ON y.v = d.n_tokens),
         agg AS (SELECT count(*)::BIGINT AS n, sum(dd * dd) AS sd2 FROM j)
         SELECT n AS n_docs, sd2::VARCHAR AS sum_d2_scaled,
                ((2 * n::HUGEINT * (n::HUGEINT * n - 1) - 3 * sd2) * 1000
                  // (2 * n::HUGEINT * (n::HUGEINT * n - 1)))::BIGINT
                  AS rho_permille
         FROM agg""",
    "q378_mann_whitney" ->
      """WITH v AS (SELECT n_chars AS val, count(*)::BIGINT AS cnt
                    FROM documents GROUP BY 1),
         m AS (SELECT val, 2 * sum(cnt) OVER (ORDER BY val
                   ROWS UNBOUNDED PRECEDING) - cnt + 1 AS s2
               FROM v),
         j AS (SELECT CASE WHEN d.lang = 'en' THEN 'en' ELSE 'other' END
                        AS grp, m.s2
               FROM documents d JOIN m ON m.val = d.n_chars),
         a AS (SELECT grp, count(*)::BIGINT AS n, sum(s2::HUGEINT) AS r2
               FROM j GROUP BY 1)
         SELECT e.n AS n_en, o.n AS n_other,
                (e.r2 - e.n::HUGEINT * (e.n + 1))::VARCHAR AS u2_en,
                ((e.r2 - e.n::HUGEINT * (e.n + 1)) * 500
                  // (e.n::HUGEINT * o.n))::BIGINT AS auc_permille
         FROM (SELECT * FROM a WHERE grp = 'en') e
              CROSS JOIN (SELECT * FROM a WHERE grp = 'other') o""",
    "q379_partition_pruned_read" ->
      """SELECT doc_id % 5 AS bucket, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents WHERE lang = 'de' GROUP BY 1""",
    "q380_wilcoxon" ->
      """WITH pu AS (
           SELECT user_id,
                  sum(CASE WHEN (epoch_us(ts) // 604800000000) % 2 = 0
                        THEN round(value * 100, 0)::BIGINT
                        ELSE -round(value * 100, 0)::BIGINT END)::BIGINT AS d
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         nz AS (SELECT d, abs(d) AS ad FROM pu WHERE d <> 0),
         v AS (SELECT ad, count(*)::BIGINT AS cnt FROM nz GROUP BY 1),
         m AS (SELECT ad, 2 * sum(cnt) OVER (ORDER BY ad
                   ROWS UNBOUNDED PRECEDING) - cnt + 1 AS s2
               FROM v),
         j AS (SELECT nz.d, m.s2 FROM nz JOIN m USING (ad)),
         agg AS (SELECT count(*)::BIGINT AS n,
                        coalesce(sum(CASE WHEN d > 0 THEN s2::HUGEINT END),
                                 0) AS w2,
                        sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS np
                 FROM j)
         SELECT n AS n_pairs, np AS n_pos, w2::VARCHAR AS w2_plus,
                CASE WHEN n = 0 THEN NULL
                     ELSE (w2 * 1000 // (n::HUGEINT * (n + 1)))::BIGINT
                END AS wplus_permille
         FROM agg""",
    "q381_ivm_changefeed" ->
      """WITH fin AS (
           SELECT CASE WHEN doc_id % 9 = 0 THEN 'zz' ELSE lang END AS lang,
                  CASE WHEN doc_id % 9 = 0 THEN n_chars + 50
                       ELSE n_chars END AS n_chars
           FROM documents WHERE doc_id % 8 <> 0
           UNION ALL
           SELECT lang, n_chars + 3 AS n_chars
           FROM documents WHERE doc_id % 11 = 0)
         SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars, true AS ivm_match
         FROM fin GROUP BY 1""",
    "q382_bloom_pruned_read" ->
      """SELECT doc_id, lang, n_chars
         FROM documents WHERE doc_id IN (33, 34, 35)""",
    "q383_cdc_chunk_dedup" ->
      """WITH pts AS (
           SELECT lang, text,
                  [1] || list_filter(range(2, length(text) + 1),
                           i -> md5(substring(text, i, 4)) LIKE '0%')
                      || [length(text) + 1] AS bs
           FROM documents),
         ch AS (
           SELECT lang,
                  md5(substring(text, bs[j], bs[j + 1] - bs[j])) AS dg
           FROM pts, UNNEST(range(1, len(bs))) AS t(j))
         SELECT lang, count(*)::BIGINT AS n_chunks,
                count(DISTINCT dg)::BIGINT AS n_distinct,
                ((count(*) - count(DISTINCT dg)) * 1000
                  // count(*))::BIGINT AS dup_permille
         FROM ch GROUP BY 1""",
    "q384_t_closeness" ->
      """WITH cell AS (SELECT source, lang, count(*)::BIGINT AS ngc
                       FROM documents GROUP BY 1, 2),
         g AS (SELECT source, sum(ngc)::BIGINT AS ng FROM cell GROUP BY 1),
         c AS (SELECT lang, sum(ngc)::BIGINT AS nc FROM cell GROUP BY 1),
         n AS (SELECT sum(ngc)::BIGINT AS n FROM cell),
         grid AS (
           SELECT g.source, g.ng, c.nc, coalesce(cell.ngc, 0) AS ngc
           FROM g CROSS JOIN c
                LEFT JOIN cell ON cell.source = g.source
                              AND cell.lang = c.lang)
         SELECT grid.source, max(grid.ng)::BIGINT AS n_rows,
                (sum(abs(grid.ngc::HUGEINT * n.n
                         - grid.nc::HUGEINT * grid.ng)) * 1000
                  // (max(grid.ng)::HUGEINT * max(n.n)))::BIGINT
                  AS l1_permille
         FROM grid CROSS JOIN n GROUP BY 1""",
    "q386_rank_anova" ->
      """WITH v AS (SELECT n_chars AS val, count(*)::BIGINT AS cnt
                    FROM documents GROUP BY 1),
         m AS (SELECT val, 2 * sum(cnt) OVER (ORDER BY val
                   ROWS UNBOUNDED PRECEDING) - cnt + 1 AS s2
               FROM v),
         j AS (SELECT d.lang, m.s2
               FROM documents d JOIN m ON m.val = d.n_chars),
         g AS (SELECT lang, count(*)::BIGINT AS n_docs,
                      sum(s2::HUGEINT) AS s2sum
               FROM j GROUP BY 1),
         t AS (SELECT count(*)::BIGINT AS n FROM documents)
         SELECT g.lang, g.n_docs, g.s2sum::VARCHAR AS s2_sum,
                ((g.s2sum - g.n_docs::HUGEINT * (t.n + 1)) * 1000
                  // (g.n_docs::HUGEINT * (t.n + 1)))::BIGINT
                  AS dev_permille
         FROM g CROSS JOIN t""",
    "q387_kendall_stats" ->
      """WITH cells AS (
           SELECT n_chars AS x, len(string_split(text, ' '))::BIGINT AS y,
                  count(*)::BIGINT AS cnt
           FROM documents GROUP BY 1, 2),
         cd AS (
           SELECT coalesce(sum(CASE WHEN b.y > a.y
                    THEN a.cnt::HUGEINT * b.cnt END), 0) AS cc,
                  coalesce(sum(CASE WHEN b.y < a.y
                    THEN a.cnt::HUGEINT * b.cnt END), 0) AS dd
           FROM cells a JOIN cells b ON b.x > a.x),
         tx AS (SELECT coalesce(sum(m::HUGEINT * (m - 1) // 2), 0) AS t_x
                FROM (SELECT sum(cnt)::BIGINT AS m FROM cells GROUP BY x)),
         ty AS (SELECT coalesce(sum(m::HUGEINT * (m - 1) // 2), 0) AS t_y
                FROM (SELECT sum(cnt)::BIGINT AS m FROM cells GROUP BY y)),
         t AS (SELECT count(*)::BIGINT AS n FROM documents)
         SELECT t.n AS n_docs,
                cd.cc::VARCHAR AS concordant,
                cd.dd::VARCHAR AS discordant,
                tx.t_x::VARCHAR AS tied_x,
                ty.t_y::VARCHAR AS tied_y,
                ((cd.cc - cd.dd) * 2000
                  // (t.n::HUGEINT * (t.n - 1)))::BIGINT AS tau_a_permille
         FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN t""",
    "q369_cohort_ltv" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
                           round(value * 100, 0)::BIGINT AS cents
                    FROM events WHERE event_type = 'purchase'),
         cohort AS (SELECT user_id, min(wk) AS cw FROM p GROUP BY 1),
         cells AS (SELECT c.cw, p.wk - c.cw AS age,
                          sum(p.cents)::BIGINT AS revenue_cents
                   FROM p JOIN cohort c ON c.user_id = p.user_id
                   GROUP BY 1, 2),
         tot AS (SELECT cw, sum(revenue_cents)::BIGINT AS cohort_cents
                 FROM cells GROUP BY 1)
         SELECT cells.cw AS cohort_week, cells.age, cells.revenue_cents,
                (sum(cells.revenue_cents) OVER (PARTITION BY cells.cw
                   ORDER BY cells.age ROWS UNBOUNDED PRECEDING))::BIGINT
                  AS cum_cents,
                ((sum(cells.revenue_cents) OVER (PARTITION BY cells.cw
                   ORDER BY cells.age ROWS UNBOUNDED PRECEDING)) * 1000
                  // t.cohort_cents)::BIGINT AS ltv_permille
         FROM cells JOIN tot t ON t.cw = cells.cw""",
    "q361_weighted_median" ->
      """WITH items AS (
           SELECT l_returnflag AS flag,
                  round(l_extendedprice * 100, 0)::BIGINT AS cents,
                  l_quantity::BIGINT AS qty,
                  l_orderkey, l_linenumber
           FROM lineitem),
         tot AS (SELECT flag, sum(qty)::BIGINT AS total_qty
                 FROM items GROUP BY 1),
         r AS (SELECT flag, cents,
                 sum(qty) OVER (PARTITION BY flag
                   ORDER BY cents, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
               FROM items)
         SELECT r.flag, min(r.cents)::BIGINT AS weighted_median_cents,
                min(t.total_qty)::BIGINT AS total_qty
         FROM r JOIN tot t ON t.flag = r.flag
         WHERE 2 * r.cum >= t.total_qty
         GROUP BY 1""",
    "q362_time_to_convert" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         fv AS (SELECT user_id, min(us) AS v_us
                FROM e WHERE event_type = 'view' GROUP BY 1),
         conv AS (SELECT e.user_id, min(e.us - fv.v_us) AS gap_us
                  FROM e JOIN fv USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.us >= fv.v_us
                  GROUP BY 1),
         b AS (SELECT fv.user_id,
                 CASE WHEN c.gap_us IS NULL THEN -1
                   ELSE length(printf('%b',
                     c.gap_us // 60000000 + 1)) - 1
                 END::BIGINT AS bucket
               FROM fv LEFT JOIN conv c USING (user_id))
         SELECT bucket, count(*)::BIGINT AS n_users
         FROM b GROUP BY 1""",
    "q359_user_cap" ->
      """WITH r AS (
           SELECT event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY md5(event_id::VARCHAR), event_id) AS rk
           FROM events)
         SELECT event_type, count(*)::BIGINT AS n_events,
                sum(CASE WHEN rk <= 40 THEN 1 ELSE 0 END)::BIGINT
                  AS n_kept,
                ((sum(CASE WHEN rk <= 40 THEN 1 ELSE 0 END) * 1000)
                  // count(*))::BIGINT AS keep_pm
         FROM r GROUP BY 1""",
    "q360_schema_evolution" ->
      """SELECT (1 + (doc_id % 2))::BIGINT AS gen,
                count(*)::BIGINT AS n_docs,
                sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
                  AS n_quality_null,
                count(DISTINCT lang)::BIGINT AS n_langs
         FROM documents GROUP BY 1""",
    "q356_rfm_segments" ->
      """WITH rfm AS (
           SELECT o_custkey AS custkey,
                  max(epoch_us(o_orderdate) // 86400000000) AS r_day,
                  count(*)::BIGINT AS f_n,
                  sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT
                    AS m_cents
           FROM orders GROUP BY 1),
         n AS (SELECT count(*)::BIGINT AS n FROM rfm),
         q AS (SELECT custkey, m_cents,
                 (row_number() OVER (ORDER BY r_day, custkey) - 1) * 5
                   // n.n + 1 AS r_q,
                 (row_number() OVER (ORDER BY f_n, custkey) - 1) * 5
                   // n.n + 1 AS f_q,
                 (row_number() OVER (ORDER BY m_cents, custkey) - 1) * 5
                   // n.n + 1 AS m_q
               FROM rfm CROSS JOIN n)
         SELECT (r_q * 100 + f_q * 10 + m_q)::BIGINT AS segment,
                count(*)::BIGINT AS n_customers,
                sum(m_cents)::BIGINT AS segment_cents
         FROM q GROUP BY 1""",
    "q357_reactivation" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
         g AS (SELECT user_id,
                 day - lag(day) OVER (PARTITION BY user_id
                   ORDER BY day) AS gap
               FROM ud),
         u AS (SELECT user_id,
                 sum(CASE WHEN gap > 2 THEN 1 ELSE 0 END)::BIGINT
                   AS n_reactivations
               FROM g GROUP BY 1)
         SELECT n_reactivations, count(*)::BIGINT AS n_users
         FROM u GROUP BY 1""",
    "q358_pareto_curve" ->
      """WITH spend AS (
           SELECT o_custkey AS custkey,
                  sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT
                    AS cents
           FROM orders GROUP BY 1),
         t AS (SELECT sum(cents)::BIGINT AS total,
                 count(*)::BIGINT AS n FROM spend),
         r AS (SELECT custkey, cents,
                 row_number() OVER (ORDER BY cents DESC, custkey)
                   ::BIGINT AS rk,
                 sum(cents) OVER (ORDER BY cents DESC, custkey
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents
               FROM spend),
         dec AS (SELECT ((rk - 1) * 10 // t.n + 1)::BIGINT AS decile,
                   count(*)::BIGINT AS n_customers,
                   max(cum_cents)::BIGINT AS max_cum
                 FROM r CROSS JOIN t GROUP BY 1)
         SELECT d.decile, d.n_customers,
                ((d.max_cum * 1000) // t.total)::BIGINT
                  AS cum_revenue_pm
         FROM dec d CROSS JOIN t""",
    "q355_mmr_rerank" ->
      """WITH occ AS MATERIALIZED (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         dfq AS (SELECT token, count(*)::BIGINT AS df
                 FROM (SELECT DISTINCT doc_id, token FROM occ)
                 GROUP BY 1),
         term AS (SELECT token AS term FROM dfq
                  ORDER BY df DESC, token LIMIT 1),
         hits AS MATERIALIZED (
           SELECT o.doc_id, count(*)::BIGINT AS h
           FROM occ o JOIN term t ON o.token = t.term GROUP BY 1),
         cand AS MATERIALIZED (
           SELECT doc_id, h FROM hits ORDER BY h DESC, doc_id LIMIT 20),
         ct AS MATERIALIZED (
           SELECT DISTINCT o.doc_id, o.token
           FROM occ o JOIN cand c USING (doc_id)),
         ov AS MATERIALIZED (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS ov
           FROM ct a JOIN ct b ON a.token = b.token
             AND a.doc_id <> b.doc_id
           GROUP BY 1, 2),
         s1 AS MATERIALIZED (
           SELECT 1::BIGINT AS pick, doc_id, h,
                  (h * 1000)::BIGINT AS score
           FROM cand ORDER BY h DESC, doc_id LIMIT 1),
         p1 AS (SELECT doc_id FROM s1),
         s2 AS MATERIALIZED (
           SELECT 2::BIGINT AS pick, doc_id, h, score FROM (
             SELECT c.doc_id, c.h,
                    (c.h * 1000 - 50 * coalesce(max(o.ov), 0))::BIGINT
                      AS score
             FROM cand c LEFT JOIN ov o ON o.da = c.doc_id
               AND o.db IN (SELECT doc_id FROM p1)
             WHERE c.doc_id NOT IN (SELECT doc_id FROM p1)
             GROUP BY 1, 2)
           ORDER BY score DESC, doc_id LIMIT 1),
         p2 AS (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2),
         s3 AS MATERIALIZED (
           SELECT 3::BIGINT AS pick, doc_id, h, score FROM (
             SELECT c.doc_id, c.h,
                    (c.h * 1000 - 50 * coalesce(max(o.ov), 0))::BIGINT
                      AS score
             FROM cand c LEFT JOIN ov o ON o.da = c.doc_id
               AND o.db IN (SELECT doc_id FROM p2)
             WHERE c.doc_id NOT IN (SELECT doc_id FROM p2)
             GROUP BY 1, 2)
           ORDER BY score DESC, doc_id LIMIT 1),
         p3 AS (SELECT doc_id FROM p2 UNION ALL SELECT doc_id FROM s3),
         s4 AS MATERIALIZED (
           SELECT 4::BIGINT AS pick, doc_id, h, score FROM (
             SELECT c.doc_id, c.h,
                    (c.h * 1000 - 50 * coalesce(max(o.ov), 0))::BIGINT
                      AS score
             FROM cand c LEFT JOIN ov o ON o.da = c.doc_id
               AND o.db IN (SELECT doc_id FROM p3)
             WHERE c.doc_id NOT IN (SELECT doc_id FROM p3)
             GROUP BY 1, 2)
           ORDER BY score DESC, doc_id LIMIT 1),
         p4 AS (SELECT doc_id FROM p3 UNION ALL SELECT doc_id FROM s4),
         s5 AS MATERIALIZED (
           SELECT 5::BIGINT AS pick, doc_id, h, score FROM (
             SELECT c.doc_id, c.h,
                    (c.h * 1000 - 50 * coalesce(max(o.ov), 0))::BIGINT
                      AS score
             FROM cand c LEFT JOIN ov o ON o.da = c.doc_id
               AND o.db IN (SELECT doc_id FROM p4)
             WHERE c.doc_id NOT IN (SELECT doc_id FROM p4)
             GROUP BY 1, 2)
           ORDER BY score DESC, doc_id LIMIT 1)
         SELECT pick, doc_id, h AS hits, score FROM (
           SELECT * FROM s1 UNION ALL SELECT * FROM s2
           UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
           UNION ALL SELECT * FROM s5)""",
    "q354_interval_coalesce" ->
      """WITH iv AS (
           SELECT user_id, event_id, epoch_us(ts) AS s_us,
                  epoch_us(ts) + 300000000 AS e_us
           FROM events),
         m AS (SELECT *, max(e_us) OVER (PARTITION BY user_id
                 ORDER BY s_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_e
               FROM iv),
         f AS (SELECT *, CASE WHEN prev_max_e IS NULL
                 OR s_us > prev_max_e THEN 1 ELSE 0 END AS new_island
               FROM m),
         g AS (SELECT *, sum(new_island) OVER (PARTITION BY user_id
                 ORDER BY s_us, event_id ROWS UNBOUNDED PRECEDING)
                 AS island
               FROM f),
         isl AS (SELECT user_id, island, min(s_us) AS is_us,
                   max(e_us) AS ie_us, count(*)::BIGINT AS n_events
                 FROM g GROUP BY 1, 2)
         SELECT user_id, count(*)::BIGINT AS n_islands,
                (sum(ie_us - is_us) // 1000000)::BIGINT AS covered_sec,
                sum(n_events)::BIGINT AS n_events
         FROM isl GROUP BY 1""",
    "q351_jsonl_roundtrip" ->
      """SELECT lang, source, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars,
                sum(length(text))::BIGINT AS sum_text_len
         FROM documents GROUP BY 1, 2""",
    "q352_l_diversity" ->
      """WITH cls AS (
           SELECT c_nationkey, c_mktsegment,
                  count(*)::BIGINT AS n_rows,
                  count(DISTINCT round(c_acctbal * 100, 0)::BIGINT
                    // 100000)::BIGINT AS n_distinct
           FROM customer GROUP BY 1, 2),
         e AS (SELECT cls.n_rows, cls.n_distinct, l.l
               FROM cls CROSS JOIN (VALUES (2), (3), (5)) AS l(l))
         SELECT l::BIGINT AS l, count(*)::BIGINT AS n_classes,
                sum(CASE WHEN n_distinct < l THEN 1 ELSE 0 END)::BIGINT
                  AS n_below_l,
                sum(CASE WHEN n_distinct < l THEN n_rows ELSE 0 END)
                  ::BIGINT AS n_rows_at_risk
         FROM e GROUP BY 1""",
    "q353_user_accumulation" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
         fd AS (SELECT user_id, min(day) AS fd FROM ud GROUP BY 1),
         nb AS (SELECT fd AS day, count(*)::BIGINT AS new_users
                FROM fd GROUP BY 1),
         dau AS (SELECT day, count(*)::BIGINT AS active_users
                 FROM ud GROUP BY 1),
         days AS (SELECT dau.day, dau.active_users,
                    coalesce(nb.new_users, 0)::BIGINT AS new_users
                  FROM dau LEFT JOIN nb USING (day)),
         r AS (SELECT *, sum(new_users) OVER (ORDER BY day
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS known_users
               FROM days)
         SELECT day::BIGINT AS day, new_users, active_users, known_users,
                ((active_users * 1000) // known_users)::BIGINT
                  AS stickiness_pm
         FROM r""",
    "q348_join_cardinality" ->
      """WITH a1 AS (SELECT o_custkey AS k, count(*)::BIGINT AS ca
                     FROM orders GROUP BY 1),
         b1 AS (SELECT c_custkey AS k, count(*)::BIGINT AS cb
                FROM customer GROUP BY 1),
         a2 AS (SELECT l_orderkey AS k, count(*)::BIGINT AS ca
                FROM lineitem GROUP BY 1),
         b2 AS (SELECT o_orderkey AS k, count(*)::BIGINT AS cb
                FROM orders GROUP BY 1),
         s1 AS (SELECT 'orders-customer' AS join_name,
                  (SELECT sum(ca * cb) FROM a1 JOIN b1 USING (k))
                    ::BIGINT AS exact_rows,
                  (SELECT sum(x.ca * y.cb) FROM
                    (SELECT k % 64 AS bkt, sum(ca) AS ca FROM a1
                     GROUP BY 1) x
                    JOIN (SELECT k % 64 AS bkt, sum(cb) AS cb FROM b1
                     GROUP BY 1) y USING (bkt))::BIGINT AS bucket_est),
         s2 AS (SELECT 'lineitem-orders',
                  (SELECT sum(ca * cb) FROM a2 JOIN b2 USING (k))
                    ::BIGINT,
                  (SELECT sum(x.ca * y.cb) FROM
                    (SELECT k % 64 AS bkt, sum(ca) AS ca FROM a2
                     GROUP BY 1) x
                    JOIN (SELECT k % 64 AS bkt, sum(cb) AS cb FROM b2
                     GROUP BY 1) y USING (bkt))::BIGINT)
         SELECT join_name, exact_rows, bucket_est,
                (((bucket_est - exact_rows) * 1000) // exact_rows)
                  ::BIGINT AS over_pm
         FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)""",
    "q349_kwic" ->
      """WITH occ AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         dfq AS (SELECT token, count(*)::BIGINT AS df
                 FROM (SELECT DISTINCT doc_id, token FROM occ)
                 GROUP BY 1),
         term AS (SELECT token AS term FROM dfq
                  ORDER BY df DESC, token LIMIT 1),
         tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
         pos AS (SELECT doc_id, toks,
                   generate_subscripts(toks, 1) AS q,
                   unnest(toks) AS token
                 FROM tk)
         SELECT p.doc_id, p.q::BIGINT AS pos,
                coalesce(array_to_string(
                  p.toks[greatest(p.q - 2, 1):(p.q - 1)], ' '), '')
                  AS left_ctx,
                t.term,
                coalesce(array_to_string(
                  p.toks[(p.q + 1):(p.q + 2)], ' '), '') AS right_ctx
         FROM pos p CROSS JOIN term t WHERE p.token = t.term""",
    "q350_bounce_report" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         d AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                 OR us - lag(us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_s
               FROM e
               WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         s0 AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                  ::BIGINT AS sid
                FROM d),
         w2 AS (SELECT user_id, sid, event_type,
                  row_number() OVER (PARTITION BY user_id, sid
                    ORDER BY us, event_id) AS rn_a,
                  row_number() OVER (PARTITION BY user_id, sid
                    ORDER BY us DESC, event_id DESC) AS rn_d,
                  count(*) OVER (PARTITION BY user_id, sid) AS n_events
                FROM s0),
         sess AS (SELECT user_id, sid,
                    min(CASE WHEN rn_a = 1 THEN event_type END)
                      AS entry_type,
                    min(CASE WHEN rn_d = 1 THEN event_type END)
                      AS exit_type,
                    min(n_events)::BIGINT AS n_events
                  FROM w2 GROUP BY 1, 2)
         SELECT entry_type, exit_type, count(*)::BIGINT AS n_sessions,
                sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
                  AS n_bounces,
                ((sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000)
                  // count(*))::BIGINT AS bounce_pm
         FROM sess GROUP BY 1, 2""",
    "q343_mad_outliers" ->
      """WITH o AS (
           SELECT o_orderkey,
                  round(o_totalprice * 100, 0)::BIGINT AS cents
           FROM orders),
         n AS (SELECT count(*)::BIGINT AS n FROM o),
         r AS (SELECT cents, row_number() OVER (ORDER BY cents,
                 o_orderkey) AS rk FROM o),
         med AS (SELECT min(cents)::BIGINT AS cents_med
                 FROM r CROSS JOIN n WHERE rk = (n + 1) // 2),
         dv AS (SELECT o.o_orderkey,
                  abs(o.cents - m.cents_med) AS adev
                FROM o CROSS JOIN med m),
         r2 AS (SELECT adev, row_number() OVER (ORDER BY adev,
                  o_orderkey) AS rk FROM dv),
         mad AS (SELECT min(adev)::BIGINT AS adev_med
                 FROM r2 CROSS JOIN n WHERE rk = (n + 1) // 2),
         f AS (SELECT count(*)::BIGINT AS n_orders,
                 sum(CASE WHEN abs(o.cents - m.cents_med) >
                   4 * d.adev_med THEN 1 ELSE 0 END)::BIGINT
                   AS n_outliers
               FROM o CROSS JOIN med m CROSS JOIN mad d)
         SELECT f.n_orders, m.cents_med AS median_cents,
                d.adev_med AS mad_cents, f.n_outliers
         FROM f CROSS JOIN med m CROSS JOIN mad d""",
    "q344_seasonal_backtest" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
         j AS (SELECT d.event_type, d.n, b.n AS pred
               FROM daily d JOIN daily b
                 ON b.event_type = d.event_type AND b.day = d.day - 7)
         SELECT event_type, count(*)::BIGINT AS n_days,
                sum(abs(n - pred))::BIGINT AS sum_abs_err,
                sum(n)::BIGINT AS total_actual,
                ((sum(abs(n - pred)) * 1000) // sum(n))::BIGINT AS mape_pm
         FROM j GROUP BY 1""",
    "q345_ab_ztest" ->
      """WITH u AS (
           SELECT user_id, max(CASE WHEN event_type = 'purchase'
             THEN 1 ELSE 0 END)::BIGINT AS converted
           FROM events GROUP BY 1),
         w AS (SELECT *, CASE WHEN substring(md5(user_id::VARCHAR), 1, 1)
                 IN ('0','1','2','3','4','5','6','7') THEN 'A'
                 ELSE 'B' END AS arm FROM u),
         arms AS (SELECT arm, count(*)::BIGINT AS n_users,
                    sum(converted)::BIGINT AS n_conv
                  FROM w GROUP BY 1),
         a AS (SELECT n_users AS na, n_conv AS ca FROM arms
               WHERE arm = 'A'),
         b AS (SELECT n_users AS nb, n_conv AS cb FROM arms
               WHERE arm = 'B')
         SELECT na, ca, nb, cb,
                ((ca * 1000) // na)::BIGINT AS conv_a_pm,
                ((cb * 1000) // nb)::BIGINT AS conv_b_pm,
                ((ca * nb - cb * na)::HUGEINT
                   * (ca * nb - cb * na)::HUGEINT
                   * (na + nb)::HUGEINT >
                 4::HUGEINT * (ca + cb)::HUGEINT
                   * (na + nb - ca - cb)::HUGEINT
                   * na::HUGEINT * nb::HUGEINT) AS significant
         FROM a CROSS JOIN b""",
    "q346_topk_ties" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, day::BIGINT AS day, n,
                rk::BIGINT AS rk
         FROM (SELECT *, dense_rank() OVER (PARTITION BY event_type
                 ORDER BY n DESC) AS rk FROM daily)
         WHERE rk <= 3""",
    "q347_compaction_plan" ->
      """WITH files AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS file_id,
                  count(*)::BIGINT AS size
           FROM orders GROUP BY 1),
         t AS (SELECT sum(size)::BIGINT AS total FROM files),
         r AS (SELECT *, sum(size) OVER (ORDER BY file_id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS running
               FROM files),
         p AS (SELECT r.file_id, r.size, r.running,
                 ((r.running - 1) // ((t.total + 7) // 8))::BIGINT AS bin
               FROM r CROSS JOIN t)
         SELECT bin, count(*)::BIGINT AS n_files,
                sum(size)::BIGINT AS bin_rows,
                min(file_id) AS first_file, max(file_id) AS last_file
         FROM p GROUP BY 1""",
    "q338_join_skew_audit" ->
      """WITH c1 AS (SELECT l_partkey AS k, count(*)::BIGINT AS c
                     FROM lineitem GROUP BY 1),
         c2 AS (SELECT l_suppkey AS k, count(*)::BIGINT AS c
                FROM lineitem GROUP BY 1),
         c3 AS (SELECT o_custkey AS k, count(*)::BIGINT AS c
                FROM orders GROUP BY 1),
         a1 AS (SELECT 'lineitem.l_partkey' AS key_col,
                  sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
                  max(c)::BIGINT AS max_key_rows,
                  (SELECT sum(c) FROM (SELECT c FROM c1
                    ORDER BY c DESC, k LIMIT 10))::BIGINT AS top10_rows
                FROM c1),
         a2 AS (SELECT 'lineitem.l_suppkey',
                  sum(c)::BIGINT, count(*)::BIGINT, max(c)::BIGINT,
                  (SELECT sum(c) FROM (SELECT c FROM c2
                    ORDER BY c DESC, k LIMIT 10))::BIGINT
                FROM c2),
         a3 AS (SELECT 'orders.o_custkey',
                  sum(c)::BIGINT, count(*)::BIGINT, max(c)::BIGINT,
                  (SELECT sum(c) FROM (SELECT c FROM c3
                    ORDER BY c DESC, k LIMIT 10))::BIGINT
                FROM c3)
         SELECT key_col, n_rows, n_keys, max_key_rows, top10_rows,
                ((max_key_rows * n_keys * 1000) // n_rows)::BIGINT
                  AS max_over_mean_pm
         FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2
               UNION ALL SELECT * FROM a3)""",
    "q339_winsorize" ->
      """WITH o AS (
           SELECT o_orderkey,
                  round(o_totalprice * 100, 0)::BIGINT AS cents
           FROM orders),
         r AS (SELECT *, row_number() OVER (ORDER BY cents, o_orderkey)
                 ::BIGINT AS rk FROM o),
         n AS (SELECT count(*)::BIGINT AS n FROM o),
         f AS (SELECT min(cents)::BIGINT AS lo, max(cents)::BIGINT AS hi
               FROM r CROSS JOIN n
               WHERE rk = greatest((n * 1) // 100, 1)
                  OR rk = greatest((n * 99) // 100, 1))
         SELECT o_orderkey, cents,
                greatest(least(cents, hi), lo)::BIGINT AS clipped_cents,
                (cents < lo OR cents > hi) AS was_clipped
         FROM o CROSS JOIN f""",
    "q340_conjunctive_search" ->
      """WITH occ AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         dfq AS (SELECT token, count(*)::BIGINT AS df
                 FROM (SELECT DISTINCT doc_id, token FROM occ)
                 GROUP BY 1),
         terms AS (SELECT token FROM dfq ORDER BY df DESC, token LIMIT 3),
         h AS (SELECT o.doc_id, o.token, count(*)::BIGINT AS hits
               FROM occ o JOIN terms t USING (token) GROUP BY 1, 2),
         agg AS (SELECT doc_id, count(*)::BIGINT AS n_terms,
                   sum(hits)::BIGINT AS total_hits
                 FROM h GROUP BY 1)
         SELECT doc_id, total_hits FROM agg WHERE n_terms = 3""",
    "q341_locf_resample" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
                  round(value * 100, 0)::BIGINT AS cents,
                  epoch_us(ts) // 3600000000 AS hour
           FROM events),
         h AS (SELECT user_id, hour, cents AS obs_cents,
                 row_number() OVER (PARTITION BY user_id, hour
                   ORDER BY us DESC, event_id DESC) AS rk
               FROM e),
         ho AS (SELECT user_id, hour, obs_cents FROM h WHERE rk = 1),
         sp AS (SELECT user_id, min(hour) AS mn, max(hour) AS mx
                FROM e GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS hour
                  FROM sp),
         j AS (SELECT g.user_id, g.hour, ho.obs_cents
               FROM grid g LEFT JOIN ho
                 ON ho.user_id = g.user_id AND ho.hour = g.hour),
         f AS (SELECT *, sum(CASE WHEN obs_cents IS NOT NULL
                   THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                   ORDER BY hour ROWS UNBOUNDED PRECEDING) AS fill_id
               FROM j)
         SELECT user_id, hour::BIGINT AS hour,
                (max(obs_cents) OVER (PARTITION BY user_id, fill_id))
                  ::BIGINT AS cents,
                (obs_cents IS NULL) AS filled
         FROM f""",
    "q342_last_touch" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(ts) AS p_us,
                  round(value * 100, 0)::BIGINT AS cents
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id AS c_user, event_id AS c_id,
                 epoch_us(ts) AS c_us,
                 (json_extract_string(props, '$.k')::BIGINT % 4) AS c_chan
               FROM events WHERE event_type = 'click'),
         j AS (SELECT p.event_id, p.p_us, c.c_us, c.c_chan,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY c.c_us DESC, c.c_id DESC) AS rk
               FROM p JOIN c ON c.c_user = p.user_id
                 AND c.c_us <= p.p_us),
         b AS (SELECT p.event_id, p.cents,
                 CASE WHEN j.c_us IS NULL
                        OR p.p_us - j.c_us > 604800000000 THEN 'none'
                      ELSE 'ch' || j.c_chan::VARCHAR END AS channel
               FROM p LEFT JOIN (SELECT * FROM j WHERE rk = 1) j
                 USING (event_id))
         SELECT channel, count(*)::BIGINT AS n_purchases,
                sum(cents)::BIGINT AS cents
         FROM b GROUP BY 1""",
    "q332_scd2_build" ->
      """WITH log AS (
           SELECT o_custkey AS custkey, epoch_us(o_orderdate) AS valid_from,
                  o_orderkey, o_orderpriority AS priority
           FROM orders),
         ch AS (SELECT *, lag(priority) OVER (PARTITION BY custkey
                  ORDER BY valid_from, o_orderkey) AS prev FROM log),
         c2 AS (SELECT * FROM ch
                WHERE prev IS NULL OR prev <> priority)
         SELECT custkey, priority, valid_from::BIGINT AS valid_from,
                (lead(valid_from) OVER (PARTITION BY custkey
                  ORDER BY valid_from, o_orderkey))::BIGINT AS valid_to,
                (lead(valid_from) OVER (PARTITION BY custkey
                  ORDER BY valid_from, o_orderkey)) IS NULL AS is_current
         FROM c2""",
    "q333_dq_expectations" ->
      """SELECT 'orders.o_custkey not_null' AS expectation,
                count(*)::BIGINT AS n_checked,
                sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_violations,
                sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
                  AS pass
         FROM orders
         UNION ALL
         SELECT 'orders.o_orderkey unique', count(*)::BIGINT,
                (count(*) - count(DISTINCT o_orderkey))::BIGINT,
                count(*) = count(DISTINCT o_orderkey)
         FROM orders
         UNION ALL
         SELECT 'orders.o_orderstatus accepted_values', count(*)::BIGINT,
                sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END)::BIGINT,
                sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) = 0
         FROM orders
         UNION ALL
         SELECT 'orders.o_custkey ref_integrity customer',
                (SELECT count(*) FROM orders)::BIGINT,
                (SELECT count(*) FROM orders o WHERE NOT EXISTS (
                  SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey))::BIGINT,
                (SELECT count(*) FROM orders o WHERE NOT EXISTS (
                  SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)) = 0
         UNION ALL
         SELECT 'lineitem.l_discount range', count(*)::BIGINT,
                sum(CASE WHEN l_discount < 0 OR l_discount > 1
                  THEN 1 ELSE 0 END)::BIGINT,
                sum(CASE WHEN l_discount < 0 OR l_discount > 1
                  THEN 1 ELSE 0 END) = 0
         FROM lineitem""",
    "q334_cdc_merge" ->
      """WITH snap AS (
           SELECT c_custkey AS custkey, c_mktsegment AS segment,
                  round(c_acctbal * 100, 0)::BIGINT AS bal_cents
           FROM customer),
         latest AS (
           SELECT custkey, cents AS new_bal FROM (
             SELECT o_custkey AS custkey,
                    round(o_totalprice * 100, 0)::BIGINT AS cents,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY epoch_us(o_orderdate) DESC,
                               o_orderkey DESC) AS rk
             FROM orders) WHERE rk = 1),
         changes AS (
           SELECT custkey,
                  CASE WHEN custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
                  new_bal
           FROM latest
           UNION ALL
           SELECT custkey + 1000000, 'I', new_bal
           FROM latest WHERE custkey % 7 = 2)
         SELECT coalesce(s.custkey, g.custkey) AS custkey,
                CASE WHEN g.op = 'I' THEN 'NEW' ELSE s.segment END
                  AS segment,
                CASE WHEN g.op IS NOT NULL THEN g.new_bal
                     ELSE s.bal_cents END AS bal_cents,
                CASE WHEN g.op = 'I' AND s.custkey IS NULL
                       THEN 'inserted'
                     WHEN g.op IS NOT NULL THEN 'updated'
                     ELSE 'kept' END AS src
         FROM snap s FULL OUTER JOIN changes g ON s.custkey = g.custkey
         WHERE coalesce(g.op, '') <> 'D'
           AND NOT (s.segment IS NULL AND g.op = 'U')""",
    "q335_table_diff" ->
      """WITH a AS (
           SELECT c_custkey AS custkey, c_mktsegment AS segment,
                  round(c_acctbal * 100, 0)::BIGINT AS bal_cents
           FROM customer),
         b AS (
           SELECT custkey,
                  CASE WHEN custkey % 13 = 0 THEN 'MIGRATED'
                       ELSE segment END AS segment,
                  CASE WHEN custkey % 11 = 0 THEN bal_cents + 500
                       ELSE bal_cents END AS bal_cents
           FROM a WHERE custkey % 17 <> 0
           UNION ALL
           SELECT custkey + 2000000, segment, bal_cents
           FROM a WHERE custkey % 19 = 0),
         j AS (SELECT a.segment AS seg_a, a.bal_cents AS bal_a,
                      b.segment AS seg_b, b.bal_cents AS bal_b
               FROM a FULL OUTER JOIN b ON a.custkey = b.custkey)
         SELECT sum(CASE WHEN seg_b IS NULL AND seg_a IS NOT NULL
                  THEN 1 ELSE 0 END)::BIGINT AS n_only_a,
                sum(CASE WHEN seg_a IS NULL AND seg_b IS NOT NULL
                  THEN 1 ELSE 0 END)::BIGINT AS n_only_b,
                sum(CASE WHEN seg_a IS NOT NULL AND seg_b IS NOT NULL
                  THEN 1 ELSE 0 END)::BIGINT AS n_common,
                sum(CASE WHEN seg_a IS NOT NULL AND seg_b IS NOT NULL
                  AND seg_a <> seg_b THEN 1 ELSE 0 END)::BIGINT
                  AS n_segment_changed,
                sum(CASE WHEN seg_a IS NOT NULL AND seg_b IS NOT NULL
                  AND bal_a <> bal_b THEN 1 ELSE 0 END)::BIGINT
                  AS n_balance_changed,
                sum(CASE WHEN seg_a IS NOT NULL AND seg_b IS NOT NULL
                  AND seg_a = seg_b AND bal_a = bal_b
                  THEN 1 ELSE 0 END)::BIGINT AS n_identical
         FROM j""",
    "q336_retention_matrix" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 604800000000 AS week
           FROM events),
         cohort AS (SELECT user_id, min(week) AS cohort_week
                    FROM uw GROUP BY 1),
         sz AS (SELECT cohort_week, count(*)::BIGINT AS cohort_size
                FROM cohort GROUP BY 1),
         cell AS (SELECT c.cohort_week,
                         (uw.week - c.cohort_week)::BIGINT AS offset_w,
                         count(*)::BIGINT AS n_active
                  FROM uw JOIN cohort c USING (user_id)
                  GROUP BY 1, 2)
         SELECT cell.cohort_week, cell.offset_w, cell.n_active,
                ((cell.n_active * 1000) // sz.cohort_size)::BIGINT
                  AS retention_pm
         FROM cell JOIN sz USING (cohort_week)""",
    "q337_gap_sweep" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         d AS (SELECT us - lag(us) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS delta
               FROM e),
         f AS (SELECT d.delta, g.gap_min
               FROM d CROSS JOIN (VALUES (5), (15), (30), (60))
                 AS g(gap_min)),
         s AS (SELECT gap_min::BIGINT AS gap_min,
                 sum(CASE WHEN delta IS NULL
                   OR delta >= gap_min::BIGINT * 60000000 THEN 1 ELSE 0 END)
                   ::BIGINT AS n_sessions,
                 count(*)::BIGINT AS n_events
               FROM f GROUP BY 1)
         SELECT gap_min, n_sessions, n_events,
                ((n_events * 1000) // n_sessions)::BIGINT
                  AS events_per_session_pm
         FROM s""",
    "q330_rate_audit" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         w AS (SELECT event_type,
                 count(*) OVER (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW)
                   ::BIGINT AS in_win
               FROM e)
         SELECT event_type, count(*)::BIGINT AS n_events,
                sum(CASE WHEN in_win > 5 THEN 1 ELSE 0 END)::BIGINT
                  AS n_over_rate,
                max(in_win)::BIGINT AS max_in_window
         FROM w GROUP BY 1""",
    "q328_k_anonymity" ->
      """WITH g AS (
           SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
           FROM customer GROUP BY 1, 2),
         e AS (SELECT g.n, k.k
               FROM g CROSS JOIN (VALUES (2), (5), (10), (20)) AS k(k))
         SELECT k::BIGINT AS k, count(*)::BIGINT AS n_groups,
                sum(CASE WHEN n < k THEN 1 ELSE 0 END)::BIGINT
                  AS n_violating_groups,
                sum(CASE WHEN n < k THEN n ELSE 0 END)::BIGINT
                  AS n_rows_at_risk
         FROM e GROUP BY 1""",
    "q298_other_bucket" ->
      """WITH bc AS (
           SELECT o_custkey,
                  sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS cents,
                  count(*)::BIGINT AS n_orders
           FROM orders GROUP BY 1),
         r AS (SELECT *, row_number() OVER (
                 ORDER BY cents DESC, o_custkey) AS rk FROM bc)
         SELECT CASE WHEN rk <= 5 THEN o_custkey::VARCHAR ELSE 'OTHER' END
                  AS cust_bucket,
                sum(cents)::BIGINT AS cents,
                sum(n_orders)::BIGINT AS n_orders,
                count(*)::BIGINT AS n_customers
         FROM r GROUP BY 1""",
    "q299_first_digit" ->
      """WITH c AS (
           SELECT substr((round(o_totalprice * 100, 0)::BIGINT)::VARCHAR, 1, 1)
                    AS digit
           FROM orders),
         g AS (SELECT digit, count(*)::BIGINT AS n FROM c GROUP BY 1),
         t AS (SELECT sum(n)::BIGINT AS n_total FROM g)
         SELECT g.digit, g.n, ((g.n * 1000) // t.n_total)::BIGINT AS share_pm
         FROM g, t""",
    "q291_window_funnel" ->
      """WITH v AS (SELECT event_id AS v_id, user_id, epoch_us(ts) AS v_us
                    FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, epoch_us(ts) AS c_us
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS p_us
               FROM events WHERE event_type = 'purchase'),
         fc AS (SELECT v.v_id, v.user_id, v.v_us, min(c.c_us) AS c_us
                FROM v LEFT JOIN c
                  ON c.user_id = v.user_id AND c.c_us >= v.v_us
                GROUP BY 1, 2, 3),
         fp AS (SELECT fc.v_id, fc.user_id, fc.v_us, fc.c_us,
                       min(p.p_us) AS p_us
                FROM fc LEFT JOIN p
                  ON p.user_id = fc.user_id AND fc.c_us IS NOT NULL
                     AND p.p_us >= fc.c_us
                GROUP BY 1, 2, 3, 4),
         d AS (SELECT user_id,
                 CASE WHEN c_us IS NOT NULL AND c_us <= v_us + 86400000000
                        AND p_us IS NOT NULL AND p_us <= c_us + 86400000000
                      THEN 3
                      WHEN c_us IS NOT NULL AND c_us <= v_us + 86400000000
                      THEN 2 ELSE 1 END AS depth
               FROM fp)
         SELECT user_id, max(depth)::BIGINT AS max_depth
         FROM d GROUP BY 1""",
    "q292_scd2_asof" ->
      """WITH b AS (
           SELECT user_id, event_id, epoch_us(ts) AS us, event_type AS attr
           FROM events),
         x AS (SELECT *, CASE WHEN lag(attr) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) IS NULL
                 OR lag(attr) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) <> attr THEN 1 ELSE 0 END AS chg
               FROM b),
         v AS (SELECT *, (sum(chg) OVER (PARTITION BY user_id
                 ORDER BY us, event_id ROWS UNBOUNDED PRECEDING))::BIGINT
                 AS version
               FROM x),
         h AS (SELECT user_id, version, min(us) AS vf_us, min(attr) AS attr
               FROM v GROUP BY 1, 2),
         h2 AS (SELECT *, lead(vf_us) OVER (PARTITION BY user_id
                  ORDER BY version) AS vt_us
                FROM h),
         m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
               FROM events)
         SELECT h2.user_id, h2.version, h2.attr
         FROM h2, m
         WHERE h2.vf_us <= m.mid AND (h2.vt_us IS NULL OR m.mid < h2.vt_us)""",
    "q293_budget_allocation" ->
      """WITH o AS (
           SELECT o_orderkey, o_orderpriority,
                  round(o_totalprice * 100, 0)::BIGINT AS cents
           FROM orders),
         b AS (SELECT sum(cents) // 10 AS budget FROM o),
         r AS (SELECT *, (sum(cents) OVER (
                 ORDER BY o_orderpriority, o_orderkey
                 ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
               FROM o)
         SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
                (count(*) FILTER (cum <= b.budget))::BIGINT AS n_funded,
                coalesce(sum(cents) FILTER (cum <= b.budget), 0)::BIGINT
                  AS funded_cents
         FROM r, b GROUP BY 1""",
    "q288_transition_matrix" ->
      """WITH x AS (
           SELECT user_id, event_type, ts, event_id,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS to_type
           FROM events),
         t AS (SELECT event_type AS from_type, to_type,
                      count(*)::BIGINT AS n
               FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT from_type, sum(n)::BIGINT AS n_from FROM t GROUP BY 1)
         SELECT t.from_type, t.to_type, t.n, ft.n_from,
                ((t.n * 1000) // ft.n_from)::BIGINT AS share_pm
         FROM t JOIN ft USING (from_type)""",
    "q289_time_to_event" ->
      """WITH fv AS (
           SELECT user_id, min(epoch_us(ts)) AS v_us
           FROM events WHERE event_type = 'view' GROUP BY 1),
         fp AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
           FROM events e JOIN fv ON fv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.v_us
           GROUP BY 1),
         b AS (
           SELECT CASE WHEN fp.p_us IS NULL THEN -1
                       ELSE (fp.p_us - fv.v_us) // 86400000000
                  END::BIGINT AS day_bucket
           FROM fv LEFT JOIN fp ON fp.user_id = fv.user_id)
         SELECT day_bucket, count(*)::BIGINT AS n_users
         FROM b GROUP BY 1""",
    "q287_orphan_quarantine" ->
      """WITH parents AS (
           SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 <> 0)
         SELECT 'quarantined:missing_parent' AS disposition,
                count(*)::BIGINT AS n_rows,
                count(DISTINCT l_orderkey)::BIGINT AS n_keys
         FROM lineitem l LEFT JOIN parents p ON p.k = l.l_orderkey
         WHERE p.k IS NULL
         UNION ALL
         SELECT 'passed', count(*)::BIGINT, count(DISTINCT l_orderkey)::BIGINT
         FROM lineitem l JOIN parents p ON p.k = l.l_orderkey""",
    "q283_audience_overlap" ->
      """WITH tu AS (
           SELECT DISTINCT event_type AS t, user_id FROM events),
         sz AS (SELECT t, count(*)::BIGINT AS n FROM tu GROUP BY 1),
         inter AS (
           SELECT a.t AS ta, b.t AS tb, count(*)::BIGINT AS n_inter
           FROM tu a JOIN tu b
             ON b.user_id = a.user_id AND a.t < b.t
           GROUP BY 1, 2)
         SELECT i.ta, i.tb, sa.n AS n_a, sb.n AS n_b, i.n_inter,
                ((i.n_inter * 1000) // (sa.n + sb.n - i.n_inter))::BIGINT
                  AS jaccard_pm
         FROM inter i JOIN sz sa ON sa.t = i.ta
                      JOIN sz sb ON sb.t = i.tb""",
    "q284_repeat_interval" ->
      """WITH p AS (
           SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'purchase'),
         g AS (SELECT user_id,
                 us - lag(us) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS d
               FROM p),
         gg AS (SELECT user_id, (d // 1000000)::BIGINT AS gap_s
                FROM g WHERE d IS NOT NULL),
         r AS (SELECT gap_s,
                 row_number() OVER (ORDER BY gap_s, user_id) AS rn,
                 (count(*) OVER ())::BIGINT AS n
               FROM gg)
         SELECT n AS n_gaps, gap_s AS median_gap_s
         FROM r WHERE rn = (n + 1) // 2""",
    "q280_asof_native" ->
      """WITH p AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id AS c_user, event_id AS c_id, ts AS c_ts
           FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id, c.c_id,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY c.c_ts DESC, c.c_id DESC) AS rk
           FROM p JOIN c ON c.c_user = p.user_id AND c.c_ts <= p.ts)
         SELECT p.event_id, p.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                j.c_id
         FROM p LEFT JOIN (SELECT event_id, c_id FROM j WHERE rk = 1) j
           ON j.event_id = p.event_id""",
    "q312_cooccur_topk" ->
      """WITH bask AS (
           SELECT DISTINCT l_orderkey AS bk, l_partkey AS part
           FROM lineitem),
         p AS (SELECT a.part AS pa, b.part AS pb, count(*)::BIGINT AS n_co
               FROM bask a JOIN bask b
                 ON b.bk = a.bk AND a.part < b.part
               GROUP BY 1, 2),
         sym AS (SELECT pa, pb, n_co FROM p
                 UNION ALL SELECT pb, pa, n_co FROM p),
         r AS (SELECT pa AS item, pb AS rec, n_co,
                 row_number() OVER (PARTITION BY pa
                   ORDER BY n_co DESC, pb)::BIGINT AS rk
               FROM sym)
         SELECT item, rec, n_co, rk FROM r WHERE rk <= 3""",
    "q315_asof_nearest" ->
      """WITH p AS (
           SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id AS cu, event_id AS c_id, ts AS c_ts,
                  epoch_us(ts) AS c_us
           FROM events WHERE event_type = 'click'),
         b AS (
           SELECT event_id, c_id, c_us FROM (
             SELECT p.event_id, c.c_id, c.c_us,
                    row_number() OVER (PARTITION BY p.event_id
                      ORDER BY c.c_ts DESC, c.c_id DESC) AS rk
             FROM p JOIN c ON c.cu = p.user_id AND c.c_ts <= p.ts)
           WHERE rk = 1),
         f AS (
           SELECT event_id, c_id, c_us FROM (
             SELECT p.event_id, c.c_id, c.c_us,
                    row_number() OVER (PARTITION BY p.event_id
                      ORDER BY c.c_ts ASC, c.c_id ASC) AS rk
             FROM p JOIN c ON c.cu = p.user_id AND c.c_ts >= p.ts)
           WHERE rk = 1)
         SELECT p.event_id, p.user_id,
                CASE WHEN b.c_id IS NOT NULL AND (f.c_id IS NULL OR
                       p.us - b.c_us <= f.c_us - p.us)
                     THEN b.c_id ELSE f.c_id END AS near_id,
                (CASE WHEN b.c_id IS NOT NULL AND (f.c_id IS NULL OR
                       p.us - b.c_us <= f.c_us - p.us)
                     THEN b.c_us - p.us ELSE f.c_us - p.us END)::BIGINT
                  AS delta_us
         FROM p LEFT JOIN b ON b.event_id = p.event_id
                LEFT JOIN f ON f.event_id = p.event_id""",
    "q319_fd_audit" ->
      """WITH a AS (SELECT DISTINCT l_orderkey::VARCHAR || ':' ||
                      l_linenumber::VARCHAR AS lhs,
                      l_partkey::VARCHAR AS rhs FROM lineitem),
         ga AS (SELECT lhs, count(*) AS n FROM a GROUP BY 1),
         b AS (SELECT DISTINCT l_orderkey::VARCHAR AS lhs, l_returnflag AS rhs
               FROM lineitem),
         gb AS (SELECT lhs, count(*) AS n FROM b GROUP BY 1),
         c AS (SELECT DISTINCT o_orderkey::VARCHAR AS lhs,
                      o_orderpriority AS rhs FROM orders),
         gc AS (SELECT lhs, count(*) AS n FROM c GROUP BY 1),
         e AS (SELECT DISTINCT o_custkey::VARCHAR AS lhs,
                      o_orderpriority AS rhs FROM orders),
         ge AS (SELECT lhs, count(*) AS n FROM e GROUP BY 1)
         SELECT 'l_orderkey,l_linenumber->l_partkey' AS fd,
                count(*)::BIGINT AS n_lhs,
                (count(*) FILTER (n > 1))::BIGINT AS n_violating,
                count(*) FILTER (n > 1) = 0 AS holds FROM ga
         UNION ALL
         SELECT 'l_orderkey->l_returnflag', count(*)::BIGINT,
                (count(*) FILTER (n > 1))::BIGINT,
                count(*) FILTER (n > 1) = 0 FROM gb
         UNION ALL
         SELECT 'o_orderkey->o_orderpriority', count(*)::BIGINT,
                (count(*) FILTER (n > 1))::BIGINT,
                count(*) FILTER (n > 1) = 0 FROM gc
         UNION ALL
         SELECT 'o_custkey->o_orderpriority', count(*)::BIGINT,
                (count(*) FILTER (n > 1))::BIGINT,
                count(*) FILTER (n > 1) = 0 FROM ge""",
    "q320_session_paths" ->
      """WITH x AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT user_id, event_type, tsu, event_id,
                  CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM x),
         s0 AS (
           SELECT user_id, event_type, tsu, event_id,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT
                    AS sid
           FROM f),
         sq AS (
           SELECT user_id, sid,
                  array_to_string(
                    list(event_type ORDER BY tsu, event_id)[1:3], '>') AS path
           FROM s0 GROUP BY 1, 2)
         SELECT path, count(*)::BIGINT AS n_sessions
         FROM sq GROUP BY 1
         ORDER BY n_sessions DESC, path LIMIT 10""",
    "q276_grain_audit" ->
      """WITH a AS (
           SELECT l_orderkey::VARCHAR AS k FROM lineitem),
         ga AS (SELECT k, count(*) AS n FROM a GROUP BY 1),
         b AS (
           SELECT l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR AS k
           FROM lineitem),
         gb AS (SELECT k, count(*) AS n FROM b GROUP BY 1)
         SELECT 'l_orderkey' AS grain, sum(n)::BIGINT AS n_rows,
                count(*)::BIGINT AS n_keys,
                (count(*) FILTER (n > 1))::BIGINT AS n_dup_keys
         FROM ga
         UNION ALL
         SELECT 'l_orderkey+l_linenumber', sum(n)::BIGINT,
                count(*)::BIGINT, (count(*) FILTER (n > 1))::BIGINT
         FROM gb""",
    "q277_file_plan" ->
      """WITH s AS (
           SELECT source, count(*)::BIGINT AS n_docs,
                  sum(n_chars)::BIGINT AS total_chars
           FROM documents GROUP BY 1)
         SELECT source, n_docs, total_chars,
                ((total_chars + 65535) // 65536)::BIGINT AS planned_files,
                (n_docs // greatest(1, (total_chars + 65535) // 65536))::BIGINT
                  AS docs_per_file
         FROM s""",
    "q278_period_over_period" ->
      """WITH m AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS rev_cents
           FROM orders GROUP BY 1),
         l AS (SELECT month, rev_cents,
                 lag(rev_cents, 1) OVER (ORDER BY month) AS prev_m,
                 lag(rev_cents, 12) OVER (ORDER BY month) AS prev_y
               FROM m)
         SELECT month, rev_cents,
                CASE WHEN prev_m IS NULL OR prev_m = 0 THEN NULL
                     ELSE ((rev_cents - prev_m) * 1000) // prev_m
                END::BIGINT AS mom_pm,
                CASE WHEN prev_y IS NULL OR prev_y = 0 THEN NULL
                     ELSE ((rev_cents - prev_y) * 1000) // prev_y
                END::BIGINT AS yoy_pm
         FROM l""",
    "q279_bounce_rate" ->
      """WITH x AS (
           SELECT user_id, event_id, ts, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                              THEN 1 ELSE 0 END AS new_s
               FROM x),
         s0 AS (SELECT user_id, ts,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
                FROM f),
         sess AS (SELECT user_id, sid, count(*) AS n_ev, min(ts) AS start_ts
                  FROM s0 GROUP BY 1, 2),
         daily AS (SELECT strftime(start_ts, '%Y-%m-%d') AS day,
                          count(*)::BIGINT AS n_sessions,
                          (count(*) FILTER (n_ev = 1))::BIGINT AS n_bounce
                   FROM sess GROUP BY 1)
         SELECT day, n_sessions, n_bounce,
                ((n_bounce * 1000) // n_sessions)::BIGINT AS bounce_pm
         FROM daily""",
    "q273_table_fingerprint" ->
      """SELECT 'region' AS table_name, count(*)::BIGINT AS n_rows,
                sum(('0x' || substr(md5(r_regionkey::VARCHAR), 1, 6))::BIGINT)
                  ::BIGINT AS checksum
         FROM region
         UNION ALL
         SELECT 'nation', count(*)::BIGINT,
                sum(('0x' || substr(md5(n_nationkey::VARCHAR), 1, 6))::BIGINT)::BIGINT
         FROM nation
         UNION ALL
         SELECT 'customer', count(*)::BIGINT,
                sum(('0x' || substr(md5(c_custkey::VARCHAR || ':' ||
                  c_nationkey::VARCHAR), 1, 6))::BIGINT)::BIGINT
         FROM customer
         UNION ALL
         SELECT 'orders', count(*)::BIGINT,
                sum(('0x' || substr(md5(o_orderkey::VARCHAR || ':' ||
                  (round(o_totalprice * 100, 0)::BIGINT)::VARCHAR), 1, 6))::BIGINT)::BIGINT
         FROM orders
         UNION ALL
         SELECT 'lineitem', count(*)::BIGINT,
                sum(('0x' || substr(md5(l_orderkey::VARCHAR || ':' ||
                  l_linenumber::VARCHAR), 1, 6))::BIGINT)::BIGINT
         FROM lineitem
         UNION ALL
         SELECT 'documents', count(*)::BIGINT,
                sum(('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                  n_chars::VARCHAR), 1, 6))::BIGINT)::BIGINT
         FROM documents""",
    "q272_ohlc_bars" ->
      """WITH b AS (
           SELECT event_type, event_id, ts,
                  round(value * 100, 0)::BIGINT AS cents,
                  date_trunc('hour', ts) AS bar
           FROM events),
         r AS (SELECT *,
                 row_number() OVER (PARTITION BY event_type, bar
                   ORDER BY ts, event_id) AS ra,
                 row_number() OVER (PARTITION BY event_type, bar
                   ORDER BY ts DESC, event_id DESC) AS rd
               FROM b)
         SELECT event_type, strftime(bar, '%Y-%m-%d %H:00') AS bar_hr,
                min(CASE WHEN ra = 1 THEN cents END)::BIGINT AS open,
                max(cents)::BIGINT AS high, min(cents)::BIGINT AS low,
                min(CASE WHEN rd = 1 THEN cents END)::BIGINT AS close,
                count(*)::BIGINT AS n_ticks
         FROM r GROUP BY 1, 2""",
    "q261_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS cnt
           FROM events GROUP BY 1, 2),
         sc AS (
           SELECT event_type, day,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY day)::BIGINT AS i,
                  (sum(cnt) OVER (PARTITION BY event_type
                    ORDER BY day ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
                  (count(*) OVER (PARTITION BY event_type))::BIGINT AS n,
                  (sum(cnt) OVER (PARTITION BY event_type))::BIGINT AS total
           FROM daily),
         dv AS (SELECT *, abs(cum * n - i * total)::BIGINT AS dev FROM sc),
         rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY dev DESC, day) AS rk FROM dv)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
                dev AS n_scaled_dev, n, total
         FROM rk WHERE rk = 1""",
    "q249_merge_upsert" ->
      """WITH ev AS (
           SELECT user_id, ts, round(value * 100, 0)::BIGINT AS cents
           FROM events),
         t AS (SELECT user_id, count(*) AS n, sum(cents) AS c FROM ev
               WHERE ts < TIMESTAMP '2024-01-20 00:00:00' GROUP BY 1),
         d AS (SELECT user_id, count(*) AS n, sum(cents) AS c FROM ev
               WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' GROUP BY 1)
         SELECT user_id,
                (coalesce(t.n, 0) + coalesce(d.n, 0))::BIGINT AS n,
                (coalesce(t.c, 0) + coalesce(d.c, 0))::BIGINT AS cents,
                CASE WHEN t.n IS NULL THEN 'insert'
                     WHEN d.n IS NULL THEN 'keep'
                     ELSE 'update' END AS action
         FROM t FULL JOIN d USING (user_id)""",
    "q250_cdc_apply" ->
      """WITH o AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                  round(value * 100, 0)::BIGINT AS cents,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS n_ops
           FROM events)
         SELECT user_id, cents,
                strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
                n_ops::BIGINT AS n_ops
         FROM o WHERE rn = 1 AND op <> 'D'""",
    "q243_basket_lift" ->
      """WITH x AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT user_id, event_type, tsu, event_id,
                  CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM x),
         s0 AS (
           SELECT user_id, event_type,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
           FROM f),
         st AS (SELECT DISTINCT user_id, sid, event_type FROM s0),
         singles AS (
           SELECT event_type, count(*)::BIGINT AS n_single
           FROM st GROUP BY 1),
         tot AS (
           SELECT count(*)::BIGINT AS n_sessions
           FROM (SELECT DISTINCT user_id, sid FROM st)),
         prs AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
                  count(*)::BIGINT AS n_ab
           FROM st a JOIN st b
             ON a.user_id = b.user_id AND a.sid = b.sid
            AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, p.n_ab,
                p.n_ab * 1.0 / t.n_sessions AS support,
                p.n_ab * 1.0 / sa.n_single AS confidence,
                (p.n_ab * t.n_sessions) * 1.0
                  / (sa.n_single * sb.n_single) AS lift
         FROM prs p
         JOIN singles sa ON sa.event_type = p.type_a
         JOIN singles sb ON sb.event_type = p.type_b, tot t""",
    "q244_weekly_cohorts" ->
      """WITH uw AS (
           SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
           FROM events),
         fst AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
         SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
                (date_diff('day', cw, wk) // 7)::BIGINT AS "offset",
                count(DISTINCT u.user_id)::BIGINT AS n_users
         FROM uw u JOIN fst USING (user_id)
         GROUP BY 1, 2""",
    "q241_rfm_segments" ->
      """WITH m AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
         per AS (
           SELECT o_custkey,
                  max(CAST(o_orderdate AS DATE)) AS last_d,
                  count(*)::BIGINT AS f,
                  sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS cents
           FROM orders GROUP BY 1),
         b AS (
           SELECT date_diff('day', last_d, mx) AS r_days, f, cents
           FROM per, m)
         SELECT (CASE WHEN r_days <= 30 THEN 1 WHEN r_days <= 90 THEN 2
                      ELSE 3 END)::BIGINT AS r_b,
                (CASE WHEN f >= 15 THEN 1 WHEN f >= 8 THEN 2
                      ELSE 3 END)::BIGINT AS f_b,
                (CASE WHEN cents >= 200000000 THEN 1
                      WHEN cents >= 100000000 THEN 2
                      ELSE 3 END)::BIGINT AS m_b,
                count(*)::BIGINT AS n_customers,
                sum(cents)::BIGINT AS cents
         FROM b GROUP BY 1, 2, 3""",
    "q242_revenue_waterfall" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
                sum(l_extendedprice::DECIMAL(12,2))::DECIMAL(38,2)::VARCHAR
                  AS gross,
                sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(4,2))
                  ::DECIMAL(38,4)::VARCHAR AS discount_amt,
                sum(l_extendedprice::DECIMAL(12,2)
                    * (1 - l_discount::DECIMAL(4,2)))::DECIMAL(38,4)::VARCHAR
                  AS net
         FROM lineitem GROUP BY 1""",
    "q237_k_anonymity" ->
      """SELECT user_id // 10 AS user_bucket,
                strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                count(*)::BIGINT AS n,
                count(*) < 5 AS suppressed
         FROM events GROUP BY 1, 2""",
    "q234_freshness_audit" ->
      """WITH p AS (
           SELECT event_type, max(epoch_us(ts)) AS last_us,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1),
         g AS (SELECT max(last_us) AS global_us FROM p)
         SELECT event_type, n,
                (global_us - last_us)::BIGINT AS lag_us,
                global_us - last_us > 21600000000 AS stale
         FROM p, g""",
    "q224_variant_explode" ->
      """SELECT doc_id, 0::BIGINT AS pos, 'lang' AS k, lang AS v
         FROM documents
         UNION ALL
         SELECT doc_id, 1::BIGINT, 'src', source FROM documents""",
    "q221_first_touch" ->
      """WITH p AS (SELECT event_id, user_id, ts, epoch_us(ts) AS pts
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS c_id, epoch_us(ts) AS cts
               FROM events WHERE event_type = 'click'),
         m AS (SELECT p.event_id AS eid, min(c.cts) AS fc_ts
               FROM p JOIN c ON c.user_id = p.user_id
                 AND c.cts BETWEEN p.pts - 86400000000 AND p.pts
               GROUP BY 1),
         sel AS (SELECT m.eid, min(c.c_id) AS click_id
                 FROM m JOIN p ON p.event_id = m.eid
                 JOIN c ON c.user_id = p.user_id AND c.cts = m.fc_ts
                 GROUP BY 1)
         SELECT p.event_id, p.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                s.click_id,
                s.click_id IS NOT NULL AS attributed
         FROM p LEFT JOIN sel s ON s.eid = p.event_id""",
    "q222_share_ratios" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
                n * 1.0 / sum(n) OVER (PARTITION BY day) AS share_of_day,
                n * 1.0 / sum(n) OVER (PARTITION BY event_type)
                  AS share_of_type
         FROM daily""",
    "q212_map_transform" ->
      """SELECT user_id, upper(event_type) AS event_type,
                (count(*) * 2)::BIGINT AS n2
         FROM events GROUP BY user_id, event_type""",
    "q302_ivm_audit" ->
      """WITH g AS (
           SELECT event_type, CAST(ts AS DATE) AS day
           FROM events GROUP BY 1, 2)
         SELECT (SELECT count(*) FROM g)::BIGINT AS n_groups_incr,
                (SELECT count(*) FROM g)::BIGINT AS n_groups_batch,
                0::BIGINT AS n_mismatch""",
    "q202_incremental_agg" ->
      """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                count(*)::BIGINT AS n,
                sum(round(value * 100, 0)::BIGINT)::BIGINT AS cents
         FROM events GROUP BY 1, 2""",
    "q203_regression_exact" ->
      """WITH b AS (
           SELECT event_type,
                  ((epoch_us(ts) - epoch_us(date_trunc('day', ts))) // 1000000)
                    ::DECIMAL(18,0) AS x,
                  round(value * 100, 0)::DECIMAL(18,0) AS y
           FROM events),
         m AS (
           SELECT event_type,
                  count(*)::DECIMAL(38,0) AS n,
                  sum(x)::DECIMAL(38,0) AS sx,
                  sum(y)::DECIMAL(38,0) AS sy,
                  sum(x * x)::DECIMAL(38,0) AS sxx,
                  sum(x * y)::DECIMAL(38,0) AS sxy
           FROM b GROUP BY 1)
         SELECT event_type,
                (n * sxy - sx * sy)::DECIMAL(38,0)::VARCHAR AS slope_num,
                (n * sxx - sx * sx)::DECIMAL(38,0)::VARCHAR AS slope_den,
                (sy * sxx - sx * sxy)::DECIMAL(38,0)::VARCHAR AS icept_num
         FROM m""",
    "q204_asof_forward" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
               FROM events WHERE event_type = 'purchase'),
         m AS (SELECT c.click_id, c.user_id, c.cts, min(p.pts) AS pts
               FROM c JOIN p ON p.user_id = c.user_id AND p.pts >= c.cts
               GROUP BY 1, 2, 3),
         sel AS (SELECT m.click_id, m.cts, m.pts,
                        min(p.purchase_id) AS purchase_id
                 FROM m JOIN p ON p.user_id = m.user_id AND p.pts = m.pts
                 GROUP BY 1, 2, 3)
         SELECT click_id, purchase_id, (pts - cts)::BIGINT AS latency_us
         FROM sel WHERE pts <= cts + 86400000000""",
    "q193_ewma" ->
      """WITH b AS (
           SELECT event_id, user_id, ts,
                  round(value * 100, 0)::BIGINT AS cents
           FROM events),
         l AS (
           SELECT event_id, user_id, cents,
                  lag(cents, 1) OVER w AS l1, lag(cents, 2) OVER w AS l2,
                  lag(cents, 3) OVER w AS l3, lag(cents, 4) OVER w AS l4,
                  lag(cents, 5) OVER w AS l5, lag(cents, 6) OVER w AS l6,
                  lag(cents, 7) OVER w AS l7
           FROM b
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_id, user_id,
                (coalesce(cents,0)*128 + coalesce(l1,0)*64 + coalesce(l2,0)*32
                 + coalesce(l3,0)*16 + coalesce(l4,0)*8 + coalesce(l5,0)*4
                 + coalesce(l6,0)*2 + coalesce(l7,0))::BIGINT AS ewma_num,
                (128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
                     + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
                     + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
                     + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
                     + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
                     + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
                     + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END)::BIGINT
                  AS ewma_den
         FROM l""",
    "q194_volume_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type,
                  count(*)::DECIMAL(38,0) AS nd,
                  sum(n::DECIMAL(38,0))::DECIMAL(38,0) AS s,
                  sum(n::DECIMAL(38,0) * n::DECIMAL(38,0))::DECIMAL(38,0) AS q
           FROM daily GROUP BY 1)
         SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n
         FROM daily d JOIN stats t USING (event_type)
         WHERE d.n::DECIMAL(38,0) * t.nd > t.s
           AND (d.n::DECIMAL(38,0) * t.nd - t.s) * (d.n::DECIMAL(38,0) * t.nd - t.s)
               > 4 * (t.nd * t.q - t.s * t.s)""",
    "q131_bfs_hops" ->
      s"""WITH t AS (
           SELECT string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         p AS (
           SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
                          FOR i IN range(1, len(toks))], recursive := true)
           FROM t),
         edges AS (SELECT DISTINCT w1, w2 FROM p),
         cnt AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         src AS (
           SELECT tok FROM (SELECT tok, count(*) AS n FROM cnt GROUP BY 1)
           QUALIFY row_number() OVER (ORDER BY n DESC, tok) = 1),
         d0 AS (SELECT tok, 0::BIGINT AS hops FROM src),
         $bfsIters
         SELECT tok, hops FROM d5""",
    "q132_attribution" ->
      """WITH p AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         c AS (
           -- collapse same-(user, ts) clicks to max(event_id) BEFORE the
           -- ASOF join: DuckDB's ASOF has no tie-break among equal
           -- timestamps, while AsOfJoin deterministically keeps the max
           -- struct — pre-collapsing makes both total-ordered
           SELECT user_id AS c_user, max(event_id) AS c_id, ts AS c_ts
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
         j AS (
           SELECT p.event_id, p.user_id, p.ts, c.c_id, c.c_ts
           FROM p ASOF LEFT JOIN c
             ON p.user_id = c.c_user AND p.ts >= c.c_ts)
         SELECT event_id, user_id,
                strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                CASE WHEN c_id IS NOT NULL
                       AND epoch_us(ts) - epoch_us(c_ts) <= 86400000000
                     THEN c_id END AS click_id,
                (c_id IS NOT NULL
                   AND epoch_us(ts) - epoch_us(c_ts) <= 86400000000)
                  AS attributed
         FROM j""",
    "q133_basket_pairs" ->
      """WITH x AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
                  lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT user_id, event_type, tsu, event_id,
                  CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM x),
         s0 AS (
           SELECT user_id, event_type,
                  sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
           FROM f),
         st AS (SELECT DISTINCT user_id, sid, event_type FROM s0)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                count(*) AS n_sessions
         FROM st a JOIN st b
           ON a.user_id = b.user_id AND a.sid = b.sid
          AND a.event_type < b.event_type
         GROUP BY 1, 2""",
    "q134_c4_filters" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) >= 30 AS len_ok,
                (length(replace(text, ' ', ''))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE) >= 3.0
                AND (length(replace(text, ' ', ''))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE) <= 5.0 AS wordlen_ok,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','of','and','to'))) >= 1 AS stopword_ok,
                lang = 'en' AS lang_ok,
                (len(string_split(text, ' ')) >= 30)
                AND (length(replace(text, ' ', ''))::DOUBLE
                      / len(string_split(text, ' '))::DOUBLE) >= 3.0
                AND (length(replace(text, ' ', ''))::DOUBLE
                      / len(string_split(text, ' '))::DOUBLE) <= 5.0
                AND (len(list_filter(string_split(text, ' '),
                        t -> t IN ('the','a','of','and','to'))) >= 1)
                AND lang = 'en' AS keep
         FROM documents""",
    "q135_exists_decorrelated" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                o_totalprice
         FROM orders o
         WHERE EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)""",
    "q179_sequence_pattern" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, event_id, event_type,
                  sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM x),
         g AS (
           SELECT user_id, sid::BIGINT AS sid,
                  string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
                  count(*) AS n_events
           FROM s GROUP BY 1, 2)
         SELECT user_id, sid, seq, n_events FROM g
         WHERE regexp_matches(seq, 'click.*purchase')""",
    "q172_max_gap" ->
      """WITH g AS (
           SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events)
         SELECT user_id, count(*) AS n_events,
                coalesce(max(gap), 0)::BIGINT AS max_gap_us
         FROM g GROUP BY 1""",
    "q173_exact_moments" ->
      """WITH b AS (
           SELECT event_type, value::DECIMAL(12,2) AS x,
                  ((epoch_us(ts) - epoch_us(date_trunc('day', ts)))
                   // 1000000)::DECIMAL(10,0) AS y
           FROM events)
         SELECT event_type, count(*) AS n,
                sum(x)::DECIMAL(38,2)::VARCHAR AS sum_x,
                sum(x * x)::DECIMAL(38,4)::VARCHAR AS sum_x2,
                sum(x * y)::DECIMAL(38,2)::VARCHAR AS sum_xy
         FROM b GROUP BY 1""",
    "q142_decimal_agg" ->
      """SELECT l_returnflag,
                sum(l_extendedprice::DECIMAL(12,2))::DECIMAL(38,2)::VARCHAR
                  AS sum_price,
                sum(l_extendedprice::DECIMAL(12,2)
                    * (1 - l_discount::DECIMAL(4,2)))::DECIMAL(38,4)::VARCHAR
                  AS sum_rev,
                count(*) AS n
         FROM lineitem GROUP BY 1""",
    "q155_observe" ->
      """SELECT count(*) AS n_rows,
                sum(CASE WHEN value > 400 THEN 1 ELSE 0 END)::BIGINT AS n_high,
                min(event_id) AS min_id, max(event_id) AS max_id
         FROM events""",
    "q152_expectations" ->
      """WITH a AS (
           SELECT
             sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS o1,
             (count(*) - count(DISTINCT event_id))::BIGINT AS o2,
             sum(CASE WHEN event_type NOT IN
                   ('click','view','purchase','signup','error')
                 THEN 1 ELSE 0 END)::BIGINT AS o3,
             sum(CASE WHEN value < 0 OR value IS NULL THEN 1 ELSE 0 END)::BIGINT AS o4,
             sum(CASE WHEN user_id < 0 THEN 1 ELSE 0 END)::BIGINT AS o5
           FROM events)
         SELECT rule, violations, violations = 0 AS pass FROM (
           SELECT 'event_id_not_null' AS rule, o1 AS violations FROM a
           UNION ALL SELECT 'event_id_unique', o2 FROM a
           UNION ALL SELECT 'event_type_in_domain', o3 FROM a
           UNION ALL SELECT 'value_non_negative', o4 FROM a
           UNION ALL SELECT 'user_id_non_negative', o5 FROM a)""",
    "q153_spike_detection" ->
      """WITH daily AS (
           SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
           FROM events GROUP BY 1)
         SELECT day, n,
                coalesce(lag(n) OVER (ORDER BY day), 0)::BIGINT AS prev,
                (lag(n) OVER (ORDER BY day) IS NOT NULL
                   AND n * 10 > lag(n) OVER (ORDER BY day) * 13) AS spike
         FROM daily""",
    "q150_dpp" ->
      """WITH daily AS (
           SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
           FROM events GROUP BY 1),
         top5 AS (
           SELECT day FROM daily
           QUALIFY row_number() OVER (ORDER BY n DESC, day) <= 5)
         SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
                round(sum(value), 2) AS total_value
         FROM events
         WHERE strftime(ts, '%Y-%m-%d') IN (SELECT day FROM top5)
         GROUP BY 1""",
    "q147_corrupt_records" ->
      """SELECT sum(CASE WHEN doc_id % 10 <> 7 THEN 1 ELSE 0 END)::BIGINT AS n_good,
                sum(CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END)::BIGINT AS n_bad,
                sum(CASE WHEN doc_id % 10 <> 7
                         THEN len(string_split(text, ' ')) ELSE 0 END)::BIGINT
                  AS good_tokens
         FROM documents""",
    "q148_variant_json" ->
      """SELECT json_extract(props, '$.k')::BIGINT AS k, count(*) AS n
         FROM events GROUP BY 1""",
    "q149_running_distinct" ->
      """WITH x AS (
           SELECT event_id, user_id,
                  CASE WHEN row_number() OVER (
                         PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) = 1
                       THEN 1 ELSE 0 END AS first_flag,
                  ts
           FROM events)
         SELECT event_id, user_id,
                sum(first_flag) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)::BIGINT
                  AS types_seen
         FROM x""",
    "q138_map_ops" ->
      """SELECT user_id, event_type, count(*) AS n
         FROM events GROUP BY 1, 2 HAVING count(*) >= 3""",
    "q139_unpivot" ->
      """WITH dts AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d FROM events),
         ty AS (SELECT unnest(['click','error','purchase','signup','view'])
                  AS event_type),
         c AS (SELECT strftime(ts, '%Y-%m-%d') AS d, event_type, count(*) AS n
               FROM events GROUP BY 1, 2)
         SELECT dts.d, ty.event_type, coalesce(c.n, 0)::BIGINT AS n
         FROM dts CROSS JOIN ty
         LEFT JOIN c ON c.d = dts.d AND c.event_type = ty.event_type""",
    "q140_event_runs" ->
      """WITH x AS (
           SELECT user_id, event_type, event_id,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS rnt
           FROM events)
         SELECT user_id, event_type, count(*) AS run_len,
                min(event_id) AS first_event
         FROM x GROUP BY user_id, event_type, rn - rnt""",
    "q136_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, ts::DATE AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT user_id,
                  unnest(generate_series(min(day), max(day),
                         INTERVAL 1 DAY))::DATE AS day
           FROM daily GROUP BY user_id)
         SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
                coalesce(d.n, 0)::BIGINT AS n
         FROM spine s LEFT JOIN daily d
           ON s.user_id = d.user_id AND s.day = d.day""",
    "q137_snapshot_diff" ->
      """WITH a AS (
           SELECT o_custkey, count(*) AS a_cnt FROM orders
           WHERE o_orderdate < TIMESTAMP '2001-06-01' GROUP BY 1),
         b AS (SELECT o_custkey, count(*) AS b_cnt FROM orders GROUP BY 1)
         SELECT o_custkey,
                coalesce(a_cnt, 0)::BIGINT AS a_cnt,
                coalesce(b_cnt, 0)::BIGINT AS b_cnt,
                CASE WHEN coalesce(a_cnt, 0) = 0 THEN 'added'
                     WHEN coalesce(b_cnt, 0) = 0 THEN 'removed'
                     WHEN coalesce(a_cnt, 0) = coalesce(b_cnt, 0) THEN 'same'
                     ELSE 'changed' END AS status
         FROM a FULL OUTER JOIN b USING (o_custkey)""",
    "q389_chi2_independence" ->
      """WITH cell AS (SELECT source, lang, count(*)::BIGINT AS o
                       FROM documents GROUP BY 1, 2),
         rm AS (SELECT source, sum(o)::BIGINT AS r FROM cell GROUP BY 1),
         cm AS (SELECT lang, sum(o)::BIGINT AS c FROM cell GROUP BY 1),
         n AS (SELECT sum(o)::BIGINT AS n FROM cell),
         grid AS (
           SELECT rm.source, cm.lang, coalesce(cell.o, 0) AS o,
                  ((coalesce(cell.o, 0)::HUGEINT * n.n - rm.r::HUGEINT * cm.c)
                   * (coalesce(cell.o, 0)::HUGEINT * n.n
                      - rm.r::HUGEINT * cm.c) * 1000000)
                    // (n.n::HUGEINT * rm.r * cm.c) AS contrib_micro
           FROM rm CROSS JOIN cm
                LEFT JOIN cell ON cell.source = rm.source
                              AND cell.lang = cm.lang, n),
         tot AS (SELECT sum(contrib_micro)::BIGINT AS chi2_micro FROM grid),
         dof AS (SELECT ((count(DISTINCT source) - 1)
                         * (count(DISTINCT lang) - 1))::BIGINT AS dof
                 FROM cell)
         SELECT grid.source, grid.lang, grid.o AS o_count,
                grid.contrib_micro::BIGINT AS contrib_micro,
                tot.chi2_micro, dof.dof
         FROM grid CROSS JOIN tot CROSS JOIN dof""",
    "q390_mcnemar" ->
      """WITH p AS (SELECT user_id,
                max(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
                    THEN 1 ELSE 0 END) AS bef,
                max(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                    THEN 1 ELSE 0 END) AS aft
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
         cells AS (SELECT count(*)::BIGINT AS n_users,
                sum(CASE WHEN bef = 1 AND aft = 1 THEN 1 ELSE 0 END)::BIGINT
                  AS both_cnt,
                sum(CASE WHEN bef = 1 AND aft = 0 THEN 1 ELSE 0 END)::BIGINT
                  AS before_only,
                sum(CASE WHEN bef = 0 AND aft = 1 THEN 1 ELSE 0 END)::BIGINT
                  AS after_only
             FROM p)
         SELECT n_users, both_cnt, before_only, after_only,
                (CASE WHEN before_only + after_only = 0 THEN 0
                 ELSE ((before_only - after_only)
                       * (before_only - after_only) * 1000)
                      // (before_only + after_only) END)::BIGINT
                  AS mcnemar_permille
         FROM cells""",
    "q391_apriori_triples" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, p_brand AS br
                   FROM lineitem JOIN part ON p_partkey = l_partkey),
         n AS (SELECT count(DISTINCT o)::BIGINT AS n_orders FROM b),
         tri AS (SELECT a.br AS b1, bb.br AS b2, c.br AS b3,
                        count(*)::BIGINT AS support
                 FROM b a JOIN b bb ON a.o = bb.o AND bb.br > a.br
                          JOIN b c  ON a.o = c.o  AND c.br > bb.br
                 GROUP BY 1, 2, 3)
         SELECT b1, b2, b3, support,
                ((support * 1000) // n.n_orders)::BIGINT AS support_permille
         FROM tri, n WHERE support * 1000 >= 5 * n.n_orders""",
    "q392_mor_delete" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
                sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS sum_cents
         FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1""",
    "q393_delete_compaction" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars,
                true AS debt_settled_match
         FROM documents WHERE n_chars >= 200 GROUP BY 1""",
    "q394_entity_resolution" ->
      """WITH RECURSIVE parts AS (
           SELECT p_partkey, p_name,
                  round(p_retailprice * 100, 0)::BIGINT AS cents,
                  p_size::BIGINT AS psize FROM part),
         names AS (SELECT p_name, min(p_partkey) AS rep FROM parts
                   GROUP BY 1),
         e AS (SELECT a.rep AS s, b.rep AS d FROM names a JOIN names b
               ON b.rep > a.rep AND levenshtein(a.p_name, b.p_name) <= 2),
         edges AS (SELECT s, d FROM e UNION SELECT d AS s, s AS d FROM e),
         reach AS (
           SELECT rep AS node, rep AS r FROM names
           UNION
           SELECT reach.node, edges.d AS r
           FROM reach JOIN edges ON edges.s = reach.r),
         lab AS (SELECT node AS rep, min(r) AS cluster_id FROM reach
                 GROUP BY 1),
         mem AS (SELECT parts.p_name, parts.cents, parts.psize,
                        lab.cluster_id
                 FROM parts JOIN names ON names.p_name = parts.p_name
                            JOIN lab ON lab.rep = names.rep),
         canon AS (SELECT lab.cluster_id, names.p_name AS canonical_name
                   FROM names JOIN lab ON lab.rep = names.rep
                   WHERE names.rep = lab.cluster_id),
         g AS (SELECT cluster_id, count(*)::BIGINT AS n_members,
                      count(DISTINCT p_name)::BIGINT AS n_names,
                      max(cents)::BIGINT AS max_price_cents,
                      min(psize)::BIGINT AS min_size
               FROM mem GROUP BY 1)
         SELECT g.cluster_id, g.n_members, g.n_names, g.max_price_cents,
                g.min_size, canon.canonical_name
         FROM g JOIN canon USING (cluster_id)""",
    "q395_seq_support" ->
      """WITH ut AS (SELECT user_id, event_type AS t,
                list_sort(list(epoch_us(ts))) AS a
             FROM events GROUP BY 1, 2),
         n AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users
               FROM events),
         tri AS (SELECT x1.user_id, x1.t AS t1, x2.t AS t2, x3.t AS t3,
                 len(list_filter(x1.a, s ->
                   coalesce(list_min(list_filter(x3.a, z -> z >
                     coalesce(list_min(list_filter(x2.a, y -> y > s)),
                       9223372036854775807))), 9223372036854775807)
                     - s <= 21600000000)) > 0 AS ok
             FROM ut x1 JOIN ut x2 USING (user_id)
                        JOIN ut x3 USING (user_id)),
         sup AS (SELECT t1, t2, t3, count(*)::BIGINT AS support_users
                 FROM tri WHERE ok GROUP BY 1, 2, 3)
         SELECT t1, t2, t3, support_users,
                ((support_users * 1000) // n.n_users)::BIGINT
                  AS support_permille
         FROM sup, n""",
    "q396_kaplan_meier" ->
      """WITH u AS (
           SELECT user_id, min(ts) AS t0,
                  min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
                  max(ts) AS tl
           FROM events GROUP BY 1),
         dur AS (SELECT user_id,
                   CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
                        ELSE date_diff('day', t0, tl) END::BIGINT AS t,
                   (tp IS NOT NULL)::BIGINT AS ev
                 FROM u),
         byt AS (SELECT t, sum(ev)::BIGINT AS d, sum(1 - ev)::BIGINT AS c,
                        count(*)::BIGINT AS cnt FROM dur GROUP BY 1),
         tot AS (SELECT count(*)::BIGINT AS n FROM dur),
         risk AS (SELECT byt.*, tot.n
                    - sum(cnt) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                    + cnt AS n_risk
                  FROM byt, tot),
         steps AS (SELECT t, d, c, n_risk,
                          row_number() OVER (ORDER BY t) AS idx
                   FROM risk WHERE d > 0),
         arr AS (SELECT list(n_risk * 1000000000 + d ORDER BY t) AS a
                 FROM steps)
         SELECT s.t AS t_days, s.n_risk::BIGINT AS n_risk,
                s.d AS d_events, s.c AS censored_here,
                list_reduce(list_prepend(1000000::BIGINT, a[1:s.idx]),
                  (acc, x) -> (acc * ((x // 1000000000) - (x % 1000000000)))
                              // (x // 1000000000))::BIGINT AS surv_ppm
         FROM steps s, arr""",
    "q397_anova_stats" ->
      """WITH li AS (SELECT l_returnflag AS flag,
                round(l_extendedprice * 100, 0)::BIGINT AS cents
             FROM lineitem),
         g AS (SELECT flag, count(*)::BIGINT AS n_i, sum(cents)::BIGINT AS s_i,
                      sum(cents::HUGEINT * cents) AS q_i
               FROM li GROUP BY 1),
         tot AS (SELECT sum(n_i)::BIGINT AS n, sum(s_i)::BIGINT AS s FROM g)
         SELECT flag, n_i, s_i::VARCHAR AS sum_cents,
                q_i::VARCHAR AS sumsq_cents,
                ((s_i::HUGEINT * n - s::HUGEINT * n_i) * 1000
                  // (s::HUGEINT * n_i))::BIGINT AS mean_dev_permille
         FROM g CROSS JOIN tot""",
    "q398_weighted_sample" ->
      """WITH docs AS (
           SELECT doc_id, source, n_chars,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT
                    * 1000000) // n_chars AS pri
           FROM documents),
         tot AS (SELECT source, sum(n_chars)::BIGINT AS w_src FROM documents
                 GROUP BY 1),
         sampled AS (
           SELECT doc_id, source, n_chars, pri,
                  row_number() OVER (PARTITION BY source
                    ORDER BY pri, doc_id)::BIGINT AS rk
           FROM docs QUALIFY rk <= 10)
         SELECT s.source, s.doc_id, s.n_chars, s.pri, s.rk,
                ((sum(s.n_chars) OVER (PARTITION BY s.source))::BIGINT * 1000
                  // tot.w_src)::BIGINT AS sampled_mass_pm
         FROM sampled s JOIN tot USING (source)""",
    "q399_wap_publish" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
                sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS sum_cents,
                true AS audit_passed
         FROM orders GROUP BY 1""",
    "q400_linreg_stats" ->
      """WITH d AS (SELECT lang, n_chars AS x,
                len(string_split(text, ' '))::BIGINT AS y
             FROM documents),
         g AS (SELECT lang, count(*)::BIGINT AS n,
                      sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                      sum(x::HUGEINT * y) AS sxy,
                      sum(x::HUGEINT * x) AS sxx
               FROM d GROUP BY 1)
         SELECT lang, n, sx, sy,
                sxy::VARCHAR AS sum_xy, sxx::VARCHAR AS sum_xx,
                ((n * sxy - sx::HUGEINT * sy) * 1000
                  // (n * sxx - sx::HUGEINT * sx))::BIGINT
                  AS slope_permille,
                ((sy::HUGEINT * sxx - sx::HUGEINT * sxy) * 1000
                  // (n * sxx - sx::HUGEINT * sx))::BIGINT
                  AS intercept_permille
         FROM g""",
    "q401_price_volume_bridge" ->
      """WITH li AS (
           SELECT p_brand AS brand, year(l_shipdate) AS yr,
                  round(l_extendedprice * 100, 0)::BIGINT AS cents,
                  l_quantity::BIGINT AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE year(l_shipdate) IN (1996, 1997)),
         g AS (SELECT brand, yr, sum(cents)::BIGINT AS r,
                      sum(qty)::BIGINT AS v
               FROM li GROUP BY 1, 2),
         y1 AS (SELECT brand, r AS r1, v AS v1 FROM g WHERE yr = 1996),
         y2 AS (SELECT brand, r AS r2, v AS v2 FROM g WHERE yr = 1997)
         SELECT brand, r1, v1, r2, v2, (r2 - r1)::BIGINT AS delta_cents,
                (((v2 - v1) * r1) // v1)::BIGINT AS volume_effect_cents,
                ((r2 - r1) - ((v2 - v1) * r1) // v1)::BIGINT
                  AS price_effect_cents
         FROM y1 JOIN y2 USING (brand)""",
    "q402_decay_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS pid, ts::DATE AS pd,
                round(value * 100, 0)::BIGINT AS cents
             FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts::DATE AS cd FROM events
               WHERE event_type = 'click'),
         touches AS (
           SELECT p.pid, p.cents,
                  date_diff('day', c.cd, p.pd)::BIGINT AS age,
                  (1::BIGINT << (7 - date_diff('day', c.cd, p.pd)))::BIGINT
                    AS w
           FROM p JOIN c USING (user_id)
           WHERE date_diff('day', c.cd, p.pd) BETWEEN 0 AND 7),
         byp AS (SELECT pid, sum(w)::BIGINT AS sumw FROM touches GROUP BY 1)
         SELECT age, count(*)::BIGINT AS n_touches,
                sum((t.cents * t.w) // byp.sumw)::BIGINT AS credited_cents
         FROM touches t JOIN byp USING (pid) GROUP BY 1""",
    "q403_kanon_generalize" ->
      """WITH cell AS (SELECT source, lang, count(*)::BIGINT AS n0
                       FROM documents GROUP BY 1, 2),
         l1 AS (SELECT *, n0 >= 5 AS ok0 FROM cell),
         langtot AS (SELECT lang, sum(n0)::BIGINT AS n1 FROM l1
                     WHERE NOT ok0 GROUP BY 1),
         routed AS (SELECT
             CASE WHEN ok0 THEN source ELSE '*' END AS source_out,
             CASE WHEN ok0 OR coalesce(n1, 0) >= 5 THEN lang
                  ELSE '*' END AS lang_out,
             (CASE WHEN ok0 THEN 0 WHEN coalesce(n1, 0) >= 5 THEN 1
                   ELSE 2 END)::BIGINT AS lvl,
             n0
           FROM l1 LEFT JOIN langtot USING (lang))
         SELECT source_out, lang_out, lvl, sum(n0)::BIGINT AS group_size,
                count(*)::BIGINT AS n_cells_merged
         FROM routed GROUP BY 1, 2, 3""",
    "q404_bellman_ford" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         o AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         adj AS (SELECT x.tok AS a, y.tok AS b FROM o x JOIN o y
                 ON y.doc_id = x.doc_id AND y.ord = x.ord + 1
                 WHERE x.tok <> y.tok),
         e AS MATERIALIZED (
           SELECT a, b, (1 + 1000000 // count(*))::BIGINT AS w
           FROM adj GROUP BY 1, 2),
         l0 AS MATERIALIZED (SELECT min(a) AS tok, 0::BIGINT AS dist FROM e),
         l1 AS MATERIALIZED (SELECT tok, min(dist)::BIGINT AS dist FROM (
           SELECT tok, dist FROM l0
           UNION ALL SELECT e.b AS tok, l0.dist + e.w AS dist
           FROM l0 JOIN e ON e.a = l0.tok) GROUP BY 1),
         l2 AS MATERIALIZED (SELECT tok, min(dist)::BIGINT AS dist FROM (
           SELECT tok, dist FROM l1
           UNION ALL SELECT e.b AS tok, l1.dist + e.w AS dist
           FROM l1 JOIN e ON e.a = l1.tok) GROUP BY 1),
         l3 AS MATERIALIZED (SELECT tok, min(dist)::BIGINT AS dist FROM (
           SELECT tok, dist FROM l2
           UNION ALL SELECT e.b AS tok, l2.dist + e.w AS dist
           FROM l2 JOIN e ON e.a = l2.tok) GROUP BY 1),
         l4 AS MATERIALIZED (SELECT tok, min(dist)::BIGINT AS dist FROM (
           SELECT tok, dist FROM l3
           UNION ALL SELECT e.b AS tok, l3.dist + e.w AS dist
           FROM l3 JOIN e ON e.a = l3.tok) GROUP BY 1)
         SELECT tok, dist FROM l4""",
    "q405_stream_mor_deletes" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents
         WHERE NOT (doc_id % 7 = 0 OR doc_id % 5 = 0 OR doc_id % 3 = 0)
         GROUP BY 1""",
    "q408_partition_evolution" ->
      """SELECT doc_id % 7 AS bucket, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents WHERE lang = 'de'
         GROUP BY 1""",
    "q409_metadata_count" ->
      """SELECT lang, count(*)::BIGINT AS n_docs
         FROM documents WHERE lang IN ('de','en','es','fr','zh')
         GROUP BY 1""",
    "q410_ivm_min_deletes" ->
      """WITH dels AS (SELECT doc_id, lang, n_chars FROM documents
                       WHERE doc_id % 6 = 0),
         ins AS (SELECT -d.doc_id - 1 AS doc_id,
                        CASE WHEN d.doc_id % 2 = 0 THEN d.lang
                             ELSE 'xx' END AS lang,
                        d.n_chars - 7 AS n_chars
                 FROM documents d WHERE d.doc_id % 13 = 0),
         base_mn AS (SELECT lang, min(n_chars) AS mn FROM documents
                     GROUP BY 1),
         del_mn AS (SELECT lang, min(n_chars) AS dmn FROM dels GROUP BY 1),
         flag AS (SELECT b.lang, coalesce(d.dmn = b.mn, FALSE) AS rc
                  FROM base_mn b LEFT JOIN del_mn d USING (lang)),
         final AS (
           SELECT lang, count(*)::BIGINT AS n_docs,
                  min(n_chars)::BIGINT AS min_chars
           FROM (SELECT doc_id, lang, n_chars FROM documents
                 WHERE doc_id % 6 <> 0
                 UNION ALL SELECT doc_id, lang, n_chars FROM ins)
           GROUP BY 1)
         SELECT f.lang, f.n_docs, f.min_chars,
                coalesce(fl.rc, FALSE) AS recomputed
         FROM final f LEFT JOIN flag fl USING (lang)""",
    "q412_cross_table_txn" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents GROUP BY 1""",
    "q413_branch_merge" ->
      """WITH merged AS (
           SELECT doc_id, lang,
                  n_chars + CASE WHEN doc_id % 5 = 0 THEN 10
                                 WHEN doc_id % 7 = 0 THEN 100
                                 ELSE 0 END AS n_chars
           FROM documents
           WHERE NOT (doc_id % 11 = 0 AND doc_id % 5 <> 0)
           UNION ALL
           SELECT -doc_id - 1, lang, n_chars + 3 FROM documents
           WHERE doc_id % 17 = 0),
         conf AS (
           SELECT lang, count(*)::BIGINT AS n_conflicts FROM documents
           WHERE doc_id % 35 = 0
              OR (doc_id % 7 = 0 AND doc_id % 11 = 0 AND doc_id % 5 <> 0)
           GROUP BY 1),
         g AS (SELECT lang, count(*)::BIGINT AS n_docs,
                      sum(n_chars)::BIGINT AS sum_chars
               FROM merged GROUP BY 1)
         SELECT g.lang, g.n_docs, g.sum_chars,
                coalesce(c.n_conflicts, 0) AS n_conflicts
         FROM g LEFT JOIN conf c USING (lang)""",
    "q418_evolving_maintenance" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
                  AS n_with_chars,
                coalesce(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END),
                  0)::BIGINT AS sum_chars
         FROM documents WHERE doc_id % 5 <> 3
         GROUP BY 1""",
    "q419_join_ivm_txn" ->
      """SELECT lang, count(*)::BIGINT AS n_pairs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents
         WHERE NOT (doc_id % 2 = 1 AND doc_id % 5 = 0)
           AND NOT (doc_id % 3 <> 0 AND doc_id % 7 = 0)
         GROUP BY 1""",
    "q421_stream_auto_compact" ->
      """WITH mid AS (
           SELECT lang, count(*)::BIGINT AS n_mid,
                  sum(n_chars)::BIGINT AS chars_mid
           FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0
           GROUP BY 1),
         fin AS (
           SELECT lang, count(*)::BIGINT AS n_final,
                  sum(n_chars)::BIGINT AS chars_final
           FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0
             AND doc_id % 3 <> 0 AND doc_id % 11 <> 0
           GROUP BY 1)
         SELECT mid.lang, mid.n_mid, mid.chars_mid,
                coalesce(fin.n_final, 0)::BIGINT AS n_final,
                coalesce(fin.chars_final, 0)::BIGINT AS chars_final
         FROM mid LEFT JOIN fin USING (lang)""",
    "q423_clustered_commit" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars,
                sum(len(string_split(text, ' ')))::BIGINT AS sum_tokens
         FROM documents
         WHERE n_chars <= 200 AND len(string_split(text, ' ')) <= 40
         GROUP BY 1""",
    "q424_permutation_test" ->
      """WITH u AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END)::BIGINT AS conv
           FROM events GROUP BY 1),
         obs AS (
           SELECT sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT
                    AS obs_na,
                  sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END)::BIGINT
                    AS obs_ca,
                  sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT
                    AS obs_nb,
                  sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END)::BIGINT
                    AS obs_cb
           FROM (SELECT conv,
                   CASE WHEN substr(md5('obs' || '|' || user_id::VARCHAR),
                     1, 1) IN ('0','1','2','3','4','5','6','7')
                     THEN 'A' ELSE 'B' END AS arm FROM u)),
         perms AS (
           SELECT p,
                  sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS na,
                  sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END)::BIGINT AS ca,
                  sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT AS nb,
                  sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END)::BIGINT AS cb
           FROM (SELECT u.conv, g.p,
                   CASE WHEN substr(md5(g.p::VARCHAR || '|'
                     || u.user_id::VARCHAR), 1, 1)
                     IN ('0','1','2','3','4','5','6','7')
                     THEN 'A' ELSE 'B' END AS arm
                 FROM u CROSS JOIN (SELECT range AS p FROM range(64)) g)
           GROUP BY 1),
         x AS (
           SELECT count(*)::BIGINT AS n_perms,
                  sum(CASE WHEN
                    abs((ca * nb - cb * na)::DECIMAL(38,0))
                      * (obs_na * obs_nb)::DECIMAL(38,0) >=
                    abs((obs_ca * obs_nb - obs_cb * obs_na)::DECIMAL(38,0))
                      * (na * nb)::DECIMAL(38,0)
                    THEN 1 ELSE 0 END)::BIGINT AS n_extreme,
                  max((obs_ca * 1000) // obs_na
                      - (obs_cb * 1000) // obs_nb)::BIGINT
                    AS obs_diff_permille
           FROM perms, obs)
         SELECT n_perms, n_extreme, obs_diff_permille,
                ((n_extreme + 1) * 1000) // (n_perms + 1) AS p_permille
         FROM x""",
    "q425_incremental_index" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents),
         u AS (SELECT doc_id, unnest(ws) AS tok,
                      generate_subscripts(ws, 1) AS ord FROM t),
         b AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || c.tok AS bg
               FROM u a JOIN u c
                 ON c.doc_id = a.doc_id AND c.ord = a.ord + 1),
         term AS (SELECT min(bg) AS bg FROM (
                    SELECT bg, count(DISTINCT doc_id) AS df
                    FROM b GROUP BY 1)
                  WHERE df BETWEEN 5 AND 50),
         hits AS (SELECT DISTINCT b.bg, b.doc_id
                  FROM b JOIN term USING (bg))
         SELECT hits.bg, d.lang, count(*)::BIGINT AS n_docs,
                sum(d.n_chars)::BIGINT AS sum_chars
         FROM documents d JOIN hits ON hits.doc_id = d.doc_id
         GROUP BY 1, 2""",
    "q426_theil_sen" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1),
         p AS (SELECT (b.n - a.n)::BIGINT AS num,
                      (b.day - a.day)::BIGINT AS den
               FROM daily a JOIN daily b ON b.day > a.day),
         c AS (SELECT count(*)::BIGINT AS n_pairs FROM p),
         r AS (SELECT num, den,
                      row_number() OVER (ORDER BY num / den, num, den)
                        AS rk
               FROM p)
         SELECT r.num AS med_num, r.den AS med_den, c.n_pairs,
                (r.num * 1000) // r.den AS slope_permille
         FROM r, c WHERE r.rk = (c.n_pairs + 1) // 2""",
    "q427_rollback_restore" ->
      """WITH bad AS (
           SELECT count(*)::BIGINT AS bad_rows_quarantined
           FROM documents WHERE doc_id % 3 = 0)
         SELECT lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars,
                max(bad.bad_rows_quarantined)::BIGINT
                  AS bad_rows_quarantined
         FROM documents, bad GROUP BY 1""",
    "q428_quarantine_ingest" ->
      """WITH ok AS (
           SELECT lang, count(*)::BIGINT AS n_valid,
                  sum(n_chars)::BIGINT AS chars_valid
           FROM documents WHERE n_chars >= 100 GROUP BY 1),
         bad AS (
           SELECT lang, count(*)::BIGINT AS n_quarantined
           FROM documents WHERE n_chars < 100 GROUP BY 1)
         SELECT coalesce(ok.lang, bad.lang) AS lang,
                coalesce(ok.n_valid, 0)::BIGINT AS n_valid,
                coalesce(ok.chars_valid, 0)::BIGINT AS chars_valid,
                coalesce(bad.n_quarantined, 0)::BIGINT AS n_quarantined
         FROM ok FULL JOIN bad ON ok.lang = bad.lang""",
    "q429_mann_kendall" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1),
         s AS (SELECT sum(sign(b.n - a.n))::BIGINT AS s_stat
               FROM daily a JOIN daily b ON b.day > a.day),
         base AS (SELECT count(*)::BIGINT AS nd,
                         (count(*) * (count(*) - 1)
                           * (2 * count(*) + 5))::BIGINT AS vbase
                  FROM daily),
         ties AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)),
                           0)::BIGINT AS vties
                  FROM (SELECT count(*)::BIGINT AS t FROM daily
                        GROUP BY n HAVING count(*) > 1))
         SELECT base.nd AS n_days, s.s_stat,
                (base.vbase - ties.vties)::BIGINT AS v18,
                (s.s_stat * 2000) // (base.nd * (base.nd - 1))
                  AS tau_permille,
                11250::DECIMAL(38,0) * (abs(s.s_stat) - 1)
                  * (abs(s.s_stat) - 1) >
                  2401::DECIMAL(38,0) * (base.vbase - ties.vties)
                  AS trend_significant
         FROM s, base, ties""",
    "q430_incremental_er" ->
      """WITH m AS (SELECT p_name, min(p_partkey) AS rep FROM part
                    WHERE p_partkey % 3 <> 0 GROUP BY 1),
         b AS (SELECT p_name, min(p_partkey) AS rep FROM part
               WHERE p_partkey % 3 = 0 GROUP BY 1),
         mm AS (SELECT b.rep AS br, count(*)::BIGINT AS nm
                FROM b JOIN m ON levenshtein(b.p_name, m.p_name) <= 2
                GROUP BY 1),
         x AS (SELECT b.rep, coalesce(mm.nm, 0)::BIGINT AS nm
               FROM b LEFT JOIN mm ON mm.br = b.rep)
         SELECT nm AS n_matches, count(*)::BIGINT AS n_entities
         FROM x GROUP BY 1""",
    "q431_metadata_minmax" ->
      """SELECT min(n_chars)::BIGINT AS min_chars,
                max(n_chars)::BIGINT AS max_chars,
                count(*)::BIGINT AS n_rows
         FROM documents""",
    "q432_conjunctive_search" ->
      """WITH toks AS (
           SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' ')))
             AS tok
           FROM documents),
         dfr AS (SELECT tok, count(*)::BIGINT AS df FROM toks GROUP BY 1),
         terms AS (SELECT tok FROM (
                     SELECT tok, row_number() OVER (ORDER BY df, tok) AS rk
                     FROM dfr) WHERE rk IN (1, 3, 5)),
         tl AS (SELECT string_agg(tok, ',' ORDER BY tok) AS terms
                FROM terms),
         hits AS (SELECT doc_id, lang FROM toks JOIN terms USING (tok)
                  GROUP BY 1, 2 HAVING count(*) = 3)
         SELECT lang, count(*)::BIGINT AS n_docs, max(tl.terms) AS terms
         FROM hits, tl GROUP BY 1""",
    "q433_fano_burstiness" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
         agg AS (
           SELECT event_type, count(*)::BIGINT AS n_days,
                  sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS q
           FROM daily GROUP BY 1)
         SELECT event_type, n_days, s AS total_events,
                ((1000 * (n_days * q - s * s))
                  // ((n_days - 1) * s))::BIGINT AS fano_permille
         FROM agg""",
    "q434_l_diversity" ->
      """WITH d AS (
           SELECT lang, source,
                  CASE WHEN n_chars < 150 THEN 'short'
                       WHEN n_chars < 300 THEN 'medium'
                       ELSE 'long' END AS len_class
           FROM documents)
         SELECT lang, source, count(*)::BIGINT AS cell_size,
                count(DISTINCT len_class)::BIGINT AS l_distinct,
                count(DISTINCT len_class) >= 3 AS diverse_l3
         FROM d GROUP BY 1, 2""",
    "q435_layout_audit" ->
      """WITH c AS (SELECT lang, count(*)::BIGINT AS r
                    FROM documents GROUP BY 1)
         SELECT count(*)::BIGINT AS n_members,
                min(r)::BIGINT AS min_rows,
                max(r)::BIGINT AS max_rows,
                sum(r)::BIGINT AS total_rows,
                ((1000 * max(r) * count(*)) // sum(r))::BIGINT
                  AS skew_permille
         FROM c""",
    "q436_out_of_order_audit" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
                    FROM events),
         l AS (SELECT us,
                      max(us) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pm
               FROM e),
         b AS (SELECT CASE
                 WHEN greatest(coalesce(pm - us, 0), 0) = 0 THEN 'in_order'
                 WHEN pm - us <= 3600000000 THEN 'lt_1h'
                 WHEN pm - us <= 21600000000 THEN 'lt_6h'
                 ELSE 'gt_6h' END AS bucket
               FROM l)
         SELECT bucket, count(*)::BIGINT AS n_events FROM b GROUP BY 1""",
    "q441_bh_fdr" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         ut AS (SELECT user_id, event_type, count(*)::BIGINT AS c
                FROM events GROUP BY 1, 2),
         ua AS (SELECT u.user_id, g.p,
                  CASE WHEN substr(md5(g.p::VARCHAR || '|'
                    || u.user_id::VARCHAR), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm
                FROM u CROSS JOIN (SELECT range AS p FROM range(32)) g),
         sizes AS (SELECT p,
                     sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT
                       AS na,
                     sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT
                       AS nb
                   FROM ua GROUP BY 1),
         uo AS (SELECT user_id,
                  CASE WHEN substr(md5('obs' || '|' || user_id::VARCHAR),
                    1, 1) IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm FROM u),
         osz AS (SELECT
                   sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT
                     AS obs_na,
                   sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT
                     AS obs_nb
                 FROM uo),
         pc AS (SELECT ut.event_type, ua.p,
                  sum(CASE WHEN ua.arm = 'A' THEN ut.c ELSE 0 END)::BIGINT
                    AS ca,
                  sum(CASE WHEN ua.arm = 'B' THEN ut.c ELSE 0 END)::BIGINT
                    AS cb
                FROM ut JOIN ua ON ua.user_id = ut.user_id GROUP BY 1, 2),
         oc AS (SELECT ut.event_type,
                  sum(CASE WHEN uo.arm = 'A' THEN ut.c ELSE 0 END)::BIGINT
                    AS obs_ca,
                  sum(CASE WHEN uo.arm = 'B' THEN ut.c ELSE 0 END)::BIGINT
                    AS obs_cb
                FROM ut JOIN uo ON uo.user_id = ut.user_id GROUP BY 1),
         pv AS (SELECT pc.event_type,
                  sum(CASE WHEN
                    abs((pc.ca * s.nb - pc.cb * s.na)::DECIMAL(38,0))
                      * (o.obs_na * o.obs_nb)::DECIMAL(38,0) >=
                    abs((oc.obs_ca * o.obs_nb
                      - oc.obs_cb * o.obs_na)::DECIMAL(38,0))
                      * (s.na * s.nb)::DECIMAL(38,0)
                    THEN 1 ELSE 0 END)::BIGINT AS ne
                FROM pc JOIN sizes s USING (p)
                        JOIN oc USING (event_type), osz o
                GROUP BY 1),
         pp AS (SELECT event_type, ((ne + 1) * 1000) // 33 AS p_permille
                FROM pv),
         mm AS (SELECT count(*)::BIGINT AS m FROM pp),
         rk AS (SELECT event_type, p_permille,
                  row_number() OVER (ORDER BY p_permille, event_type)
                    AS bh_rank
                FROM pp),
         km AS (SELECT coalesce(max(bh_rank), 0)::BIGINT AS kmax
                FROM rk, mm WHERE p_permille * mm.m <= bh_rank * 100)
         SELECT rk.event_type, rk.p_permille::BIGINT AS p_permille,
                rk.bh_rank::BIGINT AS bh_rank,
                rk.bh_rank <= km.kmax AS rejected
         FROM rk, km""",
    "q442_version_timeline" ->
      """WITH r AS (SELECT doc_id % 4 AS b FROM documents),
         c AS (SELECT b, count(*)::BIGINT AS n FROM r GROUP BY 1),
         v AS (SELECT range + 1 AS version FROM range(4))
         SELECT v.version::BIGINT AS version,
                v.version::BIGINT AS n_members,
                sum(CASE WHEN c.b < v.version THEN c.n ELSE 0 END)::BIGINT
                  AS total_rows
         FROM v CROSS JOIN c GROUP BY 1, 2""",
    "q443_markov_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
         p AS (SELECT event_type AS next,
                      lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) AS prev
               FROM e),
         c AS (SELECT prev, next, count(*)::BIGINT AS c FROM p
               WHERE prev IS NOT NULL GROUP BY 1, 2),
         k AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM events),
         rt AS (SELECT prev, sum(c)::BIGINT AS rt FROM c GROUP BY 1)
         SELECT c.prev, c.next, c.c,
                (((c.c + 1) * 1000) // (rt.rt + k.k))::BIGINT AS p_permille
         FROM c JOIN rt USING (prev), k""",
    "q444_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
         r AS (SELECT user_id, day, event_type,
                      row_number() OVER (PARTITION BY user_id, day
                        ORDER BY us, event_id) AS rn
               FROM e),
         p AS (SELECT user_id, day, count(*) AS n,
                      string_agg(event_type, '>' ORDER BY rn) AS path
               FROM r WHERE rn <= 3 GROUP BY 1, 2),
         s AS (SELECT path, count(*)::BIGINT AS support FROM p
               WHERE n = 3 GROUP BY 1),
         t AS (SELECT path, support,
                      row_number() OVER (ORDER BY support DESC, path) AS rk
               FROM s)
         SELECT path, support, rk::BIGINT AS rk FROM t WHERE rk <= 10""",
    "q446_acf_daily" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                           count(*)::BIGINT AS x
                    FROM events GROUP BY 1),
         t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx FROM d),
         c AS (SELECT day, (t.n * d.x - t.sx)::HUGEINT AS c FROM d, t),
         den AS (SELECT sum(c * c) AS den FROM c),
         l AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
         num AS (SELECT l.lag, sum(a.c * b.c) AS num,
                        count(*)::BIGINT AS n_pairs
                 FROM l
                 JOIN c a ON true
                 JOIN c b ON b.day = a.day + l.lag
                 GROUP BY 1)
         SELECT num.lag::BIGINT AS lag, num.n_pairs,
                ((1000 * num.num) // den.den)::BIGINT AS acf_permille
         FROM num, den""",
    "q449_policy_replay" ->
      """WITH e AS (SELECT user_id, event_type,
                           epoch_us(ts) // 86400000000 AS day FROM events),
         cnt AS (SELECT user_id, event_type, day, count(*)::BIGINT AS c
                 FROM e GROUP BY 1, 2, 3),
         spine AS (SELECT DISTINCT user_id, day FROM cnt),
         hist AS (SELECT s.user_id, s.day, c.event_type,
                         sum(c.c)::BIGINT AS hc
                  FROM spine s
                  JOIN cnt c ON c.user_id = s.user_id AND c.day < s.day
                  GROUP BY 1, 2, 3),
         pred AS (SELECT user_id, day, event_type AS pred FROM (
                    SELECT user_id, day, event_type,
                           row_number() OVER (PARTITION BY user_id, day
                             ORDER BY hc DESC, event_type) AS rk
                    FROM hist) WHERE rk = 1),
         m AS (SELECT e.day, count(*)::BIGINT AS n_eval,
                      sum(CASE WHEN e.event_type = p.pred THEN 1 ELSE 0
                          END)::BIGINT AS n_matched
               FROM e JOIN pred p ON p.user_id = e.user_id
                                  AND p.day = e.day
               GROUP BY 1)
         SELECT day::BIGINT AS day, n_eval, n_matched,
                ((n_matched * 1000) // n_eval)::BIGINT AS match_permille
         FROM m""",
    "q451_rendezvous_reshard" ->
      """WITH k AS (SELECT c_custkey AS k FROM customer),
         spine AS (SELECT cfg, unnest(range(cfg)) AS sh
                   FROM (SELECT unnest([16, 20]) AS cfg)),
         hr AS (SELECT k.k, s.cfg, s.sh,
                       md5(k.k::VARCHAR || '#' || s.sh::VARCHAR) AS h
                FROM k CROSS JOIN spine s),
         top AS (SELECT k, cfg, arg_max(sh, h) AS sh FROM hr
                 GROUP BY 1, 2),
         p AS (SELECT k,
                      max(CASE WHEN cfg = 16 THEN sh END) AS hrw16,
                      max(CASE WHEN cfg = 20 THEN sh END) AS hrw20
               FROM top GROUP BY 1),
         a AS (SELECT count(*)::BIGINT AS n_keys,
                      sum(CASE WHEN hrw16 <> hrw20 THEN 1 ELSE 0
                          END)::BIGINT AS hrw_moved,
                      sum(CASE WHEN k % 16 <> k % 20 THEN 1 ELSE 0
                          END)::BIGINT AS mod_moved
               FROM p)
         SELECT 'hrw' AS method, n_keys, hrw_moved AS n_moved,
                ((hrw_moved * 1000) // n_keys)::BIGINT AS moved_permille
         FROM a
         UNION ALL
         SELECT 'mod' AS method, n_keys, mod_moved AS n_moved,
                ((mod_moved * 1000) // n_keys)::BIGINT AS moved_permille
         FROM a""",
    "q452_hits_scores" ->
      """WITH w AS (SELECT user_id, event_type, count(*)::BIGINT AS w
                    FROM events GROUP BY 1, 2),
         av1 AS (SELECT event_type, sum(w)::BIGINT AS a1 FROM w
                 GROUP BY 1),
         hv1 AS (SELECT w.user_id, sum(w.w::HUGEINT * av1.a1) AS h1
                 FROM w JOIN av1 USING (event_type) GROUP BY 1),
         av2 AS (SELECT w.event_type, sum(w.w::HUGEINT * hv1.h1) AS av
                 FROM w JOIN hv1 USING (user_id) GROUP BY 1)
         SELECT av2.event_type, av1.a1, av2.av::VARCHAR AS a2,
                row_number() OVER (ORDER BY av2.av DESC,
                                   av2.event_type)::BIGINT AS rk
         FROM av2 JOIN av1 USING (event_type)""",
    "q453_ks_drift" ->
      """WITH e AS (SELECT event_type, round(value * 100, 0)::BIGINT
                      AS cents
                    FROM events
                    WHERE event_type IN ('click', 'purchase')),
         c AS (SELECT cents,
                      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                          END)::BIGINT AS c1,
                      sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END)::BIGINT AS c2
               FROM e GROUP BY 1),
         t AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2
               FROM c),
         cu AS (SELECT cents,
                       sum(c1) OVER (ORDER BY cents)::BIGINT AS cum1,
                       sum(c2) OVER (ORDER BY cents)::BIGINT AS cum2
                FROM c),
         dd AS (SELECT cents,
                       abs(t.n2::HUGEINT * cum1 - t.n1::HUGEINT * cum2)
                         AS d,
                       t.n1, t.n2
                FROM cu, t)
         SELECT n1, n2, cents AS d_at_cents,
                ((1000 * d) // (n1::HUGEINT * n2))::BIGINT AS d_permille
         FROM dd QUALIFY row_number() OVER (ORDER BY d DESC, cents) = 1""",
    "q454_cuped_lift" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                           round(value * 100, 0)::BIGINT AS cents
                    FROM events),
         sp AS (SELECT (min(day) + max(day) + 1) // 2 AS split_day
                FROM e),
         pu AS (SELECT user_id,
                       sum(CASE WHEN day < sp.split_day THEN cents
                           ELSE 0 END)::BIGINT AS x,
                       sum(CASE WHEN day >= sp.split_day THEN cents
                           ELSE 0 END)::BIGINT AS y,
                       CASE WHEN substr(md5('cuped' || user_id::VARCHAR),
                                        1, 1)
                            IN ('0','1','2','3','4','5','6','7')
                            THEN 'A' ELSE 'B' END AS arm
                FROM e, sp GROUP BY user_id, arm),
         m AS (SELECT count(*)::HUGEINT AS n,
                      sum(x::HUGEINT * y) AS sxy,
                      sum(x::HUGEINT * x) AS sxx,
                      sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                      sum(CASE WHEN arm = 'A' THEN 1 ELSE 0
                          END)::HUGEINT AS na,
                      sum(CASE WHEN arm = 'B' THEN 1 ELSE 0
                          END)::HUGEINT AS nb,
                      sum(CASE WHEN arm = 'A' THEN x ELSE 0
                          END)::HUGEINT AS sxa,
                      sum(CASE WHEN arm = 'B' THEN x ELSE 0
                          END)::HUGEINT AS sxb,
                      sum(CASE WHEN arm = 'A' THEN y ELSE 0
                          END)::HUGEINT AS sya,
                      sum(CASE WHEN arm = 'B' THEN y ELSE 0
                          END)::HUGEINT AS syb
               FROM pu)
         SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
                ((1000 * (n * sxy - sx * sy))
                  // (n * sxx - sx * sx))::BIGINT AS theta_permille,
                ((1000 * (sya * nb - syb * na))
                  // (na * nb))::BIGINT AS raw_diff_milli,
                ((1000 * ((sya * nb - syb * na) * (n * sxx - sx * sx)
                          - (n * sxy - sx * sy) * (sxa * nb - sxb * na)))
                  // ((na * nb) * (n * sxx - sx * sx)))::BIGINT
                  AS cuped_diff_milli
         FROM m""",
    "q455_groupkfold_audit" ->
      """WITH e AS (
           SELECT user_id, event_type,
                  ((instr('0123456789abcdef',
                          substr(md5('fold' || user_id::VARCHAR), 1, 1))
                    - 1) * 16
                   + (instr('0123456789abcdef',
                            substr(md5('fold' || user_id::VARCHAR), 2, 1))
                      - 1)) % 5 AS fold
           FROM events),
         ft AS (SELECT fold, event_type, count(*)::BIGINT AS c
                FROM e GROUP BY 1, 2),
         fsum AS (SELECT fold, sum(c)::BIGINT AS nf FROM ft GROUP BY 1),
         tsum AS (SELECT event_type, sum(c)::BIGINT AS nt FROM ft
                  GROUP BY 1),
         tot AS (SELECT sum(c)::BIGINT AS n FROM ft),
         users AS (SELECT fold, count(DISTINCT user_id)::BIGINT AS n_users
                   FROM e GROUP BY 1),
         leak AS (SELECT sum(CASE WHEN nf2 > 1 THEN 1 ELSE 0
                      END)::BIGINT AS leaked
                  FROM (SELECT user_id, count(DISTINCT fold) AS nf2
                        FROM e GROUP BY 1)),
         dev AS (SELECT ft.fold,
                        max(abs((1000 * ft.c) // fsum.nf
                                - (1000 * tsum.nt) // tot.n))::BIGINT
                          AS max_type_dev_permille
                 FROM ft JOIN fsum USING (fold)
                         JOIN tsum USING (event_type), tot
                 GROUP BY 1)
         SELECT dev.fold::BIGINT AS fold, users.n_users,
                fsum.nf AS n_events, dev.max_type_dev_permille,
                leak.leaked AS leaked_users
         FROM dev JOIN users USING (fold) JOIN fsum USING (fold), leak""",
    "q456_fertility_audit" ->
      """WITH w0 AS (SELECT lang, unnest(string_split(text, ' ')) AS wd
                     FROM documents),
         w AS (SELECT lang, length(wd)::BIGINT AS len FROM w0),
         g AS (SELECT lang, count(*)::BIGINT AS n_words,
                      sum((len + 3) // 4)::BIGINT AS n_subtokens,
                      sum(len)::BIGINT AS n_chars
               FROM w WHERE len > 0 GROUP BY 1)
         SELECT lang, n_words, n_subtokens, n_chars,
                ((1000 * n_subtokens) // n_words)::BIGINT
                  AS fertility_permille,
                ((100 * n_chars) // n_subtokens)::BIGINT
                  AS chars_per_token_centi
         FROM g""",
    "q457_conformal_coverage" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                           round(value * 100, 0)::BIGINT AS cents
                    FROM events),
         ev AS (SELECT event_type, cents, (day % 2 = 0) AS is_cal FROM e),
         cg AS (SELECT event_type, cents, count(*)::BIGINT AS c
                FROM ev WHERE is_cal GROUP BY 1, 2),
         cn AS (SELECT event_type, sum(c)::BIGINT AS n_cal FROM cg
                GROUP BY 1),
         cc AS (SELECT event_type, cents,
                       sum(c) OVER (PARTITION BY event_type
                         ORDER BY cents)::BIGINT AS cum
                FROM cg),
         med AS (SELECT cc.event_type, min(cents)::BIGINT AS med
                 FROM cc JOIN cn USING (event_type)
                 WHERE cum >= (n_cal + 1) // 2 GROUP BY 1),
         sg AS (SELECT ev.event_type, abs(cents - med)::BIGINT AS sc,
                       count(*)::BIGINT AS c
                FROM ev JOIN med USING (event_type)
                WHERE is_cal GROUP BY 1, 2),
         scc AS (SELECT event_type, sc,
                        sum(c) OVER (PARTITION BY event_type
                          ORDER BY sc)::BIGINT AS cum
                 FROM sg),
         qh AS (SELECT scc.event_type, min(sc)::BIGINT AS qhat
                FROM scc JOIN cn USING (event_type)
                WHERE cum >= least((9 * (n_cal + 1) + 9) // 10, n_cal)
                GROUP BY 1),
         t AS (SELECT ev.event_type, count(*)::BIGINT AS n_test,
                      sum(CASE WHEN abs(cents - med) <= qhat THEN 1
                          ELSE 0 END)::BIGINT AS n_covered
               FROM ev JOIN med USING (event_type)
                       JOIN qh USING (event_type)
               WHERE NOT is_cal GROUP BY 1)
         SELECT t.event_type, cn.n_cal, t.n_test, med.med AS med_cents,
                qh.qhat,
                ((n_covered * 1000) // n_test)::BIGINT
                  AS coverage_permille
         FROM t JOIN cn USING (event_type) JOIN med USING (event_type)
                JOIN qh USING (event_type)""",
    "q458_quantile_normalize" ->
      """WITH e AS (SELECT event_type, round(value * 100, 0)::BIGINT
                      AS cents
                    FROM events
                    WHERE event_type IN ('click', 'purchase')),
         pg0 AS (SELECT cents, count(*)::BIGINT AS c FROM e
                 WHERE event_type = 'purchase' GROUP BY 1),
         pg AS (SELECT cents,
                       sum(c) OVER (ORDER BY cents)::BIGINT AS cum
                FROM pg0),
         cg0 AS (SELECT cents, count(*)::BIGINT AS c FROM e
                 WHERE event_type = 'click' GROUP BY 1),
         cg AS (SELECT cents,
                       sum(c) OVER (ORDER BY cents)::BIGINT AS cum
                FROM cg0),
         np AS (SELECT max(cum)::BIGINT AS n_p FROM pg),
         nc AS (SELECT max(cum)::BIGINT AS n_c FROM cg),
         d AS (SELECT unnest(range(1, 11)) AS dec),
         dd AS (SELECT d.dec, (d.dec * np.n_p + 9) // 10 AS r_p,
                       (((d.dec * np.n_p + 9) // 10) * nc.n_c
                         + np.n_p - 1) // np.n_p AS r_c
                FROM d, np, nc),
         pv AS (SELECT dd.dec, dd.r_c,
                       min(pg.cents)::BIGINT AS purchase_cents
                FROM dd JOIN pg ON pg.cum >= dd.r_p GROUP BY 1, 2)
         SELECT pv.dec::BIGINT AS dec, pv.purchase_cents,
                min(cg.cents)::BIGINT AS normalized_click_cents
         FROM pv JOIN cg ON cg.cum >= pv.r_c GROUP BY 1, 2""",
    "q462_covariate_matching" ->
      """WITH e AS (SELECT user_id, event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           round(value * 100, 0)::BIGINT AS cents
                    FROM events),
         sp AS (SELECT (min(day) + max(day) + 1) // 2 AS split_day
                FROM e),
         u0 AS (SELECT user_id,
                       sum(CASE WHEN day < sp.split_day THEN 1 ELSE 0
                           END)::BIGINT AS cov,
                       sum(CASE WHEN day >= sp.split_day THEN cents
                           ELSE 0 END)::BIGINT AS y,
                       max(CASE WHEN event_type = 'purchase'
                                AND day < sp.split_day THEN cents
                           ELSE 0 END)::BIGINT AS mp
                FROM e, sp GROUP BY user_id),
         mg AS (SELECT mp, count(*)::BIGINT AS c FROM u0 GROUP BY 1),
         mt AS (SELECT sum(c)::BIGINT AS n FROM mg),
         mc AS (SELECT mp, sum(c) OVER (ORDER BY mp)::BIGINT AS cum
                FROM mg),
         mm0 AS (SELECT min(mp) AS mp_med FROM mc, mt
                 WHERE cum >= (n + 1) // 2),
         u AS (SELECT user_id, cov, y,
                      CASE WHEN mp >= mm0.mp_med THEN 1 ELSE 0
                      END::BIGINT AS treated
               FROM u0, mm0),
         w AS (SELECT *,
                      last_value(CASE WHEN treated = 0 THEN
                          {'cov': cov, 'user_id': user_id, 'y': y} END
                        IGNORE NULLS)
                        OVER (ORDER BY cov, treated, user_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS b,
                      last_value(CASE WHEN treated = 0 THEN
                          {'cov': cov, 'user_id': user_id, 'y': y} END
                        IGNORE NULLS)
                        OVER (ORDER BY cov DESC, treated DESC,
                              user_id DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS f
               FROM u),
         m AS (SELECT *, CASE WHEN f IS NULL THEN b
                              WHEN b IS NULL THEN f
                              WHEN abs(f.cov - cov) < abs(cov - b.cov)
                              THEN f ELSE b END AS mm
               FROM w WHERE treated = 1),
         n AS (SELECT sum(CASE WHEN treated = 1 THEN y ELSE 0
                           END)::HUGEINT AS syt,
                      sum(CASE WHEN treated = 0 THEN y ELSE 0
                           END)::HUGEINT AS syc,
                      sum(treated)::HUGEINT AS nt,
                      sum(1 - treated)::HUGEINT AS nc
               FROM u),
         a AS (SELECT count(*)::BIGINT AS n_matched,
                      sum((y - mm.y)::HUGEINT) AS sdiff
               FROM m WHERE mm IS NOT NULL)
         SELECT n.nt::BIGINT AS n_treated, n.nc::BIGINT AS n_control,
                a.n_matched,
                ((1000 * (n.syt * n.nc - n.syc * n.nt))
                  // (n.nt * n.nc))::BIGINT AS naive_diff_milli,
                ((1000 * a.sdiff) // a.n_matched)::BIGINT AS att_milli
         FROM a, n""",
    "q463_bootstrap_ci" ->
      """WITH dy AS (SELECT epoch_us(ts) // 86400000000 AS day,
                            sum(round(value * 100, 0)::BIGINT)::BIGINT
                              AS t
                     FROM events GROUP BY 1),
         dr AS (SELECT day, t,
                       row_number() OVER (ORDER BY day) - 1 AS r
                FROM dy),
         tt AS (SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st
                FROM dr),
         reps AS (SELECT unnest(range(32)) AS b),
         draws AS (SELECT reps.b, dr.r AS i,
                          md5('boot' || reps.b::VARCHAR || '#'
                              || dr.r::VARCHAR) AS h
                   FROM dr CROSS JOIN reps),
         ix AS (SELECT b,
                       ((instr('0123456789abcdef', substr(h, 1, 1)) - 1)
                          * 256
                        + (instr('0123456789abcdef', substr(h, 2, 1))
                           - 1) * 16
                        + (instr('0123456789abcdef', substr(h, 3, 1))
                           - 1)) % tt.n AS idx
                FROM draws, tt),
         means AS (SELECT b, (1000 * sum(dr.t)) // count(*) AS mean_milli
                   FROM ix JOIN dr ON dr.r = ix.idx GROUP BY 1),
         band AS (SELECT min(CASE WHEN rk = 2 THEN mean_milli END) AS lo,
                         min(CASE WHEN rk = 31 THEN mean_milli END)
                           AS hi,
                         count(*)::BIGINT AS n_replicas
                  FROM (SELECT b, mean_milli, row_number() OVER (
                          ORDER BY mean_milli, b) AS rk FROM means))
         SELECT tt.n::BIGINT AS n_days, band.n_replicas,
                ((1000 * tt.st) // tt.n)::BIGINT AS point_milli,
                band.lo::BIGINT AS boot_lo_milli,
                band.hi::BIGINT AS boot_hi_milli
         FROM band, tt""",
    "q464_leadlag_ccf" ->
      """WITH dy AS (SELECT epoch_us(ts) // 86400000000 AS day,
                            sum(CASE WHEN event_type = 'click' THEN 1
                                ELSE 0 END)::BIGINT AS x,
                            sum(CASE WHEN event_type = 'purchase' THEN 1
                                ELSE 0 END)::BIGINT AS y
                     FROM events
                     WHERE event_type IN ('click', 'purchase')
                     GROUP BY 1),
         tt AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                       sum(y)::BIGINT AS sy FROM dy),
         c AS (SELECT day, (tt.n * dy.x - tt.sx)::HUGEINT AS a,
                      (tt.n * dy.y - tt.sy)::HUGEINT AS b
               FROM dy, tt),
         den AS (SELECT sum(a * a) AS saa, sum(b * b) AS sbb FROM c),
         l AS (SELECT unnest(range(-7, 8)) AS lag),
         num AS (SELECT l.lag, sum(ca.a * cb.b) AS num,
                        count(*)::BIGINT AS n_pairs
                 FROM l
                 JOIN c ca ON true
                 JOIN c cb ON cb.day = ca.day + l.lag
                 GROUP BY 1),
         r AS (SELECT lag::BIGINT AS lag, n_pairs,
                      sign(num)::BIGINT AS sign,
                      ((1000000 * num * num)
                        // (den.saa * den.sbb))::BIGINT AS r2_ppm
               FROM num, den)
         SELECT lag, n_pairs, sign, r2_ppm,
                row_number() OVER (ORDER BY r2_ppm DESC, lag)::BIGINT
                  AS strength_rank
         FROM r""",
    "q467_dispersion_index" ->
      """WITH d AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           count(*)::BIGINT AS x
                    FROM events GROUP BY 1, 2),
         g AS (SELECT event_type, count(*)::BIGINT AS n,
                      sum(x)::BIGINT AS s,
                      sum(x::HUGEINT * x) AS sxx
               FROM d GROUP BY 1)
         SELECT event_type, n AS n_days, s AS total,
                ((1000 * (n * sxx - s::HUGEINT * s))
                  // (n * s::HUGEINT))::BIGINT AS d_permille,
                ((1000 * (n * sxx - s::HUGEINT * s))
                  // (n * s::HUGEINT)) >= 1500 AS bursty
         FROM g""",
    "q468_mix_decomposition" ->
      """WITH e AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           round(value * 100, 0)::BIGINT AS cents
                    FROM events),
         sp AS (SELECT (min(day) + max(day) + 1) // 2 AS split_day
                FROM e),
         seg AS (SELECT event_type,
                        sum(CASE WHEN day < sp.split_day THEN 1 ELSE 0
                            END)::HUGEINT AS ns1,
                        sum(CASE WHEN day >= sp.split_day THEN 1 ELSE 0
                            END)::HUGEINT AS ns2,
                        sum(CASE WHEN day < sp.split_day THEN cents
                            ELSE 0 END)::HUGEINT AS ss1,
                        sum(CASE WHEN day >= sp.split_day THEN cents
                            ELSE 0 END)::HUGEINT AS ss2
                 FROM e, sp GROUP BY 1),
         tot AS (SELECT sum(ns1)::HUGEINT AS n1, sum(ns2)::HUGEINT AS n2
                 FROM seg)
         SELECT seg.event_type,
                seg.ns1::BIGINT AS n_events_p1,
                seg.ns2::BIGINT AS n_events_p2,
                ((1000 * (seg.ns2 * tot.n1 - seg.ns1 * tot.n2) * seg.ss1)
                  // (tot.n1 * tot.n2 * seg.ns1))::BIGINT AS mix_milli,
                ((1000 * (seg.ns1 * seg.ss2 - seg.ss1 * seg.ns2))
                  // (tot.n1 * seg.ns2))::BIGINT AS rate_milli,
                ((1000 * (seg.ns2 * tot.n1 - seg.ns1 * tot.n2)
                        * (seg.ss2 * seg.ns1 - seg.ss1 * seg.ns2))
                  // (tot.n1 * tot.n2 * seg.ns1 * seg.ns2))::BIGINT
                  AS interaction_milli
         FROM seg, tot""",
    "q469_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         a AS (SELECT sum(CASE WHEN substr(md5('cuped'
                        || user_id::VARCHAR), 1, 1)
                        IN ('0','1','2','3','4','5','6','7')
                        THEN 1 ELSE 0 END)::BIGINT AS n_a,
                      sum(CASE WHEN substr(md5('cuped'
                        || user_id::VARCHAR), 1, 1)
                        IN ('0','1','2','3','4','5','6','7')
                        THEN 0 ELSE 1 END)::BIGINT AS n_b
               FROM u)
         SELECT n_a, n_b,
                (((n_a - n_b) * (n_a - n_b) * 1000)
                  // (n_a + n_b))::BIGINT AS chi2_milli,
                (((n_a - n_b) * (n_a - n_b) * 1000)
                  // (n_a + n_b)) > 3841 AS srm_detected
         FROM a""",
    "q470_simpson_detector" ->
      """WITH e AS (SELECT event_type,
                           round(value * 100, 0)::BIGINT AS cents,
                           CASE WHEN substr(md5('cuped'
                             || user_id::VARCHAR), 1, 1)
                             IN ('0','1','2','3','4','5','6','7')
                             THEN 'A' ELSE 'B' END AS arm
                    FROM events),
         seg AS (SELECT event_type,
                        sum(CASE WHEN arm = 'A' THEN 1 ELSE 0
                            END)::HUGEINT AS na,
                        sum(CASE WHEN arm = 'B' THEN 1 ELSE 0
                            END)::HUGEINT AS nb,
                        sum(CASE WHEN arm = 'A' THEN cents ELSE 0
                            END)::HUGEINT AS sya,
                        sum(CASE WHEN arm = 'B' THEN cents ELSE 0
                            END)::HUGEINT AS syb
                 FROM e GROUP BY 1),
         pooled AS (SELECT sign(sum(sya) * sum(nb)
                           - sum(syb) * sum(na))::BIGINT AS pooled_sign
                    FROM seg)
         SELECT seg.event_type, seg.na::BIGINT AS n_a,
                seg.nb::BIGINT AS n_b,
                sign(seg.sya * seg.nb - seg.syb * seg.na)::BIGINT
                  AS segment_sign,
                pooled.pooled_sign,
                sign(seg.sya * seg.nb - seg.syb * seg.na) <> 0
                  AND sign(seg.sya * seg.nb - seg.syb * seg.na)
                      <> pooled.pooled_sign AS reversed
         FROM seg, pooled"""
  )
}
