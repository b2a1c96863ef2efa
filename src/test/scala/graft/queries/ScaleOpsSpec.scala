package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the scale-shape operators — the contracts the
  * row-hash oracle can't express.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q116: bloom-prefiltered join ≡ plain join on the real tables") {
    val t = Tables(spark, sf)
    val dims = t.orders.filter(col("o_totalprice") >= 480000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = t.lineitem.join(dims, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val bloom = SparkEntry.queries("q116_bloom_join")(spark, sf)
      .select("o_orderpriority", "n_items")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bloom == plain)
  }

  test("q120: purge postcondition — zero tombstone rows survive, audit arithmetic holds") {
    val t = Tables(spark, sf)
    val tomb = ScaleOps.rtbfTombstones(t.events)
    val purged = ScaleOps.rtbfPurge(t.events, col("user_id"), tomb)
    assert(purged.filter(pmod(col("user_id"), lit(7L)) === 3L).count() == 0)
    val audit = SparkEntry.queries("q120_rtbf_purge")(spark, sf).collect()
    assert(audit.length == 2)
    audit.foreach { r =>
      val (before, p, after) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(before == p + after)
      assert(p > 0) // the request batch really touched both tables
    }
    // audit's purged count matches the purged frame it describes
    val evRow = audit.find(_.getString(0) == "events").get
    assert(evRow.getLong(3) == purged.count())
  }

  test("q121: emitted outliers ≡ brute-force IQR fence via percentile()") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("tsu"))
      .withColumn("gap_us", col("tsu") - lag(col("tsu"), 1).over(w))
      .filter(col("gap_us").isNotNull)
    val Array(q1, q3) = gaps
      .agg(expr("percentile(gap_us, 0.25)"), expr("percentile(gap_us, 0.75)"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val brute = gaps
      .filter(col("gap_us") < q1 - 1.5 * (q3 - q1) ||
        col("gap_us") > q3 + 1.5 * (q3 - q1))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("q121_gap_outliers")(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("q118: trailing-7-day distinct ≡ brute-force range filter per day") {
    val ud = Tables(spark, sf).events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val brute = ud.map(_._1).distinct.map { d =>
      d.toString -> ud.filter { case (day, _) =>
        !day.isAfter(d) && !day.isBefore(d.minusDays(6))
      }.map(_._2).distinct.size.toLong
    }.toMap
    val got = SparkEntry.queries("q118_trailing_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute)
  }

  test("q123: overlaps non-negative (zero only for point sessions), out-of-range window empty") {
    val df = SparkEntry.queries("q123_interval_overlap")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0))
    // a zero-measure overlap can only come from a single-event
    // (point) session contained in the window — never from two
    // genuinely-extended intervals that merely touch (those are
    // excluded by the strict half-open predicate)
    val zeroSids = rows.filter(_.getLong(3) == 0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (zeroSids.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val durations = graft.Tables(spark, sf).events
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("tsu"))
        .withColumn("prev", lag(col("tsu"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull || col("tsu") - col("prev") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg((max(col("tsu")) - min(col("tsu"))).as("dur"), count(lit(1)).as("n"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      zeroSids.foreach { k =>
        val (dur, n) = durations(k)
        assert(dur == 0L && n == 1L, s"zero overlap from a non-point session $k")
      }
    }
    assert(!rows.exists(_.getString(2) == "w4")) // calendar window past the data
  }

  test("q126: equi-depth buckets are balanced and cover all rows") {
    val rows = SparkEntry.queries("q126_equidepth_hist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.keySet == (0L to 7L).toSet)
    val total = rows.values.sum
    val n = graft.Tables(spark, sf).events.count()
    assert(total == n)
    // equi-depth on a near-continuous value grid: every bucket within
    // 20% of n/8 (exact equality is impossible with duplicate cents)
    rows.values.foreach(c =>
      assert(math.abs(c - n / 8.0) < n / 8.0 * 0.2, s"bucket sizes $rows"))
  }

  test("q127: banded join ≡ brute-force inequality join") {
    val ev = graft.Tables(spark, sf).events
      .select(col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ai, ac) <- ev; (bi, bc) <- ev
      if ai < bi && math.abs(ac - bc) <= 5
    } yield (ai, bi)).toSet
    val got = SparkEntry.queries("q127_band_join")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("q129: pagerank mass stays bounded, ranks are a permutation, sinks get base mass") {
    val rows = SparkEntry.queries("q129_pagerank_tokens")(spark, sf).collect()
    val ranks = rows.map(_.getLong(2)).sorted
    assert(ranks.toSeq == (1L to rows.length).toSeq) // total order, no ties
    val scale = 1000000000L
    rows.foreach { r =>
      val mass = r.getLong(1)
      assert(mass >= scale * 15L / 100L) // every node keeps the base term
      assert(mass <= scale * rows.length.toLong) // total-mass bound
    }
  }

  test("q130: weighted median splits each group's weight into halves") {
    val ev = graft.Tables(spark, sf).events
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"),
        coalesce(length(col("props")), lit(0)).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("q130_weighted_median")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (tpe, med) =>
      val grp = ev.filter(_._1 == tpe)
      val total = grp.map(_._3).sum
      val below = grp.filter(_._2 < med).map(_._3).sum
      val upTo = grp.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 < total, s"$tpe: strictly-below mass must be < half")
      assert(upTo * 2 >= total, s"$tpe: mass through the median reaches half")
    }
    assert(got.nonEmpty)
  }

  test("q168: HLL estimates land within ±5% of exact; union row covers the global distinct") {
    val rows = SparkEntry.queries("q168_hll_sketch")(spark, sf).collect()
    val perType = rows.filter(_.getString(0) != "ALL")
    assert(perType.nonEmpty)
    perType.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= 0.05 * exact + 1,
        s"${r.getString(0)}: HLL estimate $est vs exact $exact out of envelope")
    }
    val all = rows.filter(_.getString(0) == "ALL")
    assert(all.length == 1)
    val globalExact = Tables(spark, sf).events
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(all(0).getLong(1) - globalExact) <= 0.05 * globalExact + 1,
      "union-of-sketches estimate out of envelope vs global exact")
  }

  test("q169: CMS never underestimates; overshoot bounded by eps * stream length") {
    val ev = Tables(spark, sf).events
    val n = ev.count()
    val rows = SparkEntry.queries("q169_cms_freq")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"user ${r.getLong(0)}: CMS must never underestimate")
      assert(est <= exact + math.max(1L, (0.0001 * 3 * n).toLong),
        s"user ${r.getLong(0)}: overshoot $est vs $exact beyond 3x eps*N")
    }
  }

  test("q175: approx quantiles land within rank error of the exact quantiles") {
    val rows = SparkEntry.queries("q175_approx_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sf).events
    rows.foreach { r =>
      val tpe = r.getString(0)
      val vals = ev.filter(col("event_type") === tpe)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      Seq(0.50 -> r.getDouble(1), 0.90 -> r.getDouble(2),
        0.99 -> r.getDouble(3)).foreach { case (q, est) =>
        // rank of the estimate must sit within ±1% (plus ties) of q
        val below = vals.count(_ < est).toDouble / vals.length
        val upTo = vals.count(_ <= est).toDouble / vals.length
        assert(below - 0.01 <= q && q <= upTo + 0.01,
          s"$tpe p$q: estimate $est has rank window [$below,$upTo]")
      }
    }
  }

  test("q171: two-phase rank is a bijection onto 1..N and ordered by (value, event_id)") {
    val got = SparkEntry.queries("q171_global_rank")(spark, sf)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getLong(2)).toSeq == (1L to got.length.toLong),
      "ranks must be exactly 1..N")
    val sorted = got.map(r => (r.getDouble(1), r.getLong(0))).toSeq
    assert(sorted == sorted.sorted, "rank order must equal (value, event_id) order")
  }

  test("q192: approx_top_k counts are exact while the vocab fits the sketch") {
    val exact = Tables(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q192_approx_topk")(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(exact(r.getString(0)) == r.getLong(1),
        s"token ${r.getString(0)}: sketch count ${r.getLong(1)} != exact")
    }
    // the emitted set is a true top-10: every emitted count >= every
    // omitted count (ties at the boundary may swap members, so
    // compare counts, not membership)
    val minEmitted = got.map(_.getLong(1)).min
    val omitted = exact.keySet -- got.map(_.getString(0)).toSet
    assert(omitted.forall(t => exact(t) <= minEmitted))
  }
}
