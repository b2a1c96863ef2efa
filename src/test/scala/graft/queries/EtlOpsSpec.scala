package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the ETL/analytics operators (the oracle gate
  * proves engine equality; these prove the contract).
  */
class EtlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q131: exactly one source at hop 0, hops bounded by rounds, BFS triangle inequality") {
    val rows = SparkEntry.queries("q131_bfs_hops")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.count(_ == 0L) == 1)
    assert(rows.values.forall(h => h >= 0L && h <= 5L))
    // on this corpus's dense bigram graph everything is 1-2 hops out
    assert(rows.values.max <= 2L)
  }

  test("q132: every attribution references a real click at or before the purchase, within 24h") {
    val ev = Tables(spark, sf).events
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val rows = SparkEntry.queries("q132_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pT = ev(r.getLong(0))._2
      if (r.getBoolean(4)) {
        val (cType, cT) = ev(r.getLong(3))
        assert(cType == "click")
        assert(cT <= pT && pT - cT <= 86400000000L)
      } else assert(r.isNullAt(3))
    }
  }

  test("q135: decorrelated aggregate form ≡ literal EXISTS (nested-loop) on sf0.001") {
    val t = Tables(spark, sf)
    val expect = t.orders.as("o").join(t.lineitem.as("l"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") > col("o.o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("q135_exists_decorrelated")(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("q136: spine is dense per user — one row per day, no holes, sums preserved") {
    val rows = SparkEntry.queries("q136_gap_fill")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_._2).sorted
      val d0 = java.time.LocalDate.parse(days.head)
      val d1 = java.time.LocalDate.parse(days.last)
      assert(days.length == java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1)
      assert(days.distinct.length == days.length)
    }
    val total = rows.map(_._3).sum
    assert(total == Tables(spark, sf).events.count())
  }

  test("q140: runs partition each user's timeline — lengths sum to type counts, maximality holds") {
    val runs = SparkEntry.queries("q140_event_runs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // run lengths per (user, type) sum to that type's event count
    val sums = runs.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val direct = Tables(spark, sf).events
      .groupBy(col("user_id"), col("event_type")).count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sums == direct)
    // maximality: reconstruct each user's timeline; consecutive runs
    // (by first_event order) must alternate event types
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_id"), col("ts")).collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getTimestamp(2).getTime))
      .toMap
    runs.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (ev(r._4)._2, r._4))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._2 != b._2,
          s"adjacent runs share type ${a._2} — run not maximal")
        case _ =>
      }
    }
  }

  test("q137: statuses partition the key space and counts are consistent") {
    val rows = SparkEntry.queries("q137_snapshot_diff")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, st) = (r.getLong(1), r.getLong(2), r.getString(3))
      st match {
        case "added"   => assert(a == 0 && b > 0)
        case "removed" => assert(b == 0 && a > 0)
        case "same"    => assert(a == b && a > 0)
        case "changed" => assert(a > 0 && b > 0 && a != b)
      }
      assert(b >= a) // append-only fact: counts only grow
    }
  }
}
