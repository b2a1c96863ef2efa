package graft.operators

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Resample.locfGrid must equal a per-key sorted-scan reference —
  * checked on random irregular series with duplicate timestamps,
  * single-event keys, and multi-slot gaps.
  */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (key, order, tie, value): dense order range → duplicate orders
  // within slots; slotWidth 10 → multi-slot gaps common
  private val seriesGen = for {
    n <- Gen.chooseNum(1, 120)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf(1L, 2L, 3L)
      // negative orders INCLUDED: truncating div vs floorDiv disagree
      // exactly there (slots around zero) — the generator must cross
      // zero or the floor-division contract goes untested
      o <- Gen.chooseNum(-200L, 200L)
      v <- Gen.chooseNum(-50L, 50L)
    } yield (k, o, v))
  } yield rows.zipWithIndex.map { case ((k, o, v), i) => (k, o, i.toLong, v) }

  private def reference(rows: Seq[(Long, Long, Long, Long)], width: Long)
      : Set[(Long, Long, Long, Boolean)] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      // per-slot last observation by (order, tie, value) max
      val bySlot = rs.groupBy(r => Math.floorDiv(r._2, width))
        .map { case (slot, srs) =>
          slot -> srs.maxBy(r => (r._2, r._3, r._4))._4
        }
      val (mn, mx) = (bySlot.keys.min, bySlot.keys.max)
      var last = 0L
      (mn to mx).map { slot =>
        val obs = bySlot.get(slot)
        obs.foreach(last = _)
        (k, slot, last, obs.isEmpty)
      }
    }.toSet

  test("locfGrid equals the sorted-scan reference on random series") {
    for (seed <- 1L to 8L) {
      val rows = sample(seriesGen, seed)
      val got = Resample.locfGrid(rows.toDF("k", "o", "tie", "v"),
          "k", "o", "tie", "v", slotWidth = 10L)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(got == reference(rows, 10L), s"seed=$seed")
    }
  }

  test("a non-positive slot width fails loud") {
    val df = Seq((1L, 1L, 1L, 1L)).toDF("k", "o", "tie", "v")
    val e = intercept[IllegalArgumentException] {
      Resample.locfGrid(df, "k", "o", "tie", "v", slotWidth = 0L)
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }
}
