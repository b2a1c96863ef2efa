package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the shared identical-value collapse — the ONE
  * implementation both exact pair joins (Jaccard sets, cosine
  * vectors) now ride, so its contract is proved once: labeling
  * assigns each row its equal-value group's min id; expansion
  * reconstructs exactly the cross/intra member pairs a collapse-free
  * join would have emitted, with the `swapped` flag tracking side
  * reversal.
  */
class CollapseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // small value universe → heavy duplication (the regime the
  // operator exists for); unique ids
  private val rowsGen = for {
    n <- Gen.chooseNum(1, 60)
    vals <- Gen.listOfN(n, Gen.chooseNum(0, 7))
  } yield vals.zipWithIndex.map { case (v, i) =>
    (i.toLong, Seq(v.toLong, (v * 3).toLong)) // array value, like ts/vec
  }

  test("byValue labels every row with its group's min id") {
    for (seed <- 1L to 6L) {
      val rows = sample(rowsGen, seed)
      val c = Collapse.byValue(rows.toDF("id", "val"), "val", "id")
      val labeled = c.labeled.as[(Long, Long, Seq[Long])].collect()
      val expectRep = rows.groupBy(_._2).map { case (v, rs) =>
        v -> rs.map(_._1).min
      }
      assert(labeled.length == rows.length, s"seed=$seed")
      labeled.foreach { case (rep, id, v) =>
        assert(rep == expectRep(v), s"seed=$seed id=$id")
      }
      val dist = c.distinct.as[(Long, Seq[Long])].collect()
      assert(dist.map(_._2).toSet == rows.map(_._2).toSet, s"seed=$seed")
      assert(dist.length == rows.map(_._2).distinct.length, s"seed=$seed")
      dist.foreach { case (id, v) => assert(id == expectRep(v), s"seed=$seed") }
    }
  }

  test("expandInterPairs reconstructs all cross pairs with a correct swapped flag") {
    for (seed <- 7L to 10L) {
      val rows = sample(rowsGen, seed)
      val c = Collapse.byValue(rows.toDF("id", "val"), "val", "id")
      val reps = rows.groupBy(_._2).map { case (_, rs) => rs.map(_._1).min }
        .toSeq.sorted
      if (reps.size >= 2) {
        // every unordered rep pair, tagged with a side-specific payload
        val repPairs = (for {
          i <- reps.indices; j <- (i + 1) until reps.size
        } yield (reps(i), reps(j), s"pa_${reps(i)}", s"pb_${reps(j)}"))
          .toDF("a_id", "b_id", "pa", "pb")
        val got = Collapse.expandInterPairs(repPairs, c.members)
          .select(col("pa"), col("pb"), col("swapped"), col("a_id"), col("b_id"))
          .as[(String, String, Boolean, Long, Long)]
          .collect()
        val groupOf = rows.groupBy(_._2).map { case (v, rs) =>
          rs.map(_._1).min -> rs.map(_._1)
        }
        val expect = (for {
          i <- reps.indices; j <- (i + 1) until reps.size
          ma <- groupOf(reps(i)); mb <- groupOf(reps(j))
        } yield (math.min(ma, mb), math.max(ma, mb),
          ma > mb, s"pa_${reps(i)}", s"pb_${reps(j)}")).toSet
        assert(got.map(r => (r._4, r._5, r._3, r._1, r._2)).toSet == expect,
          s"seed=$seed")
      }
    }
  }

  test("intraPairs emits exactly the eligible groups' internal pairs") {
    for (seed <- 11L to 14L) {
      val rows = sample(rowsGen, seed)
      val c = Collapse.byValue(rows.toDF("id", "val"), "val", "id")
      val groups = rows.groupBy(_._2).map { case (_, rs) => rs.map(_._1) }
      // eligibility: only even-rep groups (an arbitrary caller rule)
      val eligible = groups.map(_.min).filter(_ % 2 == 0).toSeq
        .map(r => (r, s"pl_$r")).toDF("rep", "payload")
      val got = Collapse.intraPairs(c.members, eligible)
        .select(col("rep"), col("payload"), col("a_id"), col("b_id"))
        .as[(Long, String, Long, Long)]
        .collect()
      val expect = groups.filter(_.min % 2 == 0).flatMap { ms =>
        val s = ms.sorted
        for { i <- s.indices; j <- (i + 1) until s.size }
          yield (s.head, s"pl_${s.head}", s(i), s(j))
      }.toSet
      assert(got.toSet == expect, s"seed=$seed")
    }
  }
}
