package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** GroupedRank must be EXACTLY the window it replaces — on random
  * data, including ties, skewed groups, empty order ranges, and
  * partition counts that don't divide the data. Property-checked
  * against the single-task `row_number()`/`lag()` reference with
  * seeded scalacheck generators (sampled directly — scalatestplus
  * isn't on the offline classpath).
  */
class GroupedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (group, value) rows: few groups, heavy ties, skewed sizes
  private def rowsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.chooseNum(1, 400)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c", "hot")
      v <- Gen.chooseNum(0L, 20L) // dense → many ties
    } yield (g, v))
  } yield rows

  test("withRank equals the per-group window row_number on random data") {
    for (seed <- 1L to 5L) {
      val rows = sample(rowsGen, seed).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
      val df = rows.toDF("grp", "v", "id")
      val got = GroupedRank.withRank(df, Seq("grp"),
          Seq(col("v"), col("id")), "rk", parts = 7)
        .select("grp", "v", "id", "rk").as[(String, Long, Long, Long)]
        .collect().toSet
      val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
      val want = df.withColumn("rk", row_number().over(w).cast("long"))
        .select("grp", "v", "id", "rk").as[(String, Long, Long, Long)]
        .collect().toSet
      assert(got == want, s"seed=$seed: ${(got -- want).take(3)} vs " +
        s"${(want -- got).take(3)}")
    }
  }

  test("withGlobalRank equals the global window row_number") {
    val rows = sample(rowsGen, 42L).zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }
    val df = rows.toDF("grp", "v", "id")
    val got = GroupedRank.withGlobalRank(df, Seq(col("v"), col("id")),
        "rk", parts = 5)
      .select("v", "id", "rk").as[(Long, Long, Long)].collect().toSet
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("v", "id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("withGlobalLag equals the global window lag, boundaries stitched") {
    for (seed <- 10L to 13L) {
      // unique keys (lag over a total order)
      val keys = sample(rowsGen, seed).map(_._2).zipWithIndex
        .map { case (v, i) => v * 1000L + i }
      val df = keys.toDF("k")
      val got = GroupedRank.withGlobalLag(df, col("k"), "prev", parts = 6)
        .select("k", "prev").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toSet
      val want = df.withColumn("prev",
          lag(col("k"), 1).over(Window.orderBy(col("k"))))
        .select("k", "prev").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("single row, single group, parts > rows") {
    val df = Seq(("x", 9L, 0L)).toDF("grp", "v", "id")
    val got = GroupedRank.withRank(df, Seq("grp"),
      Seq(col("v"), col("id")), "rk", parts = 8)
    assert(got.select("rk").as[Long].collect().toSeq == Seq(1L))
  }

  test("withRunningTotal equals the global window running sum") {
    for (seed <- 20L to 23L) {
      val rows = sample(rowsGen, seed).zipWithIndex
        .map { case ((_, v), i) => (v * 7L - 60L, i.toLong) } // ± values
      val df = rows.toDF("delta", "id")
      val got = GroupedRank.withRunningTotal(df,
          Seq(col("delta"), col("id")), col("delta"), "run", parts = 6)
        .select("delta", "id", "run").as[(Long, Long, Long)]
        .collect().toSet
      val want = df.withColumn("run",
          sum(col("delta")).over(Window.orderBy(col("delta"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("delta", "id", "run").as[(Long, Long, Long)]
        .collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("withRunningTotal fails loud on duplicate order tuples and null values") {
    val dup = Seq((1L, 1L), (1L, 1L), (2L, 1L)).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      GroupedRank.withRunningTotal(dup, Seq(col("k")), col("v"), "run",
        parts = 2)
    }
    assert(e1.getMessage.contains("not TOTAL"))
    val nul = Seq((1L, Some(1L)), (2L, None), (3L, Some(2L)))
      .toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      GroupedRank.withRunningTotal(nul, Seq(col("k")), col("v"), "run",
        parts = 2)
    }
    assert(e2.getMessage.contains("nulls"))
  }

  test("withRunningTotal fails loud on a fractional value column") {
    // a DoubleType value would be silently truncated by the long
    // casts in the offsets and the per-partition cumsum — the guard
    // must reject it eagerly, before any job runs
    val frac = Seq((1L, 0.5), (2L, 1.5)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      GroupedRank.withRunningTotal(frac, Seq(col("k")), col("v"), "run",
        parts = 2)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("withRunningTotal boundary stitching under adversarial partitioning") {
    // parts ≈ rows/2 forces MANY range partitions over FEW rows —
    // most partitions hold 0–2 rows, so nearly every row sits at a
    // prefix-offset boundary (including empty partitions between
    // occupied ones). The stitched result must still be exactly the
    // single-task window, for every seed.
    for (seed <- 30L to 35L) {
      val rows = sample(rowsGen, seed).zipWithIndex
        .map { case ((_, v), i) => (v * 13L - 130L, i.toLong) } // ± values
      val df = rows.toDF("delta", "id")
      val p = math.max(rows.size / 2, 2)
      val got = GroupedRank.withRunningTotal(df,
          Seq(col("delta"), col("id")), col("delta"), "run", parts = p)
        .select("delta", "id", "run").as[(Long, Long, Long)]
        .collect().toSet
      val want = df.withColumn("run",
          sum(col("delta")).over(Window.orderBy(col("delta"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("delta", "id", "run").as[(Long, Long, Long)]
        .collect().toSet
      assert(got == want, s"seed=$seed parts=$p")
    }
  }

  test("withRank fails loud when the order is not total (duplicate tuples)") {
    // two identical ("a", 5) order tuples — boundary ranks would be
    // nondeterministic, so the precondition guard must throw, naming
    // the group
    val df = Seq(("a", 5L), ("a", 5L), ("a", 7L), ("b", 1L))
      .toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      GroupedRank.withRank(df, Seq("grp"), Seq(col("v")), "rk", parts = 3)
        .count()
    }
    assert(e.getMessage.contains("not TOTAL"))
    assert(e.getMessage.contains("grp=a"))
    assert(e.getMessage.contains("tiebreak"))
  }

  test("scaledMidranks equals twice the brute-force average rank, ties included") {
    for (seed <- 40L to 45L) {
      val rows = sample(rowsGen, seed).map(_._2) // heavy-tie values
      val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .repartition(7) // adversarial: value runs split across parts
      val got = GroupedRank.scaledMidranks(df, col("v"), "s2")
        .as[(Long, Long)].collect().toMap
      // brute force: 2 × average 1-based rank of each value's run
      val sorted = rows.sorted
      val want = sorted.zipWithIndex.groupBy(_._1).map { case (v, rs) =>
        v -> rs.map { case (_, i) => i.toLong + 1 }.sum * 2 / rs.size
      }
      assert(got == want, s"seed=$seed: got=${got.toSeq.sorted.take(5)} " +
        s"want=${want.toSeq.sorted.take(5)}")
      // the defining invariant: Σ over ROWS of s2 = 2·Σ 1..n = n(n+1)
      val n = rows.size.toLong
      val total = rows.map(got).sum
      assert(total == n * (n + 1), s"seed=$seed: Σs2=$total ≠ n(n+1)")
    }
  }

  test("withGlobalLag fails loud on a nullable order column with nulls") {
    // nulls range-sort into the first partition while the bounds max
    // ignores them — the guard must reject instead of mis-stitching
    val df = Seq(Some(3L), None, Some(9L), Some(1L), None)
      .toDF("k")
    val e = intercept[IllegalArgumentException] {
      GroupedRank.withGlobalLag(df, col("k"), "prev", parts = 3).count()
    }
    assert(e.getMessage.contains("2 null"))
    assert(e.getMessage.contains("filter or coalesce"))
  }
}
