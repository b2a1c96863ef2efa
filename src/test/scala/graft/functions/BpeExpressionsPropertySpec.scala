package graft.functions

import graft.TestSpark
import graft.operators.BpeTrain
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening of the native BPE kernels beyond the
  * word-salad corpus: random symbol arrays (including empty strings,
  * unicode, repeated runs, symbols equal to merge parts) through
  * BpeApplyMerges must equal the SQL-fold composition, and
  * AdjacentPairs must emit exactly the n-1 ordered pairs.
  */
class BpeExpressionsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator failed for seed $seed"))

  // symbols deliberately adversarial for greedy merging: tiny
  // alphabet → long same-symbol runs; ü exercises non-ASCII UTF8
  private val symGen = Gen.oneOf("a", "b", "ab", "ü", "", "x y")
  private val seqGen = Gen.listOfN(24, symGen)
  private val mergeGen = for {
    l <- Gen.oneOf("a", "b", "ab", "ü")
    r <- Gen.oneOf("a", "b", "ü", "")
  } yield (l, r)
  private val mergesGen = Gen.listOfN(4, mergeGen)

  /** Single-node reference (the BpeTrainSpec fold). */
  private def referenceEncode(toks: Array[String],
                              merges: Seq[(String, String)]): Array[String] =
    merges.foldLeft(toks) { case (s, (l, r)) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      s.foreach { x =>
        if (acc.nonEmpty && acc.last == l && x == r) {
          acc.remove(acc.length - 1); acc += s"$l${BpeTrain.Sep}$r"
        } else acc += x
      }
      acc.toArray
    }

  test("BpeApplyMerges ≡ reference fold on adversarial random inputs (20 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 1L to 20L) {
      val syms = sample(seqGen, seed)
      val merges = sample(mergesGen, seed + 500).distinct
      val df = Seq(Tuple1(syms)).toDF("syms")
      val got = BpeTrain.applyMergeAll(df, "syms", merges)
        .select(col("syms")).collect()(0).getSeq[String](0).toArray
      val expect = referenceEncode(syms.toArray, merges)
      assert(got.sameElements(expect),
        s"seed $seed: ${syms.mkString("[", ",", "]")} under $merges: " +
          s"got ${got.mkString(",")} expect ${expect.mkString(",")}")
    }
  }

  test("AdjacentPairs emits exactly n-1 ordered pairs; short arrays emit none") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftColumnBridge
    def pairs(syms: Seq[String]): Seq[String] = {
      val df = Seq(Tuple1(syms)).toDF("syms")
      df.select(GraftColumnBridge.column(
          graft.functions.expressions.AdjacentPairs(
            GraftColumnBridge.expression(col("syms")))).as("p"))
        .collect()(0).getSeq[String](0)
    }
    for (seed <- 1L to 10L) {
      val syms = sample(seqGen, seed)
      val got = pairs(syms)
      assert(got.length == math.max(syms.length - 1, 0))
      val sep = graft.functions.expressions.AdjacentPairs.Sep
      got.zipWithIndex.foreach { case (p, i) =>
        assert(p == s"${syms(i)}$sep${syms(i + 1)}", s"pair $i of $syms")
      }
    }
    assert(pairs(Seq("only")).isEmpty)
    assert(pairs(Seq.empty).isEmpty)
  }
}
