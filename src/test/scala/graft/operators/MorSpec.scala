package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read must agree with a plain Set model under RANDOM
  * interleavings of add / equality-delete / compact commits — and a
  * reader pinned at ANY intermediate version must keep reading that
  * version's exact row set after every later commit, including the
  * compactions that rewrite members underneath it. Deletes may
  * target orphan keys (never added) and already-deleted keys; both
  * must be no-ops, exactly like the model's set subtraction.
  */
class MorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private sealed trait Op
  private case class Add(n: Int) extends Op
  private case class Del(ks: List[Long]) extends Op
  private case object Compact extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.chooseNum(1, 8).map(Add(_)),
    3 -> Gen.listOf(Gen.chooseNum(0L, 60L)).map(ks => Del(ks)),
    2 -> Gen.const(Compact))

  private def morSet(root: String, v: Int): Set[Long] =
    Manifest.readMor(spark, root, v).select("id")
      .as[Long].collect().toSet

  test("readMor equals the Set model under random add/delete/compact sequences") {
    for (seed <- 1L to 6L) {
      val ops = Add(3) :: sample(Gen.listOfN(9, opGen), seed)
      val root = Files.createTempDirectory(s"graft-mor-prop-$seed").toString
      var live = Set.empty[Long]
      var nextId = 0L
      var pins = List.empty[(Int, Set[Long])]
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case Add(n) =>
            val ids = (nextId until nextId + n).toList
            nextId += n
            Manifest.commitAdd(ids.toDF("id"), root, s"a$i")
            live ++= ids
          case Del(ks) =>
            Manifest.commitEqualityDelete(ks.toDF("id"), root, s"d$i", "id")
            live --= ks
          case Compact =>
            Manifest.compactDeletes(spark, root, s"c$i")
        }
        val v = Manifest.currentVersion(root)
        assert(morSet(root, v) == live,
          s"seed=$seed op#$i $op: MOR view diverged from the model")
        pins ::= (v, live)
      }
      // every pin must still read ITS version's rows — later deletes,
      // adds, and compactions notwithstanding
      pins.foreach { case (v, set) =>
        assert(morSet(root, v) == set,
          s"seed=$seed: pinned v$v drifted after later commits")
      }
    }
  }
}
