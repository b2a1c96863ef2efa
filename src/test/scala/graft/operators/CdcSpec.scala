package graft.operators

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Cdc.applyChanges must BE the MERGE matrix — checked on random
  * snapshots and change feeds (including orphan updates/deletes,
  * insert collisions, and keys absent from both sides) against a
  * plain Scala Map fold of the documented semantics.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // snapshot: keys 0..n with values; feed: random ops over a key
  // range OVERLAPPING but not equal to the snapshot's (orphans +
  // fresh inserts guaranteed)
  private val caseGen = for {
    nSnap <- Gen.chooseNum(0, 30)
    snap <- Gen.listOfN(nSnap, for {
      k <- Gen.chooseNum(0L, 40L)
      v <- Gen.chooseNum(-100L, 100L)
    } yield (k, v))
    nCh <- Gen.chooseNum(0, 30)
    ch <- Gen.listOfN(nCh, for {
      k <- Gen.chooseNum(0L, 60L)
      op <- Gen.oneOf("D", "U", "I")
      v <- Gen.chooseNum(-100L, 100L)
    } yield (k, op, v))
  } yield (snap.distinctBy(_._1), ch.distinctBy(_._1))

  private def reference(
      snap: Seq[(Long, Long)],
      ch: Seq[(Long, String, Long)]): Set[(Long, Long, String)] = {
    val snapMap = snap.toMap
    val chMap = ch.map(c => c._1 -> c).toMap
    val survivors = snap.flatMap { case (k, v) =>
      chMap.get(k) match {
        case Some((_, "D", _))  => None
        case Some((_, _, nv))   => Some((k, nv, "updated")) // U and matched I
        case None               => Some((k, v, "kept"))
      }
    }
    val inserts = ch.collect {
      case (k, "I", nv) if !snapMap.contains(k) => (k, nv, "inserted")
    }
    (survivors ++ inserts).toSet
  }

  test("applyChanges equals the reference MERGE fold on random feeds") {
    for (seed <- 1L to 8L) {
      val (snap, ch) = sample(caseGen, seed)
      val got = Cdc.applyChanges(
          snap.toDF("k", "v"), ch.toDF("k", "op", "v"), "k", Seq("v"))
        .as[(Long, Long, String)].collect().toSet
      assert(got == reference(snap, ch),
        s"seed=$seed\n got=${got.toSeq.sortBy(_._1)}\nwant=${reference(snap, ch).toSeq.sortBy(_._1)}")
    }
  }

  test("a multi-change key fails loud, never a nondeterministic merge") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val ch = Seq((1L, "U", 11L), (1L, "U", 12L)).toDF("k", "op", "v")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap, ch, "k", Seq("v"))
    }
    assert(e.getMessage.contains("multiple rows"), e.getMessage)
  }

  test("matched insert upserts (idempotent), never duplicates the key") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val ch = Seq((1L, "I", 99L)).toDF("k", "op", "v")
    val got = Cdc.applyChanges(snap, ch, "k", Seq("v"))
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 99L, "updated")), got.toString)
  }
}
