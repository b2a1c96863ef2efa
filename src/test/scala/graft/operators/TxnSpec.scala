package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract checks for the cross-table transaction log, centered on
  * the r10 verdict/advice items: txn slot claims must be
  * COMPARE-AND-SWAP (two concurrent committers can never silently
  * overwrite each other's record — the lost-update class the
  * manifest CAS closed in r10), and vacuum must be able to honor
  * txn-pinned versions (`Manifest.vacuum(txnRoots = ...)`), with a
  * LOUD named failure — never a partial read — when a pin was
  * vacuumed anyway.
  */
class TxnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-txn-$tag").toString

  private def frame(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")

  test("concurrent txn committers claim DISTINCT slots; no record is lost") {
    import scala.jdk.CollectionConverters._
    for (attempt <- 1 to 4) {
      val root = freshRoot(s"race$attempt")
      val t1 = s"$root/ta"; val t2 = s"$root/tb"
      Manifest.commitAdd(frame(0 until 5), t1, "a1")
      Manifest.commitAdd(frame(0 until 5), t2, "b1")
      val latch = new java.util.concurrent.CountDownLatch(1)
      val results =
        new java.util.concurrent.ConcurrentLinkedQueue[(String, Either[Throwable, Int])]()
      // DIFFERENT pin sets — if one record silently replaced the
      // other, a reader would resolve the surviving committer's pins
      // under the lost committer's id
      val writers = Seq("w1" -> Map(t1 -> 1), "w2" -> Map(t2 -> 1)).map {
        case (name, pins) =>
          new Thread(() => {
            latch.await()
            try results.add(name -> Right(Txn.commit(root, pins)))
            catch { case e: Throwable => results.add(name -> Left(e)) }
          })
      }
      writers.foreach(_.start()); latch.countDown(); writers.foreach(_.join())
      val rs = results.asScala.toMap
      val losers = rs.collect { case (n, Left(e)) => (n, e) }
      assert(losers.isEmpty,
        "both txns must land (slot-claim retry is content-safe): " +
          losers.map { case (n, e) => s"$n: $e" }.mkString("; "))
      val ids = rs.collect { case (_, Right(id)) => id }.toSeq
      assert(ids.toSet.size == 2 && ids.toSet == Set(1, 2),
        s"distinct consecutive slots expected, got $ids")
      // each record survives INTACT under its own id
      val byTable = ids.map(id => Txn.pins(root, id)).map(_.keySet)
      assert(byTable.toSet == Set(Set(t1), Set(t2)),
        s"a txn record was overwritten: $byTable")
    }
  }

  test("readAt resolves each table through the txn's pins; unpinned table is loud") {
    val root = freshRoot("read")
    val t1 = s"$root/ta"; val t2 = s"$root/tb"
    Manifest.commitAdd(frame(0 until 3), t1, "a1")
    Manifest.commitAdd(frame(0 until 7), t2, "b1")
    val id = Txn.commit(root, Map(t1 -> 1, t2 -> 1))
    Manifest.commitAdd(frame(3 until 10), t1, "a2") // post-txn commit
    assert(Txn.readAt(spark, root, id, t1).count() == 3,
      "txn read must pin the pre-commit snapshot")
    val e = intercept[IllegalArgumentException] {
      Txn.readAt(spark, root, id, s"$root/other")
    }
    assert(e.getMessage.contains("does not pin"), e.getMessage)
  }

  test("vacuum(txnRoots) retains txn-pinned versions; an unprotected pin fails LOUDLY") {
    val root = freshRoot("vacuum")
    val table = s"$root/t"
    Manifest.commitAdd(frame(0 until 4), table, "c1")
    val id = Txn.commit(root, Map(table -> 1))
    Manifest.commitAdd(frame(4 until 8), table, "c2")
    Manifest.commitAdd(frame(8 until 12), table, "c3")

    // txn-aware vacuum: v1 is below the keep window but txn-pinned —
    // it must survive, and the txn read stays exact
    val (expired, _) = Manifest.vacuum(table, keepVersions = 1,
      txnRoots = Seq(root))
    assert(!expired.contains(1), s"txn-pinned v1 expired: $expired")
    assert(Txn.readAt(spark, root, id, table).count() == 4)

    // txn-BLIND vacuum expires v1; the pinned reader must then fail
    // with the named vacuum error — never silently read partial data
    val (expired2, _) = Manifest.vacuum(table, keepVersions = 1)
    assert(expired2.contains(1), s"expected v1 to expire: $expired2")
    val e = intercept[IllegalStateException] {
      Txn.readAt(spark, root, id, table).count()
    }
    assert(e.getMessage.contains("VACUUMED"), e.getMessage)
  }

  test("a never-published version stays an IllegalArgumentException, not a vacuum error") {
    val root = freshRoot("missing")
    val table = s"$root/t"
    Manifest.commitAdd(frame(0 until 2), table, "c1")
    val e = intercept[IllegalArgumentException] {
      Manifest.read(spark, table, 9).count()
    }
    assert(e.getMessage.contains("not published"), e.getMessage)
  }
}
