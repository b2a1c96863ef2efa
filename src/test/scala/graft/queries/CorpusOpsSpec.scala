package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the corpus-prep operators that the DuckDB
  * hash oracles cannot express: coverage/reconstruction for chunking,
  * partition-ness for splits, monotone-rate mixing, permutation
  * validity for shuffle shards, and redaction post-conditions.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q72 chunks cover every token and reconstruct the document (overlap removed)") {
    val docs = graft.Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = run("q72_chunk_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3)
      // chunk indices are contiguous from 0
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq)
      // stride-aligned reconstruction: first 40 tokens of every chunk
      // (all tokens of the last) concatenate back to the original
      val rebuilt = ordered.init.map(_.split(" ").take(40))
        .flatten ++ ordered.last.split(" ")
      assert(rebuilt.mkString(" ") == docs(id), s"doc $id")
      // chunk sizes: never more than 50 tokens; every non-last chunk
      // has at least stride+1 = 41 (it must reach past the next start)
      assert(ordered.forall(_.split(" ").length <= 50))
      assert(ordered.init.forall(_.split(" ").length >= 41))
    }
  }

  test("q73 split is a partition with ~75/12.5/12.5 fractions") {
    val rows = run("q73_split_assign").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length == rows.map(_._1).distinct.length) // one verdict per doc
    val byShare = rows.groupBy(_._2).view.mapValues(_.length.toDouble / rows.length).toMap
    assert(byShare.keySet == Set("train", "val", "test"))
    assert(byShare("train") > 0.65 && byShare("train") < 0.85)
    assert(byShare("val") > 0.05 && byShare("val") < 0.20)
    assert(byShare("test") > 0.05 && byShare("test") < 0.20)
  }

  test("q74 mixing keeps higher-weight sources at higher rates, subset of corpus") {
    val total = graft.Tables(spark, sf).documents
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("q74_mix_weighted").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(w: Int): Double = {
      // toSeq: mapping a SET of source names to their (often equal)
      // counts would dedup the counts before summing
      val srcs = total.keys.filter(s => s.drop(3).toInt % 4 == w).toSeq
      srcs.map(s => kept.getOrElse(s, 0L)).sum.toDouble / srcs.map(total).sum
    }
    // weight class 3 keeps everything; rates increase with the class
    assert(rate(3) == 1.0)
    assert(rate(0) < rate(1) && rate(1) < rate(2) && rate(2) < 1.0)
    assert(rate(0) > 0.05 && rate(0) < 0.45) // nominal 0.25
  }

  test("q75 shuffle shards form a permutation: contiguous ranks per shard, every doc once") {
    val rows = run("q75_shuffle_shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = graft.Tables(spark, sf).documents.count()
    assert(rows.length == n && rows.map(_._1).distinct.length == n)
    rows.groupBy(_._2).foreach { case (shard, members) =>
      assert(members.map(_._3).sorted.toSeq == (1L to members.length).toSeq,
        s"shard $shard ranks not contiguous")
    }
  }

  test("q76 redaction removes every planted email/phone and counts them") {
    val rows = run("q76_pii_redact").collect()
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phone = "\\b555-\\d{4}\\b".r
    rows.foreach { r =>
      val red = r.getString(1)
      assert(email.findFirstIn(red).isEmpty, s"email survived in doc ${r.getLong(0)}")
      assert(phone.findFirstIn(red).isEmpty, s"phone survived in doc ${r.getLong(0)}")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 1) // the plants were counted
    }
  }

  test("q77 JSONL round-trip is lossless: ids, sources, token counts all match parquet") {
    val viaJson = run("q77_jsonl_source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val direct = graft.Tables(spark, sf).documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaJson == direct)
  }
}
