package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL surface matches the Column API for the native expressions") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.limit(50).createOrReplaceTempView("e_sql")

    val viaSql = spark.sql(
      """SELECT a.vec_id qa, b.vec_id qb, vec_cosine(a.embedding, b.embedding) c
         FROM e_sql a JOIN e_sql b ON a.vec_id < b.vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaCol = {
      val a = emb.limit(50).select(col("vec_id").as("qa"), col("embedding").as("va"))
      val b = emb.limit(50).select(col("vec_id").as("qb"), col("embedding").as("vb"))
      a.crossJoin(b).filter(col("qa") < col("qb"))
        .select(col("qa"), col("qb"),
          graft.functions.Vec.cosine(col("va"), col("vb")).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    assert(viaSql == viaCol)

    val sh = spark.sql(
      "SELECT simhash64(transform(split('a b c', ' '), t -> xxhash64(t))) v")
      .collect().head.getLong(0)
    assert(sh != 0L)

    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 5L, 7L, 9L)) v")
      .collect().head.getLong(0)
    assert(ic == 2L)

    val dl = spark.sql(
      "SELECT vec_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) v")
      .collect().head.getLong(0)
    assert(dl == 32L)

    // shingle_hashes64 SQL ≡ the ShingleHashes64 the dedup core uses
    val shg = spark.sql(
      "SELECT shingle_hashes64('a b c d', 2) v").collect().head
      .getSeq[Long](0)
    assert(shg.length == 3, "3 distinct 2-gram shingles of 4 tokens")

    // adjacent_pairs: n-1 separator-encoded pairs, order preserved
    val ap = spark.sql(
      "SELECT adjacent_pairs(split('x y z', ' ')) v").collect().head
      .getSeq[String](0)
    assert(ap.length == 2 && ap(0).startsWith("x") && ap(0).endsWith("y"))
  }

  test("SQL inputs coerce to the declared element types (no silent stride misreads)") {
    GraftFunctions.register(spark)
    // int arrays → array<long> via ImplicitCastInputTypes
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1, 2, 3), array(2, 3, 4)) v")
      .collect().head.getLong(0)
    assert(ic == 2L)
    // double arrays → array<float>; orthogonal vectors → cosine 0
    val c = spark.sql(
      "SELECT vec_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) v")
      .collect().head.getDouble(0)
    assert(c == 0.0)
    // incompatible element type fails analysis, not runtime garbage
    intercept[Exception] {
      spark.sql("SELECT vec_cosine(array('a'), array('b'))").collect()
    }
  }

  test("minhash_sig rejects a non-literal numPerm with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql(
        """SELECT minhash_sig(transform(split('a b', ' '), t -> xxhash64(t)), vec_id)
           FROM parquet.`/root/testdata/sf0.001/embeddings.parquet` LIMIT 1""")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("numPerm must be an integer literal")),
      e.getMessage)
  }

  test("minhash_sig honors a literal numPerm") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_sig(transform(split('a b c', ' '), t -> xxhash64(t)), 8) v")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8)
  }

  test("nfc_normalize: composed ≡ decomposed; ASCII passes through untouched") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('caf\u00e9') = nfc_normalize('cafe\u0301') AS eq, " +
        "nfc_normalize('plain ascii') AS a, " +
        "length(nfc_normalize('cafe\u0301')) AS n")
      .collect().head
    assert(r.getBoolean(0), "NFC must unify composed and decomposed forms")
    assert(r.getString(1) == "plain ascii")
    assert(r.getInt(2) == 4, "decomposed pair must compose to one char")
  }

  test("deflate_len: deterministic, repetitive text compresses below prose") {
    GraftFunctions.register(spark)
    val rep = "spam " * 200
    val prose = (1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val r = spark.sql(
      s"SELECT deflate_len('$rep') AS a, deflate_len('$rep') AS a2, " +
        s"deflate_len('$prose') AS b").collect().head
    assert(r.getLong(0) == r.getLong(1), "must be run-to-run identical")
    assert(r.getLong(0) < r.getLong(2),
      "repetitive text must compress below varied text of similar length")
    assert(r.getLong(0) > 0)
    // q235 end-to-end: ratio in (0, ~1.1], two runs identical
    val q = graft.SparkEntry.queries("q235_deflate_ratio")(
      spark, "/root/testdata/sf0.001")
    val rows = q.collect().map(r2 => r2.getLong(0) -> r2.getDouble(3)).toMap
    assert(rows.values.forall(v => v > 0 && v < 1.2))
    val again = graft.SparkEntry.queries("q235_deflate_ratio")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r2 => r2.getLong(0) -> r2.getDouble(3)).toMap
    assert(rows == again)
  }

  test("topk_agg: heap merge across partitions ≡ window top-k; nulls ignored; small groups") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 1000 values across 8 partitions per group; planted ties at the
    // k boundary (every value appears twice)
    val df = (1L to 1000L).map(i => ("g" + (i % 3), i / 2))
      .toDF("g", "v").repartition(8)
    df.createOrReplaceTempView("tk_in")
    val got = spark.sql(
      "SELECT g, topk_agg(v, 5) AS tk FROM tk_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val exp = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(_._2).sorted(Ordering[Long].reverse).take(5).toSeq
      }
    assert(got == exp)
    // nulls ignored; group smaller than k returns all its values
    val small = spark.sql(
      """SELECT topk_agg(v, 10) FROM VALUES (1L), (CAST(NULL AS LONG)), (3L) t(v)""")
      .collect().head.getSeq[Long](0)
    assert(small == Seq(3L, 1L))
  }

  test("excise_positions: merge walk ≡ the filter/array_contains formulation") {
    import org.apache.spark.sql.GraftColumnBridge
    import spark.implicits._
    def excise(toks: org.apache.spark.sql.Column,
        rm: org.apache.spark.sql.Column) =
      GraftColumnBridge.column(graft.functions.expressions.ExcisePositions(
        GraftColumnBridge.expression(toks), GraftColumnBridge.expression(rm)))
    // corpus-driven A/B: every doc removes a deterministic pseudo-
    // random position subset (sorted, distinct — the q479 shape)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("rm", array_sort(array_distinct(filter(
        transform(sequence(lit(1), size(col("toks"))),
          i => when(pmod(xxhash64(col("doc_id"), i), lit(3)) === 0, i)),
        x => x.isNotNull))))
    val ab = docs.select(
        excise(col("toks"), col("rm")).as("fast"),
        filter(col("toks"),
          (_, i) => !array_contains(col("rm"), i + 1)).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(ab.isEmpty, "merge walk diverged from the reference lambda")
    // edge cases: empty rm (keep all), full cover (drop all),
    // out-of-range positions (never match), null rm (null out)
    val edge = Seq(
      (Seq("a", "b", "c"), Some(Seq.empty[Int]), Some(Seq("a", "b", "c"))),
      (Seq("a", "b", "c"), Some(Seq(1, 2, 3)), Some(Seq.empty[String])),
      (Seq("a", "b", "c"), Some(Seq(0, 2, 9)), Some(Seq("a", "c"))),
      (Seq("a", "b", "c"), None, None))
      .toDF("toks", "rm", "want")
    val bad = edge.filter(not(
      excise(col("toks"), col("rm")) <=> col("want")))
    assert(bad.isEmpty, "edge case diverged")
  }
}
