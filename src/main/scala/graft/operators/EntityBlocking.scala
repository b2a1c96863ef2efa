package graft.operators

import graft.functions.expressions.CharGrams64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Lossless CANDIDATE GENERATION for edit-distance matching — the
  * blocking stage of entity resolution (reference capability:
  * fuzzy-matching the string-keyed dimensions `glue_job.py:51-58`
  * joins on, done at corpus scale).
  *
  * The naive match is the all-pairs grid: every record against every
  * record, O(n^2) banded-DP evaluations — fine on a vocabulary-
  * bounded name set, fatal at 100 TB. This operator generates a
  * PROVABLY COMPLETE superset of the `<= maxEdits` pairs from three
  * necessary conditions, so the expensive verify (banded
  * levenshtein) runs on candidates only:
  *
  *  1. **Length filter** — `abs(|a| - |b|) <= k` (each edit changes
  *     length by at most 1).
  *  2. **q-gram count filter** (Gravano et al., approximate string
  *     joins over q-gram multisets): one edit destroys at most `q`
  *     of a string's character q-grams counted WITH multiplicity,
  *     so `ED(a,b) <= k` forces
  *     `|G(a) ∩multi G(b)| >= max(|G(a)|,|G(b)|) - k*q`.
  *     [[CharGrams64]] encodes occurrence counts into the gram
  *     hashes, turning multiset intersection into plain equality.
  *  3. **AllPairs prefix filter** over (2): if two multisets must
  *     share `t` elements, their `(size - t + 1)`-prefixes under ONE
  *     global total order must intersect. With `t >= max - k*q`, a
  *     fixed `k*q + 1` prefix suffices for BOTH sides. The global
  *     order is (document frequency asc, gram hash asc) — the
  *     classic AllPairs discipline ([[Dedup.jaccardPrefixes]] uses
  *     raw hash order; here rare-first ordering matters because
  *     gram frequencies are Zipfian, and prefixing on the RAREST
  *     grams keeps every join bucket small as the corpus grows).
  *
  * Pairs where BOTH sides have `<= k*q` grams (strings of length
  * `<= k*q + q - 1`) make bound (2) vacuous — they are paired
  * exhaustively within the length window instead (the "shorts"
  * bucket, broadcast-joined; with the default q=3, k=2 that is
  * names of <= 8 chars — negligible against real entity names).
  *
  * Default `q = 3`, not 2: the 2-gram alphabet saturates at ~729
  * symbols, so on a growing corpus every 2-gram's document
  * frequency grows linearly and prefix buckets quadratically —
  * 3-gram diversity tracks the corpus VOCABULARY instead (rare
  * word → rare grams), which is what keeps rare-first prefix
  * buckets bounded as data grows (measured in ErScaleGuardSpec:
  * q=2 grew 86x on a 10x corpus, q=3 stays near-linear).
  *
  * Scale shape: one narrow gram pass, one gram-keyed DF aggregate,
  * one id-keyed re-collect, then an equi-join that shuffles
  * `(id, len, gram)` prefix rows only — `k*q + 1` rows per record,
  * never payloads, never a cross join. Candidate volume is
  * sum-over-rare-grams of bucket products; with DF-ordered prefixes
  * it tracks corpus gram diversity instead of n^2 (the
  * ErScaleGuardSpec pins sub-quadratic growth on a 10x corpus).
  */
object EntityBlocking {

  /** Positional-multiset char q-gram hashes (see [[CharGrams64]]). */
  def charGrams(c: Column, q: Int = 2): Column =
    GraftColumnBridge.column(
      CharGrams64(GraftColumnBridge.expression(c), q))

  /** Candidate `(a_id, b_id)` pairs (`a_id < b_id`) — a lossless
    * superset of all pairs within `maxEdits` edit distance on
    * `nameCol`. `idCol` must be unique per name (callers collapse
    * identical names first — the [[Collapse]] discipline).
    */
  def edCandidatePairs(
      names: DataFrame,
      idCol: String,
      nameCol: String,
      maxEdits: Int = 2,
      q: Int = 3): DataFrame = {
    val (prefix, shorts) = prefixFrames(names, idCol, nameCol, maxEdits, q)
    val lenOk = abs(col("a.len") - col("b.len")) <= maxEdits
    val main = prefix.as("a").join(prefix.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id") && lenOk)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    val shortPairs = shorts.as("a").join(broadcast(shorts.as("b")),
        col("a.id") < col("b.id") && lenOk)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    main.unionByName(shortPairs).distinct()
  }

  /** CROSS-SIDE candidate pairs between a DELTA batch and a standing
    * BASE — the incremental entity-resolution shape (daily records
    * matched against the master without re-pairing base×base, the
    * [[Dedup.crossJaccardPairs]] discipline applied to edit
    * distance). Both sides' prefixes are computed under ONE global
    * (document frequency, gram) order derived from the UNION — the
    * prefix-filter theorem needs a single total order across sides.
    * Output: (a_id ∈ delta, b_id ∈ base), lossless for
    * `ED <= maxEdits`. Ids may repeat across sides (they live in
    * different tables).
    */
  def edCandidatePairsCross(
      delta: DataFrame,
      base: DataFrame,
      idCol: String,
      nameCol: String,
      maxEdits: Int = 2,
      q: Int = 3): DataFrame = {
    val sideTagged = delta.select(col(idCol), col(nameCol))
      .withColumn("__side", lit("d"))
      .unionByName(base.select(col(idCol), col(nameCol))
        .withColumn("__side", lit("b")))
    // one prefix pass over the union (shared DF order), split after
    val (prefix, shorts) = prefixFrames(
      sideTagged.withColumn("__sid",
        concat(col("__side"), lit("|"), col(idCol).cast("string"))),
      "__sid", nameCol, maxEdits, q)
    def side(df: DataFrame, s: String): DataFrame =
      df.filter(substring(col("id"), 1, 1) === s)
        .withColumn("rid", expr("substring(id, 3)"))
    val lenOk = abs(col("a.len") - col("b.len")) <= maxEdits
    val main = side(prefix, "d").as("a")
      .join(side(prefix, "b").as("b"), col("a.t") === col("b.t") && lenOk)
      .select(col("a.rid").as("a_id"), col("b.rid").as("b_id"))
    val shortPairs = side(shorts, "d").as("a")
      .join(broadcast(side(shorts, "b").as("b")), lenOk)
      .select(col("a.rid").as("a_id"), col("b.rid").as("b_id"))
    main.unionByName(shortPairs).distinct()
  }

  /** The shared blocking frames: DF-ordered AllPairs prefixes (the
    * only rows the candidate join shuffles — `k*q + 1` per record)
    * and the vacuous-bound shorts bucket (`<= k*q` grams: no shared
    * gram required at `ED <= k`, paired exhaustively by callers).
    */
  private def prefixFrames(
      names: DataFrame,
      idCol: String,
      nameCol: String,
      maxEdits: Int,
      q: Int): (DataFrame, DataFrame) = {
    require(maxEdits >= 1, s"edCandidatePairs: maxEdits=$maxEdits must be >= 1")
    val kq = maxEdits * q
    val g = names
      .select(col(idCol).as("id"), length(col(nameCol)).as("len"),
        charGrams(col(nameCol), q).as("gs"))
      .withColumn("m", size(col("gs")))
    // DF-ordered AllPairs prefixes: explode once, count gram document
    // frequency, re-collect each record's grams sorted rare-first,
    // keep the first kq+1
    val ex = g.select(col("id"), col("len"), explode(col("gs")).as("t"))
    val dfreq = ex.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfreq, "t")
      .groupBy(col("id"), col("len"))
      .agg(slice(array_sort(collect_list(struct(col("df"), col("t")))),
        1, kq + 1).as("ps"))
      .select(col("id"), col("len"), explode(col("ps")).as("e"))
      .select(col("id"), col("len"), col("e.t").as("t"))
    val shorts = g.filter(col("m") <= kq).select(col("id"), col("len"))
    (prefix, shorts)
  }
}
