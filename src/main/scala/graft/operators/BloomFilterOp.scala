package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pre-filter — the runtime-filter / semi-join
  * reduction pattern (Spark's own row-level runtime filtering and
  * every warehouse's "bloom pushdown" do exactly this shape):
  *
  *   1. BUILD distributed: each build-side key sets k bits; the
  *      bitmap is assembled with `explode(word,mask)` + `bit_or`
  *      aggregation — a (wordIdx, 64-bit mask)-only shuffle whose
  *      output is exactly `m/64` rows regardless of build size.
  *   2. The finished bitmap (m/64 longs, 128 KiB at m = 2^20) is
  *      pulled to the driver and re-embedded as an array LITERAL —
  *      the same distribute-then-broadcast life cycle as a
  *      broadcast-hash-join's build side, just 1000× smaller.
  *   3. PROBE stays whole-stage-codegen: k × (xxhash64 → pmod →
  *      element_at → shift → mask) on builtin expressions; a row
  *      survives only if all k bits are set.
  *
  * False positives are possible (bounded by (kn/m)^k ≈ 1e-10 at the
  * shipped sizing), false negatives are not — so `prefilter` output
  * MUST flow into the exact join, which silently drops the FPs.
  * At 100 TB this is the difference between shuffling the whole
  * fact table into a join that keeps 4 % of it and shuffling ~4 %:
  * the bloom probe runs map-side, before the exchange.
  *
  * Reference analog: the reference engine joins its KPI facts to
  * selective dimension subsets (glue_job.py KPI joins); this is the
  * operator that makes that join shape survive a 1000-executor fact
  * scan.
  */
object BloomFilterOp {

  /** Number of hash functions. */
  val K = 5
  /** Bitmap size in bits (2^20 → 16384 longs → 128 KiB literal). */
  val M_BITS = 1 << 20

  private val WORDS = M_BITS / 64

  private def hash(i: Int, key: Column): Column =
    pmod(xxhash64(lit(i), key), lit(M_BITS.toLong))

  /** Build the bitmap from the build side's key column. Runs one
    * Spark job (explode → bit_or over `WORDS` groups) and returns
    * the packed words. Driver holds only the 128 KiB result.
    */
  def build(build: DataFrame, buildKey: Column): Array[Long] = {
    val bits = build.select(
      explode(array((0 until K).map { i =>
        val h = hash(i, buildKey)
        struct(
          shiftright(h, 6).as("w"),
          call_function("shiftleft", lit(1L),
            h.bitwiseAND(lit(63L)).cast("int")).as("m"))
      }: _*)).as("b"))
      .select(col("b.w").as("w"), col("b.m").as("m"))
      .groupBy("w").agg(call_function("bit_or", col("m")).as("word"))
      .collect()
    val words = new Array[Long](WORDS)
    bits.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Probe predicate over `probeKey` against a built bitmap: true
    * iff all K bits are set (possible FP, never FN).
    */
  def mightContain(words: Array[Long], probeKey: Column): Column = {
    val arr = lit(words)
    (0 until K).map { i =>
      val h = hash(i, probeKey)
      val word = element_at(arr, (shiftright(h, 6) + 1L).cast("int"))
      call_function("shiftright", word, h.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Map-side pre-filter of `probe` by membership of `probeKey` in
    * `buildKey`s of `build`. Output is a superset of the rows that
    * join (FPs survive; the exact join downstream drops them).
    */
  def prefilter(probe: DataFrame, probeKey: Column,
                build: DataFrame, buildKey: Column): DataFrame =
    probe.filter(mightContain(this.build(build, buildKey), probeKey))
}
