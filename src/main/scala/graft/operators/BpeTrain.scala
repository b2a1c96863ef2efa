package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE-style merge training (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", 2016) at
  * token grain: each round counts adjacent symbol pairs across the
  * corpus, promotes the most frequent pair to a new merged symbol,
  * and re-segments every sequence greedily left-to-right.
  *
  * The distributed shape is the standard one for iterative
  * vocabulary induction:
  *   - pair counting is a corpus-wide explode + hash aggregate
  *     (map-side partials; only (pair, count) rows shuffle);
  *   - the argmax is ONE row pulled to the driver per round — the
  *     same broadcast-a-scalar lifecycle as k-means centroids;
  *   - merge application is a per-row `aggregate` fold (greedy
  *     left-to-right, so "a a a" under merge (a,a) becomes
  *     "(aa) a" — the accumulator's last element is already the
  *     merged symbol and cannot re-merge);
  *   - sequences are localCheckpointed per round, otherwise round k
  *     would recompute every previous fold on each action.
  *
  * Determinism: argmax ties break on (count desc, left asc, right
  * asc); the fold is order-deterministic per sequence. Not SQL-
  * expressible (an iterative stateful fold), so the driver gate is
  * rows-only; BpeTrainSpec proves the merge table equals a
  * single-node reference implementation.
  */
object BpeTrain {

  /** Separator inside merged symbols; must not occur in input
    * tokens (asserted on a corpus sample at train start).
    */
  val Sep = "+"

  /** Train `k` merges over `docs(textCol)` (whitespace-tokenized).
    * Returns one row per merge: (rank, left, right, pair_count),
    * rank 1 = first merge learned.
    */
  def train(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    require(k >= 1, s"k must be >= 1, got $k")
    // ONE corpus materialization up front; the exact (full-scan)
    // separator collision guard — a sampled check would let a
    // late-occurring separator silently alias merged symbols with
    // real tokens — runs CONCURRENTLY with it on a second driver
    // thread (guide §2.6): both are independent full passes over the
    // text column, so the train start pays max of the two, not the sum
    val (seqs0, _) = graft.util.Par.both(
      docs.select(split(col(textCol), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .localCheckpoint(),
      require(docs.filter(col(textCol).contains(Sep)).limit(1).count() == 0,
        s"separator '$Sep' occurs in input tokens — pick another"))
    // Per-round state is a VIRTUAL frame: the base checkpoint plus the
    // merges learned since (one native BpeApplyMerges fold — cheap per
    // row) instead of a re-materialization of the whole corpus every
    // round. Round r's counting pass then costs one base scan + an
    // r-merge fold, and the fold depth is re-zeroed by a real
    // checkpoint every `refoldBound` merges so the per-pass work stays
    // O(refoldBound · corpus) at any k — the re-fold is native
    // (~ns/symbol) while a per-round corpus write+read is orders of
    // magnitude heavier at 100 TB.
    val refoldBound = spark.conf
      .get("spark.graft.bpe.refoldBound", "8").toInt
    var ckpt = seqs0
    var pending = List.empty[(String, String)]
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val seqs =
        if (pending.isEmpty) ckpt
        else applyMergeAll(ckpt, "syms", pending.reverse)
      // native pair extraction (AdjacentPairs): the per-round corpus
      // pass; the -encoded pair's lexicographic order equals
      // the (l, r) tuple order, so tie-breaks are unchanged
      import org.apache.spark.sql.GraftColumnBridge
      val top = seqs
        .select(explode(GraftColumnBridge.column(
          graft.functions.expressions.AdjacentPairs(
            GraftColumnBridge.expression(col("syms"))))).as("p"))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("p"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val parts = top(0).getString(0)
          .split(graft.functions.expressions.AdjacentPairs.Sep, 2)
        val (l, r, c) = (parts(0), parts(1), top(0).getLong(1))
        merges += ((rank, l, r, c))
        pending = (l, r) :: pending
        if (pending.length >= refoldBound) {
          ckpt = applyMergeAll(ckpt, "syms", pending.reverse).localCheckpoint()
          pending = Nil
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("pair_count"))
  }

  /** Apply ONE merge (l, r) to an array-of-symbols column — the
    * greedy left-to-right pass shared by training's re-segmentation
    * and tokenizer APPLICATION (encode). Native (BpeApplyMerges):
    * the SQL-fold twin below costs an interpreted lambda call per
    * ELEMENT per round, which dominated the train loop.
    */
  def applyMerge(df: DataFrame, symsCol: String, l: String, r: String): DataFrame =
    applyMergeAll(df, symsCol, Seq((l, r)))

  /** Apply an ordered merge TABLE to an existing array column — the
    * encode core without the tokenize step (one native expression
    * regardless of table size).
    */
  def applyMergeAll(df: DataFrame, symsCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    df.withColumn(symsCol, GraftColumnBridge.column(
      graft.functions.expressions.BpeApplyMerges(
        GraftColumnBridge.expression(col(symsCol)), merges, Sep)))
  }

  /** The SQL higher-order-function form of applyMerge — kept as the
    * A/B reference the specs compare the native expression against.
    */
  def applyMergeSql(df: DataFrame, symsCol: String, l: String, r: String): DataFrame = {
    // Spark SQL string literals treat backslash as an escape —
    // escape it FIRST, then the quote
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val lq = esc(l)
    val rq = esc(r)
    df.withColumn(symsCol, expr(
      s"""aggregate($symsCol, cast(array() as array<string>),
            (acc, x) -> CASE
              WHEN size(acc) > 0 AND element_at(acc, -1) = '$lq' AND x = '$rq'
              THEN concat(slice(acc, 1, size(acc) - 1),
                          array('$lq$Sep$rq'))
              ELSE concat(acc, array(x)) END)"""))
  }

  /** Tokenizer APPLICATION: segment each doc with an already-trained
    * merge table (rank order = application order, exactly as during
    * training). The merge table is tokenizer-sized (k rows) — it
    * lives in the PLAN inside one native expression, not in a join,
    * so encode is a pure narrow map over the corpus: the right shape
    * for re-tokenizing 100 TB under a frozen vocabulary.
    *
    * The hot loop is `BpeApplyMerges` (native, one virtual call per
    * row); `encodeComposed` keeps the k-chained-SQL-folds form as
    * the A/B reference (BpeTrainSpec proves them identical).
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs
      .withColumn("syms0", split(col(textCol), " "))
      .withColumn("syms", GraftColumnBridge.column(
        graft.functions.expressions.BpeApplyMerges(
          GraftColumnBridge.expression(col("syms0")), merges, Sep)))
      .withColumn("n_syms_before", size(col("syms0")).cast("long"))
      .withColumn("n_syms_after", size(col("syms")).cast("long"))
      .drop("syms0")
  }

  /** The composed (k chained SQL folds) encode — interpreted per
    * element; kept as the A/B twin for the native expression.
    */
  def encodeComposed(docs: DataFrame, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val base = docs
      .withColumn("syms", split(col(textCol), " "))
      .withColumn("n_syms_before", size(col("syms")).cast("long"))
    merges.foldLeft(base) { case (df, (l, r)) => applyMergeSql(df, "syms", l, r) }
      .withColumn("n_syms_after", size(col("syms")).cast("long"))
  }
}
