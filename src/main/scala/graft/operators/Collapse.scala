package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Identical-value collapse — the shared discipline behind the exact
  * Jaccard join ([[Dedup.jaccardPairs]], `ts`-array key) and the
  * exact cosine join ([[Similarity.cosineThresholdPairs]], vector
  * key), factored to ONE implementation (round-9 verdict item 4:
  * the two hand-rolled copies had drifted subtly).
  *
  * Why it exists: a 100 TB web corpus is 30-60% exact duplicates,
  * and any similarity that is a pure function of the two values
  * (Jaccard of the sets, cosine of the vectors) is CONSTANT across
  * an identical-value group. So every quadratic pair join should run
  * over DISTINCT values only: one value-keyed window shuffle labels
  * each row with its group's min-id representative, the candidate
  * join sees one row per distinct value, and verdicts expand back to
  * member pairs afterward — exactness preserved, worst-case
  * candidate cost O(distinct²) instead of O(n²).
  *
  * Edge-rule ownership stays with the CALLER: whether an
  * identical-value group pairs with itself (always, for non-empty
  * Jaccard sets; only when the shared vector passes its own
  * self-similarity, for cosine's zero-norm NaN rule) is expressed by
  * the `eligibleReps` frame passed to [[intraPairs]] — the collapse
  * machinery itself is semantics-free.
  */
object Collapse {

  /** The collapse of `df` on `valueCol`: `labeled` carries every row
    * as (rep, id, value) — persist THIS frame when members/distinct
    * are both consumed more than once; the accessors derive from it,
    * so one cache serves all.
    */
  final case class Collapsed(labeled: DataFrame, valueCol: String) {
    /** (rep, id) for every input row — ids only, tiny on the wire. */
    def members: DataFrame = labeled.select(col("rep"), col("id"))

    /** One row per distinct value, carried under its representative's
      * id — the frame the quadratic join runs over.
      */
    def distinct: DataFrame =
      labeled.filter(col("id") === col("rep"))
        .select(col("id"), col(valueCol))
  }

  /** Group equal `valueCol` values under a min-`idCol` representative
    * with ONE value-keyed window shuffle. Output columns are
    * normalized to (rep, id, `valueCol`).
    */
  def byValue(df: DataFrame, valueCol: String, idCol: String): Collapsed = {
    val labeled = df
      .select(col(idCol).as("id"), col(valueCol).as("__cv"))
      .withColumn("rep", min(col("id")).over(Window.partitionBy(col("__cv"))))
      .select(col("rep"), col("id"), col("__cv").as(valueCol))
    Collapsed(labeled, valueCol)
  }

  /** Expand verdicts between representatives to every member cross
    * pair: each (a_id, b_id) rep pair joins both sides' member lists,
    * and the output pair is re-canonicalized to a_id < b_id. Extra
    * payload columns survive untouched; `swapped` marks pairs whose
    * sides reversed during canonicalization so side-specific payloads
    * (set sizes, norms) can swap with it at the call site.
    */
  def expandInterPairs(repPairs: DataFrame, members: DataFrame): DataFrame =
    repPairs
      .join(members.select(col("rep").as("a_id"), col("id").as("__xa")), "a_id")
      .join(members.select(col("rep").as("b_id"), col("id").as("__xb")), "b_id")
      .withColumn("swapped", col("__xa") > col("__xb"))
      .withColumn("a_id", least(col("__xa"), col("__xb")))
      .withColumn("b_id", greatest(col("__xa"), col("__xb")))
      .drop("__xa", "__xb")

  /** All unordered (a_id < b_id) pairs INSIDE each group whose
    * representative appears in `eligibleReps` (a frame keyed by
    * `rep`; its payload columns survive) — the intra-group leg of the
    * expansion. Caller decides eligibility (see class doc).
    */
  def intraPairs(members: DataFrame, eligibleReps: DataFrame): DataFrame =
    eligibleReps
      .join(members.select(col("rep"), col("id").as("__ma")), "rep")
      .join(members.select(col("rep"), col("id").as("__mb")), "rep")
      .filter(col("__ma") < col("__mb"))
      .withColumn("a_id", col("__ma"))
      .withColumn("b_id", col("__mb"))
      .drop("__ma", "__mb")
}
