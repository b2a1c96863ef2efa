package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour via IVF (inverted-file index) —
  * the coarse-quantization scale path next to the sign-LSH variant.
  *
  * Index: `nlist` deterministic seed centroids (the vectors with the
  * smallest ids — a placeholder for a k-means pass; the *structure*
  * is what matters: each corpus vector is assigned to its nearest
  * centroid once, a narrow map over a broadcast centroid table).
  *
  * Search: a query probes only its `nprobe` nearest centroid lists,
  * so the pair space shrinks from |corpus| to ~nprobe/nlist of it.
  * Exact re-rank (VecCosine) inside the probed lists.
  */
object Similarity {

  /** The deterministic seed centroids: smallest `nlist` ids. Both
    * index build and search derive centroids from this one rule, so
    * they can never disagree (reconstructing centroids from the
    * assignment column would lose a centroid whose vector duplicates
    * a smaller-id centroid's).
    */
  def centroids(emb: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    emb.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))

  /** Corpus with an `ivf_list` assignment column. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val cents = centroids(emb, idCol, vecCol, nlist)
    val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("centroid_id"))
    emb.crossJoin(broadcast(cents))
      .withColumn("csim", Vec.cosine(col(vecCol), col("cv")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(emb.columns.map(col) :+ col("centroid_id").as("ivf_list"): _*)
  }

  /** Top-k neighbours for each query id, probing `nprobe` lists. */
  def ivfTopK(
      indexed: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame, // single column `query_id`
      nlist: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val cents = centroids(indexed, idCol, vecCol, nlist)
    val queries = indexed.join(queryIds, indexed(idCol) === queryIds("query_id"))
      .select(col("query_id"), col(vecCol).as("qv"))

    // probe assignment: nprobe nearest centroids per query
    val pw = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("centroid_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("csim", Vec.cosine(col("qv"), col("cv")))
      .withColumn("__r", row_number().over(pw))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("ivf_list"))

    // candidate join restricted to probed lists, exact re-rank
    val rw = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col(idCol))
    probes.join(indexed, Seq("ivf_list"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim", Vec.cosine(col("qv"), col(vecCol)))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }
}
