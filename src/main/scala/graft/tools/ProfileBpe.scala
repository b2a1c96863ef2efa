package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.BpeTrain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop profiler for q167_bpe_encode (train + encode).
  * Usage: runMain graft.tools.ProfileBpe [sfDir] [cpus]
  */
object ProfileBpe {
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-bpe")
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
    (1 to 5).foreach { run =>
      val t0 = System.nanoTime()
      val docs = Tables(spark, sfDir).documents
        .repartition(spark.sparkContext.defaultParallelism)
      val tTrain0 = System.nanoTime()
      val merges = BpeTrain.train(docs, "text", k = 6)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val tTrain = (System.nanoTime() - tTrain0) / 1e9
      val tEnc0 = System.nanoTime()
      noop(BpeTrain.encode(docs.select(col("doc_id"), col("text")), "text", merges)
        .select(col("doc_id"), col("n_syms_before"), col("n_syms_after"),
          concat_ws(" ", col("syms")).as("encoded")))
      val tEnc = (System.nanoTime() - tEnc0) / 1e9
      println(f"[profile] run $run train=$tTrain%7.3f encode=$tEnc%7.3f total=${(System.nanoTime() - t0) / 1e9}%7.3f s")
      freeBlocks()
    }
    spark.stop()
  }
}
