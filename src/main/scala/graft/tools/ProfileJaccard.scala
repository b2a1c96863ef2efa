package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Collapse, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop profiler: decompose q35_token_jaccard (Dedup.jaccardPairs
  * over the full corpus) into timed stages.
  * Usage: runMain graft.tools.ProfileJaccard [sfDir] [cpus]
  */
object ProfileJaccard {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-jaccard")
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
    (1 to 4).foreach { run =>
      println(s"--- run $run ---")
      val tokens = split(col("text"), " ")
      val sets = Tables(spark, sfDir).documents.select(
        col("doc_id").as("id"),
        array_sort(transform(array_distinct(tokens), t => xxhash64(t))).as("ts"))
      val t0 = System.nanoTime()
      val reps = timed("repLabeled build+persist+count") {
        val r = Collapse.byValue(sets, "ts", "id").labeled
          .withColumn("n", size(col("ts")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.count(); r
      }
      val dsets = reps.filter(col("id") === col("rep"))
        .select(col("id"), col("ts"), col("n"))
      val cand = timed("allPairsCandidates noop") {
        val c = Dedup.allPairsCandidates(dsets, 0.9)
        noop(c); c
      }
      timed("verify noop") {
        noop(cand
          .join(dsets.select(col("id").as("a_id"), col("ts").as("ta"), col("n").as("na")), "a_id")
          .join(dsets.select(col("id").as("b_id"), col("ts").as("tb"), col("n").as("nb")), "b_id"))
      }
      reps.unpersist()
      timed("full jaccardPairs (ckpt inside)")(
        Dedup.jaccardPairs(sets, threshold = 0.9))
      println(f"[profile] TOTAL run $run                 ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      freeBlocks()
    }
    spark.stop()
  }
}
