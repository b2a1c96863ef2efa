package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{BucketedIndex, Dedup, Manifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop profiler: decompose q484_incremental_fold_stored's per-run
  * fold into timed stages (base fixture built once per process, like
  * the bench). Usage: runMain graft.tools.ProfileFold [sfDir] [cpus]
  */
object ProfileFold {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-fold")
    val docs = Tables(spark, sfDir).documents
    val tau = 0.9; val kb = 16
    def sets(df: DataFrame) =
      df.select(col("doc_id").as("id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          tk => xxhash64(tk))).as("ts"))
        .withColumn("n", size(col("ts")))
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft-profile-q484-p" + ProcessHandle.current().pid()).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    timed("base fixture build") {
      val base = docs.filter(col("doc_id") % 5 =!= 4)
      val bs = sets(base).localCheckpoint()
      BucketedIndex.commitBucketed(bs, s"$root/sets", "base", Seq("id"), kb)
      BucketedIndex.commitBucketed(Dedup.jaccardPrefixes(bs, tau),
        s"$root/prefixes", "base", Seq("t"), kb)
      Manifest.commitAdd(
        Dedup.duplicateClusters(
          Dedup.jaccardPairs(bs.select(col("id"), col("ts")), tau)
            .select("a_id", "b_id"),
          base.select("doc_id")),
        s"$root/labels", "base")
    }
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
    (1 to 5).foreach { run =>
      println(s"--- run $run ---")
      val t0 = System.nanoTime()
      val delta = docs.filter(col("doc_id") % 5 === 4)
      val ds = timed("delta shingle + ckpt")(sets(delta).localCheckpoint())
      val pref = timed("prunedBasePrefixes (lazy+collect)")(
        Dedup.prunedBasePrefixes(spark, s"$root/prefixes",
          Manifest.currentVersion(s"$root/prefixes"), ds, tau, kb))
      val cross = timed("crossJaccardPairsStored")(
        Dedup.crossJaccardPairsStored(spark, ds, s"$root/sets",
          Manifest.currentVersion(s"$root/sets"), tau, pref, kb))
      timed("cross noop")(noop(cross))
      val inner = timed("inner jaccardPairs (ckpt inside)")(
        Dedup.jaccardPairs(ds.select(col("id"), col("ts")), tau)
          .select("a_id", "b_id"))
      val labels = timed("labels Manifest.read (lazy)")(
        Manifest.read(spark, s"$root/labels",
          Manifest.currentVersion(s"$root/labels")))
      val outFold = timed("incrementalClusters (build)")(
        Dedup.incrementalClusters(labels, delta.select("doc_id"),
          cross.unionByName(inner)))
      timed("final noop")(noop(outFold))
      println(f"[profile] TOTAL run $run             ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      freeBlocks()
    }
    spark.stop()
  }
}
