package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{BucketedIndex, Dedup, Manifest}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop profiler #2: the q484 fold's incrementalClusters phase
  * decomposed ACTION BY ACTION (the inline body of
  * incrementalClustersDeltaBy), with a job/stage/task-counting
  * listener so per-action fixed overhead is visible, plus a trivial-
  * action calibration. Usage: runMain graft.tools.ProfileFold2 [sfDir] [cpus]
  */
object ProfileFold2 {
  @volatile private var jobs = 0
  @volatile private var stages = 0
  @volatile private var tasks = 0

  private def timed[T](name: String)(f: => T): T = {
    val (j0, s0, t0c) = (jobs, stages, tasks)
    val t0 = System.nanoTime()
    val r = f
    println(f"[p2] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s  " +
      f"jobs=${jobs - j0}%3d stages=${stages - s0}%3d tasks=${tasks - t0c}%5d")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-fold2")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    })
    val docs = Tables(spark, sfDir).documents
    val tau = 0.9; val kb = 16
    def sets(df: DataFrame) =
      df.select(col("doc_id").as("id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          tk => xxhash64(tk))).as("ts"))
        .withColumn("n", size(col("ts")))
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft-profile2-q484-p" + ProcessHandle.current().pid()).toString
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
    // calibration: fixed cost of a trivial action at `cpus` partitions
    timed("calib: 10x trivial ckpt 32p") {
      (1 to 10).foreach(_ => spark.range(0, 1000, 1, cpus).toDF("x").localCheckpoint())
    }
    timed("calib: 10x trivial ckpt 1p") {
      (1 to 10).foreach(_ => spark.range(0, 1000, 1, 1).toDF("x").localCheckpoint())
    }
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
    (1 to 3).foreach { run =>
      println(s"--- run $run ---")
      val t0 = System.nanoTime()
      val delta = docs.filter(col("doc_id") % 5 === 4)
      val ds = timed("delta shingle + ckpt")(sets(delta).localCheckpoint())
      val pref = timed("prunedBasePrefixes")(
        Dedup.prunedBasePrefixes(spark, s"$root/prefixes",
          Manifest.currentVersion(s"$root/prefixes"), ds, tau, kb))
      val cross = timed("crossJaccardPairsStored (eager cand)")(
        Dedup.crossJaccardPairsStored(spark, ds, s"$root/sets",
          Manifest.currentVersion(s"$root/sets"), tau, pref, kb))
      val inner = timed("inner jaccardPairs (eager)")(
        Dedup.jaccardPairs(ds.select(col("id"), col("ts")), tau)
          .select("a_id", "b_id"))
      val baseLabels = Manifest.read(spark, s"$root/labels",
        Manifest.currentVersion(s"$root/labels"))
      val deltaIds = delta.select("doc_id")
      val deltaPairs = cross.unionByName(inner)

      // ── inline incrementalClustersDeltaBy, action by action ──
      val p = timed("p = pairs ckpt (verify legs run)")(
        deltaPairs.select(col(deltaPairs.columns.head).as("a"),
          col(deltaPairs.columns(1)).as("b")).localCheckpoint())
      val dIds = timed("dIds ckpt")(
        deltaIds.select(col(deltaIds.columns.head).as("id")).localCheckpoint())
      timed("disjointness guard isEmpty")(
        require(baseLabels.select(col("doc_id").as("id"))
          .join(broadcast(dIds), Seq("id"), "left_semi").isEmpty))
      val endpoints = timed("endpoints ckpt")(
        p.select(col("a").as("id"))
          .unionByName(p.select(col("b").as("id"))).distinct()
          .localCheckpoint())
      val lab = baseLabels
        .select(col("doc_id").as("id"), col("cluster_id").as("lab"))
        .unionByName(dIds.select(col("id"), col("id").as("lab")))
      val labTouched = timed("labTouched ckpt")(
        lab.join(broadcast(endpoints), Seq("id"), "left_semi").localCheckpoint())
      timed("missing count")(
        require(endpoints.join(labTouched, Seq("id"), "left_anti").count() == 0))
      val contracted = timed("contracted ckpt")(
        p.join(labTouched.select(col("id").as("a"), col("lab").as("la")), "a")
          .join(labTouched.select(col("id").as("b"), col("lab").as("lb")), "b")
          .filter(col("la") =!= col("lb"))
          .select(col("la"), col("lb")).distinct()
          .localCheckpoint())
      val touched = timed("touched ckpt")(
        contracted.select(col("la").as("id"))
          .unionByName(contracted.select(col("lb").as("id"))).distinct()
          .localCheckpoint())
      println(s"[p2]   |contracted|=${contracted.count()} |touched|=${touched.count()}")
      // duplicateClusters inline
      val edges = timed("cc: edges ckpt")(
        contracted.select(col("la").as("s"), col("lb").as("d"))
          .union(contracted.select(col("lb").as("s"), col("la").as("d")))
          .localCheckpoint())
      var labels = timed("cc: labels0 ckpt")(
        touched.select(col("id"), col("id").as("label")).localCheckpoint())
      var round = 0
      var converged = false
      while (!converged && round <= 50) {
        val minNbr = edges.join(labels.withColumnRenamed("id", "s"), "s")
          .groupBy(col("d").as("id")).agg(min(col("label")).as("nbr"))
        val joined = timed(s"cc: round $round joined ckpt")(
          labels.join(minNbr, Seq("id"), "left").localCheckpoint())
        if (timed(s"cc: round $round isEmpty")(
          joined.filter(col("nbr") < col("label")).isEmpty)) converged = true
        else {
          labels = timed(s"cc: round $round labels ckpt")(
            joined.select(col("id"),
              least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
              .localCheckpoint())
          round += 1
        }
      }
      val mapping = timed("mapping ckpt (sizes join)")(
        {
          val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
          labels.join(sizes, "label")
            .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
        }.select(col("doc_id").as("old_lab"), col("cluster_id").as("new_lab"))
          .localCheckpoint())
      val oldSizes = baseLabels.select(col("cluster_id").as("old_lab"),
          col("cluster_size")).distinct()
        .join(broadcast(touched.select(col("id").as("old_lab"))),
          Seq("old_lab"), "left_semi")
        .unionByName(dIds.select(col("id").as("old_lab"),
          lit(1L).as("cluster_size"))
          .join(broadcast(touched.select(col("id").as("old_lab"))),
            Seq("old_lab"), "left_semi"))
      val newSizes = timed("newSizes ckpt")(
        oldSizes.join(broadcast(mapping), Seq("old_lab"))
          .groupBy(col("new_lab"))
          .agg(sum(col("cluster_size")).as("cluster_size"))
          .localCheckpoint())
      val relabeledBase = baseLabels
        .join(broadcast(mapping.withColumnRenamed("old_lab", "cluster_id")),
          Seq("cluster_id"))
        .select(col("doc_id"), col("new_lab").as("cluster_id"))
      val relabeledDelta = dIds
        .join(broadcast(mapping.withColumnRenamed("old_lab", "id")), Seq("id"))
        .select(col("id").as("doc_id"), col("new_lab").as("cluster_id"))
      val merged = relabeledBase.unionByName(relabeledDelta)
        .join(broadcast(newSizes.withColumnRenamed("new_lab", "cluster_id")),
          Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      val deltaSingles = dIds
        .join(broadcast(touched), Seq("id"), "left_anti")
        .select(col("id").as("doc_id"), col("id").as("cluster_id"),
          lit(1L).as("cluster_size"))
      val changed = merged.unionByName(deltaSingles)
      val untouched = baseLabels
        .join(broadcast(touched.select(col("id").as("cluster_id"))),
          Seq("cluster_id"), "left_anti")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      val out = untouched.unionByName(changed)
      timed("final noop")(
        out.write.mode("overwrite").format("noop").save())
      println(f"[p2] TOTAL run $run                 ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      freeBlocks()
    }
    spark.stop()
  }
}
