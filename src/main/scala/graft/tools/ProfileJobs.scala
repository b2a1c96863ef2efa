package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Job/stage/task census per headline query: runs each query twice
  * (noop sink) and reports the WARM run's wall time next to its job /
  * stage / task counts — separates fixed-overhead-bound queries (many
  * tiny jobs) from compute-bound ones.
  * Usage: runMain graft.tools.ProfileJobs [sfDir] [cpus] [q1,q2,...]
  */
object ProfileJobs {
  @volatile private var jobs = 0
  @volatile private var stages = 0
  @volatile private var tasks = 0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-jobs")
    sys.env.get("SPARK_GRAFT_MINPART").foreach { v =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    })
    val qs = SparkEntry.queries
    val names = if (args.length > 2) args(2).split(",").toSeq
      else Seq("q02_filter_pushdown", "q07_dedup_keyed", "q10_song_counts",
        "q12_top_songs", "q116_bloom_join", "q121_gap_outliers",
        "q127_band_join", "q150_dpp", "q162_bookmark_ingest",
        "q171_global_rank", "q190_fuzzy_match", "q196_semantic_contamination",
        "q251_triangle_count", "q257_kcore_peel", "q271_novelty_score",
        "q306_id_gaps", "q312_cooccur_topk", "q324_session_concurrency",
        "q334_cdc_merge", "q341_locf_resample", "q35_token_jaccard",
        "q36_minhash_lsh", "q37_simhash", "q38_ngram_jaccard",
        "q41_embedding_neardup", "q437_knn_graph", "q448_label_propagation",
        "q44_ann_ivf", "q462_covariate_matching", "q471_perceptual_neardup",
        "q50_stream_hourly", "q71_cosine_neardup_lsh", "q92_rare_bigrams",
        "q119_span_dedup", "q115_tfidf", "q124_pmi_bigrams")
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
    qs("q01_scan_project")(spark, sfDir).count()
    names.foreach { name =>
      qs.get(name).foreach { fn =>
        def once(): (Double, Int, Int, Int) = {
          val (j0, s0, t0c) = (jobs, stages, tasks)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          freeBlocks()
          ((System.nanoTime() - t0) / 1e9, jobs - j0, stages - s0, tasks - t0c)
        }
        once()
        val (t, j, s, tk) = once()
        println(f"[jobs] $name%-32s ${t}%7.3f s  jobs=$j%3d stages=$s%3d tasks=$tk%5d")
      }
    }
    spark.stop()
  }
}
