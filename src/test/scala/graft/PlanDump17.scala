package graft

import org.apache.spark.sql.SparkSession

/** r17 optimization-round probe: capture `.explain("formatted")` for a
  * list of declared queries into plans/r17/<name>_<tag>.txt.
  *
  * The frame is EXECUTED first (collect) so the AdaptiveSparkPlan in the
  * dump is the FINAL plan (AQE hides join-strategy changes and codegen
  * markers until first action — the committed files must show what
  * actually ran, not the initial guess). Session shape mirrors Bench
  * (local[cpus], shuffle.partitions=cpus, tune) so the plans are the
  * bench's plans; prime hooks run first so *_persisted queries dump
  * their steady-state read path, not the one-time build.
  *
  * Usage: runMain graft.PlanDump17 <tag> <sfDir> <q1,q2,...|TOP>
  */
object PlanDump17 {
  /** The bench-cost-ranked slice this round examines plan-by-plan. */
  val TOP: Seq[String] = Seq(
    "knn_graph_search", "graph_components", "dedup_embedding_lsh_recall",
    "mm_embed_recall", "pipeline_prepare_clustered", "mm_phash_clusters",
    "graph_triangles", "pipeline_prepare", "graph_linkpred", "knn_ivfpq",
    "graph_pagerank", "knn_join", "dedup_recall_curve",
    "dedup_embedding_lsh", "mm_embed_dedup", "dedup_ngram_jaccard",
    "dedup_recall", "graph_components_persisted", "graph_components_takedown",
    "sample_split_dedup", "dedup_containment", "mm_embed_neardup",
    "emb_pca2_project", "emb_pca_project", "mm_embed_budget",
    "dedup_keep_best", "dedup_clusters", "emb_pca2", "q38_shipping_delay",
    "graph_components_incremental", "knn_recall_curve", "dedup_weights",
    "knn_ivf_quantized", "emb_mmr_select", "knn_recall", "dq_rules",
    "knn_ivf_balance", "emb_pca_power", "knn_pq", "text_classify_centroid",
    "kmeans_assign", "q64_basket_pairs", "mm_caption_recall", "knn_ivf",
    "emb_spectrum", "q01_agg")

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(2) match {
      case None | Some("TOP") => TOP
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("plandump17")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        new java.io.File("target/spark-local").getAbsolutePath)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r17")
    outDir.mkdirs()
    // steady-state: artifact caches primed exactly as Bench's warmUp does
    Bench.primeHooks.foreach { case (consumers, hook) =>
      if (consumers.exists(names.contains))
        try hook(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[plandump] prime failed: ${e.getMessage}") }
    }
    val qs = SparkEntry.queries
    names.foreach { name =>
      qs.get(name) match {
        case None => System.err.println(s"[plandump] UNKNOWN query $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"plandump:$name")
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            df.collect() // finalize AQE so the dump is the executed plan
            val secs = (System.nanoTime() - t0) / 1e9
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val f = new java.io.File(outDir, s"${name}_$tag.txt")
            java.nio.file.Files.writeString(f.toPath,
              f"-- $name ($tag) sfDir=$sfDir one-shot=${secs}%.2f s\n" + plan)
            System.err.println(f"[plandump] $name%-32s ${secs}%6.2f s")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
