package graft

import org.apache.spark.sql.SparkSession

/** r18 optimization-round probe: capture `.explain("formatted")` for a
  * list of declared queries into plans/r18/<name>_<tag>.txt.
  *
  * Same contract as [[PlanDump17]]: the frame is EXECUTED first
  * (collect) so the AdaptiveSparkPlan in the dump is the FINAL plan;
  * session shape mirrors Bench (local[cpus], shuffle.partitions=cpus,
  * tune); prime hooks run first so *_persisted queries dump their
  * steady-state read path.
  *
  * Usage: runMain graft.PlanDump18 <tag> <sfDir> <q1,q2,...|TOP>
  */
object PlanDump18 {
  /** The r18 slice: the adaptive-nlist IVF family, the recall cards,
    * and the remaining verdict items.
    */
  val TOP: Seq[String] = Seq(
    "knn_join", "graph_pagerank", "graph_components", "graph_triangles",
    "graph_linkpred", "dedup_semantic", "kmeans_train", "kmeans_assign",
    "knn_ivf", "knn_ivf_balance", "knn_pq", "knn_recall",
    "dedup_embedding_lsh_recall", "mm_embed_recall", "mm_phash_clusters",
    "knn_ivfpq", "pipeline_prepare_clustered", "mm_embed_dedup",
    "mm_dedup_perceptual", "mm_phash_budget", "pipeline_prepare")

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
      .appName("plandump18")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        new java.io.File("target/spark-local").getAbsolutePath)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r18")
    outDir.mkdirs()
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
