package graft

import org.apache.spark.sql.SparkSession

/** r18 stage-attribution probe for pipeline_prepare_clustered (VERDICT
  * item #6): time each composed stage separately — quality+exact-dedup
  * checkpoint, shingle checkpoint, jaccard pair join, connected
  * components, final anti-join+summary — so the optimization targets
  * the measured floor instead of a guess.
  *
  * Usage: runMain graft.ProbePipeline [sfDir] [reps]
  */
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        new java.io.File("target/spark-local").getAbsolutePath)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // untimed warm-up (first-action init lands on the session, not a stage)
    spark.read.parquet(s"$dir/documents.parquet")
      .write.format("noop").mode("overwrite").save()

    (1 to reps).foreach { rep =>
      System.err.println(s"[probe] --- rep $rep ---")
      spark.sparkContext.setJobDescription("probe:stages")
      val (deduped, sh) = t("stages (dedup+shingle ckpt)") {
        val r = Pipe.stagesProbe(spark, dir)
        (r._1, r._2)
      }
      spark.sparkContext.setJobDescription("probe:pairs")
      val pairs = t("jaccard pairs (ckpt)") {
        graft.Checkpoint.of(
          graft.dedup.Dedup.jaccardPairs(sh, graft.dedup.Dedup.TAU)
            .select(col("a_id").as("u"), col("b_id").as("v")))
      }
      spark.sparkContext.setJobDescription("probe:cc")
      val labels = t("connected components") {
        graft.dedup.Dedup.connectedComponents(pairs)
      }
      spark.sparkContext.setJobDescription("probe:final")
      t("anti-join + summary") {
        val drops = labels.filter(col("label") < col("id"))
          .select(col("id").as("doc_id"))
        deduped.join(drops, Seq("doc_id"), "left_anti")
          .groupBy(col("lang"),
            graft.text.Sampling.splitLabel(col("text")).as("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("total_chars"))
          .orderBy("lang", "split")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

/** Test-side accessor for Pipelines' private stage builder. */
object Pipe {
  def stagesProbe(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    graft.text.Pipelines.stagesForProbe(s, dir)
}
