package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: time dedup_ngram_jaccard vs dedup_containment at a
  * given SF (default sf0.1) after a warm-up, 3 reps each. */
object ProbeCont {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // warm-up
    spark.read.parquet(s"$dir/documents.parquet")
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("dedup_exact")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (q <- Seq("dedup_ngram_jaccard", "dedup_containment"); r <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$q rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
