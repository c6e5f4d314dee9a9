package graft

import org.apache.spark.sql.SparkSession

/** Throwaway timing probe for the emb_covariance / emb_pca_power scatter
  * build (sbt "Test/runMain graft.ProbeCov [sfDir]").
  */
object ProbeCov {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.format("noop").mode("overwrite").save()
    for (name <- Seq("emb_covariance", "emb_pca_power"); r <- 1 to 3) {
      val t0 = System.nanoTime
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(s"$name rep $r: ${(System.nanoTime - t0) / 1e9}")
    }
    spark.stop()
  }
}
