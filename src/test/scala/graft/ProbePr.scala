package graft
import org.apache.spark.sql.SparkSession

object ProbePr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    SparkEntry.queries("kmeans_assign")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (q <- Seq("graph_pagerank", "graph_triangles"); r <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$q rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
