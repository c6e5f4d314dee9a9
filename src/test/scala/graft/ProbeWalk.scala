package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: isolate knn_graph_search's walk-only cost from the
  * one-time graph-artifact build at a given sf dir (the sweep's REPS=1
  * run attributes the build to whichever query touches the session
  * cache first).
  */
object ProbeWalk {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("probe-walk")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm session
    spark.read.parquet(s"$dir/embeddings.parquet").write
      .format("noop").mode("overwrite").save()
    time("build (first cache touch: knn_graph_search rep1)") {
      SparkEntry.queries("knn_graph_search")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 2 to 4) time(s"walk-only rep$i") {
      SparkEntry.queries("knn_graph_search")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
