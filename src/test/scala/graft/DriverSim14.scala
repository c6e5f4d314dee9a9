package graft

/** Round-14 driver-sim: a BARE session (none of our confs) running the
  * round-14 gated addition end-to-end at sf0.001 — proves the
  * driver-compat contract (tune() applied inside the query fns) for the
  * new query.
  */
object DriverSim14 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("knn_graph_search", "dedup_clusters_compacted",
        "graph_components", "dedup_clusters")) {
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"DRIVER_SIM14 $n rows=$c")
      require(c > 0, s"$n returned no rows")
    }
    println("DRIVER_SIM14_OK")
    spark.stop()
  }
}
