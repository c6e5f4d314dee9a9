package graft

/** Round-13 driver-sim: a BARE session (none of our confs) running every
  * round-13 gated addition end-to-end at sf0.001 — proves the
  * driver-compat contract (tune() applied inside the query fns) for the
  * new queries.
  */
object DriverSim13 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = Seq(
      "graph_components_incremental", "graph_nndescent",
      "mm_embed_dedup_persisted", "knn_ivfpq_persisted",
      "dedup_clusters_takedown", "graph_components_takedown")
    for (n <- names) {
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"DRIVER_SIM13 $n rows=$c")
      require(c > 0, s"$n returned no rows")
    }
    println("DRIVER_SIM13_OK")
    spark.stop()
  }
}
