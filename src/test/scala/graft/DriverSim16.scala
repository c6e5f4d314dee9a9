package graft

/** Round-16 driver-sim: a BARE session (none of our confs) running the
  * round's changed/added gated queries end-to-end at sf0.001 — proves
  * the driver-compat contract (tune() applied inside the query fns)
  * for the new LSH recall card, the re-sized ObjectHashAggregate
  * fallback threshold (TopEdges paths), and the celladj-bounded walk.
  */
object DriverSim16 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("dedup_embedding_lsh_recall", "dedup_embedding_lsh",
        "knn_join", "knn_graph_search", "graph_nndescent",
        "dedup_substring_apply")) {
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"DRIVER_SIM16 $n rows=$c")
      require(c > 0, s"$n returned no rows")
    }
    println("DRIVER_SIM16_OK")
    spark.stop()
  }
}
