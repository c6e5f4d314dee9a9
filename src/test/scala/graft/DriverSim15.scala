package graft

/** Round-15 driver-sim: a BARE session (none of our confs) running the
  * round's changed/added gated queries end-to-end at sf0.001 — proves
  * the driver-compat contract (tune() applied inside the query fns)
  * for the rewritten walk, the newly-gated sketches, and the capped
  * pair reports + budget cards.
  */
object DriverSim15 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("knn_graph_search", "approx_distinct_users",
        "approx_quantiles", "dedup_embedding", "dedup_embedding_budget",
        "dedup_embedding_lsh", "mm_embed_neardup", "mm_embed_budget",
        "mm_dedup_perceptual", "mm_phash_budget")) {
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"DRIVER_SIM15 $n rows=$c")
      require(c > 0, s"$n returned no rows")
    }
    println("DRIVER_SIM15_OK")
    spark.stop()
  }
}
