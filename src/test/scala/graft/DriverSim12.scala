package graft

/** Round-12 driver-sim: a BARE session (none of our confs) running every
  * round-12 addition end-to-end at sf0.001 — proves the driver-compat
  * contract (tune() applied inside the query fns) for the new queries.
  */
object DriverSim12 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = Seq(
      "dedup_clusters_persisted", "dedup_keep_best_persisted",
      "dedup_weights_persisted", "sample_split_dedup_persisted",
      "dedup_lexsem_persisted", "pipeline_prepare_clustered_persisted",
      "dedup_substring_apply", "mm_embed_dedup", "mm_audio_neardup",
      "text_search_phrase_pos", "mm_caption_recall", "q63_dau_wau",
      "dq_drift", "mm_embed_recall", "dedup_clusters_incremental")
    for (n <- names) {
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"DRIVER_SIM12 $n rows=$c")
      require(c > 0, s"$n returned no rows")
    }
    println("DRIVER_SIM12_OK")
    spark.stop()
  }
}
