package graft

/** Round-17 driver-sim: a BARE session (none of our confs) running the
  * round's changed gated queries end-to-end at sf0.001 — the
  * probe-bounded recall cards (EvalProbe), the rank-capped decontam
  * bench slice, and the mm_embed_dedup tiers whose feature vectors now
  * flow through the MediaEncoder seam (must stay bit-identical under
  * the default GramHistogramEncoder).
  */
object DriverSim17 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("dedup_embedding_lsh_recall", "mm_embed_recall",
        "decontam_embedding", "mm_embed_dedup",
        "mm_embed_dedup_persisted", "knn_join",
        // r17 optimization round: the driver-side PCA trainer family
        "emb_pca_power", "emb_pca_project", "emb_pca2",
        "emb_pca2_project", "emb_spectrum")) {
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"DRIVER_SIM17 $n rows=$c")
      require(c > 0, s"$n returned no rows")
    }
    println("DRIVER_SIM17_OK")
    spark.stop()
  }
}
