package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: round-11 driver-sim — a BARE session (no graft
  * tuning beyond what SparkEntry applies itself) running entry() plus
  * the round-11 additions, incl. an events query (encoding branch) and
  * the session-cached graph reads.
  */
object ProbeDriverSim11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    require(n > 0, "entry must return rows")
    for (q <- Seq("q62_late_priority_split", "q63_dau_wau",
        "graph_labelprop", "graph_embeddedness", "text_lm_heldout",
        "knn_pq_distortion", "emb_spectrum", "dq_volume_anomaly",
        "knn_ivf_balance", "corpus_dup_rate", "dedup_recall_curve",
        "knn_ivf_residuals", "q64_basket_pairs")) {
      val c = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"$q rows=$c")
      require(c > 0, s"$q empty")
    }
    println("driver-sim OK")
    spark.stop()
  }
}
