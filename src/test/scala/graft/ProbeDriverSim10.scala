package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: driver-sim — a BARE session (no graft tuning beyond
  * what SparkEntry applies itself) running entry() plus a spread of
  * round-10 queries, incl. an events query (nanos/NTZ branch) and the
  * persisted-graph family.
  */
object ProbeDriverSim10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    require(n > 0, "entry must return rows")
    for (q <- Seq("q20_sessionize", "q55_min_cost_supplier", "dq_rules",
        "graph_linkpred_persisted", "sample_epochs", "text_langid_eval",
        "knn_recall_curve", "emb_mmr_select")) {
      val c = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"$q rows=$c")
      require(c > 0, s"$q empty")
    }
    println("driver-sim OK")
    spark.stop()
  }
}
