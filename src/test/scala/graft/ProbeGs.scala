package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: run knn_graph_search + the refreshed sketch queries
  * against a dir and print results (fast inner loop before Verify).
  */
object ProbeGs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("probe-gs")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val qs = args.drop(1) match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("knn_graph_search", "approx_distinct_users",
        "approx_quantiles")
    }
    val out = "/tmp/gsv"
    for (q <- qs) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      df.write.mode("overwrite").parquet(s"$out/$q")
      println(f"[probe] $q: written in " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sqls = qs.flatMap(q => SparkEntry.oracleSql.get(q).map(sql =>
      s""""$q": ${ujsonStr(sql)}"""))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      sqls.mkString("{", ",", "}").getBytes("UTF-8"))
    spark.stop()
  }

  private def ujsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => String.format("\\u%04x", Int.box(c.toInt))
      case c => c.toString
    } + "\""
}
