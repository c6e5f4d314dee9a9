package graft

import org.apache.spark.sql.SparkSession

// throwaway: stage-level timing of knn_lsh at sf0.1
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PERF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    time("warm_full")(SparkEntry.queries("knn_lsh")(spark, dir).write.format("noop").mode("overwrite").save())
    time("run2_full")(SparkEntry.queries("knn_lsh")(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
