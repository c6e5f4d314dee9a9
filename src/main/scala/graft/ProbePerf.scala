package graft

import org.apache.spark.sql.SparkSession

// throwaway: where does cold pipeline_prepare time go now?
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PERF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // same untimed warmup Bench does
    import org.apache.spark.sql.functions.col
    spark.range(1000).repartition(4).groupBy(col("id") % 7).count()
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$dir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    val df = time("build_ckpts")(SparkEntry.queries("pipeline_prepare")(spark, dir))
    time("exec")(df.write.format("noop").mode("overwrite").save())
    val df2 = time("build2")(SparkEntry.queries("pipeline_prepare")(spark, dir))
    time("exec2")(df2.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
