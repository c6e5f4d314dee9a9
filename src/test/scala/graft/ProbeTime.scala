package graft
import org.apache.spark.sql.SparkSession
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    names.foreach { n =>
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).collect()
        println(f"[time] $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
