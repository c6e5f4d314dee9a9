package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: emb_mmr_select wall time at sf0.1 (warmed). */
object ProbeMmr {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val q = args.lift(1).getOrElse("emb_mmr_select")
    SparkEntry.queries(q)(spark, dir).collect() // warm
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).collect()
      println(f"$q ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
