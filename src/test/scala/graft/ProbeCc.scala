package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/gendata/sf1")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[32]").appName("probe-cc")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val h = graft.Checkpoint.of(
      graft.multimodal.Multimodal.perceptualHashes(spark, dir))
    val pairs = graft.Checkpoint.of(
      graft.multimodal.Multimodal.perceptualPairs(h, 12, 8))
    println(s"[cc-probe] pairs=${pairs.count()}")
    val t0 = System.nanoTime()
    val labels = graft.dedup.Dedup.connectedComponents(
      pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    println(s"[cc-probe] labels=${labels.count()} total=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
