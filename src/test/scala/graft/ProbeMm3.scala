package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMm3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mm3] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val raw = multimodal.Multimodal.gramVectors(media)
    raw.write.mode("overwrite").parquet("/tmp/mm3_vecs")
    val vecs = spark.read.parquet("/tmp/mm3_vecs")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    t("pairs from parquet")(println(
      dedup.Dedup.blockedCosinePairs(vecs, 0.97).count()))
    t("pairs from parquet again")(println(
      dedup.Dedup.blockedCosinePairs(vecs, 0.97).count()))
    spark.stop()
  }
}
