package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMm7 {
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
      println(f"[mm7] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val gv = graft.Checkpoint.of(multimodal.Multimodal.gramVectors(media))
    for (i <- 1 to 4)
      t(s"full mm_embed_neardup pairs rep$i")(
        dedup.Dedup.blockedCosinePairs(gv, 0.97).count())
    spark.stop()
  }
}
