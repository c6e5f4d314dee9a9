package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing of mm_embed_neardup at a given SF. */
object ProbeMm2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_agg")(spark, sfDir).collect() // warm
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mm2] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val vecs = t("gramVectors+checkpoint") {
      graft.Checkpoint.of(multimodal.Multimodal.gramVectors(media))
    }
    t("vecs.count")(println(vecs.count()))
    val pairs = dedup.Dedup.blockedCosinePairs(vecs, 0.97)
    t("pairs.count")(println(pairs.count()))
    t("pairs again")(println(pairs.count()))
    // compare: same machinery over the embeddings table
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    t("embeddings pairs")(println(
      dedup.Dedup.blockedCosinePairs(e, 0.4).count()))
    spark.stop()
  }
}
