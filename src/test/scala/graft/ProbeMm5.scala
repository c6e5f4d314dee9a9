package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMm5 {
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
      println(f"[mm5] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.DataFrame
    def scan(vecs: DataFrame): Long = {
      val q = vecs.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val cos = graft.functions.CosineSim.cosineSim(col("qv"), col("v"))
      vecs.join(broadcast(q), col("qid") =!= col("vec_id"))
        .filter(cos >= 2.0).count()  // never true: pure kernel throughput
    }
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val gv = graft.Checkpoint.of(multimodal.Multimodal.gramVectors(media))
    val ev = graft.Checkpoint.of(Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 5000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
    t("gram 500k cosines")(println(scan(gv)))
    t("emb  500k cosines")(println(scan(ev)))
    t("gram again")(println(scan(gv)))
    t("emb  again")(println(scan(ev)))
    spark.stop()
  }
}
