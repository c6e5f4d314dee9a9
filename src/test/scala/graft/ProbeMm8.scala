package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMm8 {
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
      println(f"[mm8] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.DataFrame
    def joined(vecs: DataFrame): DataFrame = {
      val nb = 8
      val e = vecs.withColumn("blk", pmod(col("vec_id"), lit(nb)).cast("int"))
      val a = e.withColumn("bb", explode(sequence(col("blk"), lit(nb - 1))))
        .select(col("vec_id").as("x_id"), col("v").as("va"),
          col("blk").as("ba"), col("bb"))
      val b = e.withColumn("ba", explode(sequence(lit(0), col("blk"))))
        .select(col("vec_id").as("y_id"), col("v").as("vb"),
          col("ba"), col("blk").as("bb"))
      a.join(b, Seq("ba", "bb"))
        .filter(col("ba") =!= col("bb") || col("x_id") < col("y_id"))
    }
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val gv = graft.Checkpoint.of(multimodal.Multimodal.gramVectors(media))
    val cos = graft.functions.CosineSim.cosineSim(col("va"), col("vb"))
    for (i <- 1 to 3) {
      t(s"raw cos filter rep$i")(joined(gv).filter(cos >= 2.0).count())
      t(s"round(cos) filter rep$i")(
        joined(gv).filter(round(cos, 6) >= 2.0).count())
      t(s"raw boundary-shifted rep$i")(
        joined(gv).filter(cos >= 0.9699995).count())
    }
    spark.stop()
  }
}
