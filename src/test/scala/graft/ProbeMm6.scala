package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMm6 {
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
      println(f"[mm6] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.DataFrame
    def rawPairs(vecs: DataFrame): Long = {
      val nb = 8
      val e = vecs.withColumn("blk", pmod(col("vec_id"), lit(nb)).cast("int"))
      val a = e.withColumn("bb", explode(sequence(col("blk"), lit(nb - 1))))
        .select(col("vec_id").as("x_id"), col("v").as("va"),
          col("blk").as("ba"), col("bb"))
      val b = e.withColumn("ba", explode(sequence(lit(0), col("blk"))))
        .select(col("vec_id").as("y_id"), col("v").as("vb"),
          col("ba"), col("blk").as("bb"))
      val cos = graft.functions.CosineSim.cosineSim(col("va"), col("vb"))
      a.join(b, Seq("ba", "bb"))
        .filter(col("ba") =!= col("bb") || col("x_id") < col("y_id"))
        .filter(cos >= 1.999999)
        .count()
    }
    val base = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 5000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // gram-like values (integral counts), SQL-built — same lineage shape
    val gramish = graft.Checkpoint.of(base
      .select(col("vec_id"), transform(col("v"),
        x => round(abs(x) * 50, 0)).as("v")))
    val plain = graft.Checkpoint.of(base)
    // typed-path version of the SAME embedding values
    import spark.implicits._
    val typed = graft.Checkpoint.of(
      base.as[(Long, Seq[Double])].map(identity).toDF("vec_id", "v"))
    t("gram-like values")(println(rawPairs(gramish)))
    t("plain emb       ")(println(rawPairs(plain)))
    t("typed-path emb  ")(println(rawPairs(typed)))
    t("gram-like again ")(println(rawPairs(gramish)))
    t("typed-path again")(println(rawPairs(typed)))
    spark.stop()
  }
}
