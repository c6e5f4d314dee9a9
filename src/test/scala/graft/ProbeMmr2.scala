package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CosineSim.cosineSim

/** Dev-only probe: where do emb_mmr_select's 4 s go? */
object ProbeMmr2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    SparkEntry.queries("knn_bruteforce")(spark, dir).collect() // warm
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("v"),
        cosineSim(col("qv"), col("v")).as("rel"))
    val wPool = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("vec_id"))
    val cand = time("cand checkpoint") {
      graft.Checkpoint.of(scored.withColumn("rk", row_number().over(wPool))
        .filter(col("rk") <= 16)
        .select("query_id", "vec_id", "v", "rel"))
    }
    time("sims checkpoint") {
      graft.Checkpoint.of(cand.as("a").join(cand.as("b"),
          col("a.query_id") === col("b.query_id") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.query_id").as("query_id"),
          col("a.vec_id").as("ca"), col("b.vec_id").as("cb"),
          cosineSim(col("a.v"), col("b.v")).as("sim")))
    }
    time("full query (incl. above)") {
      SparkEntry.queries("emb_mmr_select")(spark, dir).collect()
    }
    spark.stop()
  }
}
