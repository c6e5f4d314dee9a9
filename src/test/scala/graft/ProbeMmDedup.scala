package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMmDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val perms = args(1).toInt
    val bands = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mmd] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val sh = t("shingles")(Checkpoint.of(
      multimodal.Multimodal.byteGramShingles(media)))
    val buckets = t("minhash")(Checkpoint.of(
      dedup.Dedup.bandBucketsFromShingles(sh, perms, bands)))
    val cand = t("cand")(Checkpoint.of(
      buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()))
    println(s"[mmd] candidates=${cand.count()}")
    val vecs = t("vecs")(Checkpoint.of(
      multimodal.Multimodal.gramVectors(media)))
    val cos = functions.CosineSim.cosineSim(col("va"), col("vb"))
    val out = t("verify")(
      cand.join(vecs.select(col("vec_id").as("a_id"), col("v").as("va")), "a_id")
        .join(vecs.select(col("vec_id").as("b_id"), col("v").as("vb")), "b_id")
        .filter(cos >= lit(0.98 - 5e-7))
        .select(col("a_id"), col("b_id"), round(cos, 6).as("cosine"))
        .orderBy("a_id", "b_id").collect())
    println(s"[mmd] rows=${out.length}")
  }
}
