package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Byte-L-gram jaccard: true mm pairs vs banding candidate volumes. */
object ProbeMmGram {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val L = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    import spark.implicits._

    val media = multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val sh = media.mapPartitions(_.map { r =>
      val p = r.payload
      val set = scala.collection.mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i + L - 1 < p.length) {
        set += new String(p, i, L, java.nio.charset.StandardCharsets.ISO_8859_1)
        i += 1
      }
      (r.mediaId, set.toArray)
    }).toDF("doc_id", "sh")
    val shc = Checkpoint.of(sh)
    val truth = Checkpoint.of(
      SparkEntry.queries("mm_embed_neardup")(spark, sfDir)
        .select("a_id", "b_id", "cosine"))
    val j = truth
      .join(shc.select(col("doc_id").as("a_id"), col("sh").as("sa")), "a_id")
      .join(shc.select(col("doc_id").as("b_id"), col("sh").as("sb")), "b_id")
      .select(col("cosine"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jac"))
    j.select(count(lit(1)), min("jac"), expr("percentile(jac, 0.01)"),
      expr("percentile(jac, 0.5)")).show(false)
    // banding candidate volumes at (bands, rows): perms = bands*rows <= 64
    for ((bands, rows) <- Seq((16, 4), (32, 2), (64, 1))) {
      val buckets = Checkpoint.of(
        dedup.Dedup.bandBucketsFromShingles(shc, bands * rows, bands))
      val nCand = buckets.as("x").join(buckets.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct().count()
      println(s"[mmgram] L=$L bands=$bands rows=$rows cand=$nCand")
    }
  }
}
