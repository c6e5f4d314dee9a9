package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: stage-level timing for mm_phash_clusters at a dir —
  * hashes vs pairs vs CC vs the final label join.
  */
object ProbePhashC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/gendata/sf1")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("probe-phash-c")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$dir/documents.parquet").write
      .format("noop").mode("overwrite").save()
    val h = time("hashes (checkpointed)") {
      graft.Checkpoint.of(
        graft.multimodal.Multimodal.perceptualHashes(spark, dir))
    }
    val pairs = time("pairs ham<=8 (checkpointed)") {
      graft.Checkpoint.of(
        graft.multimodal.Multimodal.perceptualPairs(h,
          bands = 12, hamMax = 8))
    }
    println(s"[probe] n_pairs=${pairs.count()}")
    val labels = time("connectedComponents") {
      graft.Checkpoint.of(graft.dedup.Dedup.connectedComponents(
        pairs.select(col("a_id").as("u"), col("b_id").as("v"))))
    }
    println(s"[probe] n_labeled=${labels.count()}")
    time("final doc join + order") {
      Tables(spark, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"))
        .join(labels.select(col("id").as("media_id"), col("label")),
          Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("label"), col("media_id")).as("cluster_id"))
        .withColumn("is_dup", col("media_id") =!= col("cluster_id"))
        .orderBy("media_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("gated query end-to-end (2nd run)") {
      SparkEntry.queries("mm_phash_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
