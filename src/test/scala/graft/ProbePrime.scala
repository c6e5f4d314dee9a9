package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: run each warm-up prime step separately at a dir,
  * timing each — attributes the sf3 disk-spill death to its step.
  */
object ProbePrime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/gendata/sf3")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("probe-prime")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def step(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try { f; System.err.println(
        f"[prime] $label ok ${(System.nanoTime() - t0) / 1e9}%.1f s") }
      catch { case e: Throwable => System.err.println(
        f"[prime] $label FAILED ${(System.nanoTime() - t0) / 1e9}%.1f s: " +
          s"${e.getMessage.take(120)}") }
    }
    step("pq")(graft.sim.Pq.prime(spark, dir))
    step("dedupstate")(graft.dedup.DedupState.prime(spark, dir))
    step("textindex")(graft.text.TextIndex.prime(spark, dir))
    step("pipelines")(graft.text.Pipelines.prime(spark, dir))
    step("embedstate")(graft.multimodal.EmbedState.prime(spark, dir))
    step("knn")(graft.sim.Knn.prime(spark, dir))
    spark.stop()
  }
}
