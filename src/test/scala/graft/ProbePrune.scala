package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: does cast-then-isin on a partition column prune
  * directories, and what does one beam round read?
  */
object ProbePrune {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[8]")
      .appName("probe-prune")
      .config("spark.sql.shuffle.partitions", 8)
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe-prune")
    val path = dir.toString + "/t"
    (0L until 4096L).map(i => (i, i % 32, Array.fill(64)(i.toDouble).toSeq))
      .toDF("vec_id", "cent_id", "v")
      .write.partitionBy("cent_id").parquet(path)
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytes.addAndGet(ev.taskMetrics.inputMetrics.bytesRead)
    }
    def measure(label: String)(f: => Unit): Unit = {
      spark.sparkContext.addSparkListener(listener)
      bytes.set(0)
      f
      org.apache.spark.sql.graft.Shim.waitListeners(spark)
      spark.sparkContext.removeSparkListener(listener)
      println(s"[probe] $label: ${bytes.get()} bytes")
    }
    measure("full scan") {
      spark.read.parquet(path).agg(count(lit(1))).collect()
    }
    measure("cast-then-isin 2 cells") {
      spark.read.parquet(path)
        .withColumn("cent_id", col("cent_id").cast("long"))
        .filter(col("cent_id").isin(3L, 7L))
        .agg(count(lit(1))).collect()
    }
    measure("raw isin 2 cells (int literals)") {
      spark.read.parquet(path)
        .filter(col("cent_id").isin(3, 7))
        .agg(count(lit(1))).collect()
    }
    val pl = spark.read.parquet(path)
      .withColumn("cent_id", col("cent_id").cast("long"))
      .filter(col("cent_id").isin(3L, 7L))
    println(pl.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Partition"))
      .mkString("\n").take(1200))
    spark.stop()
  }
}
