package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: executed-plan audit of dedup_ngram_jaccard's
  * pre-checkpoint `bracketed` stage at a given SF — replicates
  * jaccardPairs' capped pipeline up to (but not including) the
  * Checkpoint.of barrier and counts df-aggregate / exchange / explode
  * executions in the FINAL AQE plan, to prove the viral-shingle bracket
  * scalar and the `kept` postings lineage each run once.
  * Usage: runMain graft.ProbeNj <sfDir>
  */
object ProbeNj {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cap = dedup.Dedup.DEFAULT_DF_CAP
    val st = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), dedup.Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .transform(graft.Checkpoint.of)
    val ex = st.select(col("doc_id"), col("nsh"), explode(col("sh")).as("sh"))
    val kept = ex.join(ex.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, cap)).select("sh"), "sh")
    val a = kept.select(col("doc_id").as("a_id"), col("nsh").as("na"),
      col("sh"))
    val b = kept.select(col("doc_id").as("b_id"), col("nsh").as("nb"),
      col("sh"))
    val counted = a.join(b, "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "na", "nb")
      .agg(count(lit(1)).as("inter"))
    val nViral = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(when(col("df") > cap, 1L).otherwise(0L)),
        lit(0L)).as("n_viral"))
    val bracketed = counted.crossJoin(broadcast(nViral))
    val t0 = System.nanoTime()
    bracketed.collect()
    println(f"[probenj] bracketed time ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val plan = bracketed.queryExecution.executedPlan.toString
    def n(pat: String): Int = pat.r.findAllIn(plan).length
    println(s"[probenj] ReusedExchange        = ${n("ReusedExchange")}")
    println(s"[probenj] Exchange(total)       = ${n("Exchange")}")
    println(s"[probenj] df partial_count      = ${n("partial_count")}")
    println(s"[probenj] HashAggregate         = ${n("HashAggregate")}")
    println(s"[probenj] explode               = ${n("Generate explode")}")
    println(s"[probenj] rdd scans             = ${n("Scan ExistingRDD")}")
    spark.stop()
  }
}
