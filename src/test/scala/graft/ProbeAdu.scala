package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: where do approx_distinct_users' 4 s go — the HLL
  * precision (rsd 0.01 → p=14 buffers) or the mixed
  * distinct+non-distinct aggregate rewrite?
  */
object ProbeAdu {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val ev = Tables.events(spark, dir)
    ev.count() // warm
    time("warm count")(ev.count())
    time("approx rsd=0.05 alone")(
      ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.05)).collect())
    time("approx rsd=0.01 alone")(
      ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01)).collect())
    time("countDistinct alone")(
      ev.groupBy("event_type")
        .agg(countDistinct(col("user_id"))).collect())
    time("mixed rsd=0.01 + countDistinct")(
      ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01),
          countDistinct(col("user_id")), count(lit(1))).collect())
    time("mixed rsd=0.02 + countDistinct")(
      ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02),
          countDistinct(col("user_id")), count(lit(1))).collect())
    time("two aggs joined (approx .01 ⋈ exact)")({
      val a = ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("a"))
      val e = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("e"))
      a.join(e, "event_type").collect()
    })
    spark.stop()
  }
}
