package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: schema + readability of every driver table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (t <- Seq("region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.schema.simpleString}")
        df.show(1, 60)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
