package graft
/** Simulates the driver: a BARE session (none of our confs) calling
  * SparkEntry.entry + a query that touches nanosecond-parquet events.
  */
object DriverSim {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    val m = SparkEntry.queries("q20_sessionize")(spark, "/root/testdata/sf0.001").count()
    val k = SparkEntry.queries("text_search")(spark, "/root/testdata/sf0.001").count()
    println(s"DRIVER_SIM_OK entry=$n sessionize=$m search=$k")
    spark.stop()
  }
}
