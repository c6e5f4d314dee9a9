package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway receipt probe: the fixed-knob IVF quadratic is the KNOB,
  * not the design — re-derive the sf1 kNN-join edge list with nlist
  * scaled ∝ n (160 instead of the gated 16) and time it.
  */
object ProbeNlist {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/gendata/sf1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(160)
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // seeded sample + 2 plain-double Lloyd rounds at the scaled nlist
    // (timing receipt only — the decimal-exact trainer is the gated one)
    val hk = conv(substring(md5(col("vec_id").cast("string")), 1, 15),
      16, 10).cast("long")
    var cents = e
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), hk.as("hk"))
      .orderBy("hk", "cent_id").limit(nlist).drop("hk")
      .transform(Checkpoint.of)
    val dim = 64
    for (_ <- 1 to 2) {
      cents = sim.Knn.assign(e, cents).groupBy("cent_id")
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("v"), i + 1))): _*).as("cv"))
        .transform(Checkpoint.of)
    }
    cents.write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    sim.Knn.knnGraphFrom(e, cents)
      .write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"nlist_scaling","dir":"$dir","nlist":$nlist,"knn_join_sec":$t%.1f}""")
    spark.stop()
  }
}
