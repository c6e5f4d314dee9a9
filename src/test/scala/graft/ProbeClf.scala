package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for text_classify_centroid/nb
  * (sbt "Test/runMain graft.ProbeClf [sfDir]").
  */
object ProbeClf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    // warm-up
    SparkEntry.queries("q01_agg")(spark, dir).collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables(spark, dir, "documents")
    val tok = time("tok gram agg + ckpt") {
      docs.select(col("doc_id"),
          explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
    }
    println(s"tok rows: ${tok.count()}")
    val nd = tok.groupBy("doc_id").agg(sum("cnt").as("n_d"))
    val f = time("f ckpt") {
      tok.join(nd, "doc_id")
        .select(col("doc_id"), col("tok"),
          expr("cnt * 1000 DIV n_d").as("fm")).localCheckpoint()
    }
    val d = docs.select(col("doc_id"), col("lang"))
    val lt = tok.join(d, "doc_id")
      .groupBy("lang", "tok").agg(sum("cnt").as("tlt"))
    val tl = lt.groupBy("lang").agg(sum("tlt").as("tl"))
    val c = time("c ckpt") {
      lt.join(tl, "lang")
        .select(col("lang").as("pred_lang"), col("tok"),
          expr("tlt * 1000 DIV tl").as("cm")).localCheckpoint()
    }
    println(s"f rows: ${f.count()}, c rows: ${c.count()}")
    val cross = time("cross join+agg") {
      f.join(c, "tok")
        .groupBy("doc_id", "pred_lang")
        .agg(sum(col("fm") * col("cm")).as("cx")).localCheckpoint()
    }
    println(s"cross rows: ${cross.count()}")
    for (r <- 1 to 3)
      time(s"full query rep$r") {
        SparkEntry.queries("text_classify_centroid")(spark, dir).collect()
      }
    for (r <- 1 to 3)
      time(s"nb rep$r") {
        SparkEntry.queries("text_classify_nb")(spark, dir).collect()
      }
    spark.stop()
  }
}
