package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: output-growth triage for mm_phash_clusters'
  * sweep exponent — where does the mass live (distinct hashes, banded
  * candidates, verified pairs, component sizes) at each sf?
  */
object ProbePhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("probe-phash")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val h = graft.Checkpoint.of(
        graft.multimodal.Multimodal.perceptualHashes(spark, dir))
      val n = h.count()
      val nh = h.select("phash").distinct().count()
      val dup = h.groupBy("phash").count().filter(col("count") > 1)
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
      val bands = 12; val width = 5
      val banded = h.select(col("media_id"), col("phash"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("phash"), b * width)
                .bitwiseAND((1L << width) - 1).as("bv"))): _*)).as("b"))
        .select(col("media_id"), col("phash"), col("b.band"), col("b.bv"))
        .transform(graft.Checkpoint.of)
      val rawCand = banded.groupBy("band", "bv").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
      val pairs8 = graft.multimodal.Multimodal.perceptualPairs(
        h, bands = 12, hamMax = 8).count()
      println(s"PROBE_PHASH $dir n=$n distinct_phash=$nh " +
        s"identical_pairs=${dup.get(0)} raw_band_cand=${rawCand.get(0)} " +
        s"verified_ham8=$pairs8")
      // candidate mass under g-subset band keys (pigeonhole: a pair at
      // ham<=hamMax shares an IDENTICAL g-subset when g <= bands-hamMax)
      for (g <- Seq(2, 3, 4)) {
        val subsets = (0 until bands).combinations(g).toSeq
        val keyed = h.select(col("media_id"),
            explode(array(subsets.zipWithIndex.map { case (ss, si) =>
              struct(lit(si).as("sid"),
                ss.map(b => shiftright(col("phash"), b * width)
                  .bitwiseAND((1L << width) - 1))
                  .zipWithIndex
                  .map { case (c, i) => c * lit(1L << (i * width)) }
                  .reduce(_ + _).as("kv"))
            }: _*)).as("s"))
          .select(col("media_id"), col("s.sid"), col("s.kv"))
        val cand = keyed.groupBy("sid", "kv").count()
          .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
        println(s"PROBE_PHASH $dir g=$g subsets=${subsets.size} " +
          s"cand_mass=${cand.get(0)}")
      }
    }
    spark.stop()
  }
}
