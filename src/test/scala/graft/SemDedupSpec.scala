package graft

import org.apache.spark.sql.functions._

/** Driver-side model check for dedup_semantic (the DuckDB mirror is the
  * oracle gate; this pins the within-cluster drop rule independently and
  * relates it to the exact all-pairs operator).
  */
class SemDedupSpec extends SparkSpec {

  // same sequential fold + single rounding as CosineSim / the oracle
  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("semantic dedup == within-cluster lower-id-twin rule") {
    val got = SparkEntry.queries("dedup_semantic")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val clusterOf = got.map(r => r._1 -> r._2).toMap
    val vecs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.foreach { case (id, cid, dup) =>
      val twin = vecs.keys.exists(a =>
        a < id && clusterOf(a) == cid && cos6(vecs(a), vecs(id)) >= sim.SemDedup.TAU)
      assert(dup == twin, s"vec $id flag")
    }
    assert(got.exists(_._3), "corpus has semantic dups")

    // every flagged vec is the b-side of some exact cos>=TAU pair, and
    // every exact pair that landed in one cluster has its b flagged
    val exactPairs = SparkEntry.queries("dedup_embedding")(spark, sfDir)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val flagged = got.filter(_._3).map(_._1).toSet
    assert(flagged.subsetOf(exactPairs.map(_._2).toSet))
    exactPairs.foreach { case (a, b) =>
      if (clusterOf(a) == clusterOf(b)) assert(flagged.contains(b))
    }
  }
}
