package graft

/** Cross-checks between the dedup pipelines (the SQL-expressible ones are
  * additionally oracle-gated by the driver).
  */
class DedupSpec extends SparkSpec {

  private def pairSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactJaccard = pairSet("dedup_ngram_jaccard")

  test("planted near-duplicates exist in the corpus") {
    assert(exactJaccard.nonEmpty)
  }

  test("minhash LSH has full recall vs exact jaccard at this scale") {
    assert(pairSet("dedup_minhash_lsh") == exactJaccard)
  }

  test("simhash recovers most jaccard near-dups at hamming<=3") {
    val sim = pairSet("dedup_simhash")
    val recall = (sim & exactJaccard).size.toDouble / exactJaccard.size
    info(s"simhash recall = $recall, extra pairs = ${(sim -- exactJaccard).size}")
    assert(recall >= 0.5)
    // precision sanity: hamming-close pairs shouldn't explode
    assert(sim.size <= exactJaccard.size * 3)
  }

  test("embedding LSH dedup has full recall vs the blocked exact join") {
    val exact = pairSet("dedup_embedding")
    assert(exact.nonEmpty)
    assert(pairSet("dedup_embedding_lsh") == exact)
  }

  test("df-capped jaccard bounds candidates with recall unchanged at TAU") {
    import org.apache.spark.sql.functions._
    val shingleTable = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        dedup.Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .localCheckpoint()
    def pairs(cap: Option[Int]) =
      dedup.Dedup.jaccardPairs(shingleTable, dedup.Dedup.TAU, cap)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    assert(uncapped == exactJaccard, "fixture matches the gated query")
    assert(pairs(Some(50)) == uncapped,
      "cap=50 keeps every TAU pair on this corpus (recall unchanged)")
    // candidate mass shrinks monotonically as the cap tightens
    val candLoose = dedup.Dedup.jaccardCandidates(shingleTable, 50).count()
    val candTight = dedup.Dedup.jaccardCandidates(shingleTable, 5).count()
    info(s"candidates: cap=50 → $candLoose, cap=5 → $candTight")
    assert(candTight <= candLoose)
    assert(candLoose >= uncapped.size.toLong,
      "candidates must cover every verified pair")
  }

  test("exact dedup marks nothing in a duplicate-free corpus") {
    val d = SparkEntry.queries("dedup_exact")(spark, sfDir)
    assert(d.filter("is_dup").count() == 0)
  }
}
