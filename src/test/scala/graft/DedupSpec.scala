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

  test("exact dedup marks nothing in a duplicate-free corpus") {
    val d = SparkEntry.queries("dedup_exact")(spark, sfDir)
    assert(d.filter("is_dup").count() == 0)
  }
}
