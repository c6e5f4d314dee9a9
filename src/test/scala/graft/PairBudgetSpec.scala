package graft

import org.apache.spark.sql.functions.col

import graft.dedup.Dedup

/** Output budget for quadratic-answer pair reports
  * ([[graft.dedup.Dedup.capPairs]]): the kept set must be monotone in
  * the cap, reach identity at a cap ≥ max degree, keep every doc's
  * strongest link, and bound the per-endpoint kept mass — so a capped
  * report can shrink only by declining weak tails, never by losing a
  * node's neighborhood.
  */
class PairBudgetSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capPairs is monotone in cap, identity at a huge cap, and keeps " +
      "every endpoint's strongest pair (cosine desc)") {
    val vecs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val pairs = Checkpoint.of(Dedup.blockedCosinePairs(vecs, 0.4))
    val full = pairSet(pairs)
    assert(full.nonEmpty, "the τ=0.4 grid must produce pairs at gate sf")
    val c2 = pairSet(Dedup.capPairs(pairs, "cosine", asc = false, 2))
    val c8 = pairSet(Dedup.capPairs(pairs, "cosine", asc = false, 8))
    val cInf = pairSet(Dedup.capPairs(pairs, "cosine", asc = false,
      Int.MaxValue))
    assert(c2.subsetOf(c8), "kept sets must nest as the cap grows")
    assert(c8.subsetOf(full))
    assert(cInf == full, "an unbounded cap must keep every pair")
    // every endpoint's single strongest pair always survives (rank 1)
    val strongest = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, c) => Seq((a, (c, b, a)), (b, (c, a, b))) }
      .groupBy(_._1)
      .map { case (_, g) =>
        val (_, other, self) = g.map(_._2).maxBy { case (c, o, _) =>
          (c, -o)
        }
        (math.min(self, other), math.max(self, other))
      }.toSet
    assert(strongest.subsetOf(c2),
      "rank-1 pairs must survive even the smallest cap")
    // per-endpoint kept mass is bounded: a pair is kept only through a
    // top-2 rank at one of its endpoints, so total ≤ 2·cap·n
    val n = vecs.count()
    assert(c2.size <= 2 * 2 * n, "kept mass must be linear in the corpus")
  }

  test("capPairs ranks ascending for distance scores (hamming)") {
    val hashes = graft.multimodal.Multimodal.perceptualHashes(spark, sfDir)
    val pairs = Checkpoint.of(graft.multimodal.Multimodal
      .perceptualPairs(hashes, bands = 12, hamMax = 10))
    val full = pairSet(pairs)
    assert(full.nonEmpty)
    val c1 = pairSet(Dedup.capPairs(pairs, "hamming", asc = true, 1))
    val c4 = pairSet(Dedup.capPairs(pairs, "hamming", asc = true, 4))
    val cInf = pairSet(Dedup.capPairs(pairs, "hamming", asc = true,
      Int.MaxValue))
    assert(c1.subsetOf(c4) && c4.subsetOf(full) && cInf == full)
    // the minimum-hamming pair of every endpoint survives cap 1
    val best = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .flatMap { case (a, b, h) => Seq((a, (h, b, a)), (b, (h, a, b))) }
      .groupBy(_._1)
      .map { case (_, g) =>
        val (_, other, self) = g.map(_._2).minBy { case (h, o, _) =>
          (h, o)
        }
        (math.min(self, other), math.max(self, other))
      }.toSet
    assert(best.subsetOf(c1))
  }

  test("gated budget cards reconcile: n_kept + n_dropped = n_pairs and " +
      "n_kept matches the capped report's row count") {
    for ((card, report) <- Seq(
        "dedup_embedding_budget" -> "dedup_embedding",
        "mm_embed_budget" -> "mm_embed_neardup",
        "mm_phash_budget" -> "mm_dedup_perceptual")) {
      val row = SparkEntry.queries(card)(spark, sfDir).collect().head
      val (np, nk, nd) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(np == nk + nd, s"$card: counts must reconcile")
      val kept = SparkEntry.queries(report)(spark, sfDir).count()
      assert(kept == nk,
        s"$card: n_kept=$nk but $report emits $kept rows")
    }
  }
}
