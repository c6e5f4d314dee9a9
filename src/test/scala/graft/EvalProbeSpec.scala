package graft

import org.apache.spark.sql.functions._

/** The probe-bounded eval contract ([[EvalProbe]]): recall/honesty
  * cards sample their exact grids to pairs incident to a deterministic
  * CAP-sized probe set. The contract has two load-bearing halves — at
  * gate scale the probe must be the WHOLE corpus (gated values stay
  * byte-identical to the unsampled card), and above it the probe must
  * be a fixed COUNT under any id distribution (dense, strided, or
  * 2⁴³-sized ids — never a fixed fraction or an id bound).
  */
class EvalProbeSpec extends SparkSpec {
  import spark.implicits._

  test("CAP covers every gate-sf corpus (full grid at the oracle gate)") {
    // sf0.01 (the driver's gate) holds 500 docs / 500 vectors; sf0.1
    // (the driver's bench) is the first sf where sampling may engage
    assert(EvalProbe.CAP >= 500)
  }

  test("probe is the whole id set when n <= CAP") {
    val ids = (0L until 500L).map(_ * 37L + 5L)
    val got = EvalProbe.probeIds(ids.toDF("vec_id"), "vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == ids.toSet)
  }

  test("probe is exactly CAP ids, deterministic, under strided ids") {
    // the r14 sf1 corpus shipped ids past 2^31 on a 10^9 stride — the
    // selection must be rank-capped (fixed count) and arithmetic-safe
    // there, and stable across partitionings of the same data
    val ids = (0L until 3000L).map(i => (i % 10) * 1000000000L + i)
    val a = EvalProbe.probeIds(ids.toDF("vec_id"), "vec_id")
      .collect().map(_.getLong(0)).toSeq
    val b = EvalProbe.probeIds(
        ids.toDF("vec_id").repartition(13), "vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a.size == EvalProbe.CAP)
    assert(a.toSet == b.toSet)
    // mirror of the SQL rank expression: modular arithmetic on longs
    val expect = ids.sortBy(id => (id % 1000003L * 8191L % 1000003L, id))
      .take(EvalProbe.CAP).toSet
    assert(a.toSet == expect)
  }

  test("dedup recall-card branches agree at the CAP boundary") {
    // the oracle gate only ever exercises the fast path (every gate sf
    // has n <= CAP), so branch drift would surface only at un-gated
    // bench sfs — pin the identity here instead (r17 ADVICE item).
    // Synthetic corpus of exactly CAP vectors with planted sibling
    // near-dups (2i ~ 2i+1), so n_exact > 0 and both the exact grid and
    // the bank see real pairs.
    // hash-based components: independent pseudo-random vectors are
    // near-orthogonal (cos ~ N(0, 1/8)), so the τ=0.4 grid stays small
    // — smooth sin(phase) vectors would correlate as cos(Δphase) and
    // make ~40% of all pairs "exact", blowing the broadcast
    def corpus(n: Int) = spark.range(n).toDF("vec_id")
      .withColumn("v", array((0 until 64).map(i =>
        (xxhash64((col("vec_id") / 2).cast("long"), lit(i)) % 1000)
          .cast("double") / 500.0
          + (col("vec_id") % 2) * lit(1e-3)): _*))
    val atCap = corpus(EvalProbe.CAP)
    val fast = graft.dedup.Dedup
      .lshRecallFastPath(atCap, EvalProbe.CAP).collect().head
    val probeAt = graft.dedup.Dedup
      .lshRecallProbePath(atCap).collect().head
    // probe == whole corpus at n == CAP: all four columns identical
    assert(fast.getLong(0) == probeAt.getLong(0), "n_exact")
    assert(fast.getLong(1) == probeAt.getLong(1), "n_found")
    assert(fast.getLong(2) == probeAt.getLong(2), "n_missed")
    assert(fast.getLong(3) == probeAt.getLong(3), "n_eval")
    assert(fast.getLong(0) > 0, "planted pairs must be visible")
    // one past the boundary: the probe tier caps n_eval and can only
    // lose pairs relative to the full grid
    val past = corpus(EvalProbe.CAP + 1)
    val probePast = graft.dedup.Dedup
      .lshRecallProbePath(past).collect().head
    val fastPast = graft.dedup.Dedup
      .lshRecallFastPath(past, EvalProbe.CAP + 1).collect().head
    assert(probePast.getLong(3) == EvalProbe.CAP, "n_eval capped")
    assert(probePast.getLong(0) <= fastPast.getLong(0),
      "probe-incident exact set is a subset of the full grid")
  }

  test("probe ids near 2^43 cannot wrap the rank multiply") {
    val big = Seq(1L << 43, (1L << 43) + 7L, Long.MaxValue / 4)
    val got = EvalProbe.probeIds(big.toDF("vec_id"), "vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == big.toSet) // n <= CAP: selection total, no overflow
  }
}
