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

  test("probe ids near 2^43 cannot wrap the rank multiply") {
    val big = Seq(1L << 43, (1L << 43) + 7L, Long.MaxValue / 4)
    val got = EvalProbe.probeIds(big.toDF("vec_id"), "vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == big.toSet) // n <= CAP: selection total, no overflow
  }
}
