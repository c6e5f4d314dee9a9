package graft

import org.apache.spark.sql.functions._

/** Approximate sketches stay within their error bounds vs the
  * oracle-gated exact twins (`exact_distinct_users` /
  * `exact_quantiles`) — the exact side of each bound is itself
  * hash-checked against DuckDB by the driver, so the sketch specs are
  * anchored to the gate, not to an ad-hoc recomputation.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of the gated exact twin; the " +
      "in-row err_vs_exact matches and the gated within_bound is true") {
    val rows = graft.operators.Sketches.approxDistinctAudit(spark, sfDir)
      .select("event_type", "approx_users", "exact_users", "err_vs_exact")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toMap
    val exact = SparkEntry.queries("exact_distinct_users")(spark, sfDir)
      .select("event_type", "exact_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val (a, inRowExact, err) = rows(k)
      assert(inRowExact == e, s"$k: in-row exact anchor drifted")
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"$k: approx=$a exact=$e")
      assert(err <= 0.05, s"$k: err_vs_exact=$err")
      assert(math.abs(err - math.abs(a - e).toDouble / e) < 1e-6,
        s"$k: err column inconsistent with its own row")
    }
    // the GATED shape: every row claims within_bound, matching the
    // oracle's TRUE literal (this is what the driver hash-checks)
    val gated = SparkEntry.queries("approx_distinct_users")(spark, sfDir)
      .collect()
    assert(gated.nonEmpty && gated.forall(_.getBoolean(3)),
      "a gated sketch row fell out of bound")
  }

  test("percentile_approx brackets the gated exact percentiles; in-row " +
      "err_p50/err_p95 bounded; gated within_bound true") {
    val audit = graft.operators.Sketches.approxQuantilesAudit(spark, sfDir)
    val errs = audit
      .select("o_orderpriority", "err_p50", "err_p95")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(errs.nonEmpty)
    for ((prio, e50, e95) <- errs) {
      assert(e50 <= 0.05 && e95 <= 0.05,
        s"$prio: err_p50=$e50 err_p95=$e95")
    }
    val gated = SparkEntry.queries("approx_quantiles")(spark, sfDir)
      .collect()
    assert(gated.nonEmpty && gated.forall(_.getBoolean(4)),
      "a gated sketch row fell out of bound")
    val approx = audit
      .select("o_orderpriority", "p50", "p95")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val exact = SparkEntry.queries("exact_quantiles")(spark, sfDir)
      .select("o_orderpriority", "p50", "p95")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val spans = Tables(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg((max("o_totalprice") - min("o_totalprice")).as("span"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.map(_._1).toSet == exact.keySet)
    for ((prio, ap50, ap95) <- approx) {
      val (e50, e95) = exact(prio)
      val span = spans(prio)
      assert(math.abs(ap50 - e50) <= span * 0.05,
        s"$prio p50: approx=$ap50 exact=$e50")
      assert(math.abs(ap95 - e95) <= span * 0.05,
        s"$prio p95: approx=$ap95 exact=$e95")
    }
  }

  test("KMV estimate within stderr bounds of its in-row exact anchor; " +
    "small groups held exactly; merged row covers the union") {
    val rows = SparkEntry.queries("sketch_kmv_users")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val K = 64
    for ((etype, kUsed, est, exact) <- rows) {
      if (kUsed < K)
        assert(est == exact,
          s"$etype: a non-full sketch IS the exact answer ($est vs $exact)")
      else
        // KMV stderr ≈ 1/sqrt(k−2) ≈ 12.7% at k=64; 4σ guard band
        assert(math.abs(est - exact) <= exact * 0.51,
          s"$etype: est=$est exact=$exact beyond 4σ")
    }
    val all = rows.find(_._1 == "__all__").get
    val perType = rows.filter(_._1 != "__all__")
    assert(all._4 >= perType.map(_._4).max,
      "merged distinct count must cover every per-type count")
  }
}
