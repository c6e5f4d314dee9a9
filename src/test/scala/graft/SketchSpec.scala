package graft

import org.apache.spark.sql.functions._

/** Approximate sketches stay within their error bounds vs the
  * oracle-gated exact twins (`exact_distinct_users` /
  * `exact_quantiles`) — the exact side of each bound is itself
  * hash-checked against DuckDB by the driver, so the sketch specs are
  * anchored to the gate, not to an ad-hoc recomputation.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of the gated exact twin") {
    val approx = SparkEntry.queries("approx_distinct_users")(spark, sfDir)
      .select("event_type", "approx_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("exact_distinct_users")(spark, sfDir)
      .select("event_type", "exact_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"$k: approx=$a exact=$e")
    }
  }

  test("percentile_approx brackets the gated exact percentiles") {
    val approx = SparkEntry.queries("approx_quantiles")(spark, sfDir)
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
}
