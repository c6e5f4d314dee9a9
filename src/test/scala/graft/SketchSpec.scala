package graft

import org.apache.spark.sql.functions._

/** Approximate sketches stay within their error bounds vs exact answers. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val approx = SparkEntry.queries("approx_distinct_users")(spark, sfDir)
      .select("event_type", "approx_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"$k: approx=$a exact=$e")
    }
  }

  test("percentile_approx brackets the exact percentile") {
    val approx = SparkEntry.queries("approx_quantiles")(spark, sfDir)
      .select("o_orderpriority", "p50", "p95")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val exact = Tables(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    for ((prio, ap50, ap95) <- approx) {
      val (e50, e95, lo, hi) = exact(prio)
      val span = hi - lo
      assert(math.abs(ap50 - e50) <= span * 0.05,
        s"$prio p50: approx=$ap50 exact=$e50")
      assert(math.abs(ap95 - e95) <= span * 0.05,
        s"$prio p95: approx=$ap95 exact=$e95")
    }
  }
}
