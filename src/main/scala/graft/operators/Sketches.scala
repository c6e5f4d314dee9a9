package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Approximate sketch aggregations — the operators that replace their
  * exact counterparts at 100 TB, where exact distinct counts or
  * percentiles would shuffle the full key space.
  *
  * Both are partial-aggregatable sketches (HyperLogLog++ and an
  * approximate-quantile summary): map-side state is O(sketch size), the
  * exchange carries one sketch per group, never the raw values. No DuckDB
  * oracle (sketch internals are engine-specific) — the driver records a
  * rows-only check and SketchSpec asserts error bounds vs the exact
  * answers.
  */
object Sketches {

  /** Distinct users per event type via HLL++ (rsd 1%) next to the window
    * an exact count would need; rows-only + spec-bounded.
    */
  private val approxDistinct = Q(
    "approx_distinct_users",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.01)
          .as("approx_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    None)

  /** Price quantiles per order priority via the approximate-percentile
    * sketch (accuracy 10000 ≈ 0.01% rank error).
    */
  private val approxQuantiles = Q(
    "approx_quantiles",
    (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("p50"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
            .as("p95"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    None)

  val all: Seq[Q] = Seq(approxDistinct, approxQuantiles)
}
