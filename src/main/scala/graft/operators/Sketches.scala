package graft.operators

import org.apache.spark.sql.expressions.Window
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
  * rows-only check and SketchSpec asserts error bounds vs the EXACT
  * TWINS below ([[exactDistinct]] / [[exactQuantiles]]), which ARE
  * oracle-gated, anchoring the sketch bounds to the DuckDB gate.
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

  /** Oracle-gated exact twin of [[approxDistinct]]: the full
    * distinct-shuffle answer the sketch approximates. At 100 TB this is
    * the query you DON'T run (the exchange carries every distinct
    * (event_type, user_id)); here it pins the sketch's error bound to
    * the DuckDB gate.
    */
  private val exactDistinct = Q(
    "exact_distinct_users",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
      COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Oracle-gated exact twin of [[approxQuantiles]]: discrete percentiles
    * (PERCENTILE_DISC — the smallest value whose cumulative rank reaches
    * p) selected by PURE INTEGER rank arithmetic, `rn = ⌈p·n⌉` expressed
    * as `rn·q ≥ n·p' ∧ (rn−1)·q < n·p'` for p = p'/q — no float index
    * math, so both engines pick the identical order statistic (built-in
    * PERCENTILE_DISC/quantile_disc index rules differ between engines at
    * p=0.95). Ties in o_totalprice are immaterial: the k-th order
    * statistic is tie-order-independent.
    */
  private val exactQuantiles = Q(
    "exact_quantiles",
    (s, dir) => {
      val wRank = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
      val wAll = Window.partitionBy("o_orderpriority")
      def pick(num: Int, den: Int) = max(when(
        col("rn") * den >= col("n") * num &&
          (col("rn") - 1) * den < col("n") * num,
        col("o_totalprice")))
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rn", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("o_orderpriority")
        .agg(pick(1, 2).as("p50"), pick(19, 20).as("p95"),
          max(col("n")).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (
      SELECT o_orderpriority, o_totalprice,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice) AS rn,
        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
      MAX(CASE WHEN rn * 2 >= n * 1 AND (rn - 1) * 2 < n * 1
        THEN o_totalprice END) AS p50,
      MAX(CASE WHEN rn * 20 >= n * 19 AND (rn - 1) * 20 < n * 19
        THEN o_totalprice END) AS p95,
      MAX(n) AS n
    FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val all: Seq[Q] =
    Seq(approxDistinct, approxQuantiles, exactDistinct, exactQuantiles)
}
