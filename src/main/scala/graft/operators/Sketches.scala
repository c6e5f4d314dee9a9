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
  * exchange carries one sketch per group, never the raw values. Sketch
  * INTERNALS are engine-specific (DuckDB cannot mirror them), so the
  * gated rows emit the exact anchor plus a `within_bound` boolean
  * asserting the sketch estimate in-row — the hash gate then covers the
  * sketch's health end-to-end; SketchSpec additionally asserts the raw
  * estimates (via the *Audit frames) vs the EXACT TWINS below
  * ([[exactDistinct]] / [[exactQuantiles]]), which are themselves
  * oracle-gated.
  */
object Sketches {

  /** Relative-error budget the gated sketch rows assert IN-ROW: HLL++ at
    * rsd 0.02 sits ~3 rsd under it and percentile_approx at accuracy
    * 10000 sits orders of magnitude under it, so the boolean is stable
    * across runs (sketch estimates are deterministic per input SET; only
    * a genuine bound violation can flip it — and then the hash gate
    * fails loudly, which is the point). SketchSpec asserts the same
    * bound on the raw audit estimates.
    */
  private[graft] val SKETCH_BOUND = 0.05

  /** Audit frame behind [[approxDistinct]]: the raw HLL++ estimate next
    * to the gated exact count with the relative error in-row. The raw
    * estimate is engine-specific (DuckDB cannot mirror HLL++ register
    * contents), so the GATED query below projects this down to the
    * mirrorable columns + a within-bound boolean; SketchSpec asserts the
    * bound on these raw columns.
    */
  private[graft] def approxDistinctAudit(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      // rsd 0.02 (p≈12, the production-typical register budget) —
      // 0.01 doubles the register file for one more error bit and
      // made the SKETCH 28× slower than its exact twin at sf0.1
      // (4.2 s vs 0.15 s, ProbeAdu): the precision the register
      // array pays for is below what the err_vs_exact audit column
      // can even surface against this data
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02)
        .as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .withColumn("err_vs_exact",
        round(abs(col("approx_users") - col("exact_users"))
          .cast("double") / col("exact_users"), 6))

  /** Distinct users per event type via HLL++ (rsd 2%), under the FULL
    * hash gate: the row carries the exact anchor (mirrorable) plus
    * `within_bound` — the sketch estimate asserted against
    * [[SKETCH_BOUND]] in-row. The oracle computes the exact side and
    * claims TRUE; a sketch drifting out of bound flips the Spark
    * boolean and fails the hash gate loudly. (HLL++ estimates are
    * deterministic per input set — register maxes are
    * order-independent — so the boolean is as deterministic as the
    * data.) At 100 TB you drop the exact ride-along (it is the full
    * distinct shuffle the sketch exists to avoid); the sketch aggregate
    * is unchanged either way.
    */
  private val approxDistinct = Q(
    "approx_distinct_users",
    (s, dir) =>
      approxDistinctAudit(s, dir)
        .select(col("event_type"), col("exact_users"), col("n_events"),
          (col("err_vs_exact") <= SKETCH_BOUND).as("within_bound"))
        .orderBy("event_type"),
    Some(s"""SELECT event_type,
      COUNT(DISTINCT user_id)::BIGINT AS exact_users,
      COUNT(*)::BIGINT AS n_events, TRUE AS within_bound
    FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Audit frame behind [[approxQuantiles]]: raw percentile_approx
    * estimates next to the gated exact percentiles with per-percentile
    * relative errors — same audit/gate split as
    * [[approxDistinctAudit]]; SketchSpec asserts the bounds here.
    */
  private[graft] def approxQuantilesAudit(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
          .as("p95"),
        count(lit(1)).as("n"))
      .join(exactQuantilesOf(s, dir)
        .select(col("o_orderpriority"), col("p50").as("e50"),
          col("p95").as("e95")), "o_orderpriority")
      .withColumn("err_p50",
        round(abs(col("p50") - col("e50")) / col("e50"), 6))
      .withColumn("err_p95",
        round(abs(col("p95") - col("e95")) / col("e95"), 6))

  /** Price quantiles per order priority via the approximate-percentile
    * sketch (accuracy 10000 ≈ 0.01% rank error), under the FULL hash
    * gate: the gated row carries the EXACT percentiles (the mirrorable
    * anchor, same integer-rank arithmetic as [[exactQuantiles]]) plus
    * `within_bound` — both sketch estimates asserted against
    * [[SKETCH_BOUND]] in-row, so the sketch's health rides the hash
    * gate without exposing engine-specific summary contents.
    */
  private val approxQuantiles = Q(
    "approx_quantiles",
    (s, dir) =>
      approxQuantilesAudit(s, dir)
        .select(col("o_orderpriority"), col("e50").as("p50"),
          col("e95").as("p95"), col("n"),
          (col("err_p50") <= SKETCH_BOUND &&
            col("err_p95") <= SKETCH_BOUND).as("within_bound"))
        .orderBy("o_orderpriority"),
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
      MAX(n) AS n, TRUE AS within_bound
    FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

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
  private def exactQuantilesOf(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
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
  }

  private val exactQuantiles = Q(
    "exact_quantiles",
    (s, dir) => exactQuantilesOf(s, dir).orderBy("o_orderpriority"),
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

  /** KMV (k-minimum-values) distinct sketch under the FULL hash gate —
    * unlike HLL++ (engine-specific internals, rows-only check), KMV's
    * state is just the k smallest distinct hash values, which both
    * engines can compute bit-identically: h = first 10 md5 hex chars of
    * the key (40 bits — so the estimator's `(k−1)·2⁴⁰ DIV h_k` stays in
    * long range), estimate exact-integer floor. Groups smaller than K
    * aren't estimated (the sketch holds them exactly). The `__all__` row
    * is the MERGED sketch — union the per-type hash sets, keep the k
    * smallest — demonstrating the mergeability that makes KMV a
    * map-side-combinable aggregate at 100 TB (the exchange carries ≤K
    * longs per group, never the key space). `n_distinct` (distinct
    * hashes ≈ distinct users) rides along as the in-row accuracy anchor;
    * SketchSpec bounds the relative error.
    *
    * Scale note: the window top-k here runs over DISTINCT (type, hash)
    * rows — at 100 TB you'd fold the same arithmetic into an Aggregator
    * keeping a bounded heap per group; the k-smallest-of-distinct
    * semantics (and this gate) are unchanged.
    */
  private val KMV_K = 64
  private val KMV_SPACE = 1L << 40

  private val kmvDistinct = Q(
    "sketch_kmv_users",
    (s, dir) => {
      val dist = Tables.events(s, dir)
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 10),
            16, 10).cast("long").as("h"))
        .distinct()
      val merged = dist.select(lit("__all__").as("event_type"), col("h"))
        .distinct()
      val hh = dist.unionByName(merged)
      val w = Window.partitionBy("event_type").orderBy("h")
      val sk = hh.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(max("h").as("h_k"), count(lit(1)).cast("long").as("k_used"))
      val exact = hh.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_distinct"))
      sk.join(exact, "event_type")
        .select(col("event_type"), col("k_used"), col("h_k"),
          when(col("k_used") < KMV_K, col("k_used"))
            .otherwise(expr(s"(k_used - 1) * $KMV_SPACE DIV h_k"))
            .cast("long").as("est_users"),
          col("n_distinct"))
        .orderBy("event_type")
    },
    Some(s"""WITH dist AS (
      SELECT DISTINCT event_type,
        ('0x' || substr(md5(user_id::VARCHAR), 1, 10))::BIGINT AS h
      FROM events),
    merged AS (SELECT DISTINCT '__all__' AS event_type, h FROM dist),
    hh AS (SELECT * FROM dist UNION ALL SELECT * FROM merged),
    ranked AS (SELECT event_type, h,
        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hh),
    sk AS (SELECT event_type, MAX(h) AS h_k, COUNT(*)::BIGINT AS k_used
      FROM ranked WHERE rn <= $KMV_K GROUP BY event_type),
    ex AS (SELECT event_type, COUNT(*)::BIGINT AS n_distinct
      FROM hh GROUP BY event_type)
    SELECT event_type, k_used, h_k,
      (CASE WHEN k_used < $KMV_K THEN k_used
        ELSE (k_used - 1) * $KMV_SPACE // h_k END)::BIGINT AS est_users,
      n_distinct
    FROM sk JOIN ex USING (event_type) ORDER BY event_type"""))

  // ---------------------------------------------------- sketch_kmv_intersect
  /** KMV sketch SET ALGEBRA — the theta-sketch intersection (Dasgupta et
    * al., "Theta Sketch Framework"): estimate every pairwise event-type
    * audience overlap |A∩B| from the per-type k-min sketches ALONE, the
    * query a sketch warehouse answers without rescanning raw data (union
    * mergeability is proved by sketch_kmv_users's `__all__` row; this is
    * the other half of the algebra). θ = min(θ_A, θ_B); the intersection
    * sample is the common sketch hashes below θ; estimate =
    * `n_common·2⁴⁰ DIV θ` — the same deterministic integer estimator as
    * the base sketch, so the oracle hash-gates sketch contents, θ, the
    * estimate AND the exact overlap it approximates, side by side.
    *
    * Scale: sketches are ≤k rows per type — the pair grid and all joins
    * are sketch-sized (broadcast), never corpus-sized; the one
    * corpus-scale stage is the shared distinct pass the base sketch
    * already runs.
    */
  private val kmvIntersect = Q(
    "sketch_kmv_intersect",
    (s, dir) => {
      val dist = Tables.events(s, dir)
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 10),
            16, 10).cast("long").as("h"))
        .distinct()
        .transform(graft.Checkpoint.of) // sketches + exact overlap read it
      val w = Window.partitionBy("event_type").orderBy("h")
      val sk = dist.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= KMV_K)
        .transform(graft.Checkpoint.of) // theta agg + both pair-join sides
      val theta = sk.groupBy("event_type").agg(max("h").as("theta"))
      val grid = theta.as("a").join(theta.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          least(col("a.theta"), col("b.theta")).as("theta"))
      val common = sk.as("x").join(sk.as("y"),
          col("x.h") === col("y.h") &&
            col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"), col("x.h").as("h"))
      val nCommon = common.join(grid, Seq("type_a", "type_b"))
        .filter(col("h") < col("theta"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_common"))
      val exact = dist.as("x").join(dist.as("y"),
          col("x.h") === col("y.h") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_exact"))
      grid.join(nCommon, Seq("type_a", "type_b"), "left")
        .join(exact, Seq("type_a", "type_b"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
        .select(col("type_a"), col("type_b"), col("theta"),
          col("n_common"),
          expr(s"n_common * $KMV_SPACE DIV theta").as("est_common"),
          col("n_exact"))
        .orderBy("type_a", "type_b")
    },
    Some(s"""WITH dist AS MATERIALIZED (
      SELECT DISTINCT event_type,
        ('0x' || substr(md5(user_id::VARCHAR), 1, 10))::BIGINT AS h
      FROM events),
    sk AS MATERIALIZED (
      SELECT event_type, h FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dist) WHERE rn <= $KMV_K),
    theta AS (SELECT event_type, MAX(h) AS theta FROM sk GROUP BY event_type),
    grid AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        LEAST(a.theta, b.theta) AS theta
      FROM theta a JOIN theta b ON a.event_type < b.event_type),
    nc AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
        COUNT(*) FILTER (WHERE x.h < g.theta)::BIGINT AS n_common
      FROM sk x JOIN sk y ON x.h = y.h AND x.event_type < y.event_type
      JOIN grid g ON g.type_a = x.event_type AND g.type_b = y.event_type
      GROUP BY x.event_type, y.event_type),
    ex AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
        COUNT(*)::BIGINT AS n_exact
      FROM dist x JOIN dist y ON x.h = y.h AND x.event_type < y.event_type
      GROUP BY x.event_type, y.event_type)
    SELECT g.type_a AS type_a, g.type_b AS type_b, g.theta AS theta,
      COALESCE(nc.n_common, 0)::BIGINT AS n_common,
      (COALESCE(nc.n_common, 0) * $KMV_SPACE // g.theta)::BIGINT
        AS est_common,
      COALESCE(ex.n_exact, 0)::BIGINT AS n_exact
    FROM grid g
    LEFT JOIN nc ON nc.type_a = g.type_a AND nc.type_b = g.type_b
    LEFT JOIN ex ON ex.type_a = g.type_a AND ex.type_b = g.type_b
    ORDER BY type_a, type_b"""))

  val all: Seq[Q] =
    Seq(approxDistinct, approxQuantiles, exactDistinct, exactQuantiles,
      kmvDistinct, kmvIntersect)
}
