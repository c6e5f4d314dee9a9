package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.plans.AsofDirection

/** Operators Spark lacks natively — SURVEY.md §2.3: as-of join, range
  * (interval-containment) join, per-group top-k. Each is a reusable
  * Dataset-level API plus an oracle-gated query instance over `events`.
  */
object CustomJoins {

  // ----------------------------------------------------------- asof join
  /** Point-in-time (as-of) left join, composed as union + window: tag
    * right rows, union with left rows on the shared (key, time) axis,
    * and carry the latest right payload forward with
    * `last(_, ignoreNulls)` over (key ORDER BY time, rightFirst) — equal
    * timestamps match (right sorts first). One shuffle on the key, NO
    * row-explosion: at 100 TB this is strictly cheaper than the
    * inequality-join rewrite (which degenerates to per-key cross products)
    * and never materializes candidate pairs. Forward is the same carry
    * traversed in reverse time order; Nearest runs BOTH carries over the
    * one key-partitioning (two sorts, still one exchange) and picks the
    * closer candidate, ties backward — the full surface of the native
    * operator ([[graft.plans.AsofJoin.asofJoinNative]]), spec-equal to it.
    *
    * Right must be unique per (key, time) — pre-aggregate to make the
    * match deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String],
      direction: AsofDirection = AsofDirection.Backward,
      toleranceMs: Option[Long] = None): DataFrame = {
    val l = left.withColumn("_is_right", lit(0))
    // the matched right row travels as ONE struct: carrying payload
    // columns individually with last(ignoreNulls) would let a NULL
    // payload field fall through to an OLDER right row than the carried
    // _r_time — the struct is non-null per right row, so time and
    // payload stay atomic
    val r = right.select(
      col(key), col(time), lit(1).as("_is_right"),
      struct(col(time).as("_r_time") +: payload.map(col): _*).as("_r"))
    val unioned = l.drop(payload: _*)
      .unionByName(r, allowMissingColumns = true)
    def carryWindow(ord: Column) = Window.partitionBy(col(key))
      .orderBy(ord, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(df: DataFrame, as: String, ord: Column): DataFrame =
      df.withColumn(as,
        last(col("_r"), ignoreNulls = true).over(carryWindow(ord)))
    val tol = toleranceMs.getOrElse(Long.MaxValue)
    direction match {
      case AsofDirection.Backward | AsofDirection.Forward =>
        val ord = if (direction == AsofDirection.Forward) col(time).desc
          else col(time)
        val carried = carry(unioned, "_m", ord)
          .filter(col("_is_right") === 0).drop("_is_right")
        val dist = if (direction == AsofDirection.Forward)
          col("_m._r_time") - col(time)
        else col(time) - col("_m._r_time")
        payload.foldLeft(carried) { (df, p) =>
          df.withColumn(p, when(dist <= tol, col(s"_m.$p")))
        }.drop("_m", "_r")
      case AsofDirection.Nearest =>
        // both windows share the key partitioning: Catalyst plans ONE
        // exchange and two in-partition sorts (asc, then desc)
        val carried = carry(carry(unioned, "_mb", col(time)),
            "_mf", col(time).desc)
          .filter(col("_is_right") === 0).drop("_is_right")
        val bDist = col(time) - col("_mb._r_time")
        val fDist = col("_mf._r_time") - col(time)
        // null dists (no candidate on that side) must read as FALSE, not
        // null: a null fOk would otherwise null out `useB` below and
        // drop a perfectly good backward match (3-valued logic)
        val bOk = coalesce(bDist <= tol, lit(false))
        val fOk = coalesce(fDist <= tol, lit(false))
        // at distance 0 both candidates exist and backward wins the tie,
        // matching AsofJoinExec's rule
        val useB = bOk && (!fOk || bDist <= fDist)
        val chosen = when(useB, col("_mb")).when(fOk, col("_mf"))
        payload.foldLeft(carried.withColumn("_m", chosen)) { (df, p) =>
          df.withColumn(p, col(s"_m.$p"))
        }.drop("_m", "_mb", "_mf", "_r")
    }
  }

  /** Shared fixture for every asof query: click events joined against
    * purchases deduped to one per (user, ms) with max event_id; right side
    * carries (purchase_id, purchase_ms) as the payload.
    */
  private def clicksAndPurchases(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ms")
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ms").as("purchase_ms"))
      .agg(max("event_id").as("purchase_id"))
      .select(col("user_id"), col("purchase_ms").as("ts_ms"),
        col("purchase_id"), col("purchase_ms"))
    (clicks, purchases)
  }

  private val asofOracleProlog = """WITH e AS (
      SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
      FROM events),
    c AS (SELECT event_id, user_id, ts_ms FROM e
      WHERE event_type = 'click'),
    p AS (SELECT user_id, ts_ms AS purchase_ms,
        MAX(event_id) AS purchase_id
      FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_ms)
    """

  /** For each click event: the latest prior-or-equal purchase of the same
    * user.
    */
  private val asof = Q(
    "asof_join",
    (s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      asofJoin(clicks, purchases, key = "user_id", time = "ts_ms",
        payload = Seq("purchase_id", "purchase_ms"))
        .select("event_id", "user_id", "ts_ms", "purchase_id", "purchase_ms")
        .orderBy("event_id")
    },
    Some(asofOracleProlog + """
    SELECT c.event_id, c.user_id, c.ts_ms, p.purchase_id, p.purchase_ms
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts_ms >= p.purchase_ms
    ORDER BY c.event_id"""))

  /** Same semantics through the NATIVE operator stack
    * ([[graft.plans.AsofJoinPlan]] → AsofJoinStrategy → AsofJoinExec:
    * co-partitioned co-sorted single merge pass) — gated by the identical
    * DuckDB ASOF JOIN oracle as the composed form above.
    */
  private val asofNative = Q(
    "asof_join_native",
    (s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      graft.plans.AsofJoin.asofJoinNative(
        clicks, purchases, key = "user_id", time = "ts_ms",
        payload = Seq("purchase_id", "purchase_ms"))
        .select("event_id", "user_id", "ts_ms", "purchase_id", "purchase_ms")
        .orderBy("event_id")
    },
    asof.oracle)

  /** Backward asof bounded to a 30-minute lookback: a purchase older than
    * the tolerance is no match (payload null), mirroring DuckDB ASOF +
    * post-CASE.
    */
  private val asofTolerance = Q(
    "asof_join_tolerance",
    (s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      graft.plans.AsofJoin.asofJoinNative(
        clicks, purchases, key = "user_id", time = "ts_ms",
        payload = Seq("purchase_id", "purchase_ms"),
        toleranceMs = Some(1800000L))
        .select("event_id", "user_id", "ts_ms", "purchase_id", "purchase_ms")
        .orderBy("event_id")
    },
    Some(asofOracleProlog + """
    SELECT c.event_id, c.user_id, c.ts_ms,
      CASE WHEN c.ts_ms - p.purchase_ms <= 1800000
        THEN p.purchase_id END AS purchase_id,
      CASE WHEN c.ts_ms - p.purchase_ms <= 1800000
        THEN p.purchase_ms END AS purchase_ms
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts_ms >= p.purchase_ms
    ORDER BY c.event_id"""))

  /** Forward asof: the earliest same-or-later purchase per click (DuckDB
    * expresses it as ASOF with the inequality flipped).
    */
  private val asofForward = Q(
    "asof_join_forward",
    (s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      graft.plans.AsofJoin.asofJoinNative(
        clicks, purchases, key = "user_id", time = "ts_ms",
        payload = Seq("purchase_id", "purchase_ms"),
        direction = AsofDirection.Forward)
        .select("event_id", "user_id", "ts_ms", "purchase_id", "purchase_ms")
        .orderBy("event_id")
    },
    Some(asofOracleProlog + """
    SELECT c.event_id, c.user_id, c.ts_ms, p.purchase_id, p.purchase_ms
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts_ms <= p.purchase_ms
    ORDER BY c.event_id"""))

  /** Nearest asof: closer of the backward/forward candidates, ties
    * backward — mirrored as two stacked DuckDB ASOF joins + CASE on the
    * distances (NULL distances lose via COALESCE to "infinity").
    */
  private val asofNearest = Q(
    "asof_join_nearest",
    (s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      graft.plans.AsofJoin.asofJoinNative(
        clicks, purchases, key = "user_id", time = "ts_ms",
        payload = Seq("purchase_id", "purchase_ms"),
        direction = AsofDirection.Nearest)
        .select("event_id", "user_id", "ts_ms", "purchase_id", "purchase_ms")
        .orderBy("event_id")
    },
    Some(asofOracleProlog + """,
    j AS (
      SELECT c.event_id, c.user_id, c.ts_ms,
        b.purchase_id AS b_id, b.purchase_ms AS b_ms,
        f.purchase_id AS f_id, f.purchase_ms AS f_ms
      FROM c
      ASOF LEFT JOIN p b
        ON c.user_id = b.user_id AND c.ts_ms >= b.purchase_ms
      ASOF LEFT JOIN p f
        ON c.user_id = f.user_id AND c.ts_ms <= f.purchase_ms)
    SELECT event_id, user_id, ts_ms,
      CASE WHEN COALESCE(ts_ms - b_ms, 9223372036854775807)
          <= COALESCE(f_ms - ts_ms, 9223372036854775807)
        THEN b_id ELSE f_id END AS purchase_id,
      CASE WHEN COALESCE(ts_ms - b_ms, 9223372036854775807)
          <= COALESCE(f_ms - ts_ms, 9223372036854775807)
        THEN b_ms ELSE f_ms END AS purchase_ms
    FROM j ORDER BY event_id"""))

  // ----------------------------------------------------------- range join
  /** Interval-containment join via bucketed equi-prejoin: intervals are
    * exploded to every `bucketMs` bucket they overlap; points join on
    * (key, bucket) — an EQUI join Catalyst hash-partitions — then the
    * exact containment predicate filters. Candidate fan-out is
    * `len/bucketMs + 1` per interval instead of the O(n·m) per-key cross
    * product a raw inequality join costs at 100 TB.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      pointMs: String, startMs: String, endMs: String,
      bucketMs: Long): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / bucketMs).cast("long")
    val exploded = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(startMs)), bucketOf(col(endMs) - 1))))
    val bucketed = points.withColumn("_bucket", bucketOf(col(pointMs)))
    bucketed.join(exploded, Seq(key, "_bucket"))
      .filter(col(pointMs) >= col(startMs) && col(pointMs) < col(endMs))
      .drop("_bucket")
  }

  /** Clicks landing inside [purchase, purchase + 1 h) windows of the same
    * user, aggregated per purchase window.
    */
  private val range = Q(
    "range_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ms"), col("value"))
      val windows = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_ms").as("start_ms"),
          (col("ts_ms") + 3600000L).as("end_ms"))
      rangeJoin(clicks, windows, key = "user_id", pointMs = "ts_ms",
        startMs = "start_ms", endMs = "end_ms", bucketMs = 3600000L)
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_clicks"),
          graft.Exact.dsum2(col("value")).as("click_value"))
        .orderBy("purchase_id")
    },
    Some("""WITH e AS (
      SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms
      FROM events),
    c AS (SELECT user_id, ts_ms, value FROM e WHERE event_type = 'click'),
    w AS (SELECT event_id AS purchase_id, user_id, ts_ms AS start_ms,
        ts_ms + 3600000 AS end_ms
      FROM e WHERE event_type = 'purchase')
    SELECT purchase_id, COUNT(*) AS n_clicks,
      CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
    FROM c JOIN w ON c.user_id = w.user_id
      AND c.ts_ms >= w.start_ms AND c.ts_ms < w.end_ms
    GROUP BY purchase_id ORDER BY purchase_id"""))

  // ---------------------------------------------------------- approx_topk
  /** Per-group top-k frequent items. Counting is a partial-aggregated
    * hash-agg (map-side combine absorbs item skew before the exchange);
    * the per-group k-selection is a window over the already-reduced
    * (group, item) space — orders of magnitude smaller than the input.
    * Exact at any SF; swap the count stage for a CMS/SpaceSaving sketch
    * per partition when item cardinality itself is the bottleneck.
    */
  def topkPerGroup(df: DataFrame, group: String, item: String,
      k: Int): DataFrame = {
    val counts = df.groupBy(col(group), col(item))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(group))
      .orderBy(col("cnt").desc, col(item))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-3 parts per supplier by lineitem frequency. */
  private val topk = Q(
    "approx_topk",
    (s, dir) =>
      topkPerGroup(Tables(s, dir, "lineitem"), "l_suppkey", "l_partkey", 3)
        .select("l_suppkey", "l_partkey", "cnt", "rank")
        .orderBy("l_suppkey", "rank"),
    Some("""SELECT l_suppkey, l_partkey, cnt, rank FROM (
      SELECT l_suppkey, l_partkey, COUNT(*) AS cnt,
        row_number() OVER (PARTITION BY l_suppkey
          ORDER BY COUNT(*) DESC, l_partkey) AS rank
      FROM lineitem GROUP BY l_suppkey, l_partkey)
    WHERE rank <= 3 ORDER BY l_suppkey, rank"""))

  /** Time-weighted INTERPOLATION join — the time-series twin the asof
    * family is missing: an as-of join snaps to ONE bracketing row; sensor
    * / pricing pipelines want the value interpolated BETWEEN the
    * surrounding rows. For each click, linearly interpolate the purchase
    * `value` between the user's latest prior purchase and earliest later
    * purchase (ROWS-bounded conditional first/last IGNORE NULLS windows —
    * two window passes over one user-partitioned sort, no join at all).
    *
    * Exactness: value enters as FLOOR(value·10⁶) (IEEE product identical
    * in both engines, floor deterministic) and the interpolation is the
    * integer weighted mean `(pm·(nt−ts) + nm·(ts−pt)) DIV (nt−pt)` —
    * all operands non-negative here, so Spark's truncating DIV equals
    * DuckDB's flooring `//`. Overflow headroom: value_micro ≤ 5·10⁸ ×
    * span 2.6·10⁹ ms ≈ 1.3·10¹⁸ < 2⁶³; a wider domain widens the
    * numerator to DECIMAL(38,0) (Spark IntegralDivide accepts decimals)
    * with the same semantics. Clicks with no bracket on either side
    * carry NULL — the honest answer, not an extrapolation.
    */
  private val asofInterpolate = Q(
    "asof_interpolate",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_ms"),
          floor(col("value") * 1000000d).cast("long").as("vm"))
      val order = Seq(col("ts_ms"), col("event_id"))
      val wP = Window.partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val wN = Window.partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(1, Window.unboundedFollowing)
      val isP = col("event_type") === "purchase"
      e.withColumn("pm", last(when(isP, col("vm")), ignoreNulls = true)
          .over(wP))
        .withColumn("pt", last(when(isP, col("ts_ms")), ignoreNulls = true)
          .over(wP))
        .withColumn("nm", first(when(isP, col("vm")), ignoreNulls = true)
          .over(wN))
        .withColumn("nt", first(when(isP, col("ts_ms")), ignoreNulls = true)
          .over(wN))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("pt").as("prev_ms"), col("nt").as("next_ms"),
          when(col("pt").isNotNull && col("nt").isNotNull,
            when(col("nt") > col("pt"),
              expr("(pm * (nt - ts_ms) + nm * (ts_ms - pt)) DIV (nt - pt)"))
              .otherwise(col("pm")))
            .as("interp_micro"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
      SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
        FLOOR(value * 1000000)::BIGINT AS vm
      FROM events),
    w AS (SELECT event_id, user_id, event_type, ts_ms,
        LAST_VALUE(CASE WHEN event_type = 'purchase' THEN vm END
          IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
        LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts_ms END
          IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN vm END
          IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nm,
        FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ts_ms END
          IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM e)
    SELECT event_id, user_id, ts_ms, pt AS prev_ms, nt AS next_ms,
      CASE WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
        CASE WHEN nt > pt
          THEN (pm * (nt - ts_ms) + nm * (ts_ms - pt)) // (nt - pt)
          ELSE pm END
      END AS interp_micro
    FROM w WHERE event_type = 'click' ORDER BY event_id"""))

  val all: Seq[Q] = Seq(asof, asofNative, asofTolerance, asofForward,
    asofNearest, range, topk, asofInterpolate)
}
