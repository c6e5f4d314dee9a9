package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Data-quality constraint suite — the Deequ/Great-Expectations shape
  * (AWS Deequ's `VerificationSuite`, re-expressed Spark-first): a
  * declarative rule set evaluated in as few passes as the rules allow,
  * emitting ONE thin report row per rule `(rule, n_rows, n_violations,
  * pass)`. This is the admission gate a 100 TB ingest runs before any
  * downstream operator trusts the batch — completeness (NOT NULL),
  * domain membership, range, key uniqueness, referential integrity,
  * and cross-table temporal ordering, each over the driver's TPC-H
  * tables.
  *
  * Scale design:
  *  - Row-level rules on the same table share ONE column-pruned scan:
  *    a single aggregate computes every rule's violation count as a
  *    `sum(CASE)` beside the shared row count.
  *  - Uniqueness aggregates the KEY, never the row: `count>1` groups
  *    roll up map-side-combined; violations = rows living in
  *    duplicated groups.
  *  - Referential rules left-join DISTINCT child keys against the
  *    distinct parent key set — the probe is |distinct keys|, not
  *    |fact rows| — and count keys and orphans in one aggregate.
  *  - The temporal rule rides the one orderkey shuffle the q38 family
  *    already demonstrates is bucketable to zero-exchange.
  * The whole suite is ONE job: the seven 1-row aggregates meet in
  * 1-row crossJoins and stack() unpivots the wide row into the 9
  * report rows — no materialization barriers, every subtree evaluated
  * exactly once, driver-tiny by construction (r17; the previous shape
  * paid 4 Checkpoint.of jobs to keep the 9-branch union from
  * re-running shared scans).
  */
object Dq {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Violation counter beside the shared row count. Report counts
    * coalesce to zero at the stack() unpivot: over an EMPTY shard
    * `sum(CASE)` is NULL, and a null violation count would read as a
    * failing rule (totality — RobustnessSpec pins it).
    */
  private def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** The lineitem ROW-LEVEL rules as one 1-row aggregate — shared by
    * the batch report and [[graft.streaming.Streaming.dqSink]] (the
    * twin-constant rule: duplicated bounds compile clean and diverge
    * silently).
    */
  private[graft] def lineitemRowAgg(li: DataFrame): DataFrame =
    li.select(col("l_quantity"), col("l_discount"))
      .agg(count(lit(1)).as("n"),
        viol(!col("l_quantity").between(1, 50)).as("v_qty"),
        viol(!col("l_discount").between(0, 1)).as("v_disc"))

  private val dqRules = Q(
    "dq_rules",
    (s, dir) => {
      // ONE physical plan, ONE action (r17): the report used to fan out
      // of 4 Checkpoint.of barriers (liAgg/ordAgg + one per referential
      // key set), each a separate ~0.2-0.5 s job whose only purpose was
      // stopping the union's 9 branches from re-running shared scans.
      // Instead every rule lands in ONE wide row — seven 1-row
      // aggregates glued by 1-row × 1-row crossJoins (BNLJ cards, in
      // PlanSpec's allowlist) — and stack() unpivots it to the 9 report
      // rows, so each aggregate subtree appears exactly once in one
      // job and the admission gate is a single pass.

      // lineitem row rules — ONE scan, one 1-row aggregate
      val liAgg = lineitemRowAgg(t(s, dir, "lineitem"))
        .select(col("n").as("li_n"), col("v_qty"), col("v_disc"))

      // orders row rules — ONE scan, one 1-row aggregate
      val ordAgg = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("ord_n"),
          viol(col("o_custkey").isNull).as("v_null"),
          viol(!col("o_orderstatus").isin("F", "O", "P")).as("v_dom"))

      // part row rule — one scan
      val partAgg = t(s, dir, "part")
        .select(col("p_retailprice"))
        .agg(count(lit(1)).as("part_n"),
          viol(col("p_retailprice") <= 0).as("v_price"))

      // key uniqueness: violations = rows inside duplicated key groups
      val uniqAgg = t(s, dir, "orders").select(col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("uniq_n"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("uniq_v"))

      // referential integrity over DISTINCT NON-NULL child keys — a
      // NULL key is the not_null rule's finding, not an orphan, and
      // the engines disagree on NULLs here, so the rule domain excludes
      // them EXPLICITLY on both sides. n and the orphan count come from
      // ONE left join against the DISTINCT parent keys (matches the
      // oracle's NOT-IN-over-distinct semantics exactly) instead of an
      // anti-join plus two counts of the same checkpointed key set.
      def refAgg(child: DataFrame, key: String, parent: DataFrame,
          pkey: String, pfx: String): DataFrame =
        child.select(col(key)).filter(col(key).isNotNull).distinct()
          .join(parent.select(col(pkey)).filter(col(pkey).isNotNull)
            .distinct(), col(key) === col(pkey), "left")
          .agg(count(lit(1)).as(s"${pfx}_n"),
            viol(col(pkey).isNull).as(s"${pfx}_v"))
      val liRef = refAgg(t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders"), "o_orderkey", "liref")
      val ordRef = refAgg(t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey", "ordref")

      // cross-table temporal rule: a line never ships before its order
      val shipAgg = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("ship_n"),
          viol(col("l_shipdate") < col("o_orderdate")).as("ship_v"))

      liAgg.crossJoin(ordAgg).crossJoin(partAgg).crossJoin(uniqAgg)
        .crossJoin(liRef).crossJoin(ordRef).crossJoin(shipAgg)
        .select(expr("""stack(9,
          'lineitem_discount_range', li_n, v_disc,
          'lineitem_orderkey_ref', liref_n, liref_v,
          'lineitem_quantity_range', li_n, v_qty,
          'lineitem_ship_after_order', ship_n, ship_v,
          'orders_custkey_not_null', ord_n, v_null,
          'orders_custkey_ref', ordref_n, ordref_v,
          'orders_orderkey_unique', uniq_n, uniq_v,
          'orders_status_domain', ord_n, v_dom,
          'part_retailprice_positive', part_n, v_price)
          as (rule, rn, rv)"""))
        .select(col("rule"),
          coalesce(col("rn").cast("long"), lit(0L)).as("n_rows"),
          coalesce(col("rv").cast("long"), lit(0L)).as("n_violations"))
        .withColumn("pass", col("n_violations") === 0L)
        .orderBy("rule")
    },
    // COALESCE mirrors the Spark side's zero-coalesce: SUM(CASE) over
    // an empty shard is NULL in both engines, and only a total oracle
    // stays hash-equal if the driver ever regenerates a table empty.
    // The referential subqueries exclude NULL keys EXPLICITLY (NULL is
    // the not_null rule's finding; NOT IN over a null parent would
    // otherwise poison the whole count).
    Some("""SELECT rule, n_rows,
      COALESCE(n_violations, 0)::BIGINT AS n_violations,
      COALESCE(n_violations, 0) = 0 AS pass
    FROM (
      SELECT 'lineitem_discount_range' AS rule,
        COUNT(*)::BIGINT AS n_rows,
        SUM(CASE WHEN NOT l_discount BETWEEN 0 AND 1
          THEN 1 ELSE 0 END)::BIGINT AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_orderkey_ref',
        (SELECT COUNT(*) FROM
          (SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_orderkey IS NOT NULL) k)::BIGINT,
        (SELECT COUNT(*) FROM
          (SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_orderkey IS NOT NULL) k
          WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders
              WHERE o_orderkey IS NOT NULL))::BIGINT
      UNION ALL
      SELECT 'lineitem_quantity_range',
        COUNT(*)::BIGINT,
        SUM(CASE WHEN NOT l_quantity BETWEEN 1 AND 50
          THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_ship_after_order',
        COUNT(*)::BIGINT,
        SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'orders_custkey_not_null',
        COUNT(*)::BIGINT,
        SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM orders
      UNION ALL
      SELECT 'orders_custkey_ref',
        (SELECT COUNT(*) FROM
          (SELECT DISTINCT o_custkey FROM orders
            WHERE o_custkey IS NOT NULL) k)::BIGINT,
        (SELECT COUNT(*) FROM
          (SELECT DISTINCT o_custkey FROM orders
            WHERE o_custkey IS NOT NULL) k
          WHERE o_custkey NOT IN
            (SELECT c_custkey FROM customer
              WHERE c_custkey IS NOT NULL))::BIGINT
      UNION ALL
      SELECT 'orders_orderkey_unique',
        COALESCE(SUM(c), 0)::BIGINT,
        SUM(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT
      FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'orders_status_domain',
        COUNT(*)::BIGINT,
        SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
          THEN 1 ELSE 0 END)::BIGINT
      FROM orders
      UNION ALL
      SELECT 'part_retailprice_positive',
        COUNT(*)::BIGINT,
        SUM(CASE WHEN p_retailprice <= 0 THEN 1 ELSE 0 END)::BIGINT
      FROM part)
    ORDER BY rule"""))

  /** Numeric STAT-DRIFT report — the second data-quality tier after
    * [[dqRules]]' hard constraints (Deequ's AnomalyDetection shape,
    * text_source_drift's numeric-table sibling): compare each fact
    * metric's mean between a REFERENCE slice and the NEW slice (here:
    * lineitem before/since 1998 — in production, yesterday's corpus vs
    * today's batch) in exact integer micro units. Division-free where
    * signs could bite: means are positive-integer floors
    * (`sum_micro DIV n`, identical both engines) and the drift is the
    * raw mean DIFFERENCE (a signed ratio would hit the DIV/`//`
    * truncate-vs-floor trap q50 documents; a subtraction is exact).
    *
    * Scale: ONE column-pruned scan computes both slices' sums and
    * counts as `sum(CASE)` partials beside each other (never two
    * scans); the 1-row result is checkpointed before fanning out into
    * the three metric rows; the report is driver-tiny at any size.
    */
  private val dqDrift = Q(
    "dq_drift",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val isNew = col("l_shipdate") >= lit("1998-01-01")
      def micro(c: Column) =
        (c.cast(DecimalType(18, 6)) * lit(1000000)).cast(DecimalType(38, 0))
      def side(flag: Column, c: Column, tag: String) = Seq(
        sum(when(flag, micro(c)).otherwise(lit(0)))
          .cast(DecimalType(38, 0)).as(s"s_$tag"),
        sum(when(flag, 1L).otherwise(0L)).as(s"n_$tag"))
      val metrics = Seq(
        "l_discount" -> col("l_discount"),
        "l_extendedprice" -> col("l_extendedprice"),
        "l_quantity" -> col("l_quantity"))
      val aggExprs = metrics.flatMap { case (m, c) =>
        side(!isNew, c, s"ref_$m") ++ side(isNew, c, s"new_$m")
      }
      val agg1 = t(s, dir, "lineitem")
        .select(col("l_shipdate") +: metrics.map(_._2): _*)
        .agg(aggExprs.head, aggExprs.tail: _*)
        .transform(graft.Checkpoint.of)
      metrics.map { case (m, _) =>
        agg1.select(lit(m).as("metric"),
          coalesce(col(s"n_ref_$m"), lit(0L)).cast("long").as("n_ref"),
          coalesce(col(s"n_new_$m"), lit(0L)).cast("long").as("n_new"),
          // Empty slice → NULL mean (never DIVIDE_BY_ZERO under ANSI;
          // the driver HAS regenerated tables mid-round — a shipdate
          // split can legitimately go one-sided).
          expr(s"CASE WHEN coalesce(n_ref_$m, 0) = 0 THEN NULL " +
            s"ELSE s_ref_$m DIV n_ref_$m END").cast("double")
            .as("ref_mean_micro"),
          expr(s"CASE WHEN coalesce(n_new_$m, 0) = 0 THEN NULL " +
            s"ELSE s_new_$m DIV n_new_$m END").cast("double")
            .as("new_mean_micro"))
      }.reduce(_ unionByName _)
        .withColumn("diff_micro",
          col("new_mean_micro") - col("ref_mean_micro"))
        .orderBy("metric")
    },
    Some("""WITH agg AS (
      SELECT
        SUM(CASE WHEN l_shipdate < '1998-01-01'
          THEN (l_discount::DECIMAL(18,6) * 1000000)::HUGEINT
          ELSE 0 END) AS s_ref_disc,
        SUM(CASE WHEN l_shipdate >= '1998-01-01'
          THEN (l_discount::DECIMAL(18,6) * 1000000)::HUGEINT
          ELSE 0 END) AS s_new_disc,
        SUM(CASE WHEN l_shipdate < '1998-01-01'
          THEN (l_extendedprice::DECIMAL(18,6) * 1000000)::HUGEINT
          ELSE 0 END) AS s_ref_price,
        SUM(CASE WHEN l_shipdate >= '1998-01-01'
          THEN (l_extendedprice::DECIMAL(18,6) * 1000000)::HUGEINT
          ELSE 0 END) AS s_new_price,
        SUM(CASE WHEN l_shipdate < '1998-01-01'
          THEN (l_quantity::DECIMAL(18,6) * 1000000)::HUGEINT
          ELSE 0 END) AS s_ref_qty,
        SUM(CASE WHEN l_shipdate >= '1998-01-01'
          THEN (l_quantity::DECIMAL(18,6) * 1000000)::HUGEINT
          ELSE 0 END) AS s_new_qty,
        SUM(CASE WHEN l_shipdate < '1998-01-01' THEN 1 ELSE 0 END)
          AS n_ref,
        SUM(CASE WHEN l_shipdate >= '1998-01-01' THEN 1 ELSE 0 END)
          AS n_new
      FROM lineitem)
    SELECT metric, COALESCE(n_ref, 0)::BIGINT AS n_ref,
      COALESCE(n_new, 0)::BIGINT AS n_new,
      (CASE WHEN COALESCE(n_ref, 0) = 0 THEN NULL
        ELSE s_ref // n_ref END)::DOUBLE AS ref_mean_micro,
      (CASE WHEN COALESCE(n_new, 0) = 0 THEN NULL
        ELSE s_new // n_new END)::DOUBLE AS new_mean_micro,
      (CASE WHEN COALESCE(n_ref, 0) = 0 OR COALESCE(n_new, 0) = 0
        THEN NULL
        ELSE (s_new // n_new) - (s_ref // n_ref) END)::DOUBLE
        AS diff_micro
    FROM (
      SELECT 'l_discount' AS metric, s_ref_disc AS s_ref,
        s_new_disc AS s_new, n_ref, n_new FROM agg
      UNION ALL
      SELECT 'l_extendedprice', s_ref_price, s_new_price, n_ref, n_new
      FROM agg
      UNION ALL
      SELECT 'l_quantity', s_ref_qty, s_new_qty, n_ref, n_new FROM agg)
    ORDER BY metric"""))

  /** Shared window/σ constants — ONE definition for the batch query
    * and [[graft.streaming.Streaming.volumeAnomalySink]] (the
    * bit-equality contract between the twins depends on them; see the
    * driftSink constant-sharing rule). The oracle SQL interpolates the
    * SAME values.
    */
  private[graft] val VOL_WINDOW = 14
  private[graft] val VOL_WARMUP = 7

  /** The anomaly report from any (day, n_events) date-grain frame —
    * shared by `dq_volume_anomaly` and the streaming sink.
    *
    * The input is densified over a CALENDAR SPINE first: a day with no
    * events produces no aggregate row, and without the spine the
    * headline failure mode — a TOTAL outage day — would be invisible
    * (no row, and the ROWS window would silently stretch the lookback
    * across the gap). Zero-filled days participate like any other:
    * after a steady week, an outage day's dev² = S₁² > 0 = 9·(nS₂−S₁²),
    * so the alarm fires. An empty input stays empty (NULL bounds →
    * empty sequence — totality preserved).
    */
  private[graft] def volumeReport(dailyRaw: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    // two consumers (bounds + join) of a date-grain frame
    val dailyCk = graft.Checkpoint.of(dailyRaw)
    val spine = dailyCk.agg(min("day").as("d0"), max("day").as("d1"))
      .filter(col("d0").isNotNull)
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = spine.join(dailyCk, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_events"), lit(0L)).as("n_events"))
    val w = Window.partitionBy("g").orderBy("day")
      .rowsBetween(-VOL_WINDOW, -1)
    val vD = col("n_events").cast(dec)
    val dev = vD * col("n_prev") - col("s1")
    daily.withColumn("g", lit(1))
      .withColumn("n_prev", count(col("n_events")).over(w))
      .withColumn("s1", sum(vD).over(w))
      .withColumn("s2", sum((vD * vD).cast(dec)).over(w))
      .select(col("day"), col("n_events"), col("n_prev"),
        (col("n_prev") >= VOL_WARMUP &&
          dev * dev >
            (col("n_prev") * col("s2") - col("s1") * col("s1")) * 9)
          .as("is_anomaly"))
      .orderBy("day")
  }

  /** Daily INGEST-VOLUME anomaly — the third data-quality tier (dqRules:
    * hard constraints; dqDrift: distribution shift; this: pipeline
    * health): flag days whose event volume deviates more than 3σ from
    * the trailing-[[VOL_WINDOW]]-day window — a scraper outage, a
    * duplicated feed, or a backfill all show up here before any content
    * check fires. Exactly the q35 integer trick at DATE grain:
    * `|v−μ|>3σ ⇔ (v·n−S₁)² > 9(n·S₂−S₁²)` over exact
    * DECIMAL(38,0)/HUGEINT daily counts (counts at 100 TB reach
    * 10⁹/day — squares at 10¹⁸ already need the wide lane), warm-up
    * days (n_prev < [[VOL_WARMUP]]) report false, and every day reports
    * (totality — a DQ dashboard wants the full calendar, not just
    * alarms; the steady synthetic feed keeps these rows all-false, so
    * DqSpec proves the alarm fires on a constructed spike).
    *
    * Scale: ONE map-side-combined date-grain aggregate over the events
    * scan; the window runs on the ≤|days| thin frame (a single
    * partition of date-grain rows — ~36k rows per century, trainer-
    * state-sized, never the corpus).
    */
  private val dqVolume = Q(
    "dq_volume_anomaly",
    (s, dir) => volumeReport(
      Tables.events(s, dir)
        .groupBy(expr("ts_ms DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n_events"))),
    Some(s"""WITH daily0 AS MATERIALIZED (
      SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY 1),
    spine AS (SELECT UNNEST(range((SELECT MIN(day) FROM daily0),
      (SELECT MAX(day) FROM daily0) + 1)) AS day),
    daily AS (
      SELECT s.day, COALESCE(d.n_events, 0)::BIGINT AS n_events
      FROM spine s LEFT JOIN daily0 d USING (day)),
    win AS (
      SELECT *, COUNT(n_events) OVER w AS n_prev,
        SUM(n_events::HUGEINT) OVER w AS s1,
        SUM(n_events::HUGEINT * n_events::HUGEINT) OVER w AS s2
      FROM daily
      WINDOW w AS (ORDER BY day
        ROWS BETWEEN $VOL_WINDOW PRECEDING AND 1 PRECEDING))
    SELECT day::BIGINT AS day, n_events, n_prev::BIGINT AS n_prev,
      (n_prev >= $VOL_WARMUP AND
        (n_events::HUGEINT * n_prev - s1) * (n_events::HUGEINT * n_prev - s1)
          > 9 * (n_prev * s2 - s1 * s1)) AS is_anomaly
    FROM win ORDER BY day"""))

  val all: Seq[Q] = Seq(dqRules, dqDrift, dqVolume)
}
