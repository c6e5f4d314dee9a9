package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Exact, Q, Tables}
import graft.Exact._

/** Relational core — SURVEY.md §2.2 + §2.3 composed operators.
  *
  * Every query ends in a total deterministic order (unique tie-break keys)
  * and every double is derived via Exact.* so the DuckDB oracle hashes
  * identically. Scale notes per query: filters/projections sit directly on
  * the scan (pushdown), small dims are broadcast, and aggregations rely on
  * Spark's partial (map-side) aggregation — no driver-side loops anywhere.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---------------------------------------------------------------- q01
  private val q01 = Q(
    "q01_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val charge = discPrice * (lit(1) + col("l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          dsum6(discPrice).as("sum_disc_price"),
          dsum6(charge).as("sum_charge"),
          davg2(col("l_quantity")).as("avg_qty"),
          davg2(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlSum2("l_quantity", "sum_qty")},
      ${sqlSum2("l_extendedprice", "sum_base_price")},
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
      ${sqlSum6("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
      ${sqlAvg2("l_quantity", "avg_qty")},
      ${sqlAvg2("l_extendedprice", "avg_price")},
      COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  private val q02 = Q(
    "q02_filter_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01").cast(TimestampNTZType)
          && col("l_discount") >= lit(0.08))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "l_extendedprice", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount >= 0.08
    ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q03
  private val q03 = Q(
    "q03_join_agg",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast(TimestampNTZType))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1999-01-01").cast(TimestampNTZType))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 20"""))

  // ---------------------------------------------------------------- q04
  private val q04 = Q(
    "q04_broadcast_join",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          dsum2(col("s_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      ${sqlSum2("s_acctbal", "total_acctbal")}
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  // ---------------------------------------------------------------- q05
  private val q05 = Q(
    "q05_multi_join",
    (s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampNTZType)
          && col("o_orderdate") < lit("1997-01-01").cast(TimestampNTZType))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name,
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // ---------------------------------------------------------------- q06
  private val q06 = Q(
    "q06_selective_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampNTZType)
          && col("l_shipdate") < lit("1997-01-01").cast(TimestampNTZType)
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items")),
    Some(s"""SELECT ${sqlSum6("l_extendedprice * l_discount", "revenue")},
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""))

  // ---------------------------------------------------------------- q07
  private val q07 = Q(
    "q07_window",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "running_spend")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn, running_spend
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS rn,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_spend
      FROM orders)
    WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q08
  private val q08 = Q(
    "q08_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // ---------------------------------------------------------------- q09
  private val q09 = Q(
    "q09_distinct",
    (s, dir) =>
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        countDistinct(col("o_custkey"), col("o_orderpriority"))
          .as("n_cust_prio"),
        count(lit(1)).as("n_orders")),
    Some("""SELECT COUNT(DISTINCT o_custkey) AS n_cust,
      COUNT(DISTINCT o_orderpriority) AS n_prio,
      COUNT(DISTINCT (o_custkey, o_orderpriority)) AS n_cust_prio,
      COUNT(*) AS n_orders
    FROM orders"""))

  // ---------------------------------------------------------------- q10
  private val q10 = Q(
    "q10_semi_join",
    (s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select("o_custkey")
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q11
  private val q11 = Q(
    "q11_anti_join",
    (s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q12
  private val q12 = Q(
    "q12_union_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val hi = li.filter(col("l_quantity") >= 30)
        .select(lit("hi").as("src"), col("l_extendedprice").as("value"))
      val lo = li.filter(col("l_quantity") < 30)
        .select(lit("lo").as("src"), col("l_extendedprice").as("value"))
      hi.unionAll(lo)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("total"))
        .orderBy(col("src"))
    },
    Some(s"""SELECT src, COUNT(*) AS n, ${sqlSum2("value", "total")}
    FROM (
      SELECT 'hi' AS src, l_extendedprice AS value FROM lineitem
        WHERE l_quantity >= 30
      UNION ALL
      SELECT 'lo' AS src, l_extendedprice AS value FROM lineitem
        WHERE l_quantity < 30)
    GROUP BY src ORDER BY src"""))

  // ---------------------------------------------------------------- q13
  private val q13 = Q(
    "q13_left_join_agg",
    (s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  // ---------------------------------------------------------------- q14
  private val q14 = Q(
    "q14_date_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum2(col("o_totalprice")).as("total"))
        .orderBy(col("month")),
    Some(s"""SELECT date_trunc('month', o_orderdate) AS month,
      COUNT(*) AS n_orders, ${sqlSum2("o_totalprice", "total")}
    FROM orders GROUP BY 1 ORDER BY month"""))

  // ---------------------------------------------------------------- q15
  private val q15 = Q(
    "q15_rollup",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          dsum2(col("s_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some(s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      ${sqlSum2("s_acctbal", "total_acctbal")}
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q16
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val q16 = Q(
    "q16_pivot",
    (s, dir) => {
      val piv = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      piv.select(col("user_id") +:
          eventTypes.map(e => coalesce(col(e), lit(0L)).as(e)): _*)
        .orderBy(col("user_id"))
    },
    Some(s"""SELECT user_id,
      ${eventTypes.map(e =>
        s"COUNT(*) FILTER (WHERE event_type = '$e') AS $e").mkString(",\n      ")}
    FROM events GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- q17
  private val q17 = Q(
    "q17_json",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(col("k")).as("n_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
    FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- q18
  private val q18 = Q(
    "q18_corr_scalar",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val thr = cust.agg((dsum2(col("c_acctbal")) / count(lit(1)))
        .as("threshold"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("threshold"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
      FROM customer)
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q19
  private val q19 = Q(
    "q19_having",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_items"), dsum2(col("l_quantity")).as("total_qty"))
        .filter(col("n_items") >= 40)
        .orderBy(col("l_partkey")),
    Some(s"""SELECT l_partkey, COUNT(*) AS n_items,
      ${sqlSum2("l_quantity", "total_qty")}
    FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 40
    ORDER BY l_partkey"""))

  // ---------------------------------------------------------------- q20
  private val q20 = Q(
    "q20_sessionize",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select("user_id", "event_id", "ts_ms", "value")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      e.withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ms").isNull
            || col("ts_ms") - col("prev_ms") > 1800000L, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("start_ms"),
          max(col("ts_ms")).as("end_ms"),
          dsum2(col("value")).as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some(s"""WITH e AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
    f AS (SELECT *, LAG(ts_ms) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
    g AS (SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      THEN 1 ELSE 0 END AS is_new FROM f),
    h AS (SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id FROM g)
    SELECT user_id, session_id, COUNT(*) AS n_events,
      MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
      ${sqlSum2("value", "total_value")}
    FROM h GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  // ---------------------------------------------------------------- q21
  private val q21 = Q(
    "q21_stream_window",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("hour_ms", expr("(ts_ms DIV 3600000) * 3600000"))
        .groupBy(col("hour_ms"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("total_value"))
        .orderBy(col("hour_ms"), col("event_type")),
    Some(s"""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      COUNT(*) AS n_events, ${sqlSum2("value", "total_value")}
    FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type"""))

  // ---------------------------------------------------------------- q22
  private val q22 = Q(
    "q22_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsum2(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first),
    Some(s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
      ${sqlSum2("o_totalprice", "total")}
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority ASC NULLS FIRST,
      o_orderstatus ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q23
  private val q23 = Q(
    "q23_window_funcs",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("rnk", rank().over(w).cast(LongType))
        .withColumn("drnk", dense_rank().over(w).cast(LongType))
        .withColumn("quartile", ntile(4).over(w).cast(LongType))
        .withColumn("next_price", lead(col("l_extendedprice"), 1).over(w))
        .filter(col("rnk") <= 8)
        .orderBy("l_suppkey", "rnk", "l_orderkey", "l_linenumber")
    },
    Some("""SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        RANK() OVER w AS rnk,
        DENSE_RANK() OVER w AS drnk,
        NTILE(4) OVER w AS quartile,
        LEAD(l_extendedprice, 1) OVER w AS next_price
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
    WHERE rnk <= 8
    ORDER BY l_suppkey, rnk, l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q24
  /** q20's gap sessionization via Spark's NATIVE session_window operator
    * (one aggregation, merge-able session state — the same code runs in
    * Structured Streaming). The oracle recomputes sessions with the
    * lag+cumsum formulation, proving the two definitions coincide.
    */
  private val q24 = Q(
    "q24_session_window",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("event_time", timestamp_millis(col("ts_ms")))
        .groupBy(col("user_id"),
          session_window(col("event_time"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("start_ms"),
          max(col("ts_ms")).as("end_ms"),
          dsum2(col("value")).as("total_value"))
        .select("user_id", "n_events", "start_ms", "end_ms", "total_value")
        .orderBy("user_id", "start_ms"),
    Some(s"""WITH e AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
    f AS (SELECT *, LAG(ts_ms) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
    -- session_window ends are EXCLUSIVE: an event landing exactly at
    -- prev + gap starts a NEW session (>=, not >)
    g AS (SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms >= 1800000
      THEN 1 ELSE 0 END AS is_new FROM f),
    h AS (SELECT *, SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id, COUNT(*) AS n_events,
      MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
      ${sqlSum2("value", "total_value")}
    FROM h GROUP BY user_id, session_id ORDER BY user_id, start_ms"""))

  // ---------------------------------------------------------------- q25
  /** Set operators: customers ordering in BOTH 1995 and 1996 (INTERSECT)
    * minus anyone with a 1997 order (EXCEPT). Each leg is a pruned scan +
    * distinct; Catalyst plans INTERSECT/EXCEPT as left-semi/anti joins on
    * the deduplicated keys — no full materialization of either side.
    */
  private val q25 = Q(
    "q25_set_ops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def buyersIn(year: Int) =
        o.filter(expr(s"year(o_orderdate) = $year"))
          .select(col("o_custkey")).distinct()
      buyersIn(1995).intersect(buyersIn(1996))
        .except(buyersIn(1997))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- q26
  /** Explicit NON-hierarchical GROUPING SETS — ((mktsegment), (year)):
    * two independent aggregation lattices in one pass, which neither
    * ROLLUP (q15) nor CUBE (q22) expresses. Spark 4's native
    * `Dataset.groupingSets` plans ONE Expand + one hash aggregate — the
    * same single-shuffle shape as a plain groupBy, not two jobs unioned.
    */
  private val q26 = Q(
    "q26_grouping_sets",
    (s, dir) => {
      val j = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .withColumn("o_year", expr("year(o_orderdate)").cast("long"))
      j.groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("o_year"))),
          col("c_mktsegment"), col("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          dsum2(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("o_year").asc_nulls_first)
    },
    Some(s"""SELECT c_mktsegment, year(o_orderdate)::BIGINT AS o_year,
      COUNT(*) AS n_orders, ${sqlSum2("o_totalprice", "total")}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (year(o_orderdate)::BIGINT))
    ORDER BY c_mktsegment ASC NULLS FIRST, o_year ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q27
  /** RANGE-frame window (value-based, not row-based): per event, the
    * exact-decimal sum and count of the SAME USER's events in the
    * trailing hour — the sliding-lookback feature a feature-store
    * pipeline computes. ROWS frames (q07/q23) bound by row offsets; the
    * RANGE frame here bounds by the ordering VALUE (ts_ms − 3 600 000),
    * so frame membership is deterministic regardless of tie order, and
    * the decimal sum keeps the aggregate order-independent on top.
    */
  private val q27 = Q(
    "q27_range_window",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
        .rangeBetween(-3600000L, 0L)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(col("value").cast(DecimalType(18, 2)))
          .over(w).cast("double"))
        .select("user_id", "event_id", "ts_ms", "n_1h", "sum_1h")
        .orderBy("user_id", "ts_ms", "event_id")
    },
    Some("""SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      COUNT(*) OVER w AS n_1h,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts_ms, event_id"""))

  // ---------------------------------------------------------------- q28
  /** Ordered funnel (view → click → purchase): per user, the first view,
    * the first click AFTER that view, the first purchase AFTER that
    * click — the product-analytics staple. Three thin per-user
    * aggregates chained by broadcast-able joins (each stage's frame is
    * one row per user); integer-millisecond arithmetic end-to-end.
    */
  private val q28 = Q(
    "q28_funnel",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_ms"))
      def stage(t: String) = e.filter(col("event_type") === t)
      val v = stage("view").groupBy("user_id")
        .agg(min("ts_ms").as("t_view"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts_ms") > col("t_view"))
        .groupBy("user_id").agg(min("ts_ms").as("t_click"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts_ms") > col("t_click"))
        .groupBy("user_id").agg(min("ts_ms").as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"))
        .orderBy("user_id")
    },
    Some("""WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    v AS (SELECT user_id, MIN(ts_ms) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(ts_ms) AS t_click
      FROM e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts_ms > t_view GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(ts_ms) AS t_purchase
      FROM e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts_ms > t_click
      GROUP BY e.user_id)
    SELECT user_id, t_view, t_click, t_purchase
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    ORDER BY user_id"""))

  // ---------------------------------------------------------------- q29
  /** Cohort retention matrix: users bucketed by the INTEGER epoch-week
    * of their first event, counted distinct per (cohort week, active
    * week). Pure integer week arithmetic (`ts_ms DIV 604800000`) — no
    * calendar/timezone/week-start semantics to drift between engines.
    * Two thin aggregates; the first-event frame joins back broadcast-
    * style on user_id.
    */
  private val q29 = Q(
    "q29_cohort",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ms DIV 604800000").as("wk"))
      val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      e.join(cohort, "user_id")
        .groupBy("cohort_wk", "wk")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_wk", "wk")
    },
    Some("""WITH e AS (
      SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
    c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
    SELECT cohort_wk, wk, COUNT(DISTINCT user_id) AS n_users
    FROM e JOIN c USING (user_id)
    GROUP BY cohort_wk, wk ORDER BY cohort_wk, wk"""))

  // ---------------------------------------------------------------- q30
  /** CDC-style latest-record dedup: keep the newest event per
    * (user, event_type) — the compaction every change-stream ingest runs
    * before joining dimensions. One row_number window over thin
    * (key, ts, id) rows, ties broken by event_id so both engines pick
    * the identical row; at scale this is the shape to replace with
    * `max_by` / sort-merge on a bucketed key when the key space is huge.
    */
  private val q30 = Q(
    "q30_latest_per_key",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts_ms"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("latest_event_id"),
          col("ts_ms").as("latest_ms"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, latest_event_id, latest_ms FROM (
      SELECT user_id, event_type, event_id AS latest_event_id,
        epoch_ms(ts) AS latest_ms,
        row_number() OVER (PARTITION BY user_id, event_type
          ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1 ORDER BY user_id, event_type"""))

  // ---------------------------------------------------------------- q31
  /** Rolling 7-day per-user aggregates — the RANGE-frame feature-
    * engineering shape (q27's range window counts events in a fixed
    * bucket; this is the sliding event-time frame ML feature pipelines
    * compute per interaction): for every event, the sum/count of the
    * user's events in `[ts − 7d, ts]`. One RANGE window over the
    * user-partitioned time sort; values ride as floor-micro longs so the
    * sums are integer-exact (`::BIGINT` on the DuckDB side — SUM of
    * BIGINT surfaces as HUGEINT otherwise). RANGE frames include
    * timestamp PEERS in both engines, so ties contribute identically.
    */
  private val q31 = Q(
    "q31_rolling_window",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms")
        .rangeBetween(-604800000L, 0L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          floor(col("value") * 1000000d).cast("long").as("vm"))
        .withColumn("roll_sum_micro", sum("vm").over(w))
        .withColumn("roll_n", count(lit(1)).over(w))
        .select("event_id", "user_id", "ts_ms", "roll_sum_micro", "roll_n")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      (SUM(FLOOR(value * 1000000)::BIGINT) OVER (PARTITION BY user_id
        ORDER BY epoch_ms(ts)
        RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW))::BIGINT
        AS roll_sum_micro,
      COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
        AS roll_n
    FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- q32
  /** Salted skewed join under the oracle gate — the [[Skew]] machinery
    * (spec-only until now) run end-to-end: lineitem joined against the
    * supplier dim with an 8-way salt (each supplier row replicated 8×,
    * each fact row routed to one replica by a seeded rand), then
    * aggregated per nation. The salt only ROUTES rows, so the result is
    * provably identical to the plain equi-join the oracle runs — the
    * exact property that makes salting safe to drop into a production
    * plan when one reducer owns a hot key even after map-side combine.
    * Exact decimal revenue (SURVEY §5). Scale: the replicated side is
    * |supplier|·8 — dimension-sized; the fact side is scanned once with
    * no extra shuffle beyond the join's own exchange.
    */
  private val q32 = Q(
    "q32_skew_salted",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      Skew.saltedJoin(li, sup, "s_suppkey", 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("s_nationkey")
    },
    Some(s"""SELECT s_nationkey, COUNT(*) AS n_items,
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ---------------------------------------------------------------- q33
  /** SCD type-2 interval build — the other half of the CDC pair with
    * [[q30]]: q30 keeps only the LATEST record per key; this keeps them
    * ALL, turning each (user, event_type) change stream into validity
    * intervals `[valid_from, valid_to)` via one `lead` over a
    * per-key sort — the slowly-changing-dimension table every
    * point-in-time join (and our as-of family) reads at a warehouse.
    * Open intervals (`valid_to IS NULL`) are flagged `is_current`.
    * Determinism: the window orders by (ts_ms, event_id) so same-ms
    * events chain identically in both engines; all-integer output.
    * Scale: ONE hash exchange on the key + per-partition sort — the
    * same shape as q23's windows; no joins, no second pass.
    */
  private val q33 = Q(
    "q33_scd2_intervals",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("valid_from", "event_id")
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_ms").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
      epoch_ms(ts) AS valid_from,
      lead(epoch_ms(ts)) OVER (PARTITION BY user_id, event_type
        ORDER BY epoch_ms(ts), event_id) AS valid_to,
      lead(epoch_ms(ts)) OVER (PARTITION BY user_id, event_type
        ORDER BY epoch_ms(ts), event_id) IS NULL AS is_current
    FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- q34
  /** Time-series RESAMPLE — downsample each user's event stream into
    * per-hour OHLC bars (open/high/low/close + count), the kdb/Flink
    * staple that turns a raw tick stream into a fixed-rate feature
    * table. Open/close are the FIRST/LAST values by (ts_ms, event_id) —
    * the unique tie-break makes both engines pick the identical event
    * when a user has same-ms ticks. Values are floor-micro integers
    * (SURVEY §5), buckets are integer epoch-hour floors — nothing to
    * drift. Scale: one hash exchange on (user, bucket) feeds both
    * window passes (ascending + descending rank over the SAME
    * partitioning — the second is a sort within already-exchanged
    * partitions, not a new shuffle) and the final aggregate.
    */
  private val q34 = Q(
    "q34_resample_ohlc",
    (s, dir) => {
      val base = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          floor(col("value") * 1000000d).cast("long").as("vm"))
        .withColumn("bucket_ms", expr("ts_ms DIV 3600000 * 3600000"))
      val wa = Window.partitionBy("user_id", "bucket_ms")
        .orderBy(col("ts_ms"), col("event_id"))
      val wd = Window.partitionBy("user_id", "bucket_ms")
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      base
        .withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy("user_id", "bucket_ms")
        .agg(max(when(col("rn_a") === 1, col("vm"))).as("open_micro"),
          max("vm").as("high_micro"),
          min("vm").as("low_micro"),
          max(when(col("rn_d") === 1, col("vm"))).as("close_micro"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "bucket_ms")
    },
    Some("""WITH base AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        FLOOR(value * 1000000)::BIGINT AS vm,
        (epoch_ms(ts) // 3600000 * 3600000)::BIGINT AS bucket_ms
      FROM events),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id, bucket_ms
          ORDER BY ts_ms, event_id) AS rn_a,
        row_number() OVER (PARTITION BY user_id, bucket_ms
          ORDER BY ts_ms DESC, event_id DESC) AS rn_d
      FROM base)
    SELECT user_id, bucket_ms,
      MAX(CASE WHEN rn_a = 1 THEN vm END)::BIGINT AS open_micro,
      MAX(vm)::BIGINT AS high_micro,
      MIN(vm)::BIGINT AS low_micro,
      MAX(CASE WHEN rn_d = 1 THEN vm END)::BIGINT AS close_micro,
      COUNT(*) AS n_events
    FROM ranked GROUP BY user_id, bucket_ms
    ORDER BY user_id, bucket_ms"""))

  // ---------------------------------------------------------------- q35
  /** Trailing-window Z-SCORE anomaly detection — the monitoring staple
    * (flag an event whose value sits > 3σ from the mean of the user's
    * previous ≤ 20 events). The detector stays EXACT across engines by
    * never computing μ, σ or a square root: `|v − μ| > 3σ` over the
    * n-row trailing frame is equivalently `(v·n − S)² > 9·(n·ΣvΔ² …)`
    * — i.e. `(v·n − S₁)² > 9·(n·S₂ − S₁²)` with S₁=Σv, S₂=Σv² — all in
    * floor-micro integer values, carried as DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB) since the squares reach ~10²⁰. Warm-up rows
    * (n < 10) are not judged, mirroring any production detector.
    *
    * Scale: one hash exchange on user_id + per-partition sort serves
    * all three trailing sums (same window frame), then a map-side
    * filter — the q31 rolling shape; no joins, no second shuffle.
    */
  private val q35 = Q(
    "q35_anomaly_zscore",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
        .rowsBetween(-20, -1)
      val vmD = col("vm").cast(DecimalType(38, 0))
      val base = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          floor(col("value") * 1000000d).cast("long").as("vm"))
      val dev = vmD * col("n_win") - col("s1")
      base
        .withColumn("n_win", count(col("vm")).over(w))
        .withColumn("s1", sum(vmD).over(w))
        .withColumn("s2", sum(vmD * vmD).over(w))
        .filter(col("n_win") >= 10 &&
          dev * dev > (col("n_win") * col("s2") - col("s1") * col("s1")) * 9)
        .select(col("event_id"), col("user_id"), col("ts_ms"), col("vm"),
          col("n_win"))
        .orderBy("event_id")
    },
    Some("""WITH base AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        FLOOR(value * 1000000)::BIGINT AS vm
      FROM events),
    win AS (
      SELECT *,
        COUNT(vm) OVER w AS n_win,
        SUM(vm::HUGEINT) OVER w AS s1,
        SUM(vm::HUGEINT * vm::HUGEINT) OVER w AS s2
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, ts_ms, vm, n_win::BIGINT AS n_win
    FROM win
    WHERE n_win >= 10
      AND (vm::HUGEINT * n_win - s1) * (vm::HUGEINT * n_win - s1)
          > 9 * (n_win * s2 - s1 * s1)
    ORDER BY event_id"""))

  // ---------------------------------------------------------------- q36
  /** Event-type MARKOV TRANSITION matrix — the generalization of the
    * q28 funnel: for every ordered pair of consecutive events of the
    * same user, count (prev_type → type) and express it as an exact
    * integer millionths-share of the previous type's outgoing total
    * (`n·10⁶ DIV total_out`) — the first-order behavioral model product
    * analytics reads (and the sessionize/funnel sanity check: rows of
    * the matrix sum to ≤ 10⁶ by construction). First events per user
    * have no predecessor and are excluded, mirroring `lag IS NOT NULL`.
    *
    * Scale: one hash exchange on user_id + per-partition sort for the
    * lag, then a map-side-combined aggregate on ≤|types|² keys,
    * CHECKPOINTED so both consumers (outgoing totals + final join)
    * read the materialized tiny frame — no second pass over the data
    * regardless of how AQE plans the broadcast.
    */
  private val q36 = Q(
    "q36_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        // two consumers (totals + final join): the barrier keeps the
        // event scan + lag window single-pass even when AQE's broadcast
        // conversion defeats ReusedExchange (the q40/dedup_substring trap)
        .transform(graft.Checkpoint.of)
      val totals = pairs.groupBy("prev_type")
        .agg(sum("n").as("total_out"))
      pairs.join(broadcast(totals), "prev_type")
        .select(col("prev_type"), col("event_type"), col("n"),
          expr("n * 1000000 DIV total_out").as("rate_micro"))
        .orderBy("prev_type", "event_type")
    },
    Some("""WITH ordered AS (
      SELECT user_id, event_type,
        lag(event_type) OVER (PARTITION BY user_id
          ORDER BY epoch_ms(ts), event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type, COUNT(*)::BIGINT AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
    totals AS (
      SELECT prev_type, SUM(n)::BIGINT AS total_out
      FROM pairs GROUP BY prev_type)
    SELECT p.prev_type, p.event_type, p.n,
      (p.n * 1000000 // t.total_out)::BIGINT AS rate_micro
    FROM pairs p JOIN totals t USING (prev_type)
    ORDER BY prev_type, event_type"""))

  // ---------------------------------------------------------------- q37
  /** Per-type INTER-ARRIVAL gap percentiles — the latency/cadence
    * distribution table (p50/p90/p99 of the time between a user's
    * consecutive events of a type) every on-call dashboard and
    * session-gap calibration reads (q20's 30-min gap is exactly the
    * knee this table exposes). Gaps are integer millis from one lag
    * window; percentiles are PERCENTILE_DISC selected by the
    * exact_quantiles integer-rank rule (`rn·q ≥ n·p' ∧ (rn−1)·q <
    * n·p'`) so both engines pick the identical order statistic — no
    * float index math anywhere.
    *
    * Scale: the lag shuffles on user_id; the rank windows shuffle the
    * thin (type, gap) stream on event_type — two hash exchanges of
    * narrow rows, map-side column pruning to 4 columns at the scan.
    */
  private val q37 = Q(
    "q37_interarrival",
    (s, dir) => {
      val wLag = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_ms"), col("event_id"))
      val wRank = Window.partitionBy("event_type").orderBy("gap_ms")
      val wAll = Window.partitionBy("event_type")
      def pick(num: Int, den: Int) = max(when(
        col("rn") * den >= col("n") * num &&
          (col("rn") - 1) * den < col("n") * num, col("gap_ms")))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_ms"),
          col("event_id"))
        .withColumn("gap_ms", col("ts_ms") - lag(col("ts_ms"), 1).over(wLag))
        .filter(col("gap_ms").isNotNull)
        .withColumn("rn", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("event_type")
        .agg(pick(1, 2).as("p50_ms"), pick(9, 10).as("p90_ms"),
          pick(99, 100).as("p99_ms"), max(col("n")).as("n_gaps"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (
      SELECT event_type,
        epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
          PARTITION BY user_id, event_type
          ORDER BY epoch_ms(ts), event_id) AS gap_ms
      FROM events),
    r AS (
      SELECT event_type, gap_ms,
        row_number() OVER (PARTITION BY event_type ORDER BY gap_ms) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM g WHERE gap_ms IS NOT NULL)
    SELECT event_type,
      MAX(CASE WHEN rn * 2 >= n * 1 AND (rn - 1) * 2 < n * 1
        THEN gap_ms END) AS p50_ms,
      MAX(CASE WHEN rn * 10 >= n * 9 AND (rn - 1) * 10 < n * 9
        THEN gap_ms END) AS p90_ms,
      MAX(CASE WHEN rn * 100 >= n * 99 AND (rn - 1) * 100 < n * 99
        THEN gap_ms END) AS p99_ms,
      MAX(n)::BIGINT AS n_gaps
    FROM r GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- q38
  /** Order-to-ship DELAY distribution per priority — the TPC-H-shaped
    * SLA report (did URGENT orders actually ship faster?): join the
    * fact table to orders on the order key, delay = integer epoch-DAY
    * floor difference (`unix_micros DIV 86.4e9` both engines — no
    * date-boundary semantics to disagree on), p50/p90/p99 by the
    * exact_quantiles integer-rank rule.
    *
    * Scale: the one big stage is the orderkey shuffle join of two fact
    * tables (both sides pruned to 2–3 columns at the scan); the rank
    * windows then shuffle thin (priority, delay) pairs — at 100 TB
    * bucketing both tables by orderkey (writeBucketed) makes the join
    * zero-exchange, the same recipe the as-of suite demonstrates.
    */
  private val q38 = Q(
    "q38_shipping_delay",
    (s, dir) => {
      val wRank = Window.partitionBy("o_orderpriority").orderBy("delay_days")
      val wAll = Window.partitionBy("o_orderpriority")
      def pick(num: Int, den: Int) = max(when(
        col("rn") * den >= col("n") * num &&
          (col("rn") - 1) * den < col("n") * num, col("delay_days")))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " DIV 86400000000").as("od"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " DIV 86400000000").as("sd"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), (col("sd") - col("od"))
          .as("delay_days"))
        .withColumn("rn", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("o_orderpriority")
        .agg(pick(1, 2).as("p50_days"), pick(9, 10).as("p90_days"),
          pick(99, 100).as("p99_days"), max(col("n")).as("n_lines"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH d AS (
      SELECT o_orderpriority,
        epoch_ms(l_shipdate) // 86400000
          - epoch_ms(o_orderdate) // 86400000 AS delay_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    r AS (
      SELECT o_orderpriority, delay_days,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY delay_days) AS rn,
        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM d)
    SELECT o_orderpriority,
      MAX(CASE WHEN rn * 2 >= n * 1 AND (rn - 1) * 2 < n * 1
        THEN delay_days END)::BIGINT AS p50_days,
      MAX(CASE WHEN rn * 10 >= n * 9 AND (rn - 1) * 10 < n * 9
        THEN delay_days END)::BIGINT AS p90_days,
      MAX(CASE WHEN rn * 100 >= n * 99 AND (rn - 1) * 100 < n * 99
        THEN delay_days END)::BIGINT AS p99_days,
      MAX(n)::BIGINT AS n_lines
    FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q39
  /** Per-user FEATURE-STORE row — the materialized user-feature table
    * every downstream model joins against (churn, ranking, abuse):
    * event volume, active-day count, type diversity as both a distinct
    * count and a Shannon ENTROPY over the user's event-type
    * distribution (the behavioral-diversity feature; one dominant type
    * ⇒ 0, uniform over k types ⇒ log2 k — in the repo's fixed-point
    * 2⁻²⁰ integer log2, no transcendental ln), and exact floor-micro
    * value totals.
    *
    * Scale: ONE pass aggregates (user, type) counts map-side-combined;
    * the per-user roll-up re-aggregates those thin keys; the
    * day/value directs are a second map-side-combined user aggregate;
    * the user-key join of the two is co-partitioned (same key). No
    * windows, nothing corpus²-shaped.
    */
  private val q39 = Q(
    "q39_user_features",
    (s, dir) => {
      val ilog2 = graft.text.Sampling.ilog2m20 _
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          expr("ts_ms DIV 86400000").as("day"),
          floor(col("value") * 1000000d).cast("long").as("vm"))
      val byType = ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
      val diversity = byType.groupBy("user_id")
        .agg(count(lit(1)).as("n_types"),
          sum("c").as("n_events"),
          sum(expr(s"c * ${ilog2("c")}")).as("clc"))
        .withColumn("type_entropy_m20",
          expr(s"${ilog2("n_events")} - clc DIV n_events"))
      val direct = ev.groupBy("user_id")
        .agg(countDistinct(col("day")).as("n_days"),
          sum("vm").as("total_vm"))
      diversity.join(direct, "user_id")
        .select(col("user_id"), col("n_events"), col("n_days"),
          col("n_types"), col("type_entropy_m20"), col("total_vm"))
        .orderBy("user_id")
    },
    Some({
      val d = graft.text.Sampling.dIlog2m20 _
      s"""WITH ev AS (
      SELECT user_id, event_type,
        epoch_ms(ts) // 86400000 AS day,
        FLOOR(value * 1000000)::BIGINT AS vm
      FROM events),
    bt AS (
      SELECT user_id, event_type, COUNT(*)::BIGINT AS c
      FROM ev GROUP BY user_id, event_type),
    div AS (
      SELECT user_id, COUNT(*)::BIGINT AS n_types,
        SUM(c)::BIGINT AS n_events,
        SUM(c * ${d("c")})::BIGINT AS clc
      FROM bt GROUP BY user_id),
    direct AS (
      SELECT user_id, COUNT(DISTINCT day)::BIGINT AS n_days,
        SUM(vm)::BIGINT AS total_vm
      FROM ev GROUP BY user_id)
    SELECT user_id, n_events, n_days, n_types,
      (${d("n_events")} - clc // n_events)::BIGINT AS type_entropy_m20,
      total_vm
    FROM div JOIN direct USING (user_id) ORDER BY user_id"""
    }))

  // ---------------------------------------------------------------- q40
  /** MARKET-SHARE report (the TPC-H Q8 shape): for the ASIA customer
    * market, each supplier nation's share of yearly revenue — the
    * two-level ratio aggregate (numerator and denominator are the SAME
    * aggregate at two grouping depths) that every BI rollup runs.
    * Exactness: per-row revenue is lossless DECIMAL(26,6), lifted to
    * integer micro units before summing, so numerator/denominator are
    * exact integers and the share is `nrev·10⁶ DIV mrev` — no float
    * division, no ratio drift.
    *
    * Scale: the fact chain joins shuffle on orderkey/custkey with all
    * dims broadcast; the (year, nation) aggregate is CHECKPOINTED so
    * its two consumers (the market denominator and the final join)
    * read the materialized thin rows — never a second pass over the
    * facts, by barrier rather than by hoping ReusedExchange survives
    * AQE's broadcast conversion.
    */
  private val q40 = Q(
    "q40_market_share",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val natC = t(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"),
          col("n_regionkey").as("cn_region"))
      val natS = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val revMicro = ((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(26, 6)) * lit(1000000))
        .cast(DecimalType(38, 0))
      // checkpointed: byNation feeds the market denominator AND the
      // final join — without the barrier the whole 6-join fact chain
      // can evaluate twice when AQE's broadcast conversion defeats
      // ReusedExchange (the dedup_substring 2-consumer trap)
      val byNation = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .join(broadcast(reg), col("cn_region") === col("r_regionkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .groupBy(col("o_year"), col("supp_nation"))
        .agg(sum(revMicro).cast(DecimalType(38, 0)).as("nrev"))
        .transform(graft.Checkpoint.of)
      val market = byNation.groupBy("o_year")
        .agg(sum("nrev").cast(DecimalType(38, 0)).as("mrev"))
      byNation.join(broadcast(market), "o_year")
        .select(col("o_year"), col("supp_nation"),
          col("nrev").cast("long").as("nrev_micro"),
          expr("nrev * 1000000 DIV mrev").as("share_micro"))
        .orderBy("o_year", "supp_nation")
    },
    Some("""WITH base AS (
      SELECT year(o_orderdate)::BIGINT AS o_year, ns.n_name AS supp_nation,
        ((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
          * 1000000)::HUGEINT AS rev_micro
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region ON nc.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      WHERE r_name = 'ASIA'),
    bn AS (
      SELECT o_year, supp_nation, SUM(rev_micro) AS nrev
      FROM base GROUP BY o_year, supp_nation),
    mk AS (SELECT o_year, SUM(nrev) AS mrev FROM bn GROUP BY o_year)
    SELECT bn.o_year AS o_year, supp_nation,
      nrev::BIGINT AS nrev_micro,
      (nrev * 1000000 // mrev)::BIGINT AS share_micro
    FROM bn JOIN mk ON bn.o_year = mk.o_year
    ORDER BY o_year, supp_nation"""))

  // ---------------------------------------------------------------- q41
  /** Suppliers who kept orders waiting — the TPC-H Q21 shape (the
    * hardest of the classic 22: double self-correlation on the fact
    * table), adapted to this schema's dates: a supplier "kept order O
    * waiting" iff it shipped a line of O more than 90 epoch-days after
    * the order date (the q38 SLA rule, integer epoch-day floor both
    * engines), O involves AT LEAST one other supplier (the EXISTS),
    * and NO other supplier of O was late (the NOT EXISTS) — sole
    * blame. Output: per supplier, the count of such orders, top-100.
    *
    * Spark-first restatement: the EXISTS / NOT EXISTS correlations
    * collapse into TWO thin aggregates instead of two more fact-table
    * joins — per (order, supplier) a late flag (map-side-combined off
    * the one orderkey shuffle join), then per order `n_supps` and
    * `n_late`; supplier S qualifies iff its own flag is set, n_supps ≥
    * 2 and n_late = 1 (S is then necessarily the late one). The
    * per-(order, supplier) frame feeds both aggregates — CHECKPOINTED
    * (the q40 two-consumer barrier). Top-100 plans as
    * TakeOrderedAndProject with the suppkey tie-break; at 100 TB both
    * fact tables bucket by orderkey and the join is zero-exchange
    * (the q38 note).
    */
  private val q41 = Q(
    "q41_waiting_suppliers",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " DIV 86400000000").as("od"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " DIV 86400000000").as("sd"))
      val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("sd") - col("od") > 90, 1L).otherwise(0L))
          .as("late"))
        .transform(graft.Checkpoint.of)
      val perOrd = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supps"), sum("late").as("n_late"))
      perSupp.filter(col("late") === 1L)
        .join(perOrd, "l_orderkey")
        .filter(col("n_supps") >= 2 && col("n_late") === 1L)
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(100)
    },
    Some("""WITH d AS (
      SELECT l_orderkey, l_suppkey,
        (CASE WHEN epoch_ms(l_shipdate) // 86400000
          - epoch_ms(o_orderdate) // 86400000 > 90
          THEN 1 ELSE 0 END)::BIGINT AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    ps AS MATERIALIZED (
      SELECT l_orderkey, l_suppkey, MAX(late) AS late
      FROM d GROUP BY l_orderkey, l_suppkey),
    po AS (
      SELECT l_orderkey, COUNT(*)::BIGINT AS n_supps,
        SUM(late)::BIGINT AS n_late
      FROM ps GROUP BY l_orderkey)
    SELECT l_suppkey AS s_suppkey, COUNT(*)::BIGINT AS numwait
    FROM ps JOIN po USING (l_orderkey)
    WHERE ps.late = 1 AND n_supps >= 2 AND n_late = 1
    GROUP BY l_suppkey
    ORDER BY numwait DESC, s_suppkey LIMIT 100"""))

  // ---------------------------------------------------------------- q42
  /** Global-sales-opportunity report — the TPC-H Q22 shape (scalar
    * subquery threshold + NOT EXISTS anti-join), grouped by nation
    * instead of phone prefix: per nation, the count and total balance
    * of customers whose account balance is above the average POSITIVE
    * balance and who have placed NO order since 2000-01-01 (the
    * wealthy-but-lapsed segment; every customer in this data has SOME
    * order, so the classic "no orders ever" predicate is restated as
    * recency-lapse — which is also what a real retention report asks).
    * The date predicate pushes to the orders parquet scan.
    *
    * Exactness without a float average: balances lift to exact micro
    * ints (`round(x,6)·10⁶`), the threshold scalar is the exact PAIR
    * (Σ positive, n positive), and "above average" is the integer
    * cross-multiplication `bal·n_pos > sum_pos` — no division, no
    * float accumulation, identical integer comparison in both engines;
    * the total is an exact micro sum. Shapes: one thin customer scan +
    * one 1-row broadcast scalar (the q18 pattern), LEFT ANTI against
    * the distinct order custkeys (semi-join infrastructure, never a
    * fact-table row explosion), one ≤|nations|-key aggregate.
    */
  private val q42 = Q(
    "q42_inactive_rich",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val balMicro = (round(col("c_acctbal"), 6).cast(DecimalType(38, 6))
        * lit(1000000)).cast(DecimalType(38, 0)).cast("long")
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long")
          .as("nationkey"), balMicro.as("bal_micro"))
      val thresh = c.filter(col("bal_micro") > 0)
        .agg(sum("bal_micro").as("sum_pos"),
          count(lit(1)).as("n_pos"))
      val ordered = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      c.crossJoin(broadcast(thresh))
        .filter(col("bal_micro") * col("n_pos") > col("sum_pos"))
        .join(ordered, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum("bal_micro").as("totbal_micro"))
        .orderBy("nationkey")
    },
    Some("""WITH c AS (
      SELECT c_custkey, c_nationkey::BIGINT AS nationkey,
        (round(c_acctbal, 6)::DECIMAL(38,6) * 1000000)::BIGINT AS bal_micro
      FROM customer),
    th AS (SELECT SUM(bal_micro)::BIGINT AS sum_pos,
        COUNT(*)::BIGINT AS n_pos
      FROM c WHERE bal_micro > 0)
    SELECT nationkey, COUNT(*)::BIGINT AS numcust,
      SUM(bal_micro)::BIGINT AS totbal_micro
    FROM c, th
    WHERE bal_micro * n_pos > sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY nationkey ORDER BY nationkey"""))

  // ---------------------------------------------------------------- q45
  /** Symmetric reconciliation via FULL OUTER join — the operator the
    * suite's left/semi/anti coverage still lacked: two independently
    * derived per-user aggregates (click volume vs purchase volume)
    * merged so users present on EITHER side survive, with
    * null-coalesced counts and a divergence flag. The audit-report
    * shape every pipeline runs when two systems should agree (counts
    * from ingest vs counts from serving).
    *
    * Scale: two map-side-combined aggregates off one scan lineage,
    * FULL OUTER on the thin user keys (co-partitioned — both sides
    * hash on user_id), integer arithmetic only.
    */
  private val q45 = Q(
    "q45_full_outer_reconcile",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
      clicks.join(purchases, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
        .withColumn("clicks_only",
          col("n_clicks") > 0 && col("n_purchases") === 0)
        .withColumn("purchases_only",
          col("n_purchases") > 0 && col("n_clicks") === 0)
        .orderBy("user_id")
    },
    Some("""WITH c AS (
      SELECT user_id, COUNT(*)::BIGINT AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    p AS (
      SELECT user_id, COUNT(*)::BIGINT AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      COALESCE(n_clicks, 0)::BIGINT AS n_clicks,
      COALESCE(n_purchases, 0)::BIGINT AS n_purchases,
      COALESCE(n_clicks, 0) > 0 AND COALESCE(n_purchases, 0) = 0
        AS clicks_only,
      COALESCE(n_purchases, 0) > 0 AND COALESCE(n_clicks, 0) = 0
        AS purchases_only
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    ORDER BY user_id"""))

  // ---------------------------------------------------------------- q46
  /** UNPIVOT (melt) — the inverse of q16's pivot, the wide→long reshape
    * every feature table goes through before a union'd metrics store:
    * the per-user wide row of per-type event counts melts back into
    * (user_id, event_type, n) rows, dropping structural zeros (unpivot
    * with null-exclusion after a zero→null mapping, the standard
    * sparse-melt). Native `Dataset.unpivot` (Spark 3.4+) — ONE Expand
    * node, not |types| unioned scans.
    *
    * Round-trip property: melting q16's pivot reproduces the plain
    * groupBy counts — which is exactly what the oracle states directly,
    * so the gate proves pivot→unpivot is lossless.
    */
  private val q46 = Q(
    "q46_unpivot",
    (s, dir) => {
      val wide = Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      wide.unpivot(
          Array(col("user_id")),
          eventTypes.map(t => col(s"`$t`").as(t)).toArray,
          "event_type", "n_raw")
        .filter(col("n_raw").isNotNull && col("n_raw") > 0)
        .select(col("user_id"), col("event_type"),
          col("n_raw").cast("long").as("n"))
        .orderBy("user_id", "event_type")
    },
    // The oracle is constrained to the SAME pivot column list (the
    // shared `eventTypes` constant) so a testdata regeneration that
    // introduces a new event_type cannot desync the two sides: the
    // pivot would silently drop it, so the oracle must too.
    Some(s"""SELECT user_id, event_type, COUNT(*)::BIGINT AS n
    FROM events
    WHERE event_type IN (${eventTypes.map(e => s"'$e'").mkString(", ")})
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type"""))

  // ---------------------------------------------------------------- q44
  /** Small-quantity-order revenue — the TPC-H Q17 shape (correlated
    * aggregate threshold PER GROUP, where q18/q42 use one global
    * scalar): total revenue from lineitems whose quantity is below 20%
    * of their part's average quantity, reported per brand. The
    * division-free restatement `5·qty·n_p < sum_p` (qty < avg/5 ⇔
    * 5·qty < sum/n, all positive integers — quantities are whole
    * numbers in this data) keeps the threshold exact in both engines;
    * revenue sums in exact DECIMAL micro units with ONE cast at the
    * end.
    *
    * Scale: the per-part aggregate is map-side-combined off the same
    * partkey exchange the join needs (thin (part, sum, n) rows
    * broadcast back is wrong at 10⁸ parts — it stays a partkey
    * shuffle join, co-partitioned with the fact scan); part dim
    * broadcasts for the brand label.
    */
  private val q44 = Q(
    "q44_small_qty_revenue",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val li = t(s, dir, "lineitem")
        // floor, not a raw long cast: Spark cast(double→long) truncates
        // toward zero while DuckDB ::BIGINT rounds half-even — they
        // agree only on whole numbers. floor() is identical in both
        // engines, so the gate no longer depends on quantities staying
        // integral across testdata regenerations.
        .select(col("l_partkey"), floor(col("l_quantity")).as("qty"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(1000000))
            .cast(DecimalType(38, 0)).as("price_micro"))
      val perPart = li.groupBy("l_partkey")
        .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n_li"))
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      li.join(perPart, "l_partkey")
        .filter(col("qty") * 5 * col("n_li") < col("sum_qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small"),
          sum("price_micro").cast(DecimalType(38, 0)).cast("long")
            .as("rev_micro"))
        .orderBy("p_brand")
    },
    Some("""WITH li AS (
      SELECT l_partkey, FLOOR(l_quantity)::BIGINT AS qty,
        (l_extendedprice::DECIMAL(18,2) * 1000000)::HUGEINT AS price_micro
      FROM lineitem),
    pp AS (
      SELECT l_partkey, SUM(qty)::BIGINT AS sum_qty,
        COUNT(*)::BIGINT AS n_li
      FROM li GROUP BY l_partkey)
    SELECT p_brand, COUNT(*)::BIGINT AS n_small,
      SUM(price_micro)::BIGINT AS rev_micro
    FROM li
    JOIN pp USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    WHERE qty * 5 * n_li < sum_qty
    GROUP BY p_brand ORDER BY p_brand"""))

  // ---------------------------------------------------------------- q43
  /** Forward-fill gap imputation (LOCF — last observation carried
    * forward): the feature-store imputation pass that turns a sparse
    * reading stream into a dense per-event feature. Only `purchase`
    * events carry a reading here (derived deterministically so both
    * engines see the identical sparse column); every event then gets
    * the user's latest prior reading via `last(..., ignoreNulls)` over
    * the (ts, event_id)-ordered per-user window — `IGNORE NULLS` is
    * the one window modifier the rest of the suite doesn't exercise.
    * `is_imputed` marks carried values (QA column every imputation
    * stage logs).
    *
    * Exactness: readings are COPIED doubles (no arithmetic — identical
    * bits both engines); ordering is (ts_ms, event_id) integer-total.
    * Scale: one user_id hash exchange + per-partition sort, the
    * running frame is O(1) state per row — the q20 sessionize posture.
    */
  private val q43 = Q(
    "q43_gapfill",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val reading = when(col("event_type") === "purchase", col("value"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          reading.as("reading"))
        .withColumn("filled", last(col("reading"), ignoreNulls = true)
          .over(w))
        .withColumn("is_imputed",
          col("reading").isNull && col("filled").isNotNull)
        .orderBy("event_id")
    },
    Some("""WITH e AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        CASE WHEN event_type = 'purchase' THEN value END AS reading
      FROM events)
    SELECT event_id, user_id, ts_ms, reading,
      last_value(reading IGNORE NULLS) OVER (PARTITION BY user_id
        ORDER BY ts_ms, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
      reading IS NULL AND last_value(reading IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL
        AS is_imputed
    FROM e ORDER BY event_id"""))

  // ---------------------------------------------------------------- q47
  /** Bilateral trade volume — the TPC-H Q7 shape (a DISJUNCTIVE join
    * predicate over a symmetric nation pair): yearly shipped revenue
    * between NATION_3 and NATION_7, in both directions. The classic
    * trap is evaluating the OR as a post-join filter over the full
    * fact×fact join; the Spark-first plan pre-filters BOTH nation dims
    * to the two names, so the two broadcast hash joins drop ~23/25 of
    * each fact stream at the scan side, and the residual OR (really
    * `supp_nation <> cust_nation`) runs on the already-thin stream.
    *
    * Exactness: revenue via Exact.dsum6 (lossless DECIMAL(26,6));
    * grouping keys are strings + integer year.
    * Scale: lineitem⋈supplier and orders⋈customer are each
    * dim-broadcast (no exchange); the one shuffle is the orderkey
    * join of the two pre-thinned streams — bucketed twins make it
    * zero-exchange (the q38 note).
    */
  private val q47 = Q(
    "q47_nation_volume",
    (s, dir) => {
      val pair = Seq("NATION_3", "NATION_7")
      val natS = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      val natC = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      // customer thins against the 2-row nation dim BEFORE touching
      // orders — joining orders x full customer first would carry all
      // 25 nations of customers through the join (CBO off: Spark does
      // not reorder inner joins by selectivity)
      val custPair = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(custPair, col("o_custkey") === col("c_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      year(l_shipdate)::BIGINT AS l_year,
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // ---------------------------------------------------------------- q48
  /** Customer order-count distribution — the TPC-H Q13 shape (the only
    * classic query whose answer depends on rows that DON'T join): how
    * many customers placed exactly k qualifying orders, INCLUDING
    * k = 0. The zero bucket forces an outer join — an inner join or a
    * plain GROUP BY on orders can never see order-less customers.
    * Qualifying = priority ≠ '4-NOT SPECIFIED' (this schema's stand-in
    * for Q13's comment NOT LIKE filter).
    *
    * Spark-first: aggregate orders per custkey FIRST (map-side combine
    * off the one custkey exchange — never outer-join raw facts), left
    * join customer on the co-partitioned custkey, coalesce the miss to
    * 0, then the tiny k-histogram aggregate (partial agg, ~dozens of
    * groups). Scale: two custkey exchanges total, both map-combined;
    * nothing broadcast-sized is assumed about customer.
    */
  private val q48 = Q(
    "q48_order_count_distribution",
    (s, dir) => {
      val perCust = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      t(s, dir, "customer").select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""WITH pc AS (
      SELECT o_custkey, COUNT(*)::BIGINT AS n
      FROM orders WHERE o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY o_custkey)
    SELECT COALESCE(n, 0)::BIGINT AS c_count, COUNT(*)::BIGINT AS custdist
    FROM customer LEFT JOIN pc ON c_custkey = o_custkey
    GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""))

  // ---------------------------------------------------------------- q49
  /** Daily-active vs CUMULATIVE-distinct user growth — the launch
    * dashboard's "uniques to date" curve. The naive running distinct
    * (per day, count users over all history ≤ day) is quadratic and
    * unshardable; the scale-first restatement is the FIRST-OCCURRENCE
    * trick: cumulative uniques at day d = Σ over days ≤ d of users
    * whose MIN(day) is that day — one distinct (day, user) pass, one
    * per-user min, and a running sum over the date-grain frame.
    *
    * Scale: the distinct (day, user) frame is CHECKPOINTED (it feeds
    * both the daily-active count and the per-user first-day aggregate
    * — one events scan, not two); the running-sum window is
    * unpartitioned but runs on ≤|days| rows (date-grain), never the
    * facts. All integer: epoch-day floor, counts, running sum.
    */
  private val q49 = Q(
    "q49_cumulative_users",
    (s, dir) => {
      val act = Tables.events(s, dir)
        .select(expr("ts_ms DIV 86400000").as("day"), col("user_id"))
        .distinct()
        .transform(graft.Checkpoint.of)
      val daily = act.groupBy("day").agg(count(lit(1)).as("n_active"))
      val firstDay = act.groupBy("user_id").agg(min("day").as("day"))
      val newbies = firstDay.groupBy("day").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(newbies, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_users", sum("n_new").over(w))
        .select("day", "n_active", "n_new", "cum_users")
        .orderBy("day")
    },
    Some("""WITH act AS MATERIALIZED (
      SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
      FROM events),
    daily AS (SELECT day, COUNT(*)::BIGINT AS n_active
      FROM act GROUP BY day),
    fd AS (SELECT user_id, MIN(day) AS day FROM act GROUP BY user_id),
    nw AS (SELECT day, COUNT(*)::BIGINT AS n_new FROM fd GROUP BY day)
    SELECT day, n_active, COALESCE(n_new, 0)::BIGINT AS n_new,
      SUM(COALESCE(n_new, 0)) OVER (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        AS cum_users
    FROM daily LEFT JOIN nw USING (day) ORDER BY day"""))

  // ---------------------------------------------------------------- q50
  /** Year-over-year revenue GROWTH per supplier nation — the trend
    * report layered on a yearly aggregate (lag over GROUPED rows, where
    * q31's rolling window lags raw facts). Growth is signed, and signed
    * integer division is an engine trap: Spark's `DIV` truncates toward
    * zero, DuckDB's `//` floors — they disagree on every negative
    * quotient. The SIGN-SPLIT form `CASE diff < 0 THEN −((−diff)·10⁶
    * DIV prev) ELSE diff·10⁶ DIV prev` keeps both engines dividing
    * non-negative integers (truncate ≡ floor) and restores the sign
    * exactly. Revenue stays DECIMAL(38,0) micro units (a yearly
    * nation's revenue ·10⁶ ·10⁶ overflows BIGINT at real scale).
    *
    * Scale: one fact pass with broadcast dims into a (nation, year)
    * aggregate; the lag window runs on the ≤|nations|·|years| thin
    * frame, never the facts.
    */
  private val q50 = Q(
    "q50_yoy_growth",
    (s, dir) => {
      val revMicro = ((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(26, 6)) * lit(1000000))
        .cast(DecimalType(38, 0))
      val yearly = t(s, dir, "lineitem")
        .select(col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          revMicro.as("rm"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("l_year"))
        .agg(sum("rm").cast(DecimalType(38, 0)).as("rev"))
      val w = Window.partitionBy("n_name").orderBy("l_year")
      yearly.withColumn("prev", lag(col("rev"), 1).over(w))
        .withColumn("diff", col("rev") - col("prev"))
        .select(col("n_name"), col("l_year"),
          col("rev").cast("long").as("rev_micro"),
          when(col("prev").isNull, lit(null))
            .when(col("diff") < 0,
              -expr("(-diff) * 1000000 DIV prev"))
            .otherwise(expr("diff * 1000000 DIV prev"))
            .cast("long").as("growth_micro"))
        .orderBy("n_name", "l_year")
    },
    Some("""WITH yearly AS (
      SELECT n_name, year(l_shipdate)::BIGINT AS l_year,
        SUM(((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
          * 1000000)::HUGEINT) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2),
    lagd AS (SELECT n_name, l_year, rev,
        LAG(rev) OVER (PARTITION BY n_name ORDER BY l_year) AS prev
      FROM yearly)
    SELECT n_name, l_year, rev::BIGINT AS rev_micro,
      (CASE WHEN prev IS NULL THEN NULL
        WHEN rev - prev < 0 THEN -((prev - rev) * 1000000 // prev)
        ELSE (rev - prev) * 1000000 // prev END)::BIGINT AS growth_micro
    FROM lagd ORDER BY n_name, l_year"""))

  // ---------------------------------------------------------------- q51
  /** Discounted revenue under a DISJUNCTION of (brand, size-range,
    * quantity-range) branches — the TPC-H Q19 shape (the OR-of-ANDs
    * join predicate that defeats naive pushdown): the classic mistake
    * is evaluating the whole disjunction as a residual AFTER a full
    * part⋈lineitem join. The Spark-first split: the part-only half of
    * each branch (brand + size) filters the BROADCAST dim — the scan
    * side joins against a dim already reduced to the union of the
    * three branch part-sets — and only the quantity half remains as a
    * residual on the joined stream. Per-branch rows (brand keys the
    * branch here) with exact DECIMAL revenue.
    */
  private val q51 = Q(
    "q51_disjunctive_parts",
    (s, dir) => {
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        .filter(
          (col("p_brand") === "Brand#1" &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#2" &&
            col("p_size").between(10, 25)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_size").between(25, 50)))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#2" &&
            col("l_quantity").between(10, 25)) ||
          (col("p_brand") === "Brand#3" &&
            col("l_quantity").between(20, 35)))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("p_brand")
    },
    Some(s"""SELECT p_brand, COUNT(*)::BIGINT AS n_items,
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
        AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 25 AND 50
        AND l_quantity BETWEEN 20 AND 35)
    GROUP BY p_brand ORDER BY p_brand"""))

  // ---------------------------------------------------------------- q52
  /** Returned-item reporting — the TPC-H Q10 shape (who returned the
    * most money): revenue on `l_returnflag = 'R'` lines per customer,
    * top-20 with the customer's nation. The returnflag filter sits ON
    * THE SCAN (PushedFilters — ~1/3 selectivity before any join), the
    * two fact tables shuffle once on orderkey, nation broadcasts, and
    * the top-20 plans as TakeOrderedAndProject (never a full sort).
    */
  private val q52 = Q(
    "q52_returned_customers",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(count(lit(1)).as("n_returned"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name,
      COUNT(*)::BIGINT AS n_returned,
      ${sqlSum6("l_extendedprice * (1 - l_discount)", "lost_revenue")}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey LIMIT 20"""))

  // ---------------------------------------------------------------- q53
  /** Top supplier by quarterly revenue — the TPC-H Q15 shape (ARGMAX
    * WITH TIES against a global scalar: the view + `total = (SELECT
    * MAX...)` correlation): revenue per supplier over one quarter,
    * keep every supplier whose revenue EQUALS the maximum. The
    * equality is exact because revenue never leaves DECIMAL micro
    * units until output — a double-sum argmax can drop a true tie (or
    * invent one) on the last bit; decimal equality cannot. Date range
    * filters on the scan; the max is a broadcast 1-row scalar (the q18
    * posture); ties surface deterministically, suppkey-ordered.
    */
  private val q53 = Q(
    "q53_top_supplier",
    (s, dir) => {
      val revMicro = ((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(26, 6)) * lit(1000000))
        .cast(DecimalType(38, 0))
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-04-01")
        .select(col("l_suppkey"), revMicro.as("rm"))
        .groupBy("l_suppkey")
        .agg(sum("rm").cast(DecimalType(38, 0)).as("rev"))
        // checkpointed: rev feeds the max scalar AND the probe side —
        // without the barrier the quarter-filtered fact scan + agg runs
        // twice (the q40 two-consumer trap)
        .transform(graft.Checkpoint.of)
      val mx = rev.agg(max("rev").as("mx"))
      rev.join(broadcast(mx), col("rev") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev").cast("long").as("rev_micro"))
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (
      SELECT l_suppkey,
        SUM(((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
          * 1000000)::HUGEINT) AS rev
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      GROUP BY l_suppkey),
    mx AS (SELECT MAX(rev) AS mx FROM rev)
    SELECT s_suppkey, s_name, rev::BIGINT AS rev_micro
    FROM rev JOIN mx ON rev = mx
    JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q54
  /** Supplier diversity per part attribute, excluding a blocklist —
    * the TPC-H Q16 shape (COUNT DISTINCT over an anti-joined
    * relationship table): how many DISTINCT qualified suppliers serve
    * each (brand, size), where the part↔supplier relationship is
    * derived from the fact table (this schema has no partsupp) and
    * "qualified" anti-joins the blocklist (negative account balance —
    * the comment-LIKE stand-in). Spark-first: the relationship
    * dedupes to thin (partkey, suppkey) pairs FIRST (one exchange on
    * the pair — never count-distinct over raw facts), the blocklist
    * broadcasts as an anti-join, part broadcasts for the attributes,
    * and the distinct count re-aggregates pre-deduped pairs.
    */
  private val q54 = Q(
    "q54_part_supplier_counts",
    (s, dir) => {
      val rel = t(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
      val block = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      rel.join(broadcast(block),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(50)
    },
    Some("""WITH rel AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    q AS (
      SELECT l_partkey, l_suppkey FROM rel
      WHERE l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
    SELECT p_brand, p_size,
      COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM q JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 50"""))

  // ---------------------------------------------------------------- q55
  /** Minimum-cost supplier per part — the TPC-H Q2 shape (PER-GROUP
    * ARGMIN with ties over a correlated aggregate, where q53's argmax
    * is against one GLOBAL scalar): for every mid-size part, which
    * EUROPE supplier ships it cheapest? Unit cost is derived from the
    * fact table (no partsupp in this schema) as the integer floor
    * `price_micro DIV qty` per line, minimized per (part, supplier) —
    * all-integer, so the per-part argmin ties are exact in both
    * engines (a float unit price can drop or invent a tie).
    *
    * Scale: both dims thin FIRST — qualified suppliers collapse to a
    * broadcast (suppkey, name, nation) set via the nation→region
    * chain, the part filter broadcasts — so the fact scan joins
    * already-reduced dims (the q47 no-CBO rule); the (part, supp) min
    * aggregates map-side-combined; the per-part argmin is a
    * `rank() = 1` window — WindowGroupLimit bounds every partition at
    * O(n·1) instead of a full per-part sort.
    */
  private val q55 = Q(
    "q55_min_cost_supplier",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
      val p = t(s, dir, "part")
        .filter(col("p_size").between(10, 30))
        .select("p_partkey", "p_brand")
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity")).as("qty"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(1000000))
            .cast(DecimalType(38, 0)).as("price_micro"))
        .filter(col("qty") > 0)
      val pairCost = li
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
          col("s_name"), col("n_name"),
          expr("price_micro DIV qty").cast("long").as("unit_cost"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "n_name")
        .agg(min("unit_cost").as("cost_micro"))
      val w = Window.partitionBy("p_partkey")
        .orderBy("cost_micro")
      pairCost.withColumn("rk", rank().over(w))
        .filter(col("rk") === 1)
        .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("cost_micro"))
        .orderBy("p_partkey", "s_suppkey")
        .limit(100)
    },
    Some("""WITH sup AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    pair AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
        MIN((l_extendedprice::DECIMAL(18,2) * 1000000)::HUGEINT
          // FLOOR(l_quantity)::BIGINT)::BIGINT AS cost_micro
      FROM lineitem
      JOIN sup ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_size BETWEEN 10 AND 30 AND FLOOR(l_quantity) > 0
      GROUP BY 1, 2, 3, 4, 5),
    rk AS (
      SELECT *, RANK() OVER (PARTITION BY p_partkey
        ORDER BY cost_micro) AS r
      FROM pair)
    SELECT p_partkey, p_brand, s_suppkey, s_name, n_name, cost_micro
    FROM rk WHERE r = 1
    ORDER BY p_partkey, s_suppkey LIMIT 100"""))

  // ---------------------------------------------------------------- q56
  /** Late-line order-priority check — the TPC-H Q4 shape (EXISTS
    * semi-join feeding an aggregate, where q10 is the bare semi): for
    * one order quarter, how many orders per priority had at least one
    * line shipped more than 60 epoch-days after the order date? The
    * date predicate prunes the orders scan BEFORE the join; the
    * existence test is a LEFT SEMI with the lateness residual on the
    * join itself (never a count-distinct over matched lines).
    *
    * Scale: one orderkey shuffle of the quarter-pruned orders against
    * a 2-column lineitem projection; the final aggregate runs on
    * ≤|priorities| map-side-combined keys. Both tables bucketed by
    * orderkey → zero-exchange (the q38 recipe).
    */
  private val q56 = Q(
    "q56_late_priority_orders",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1997-01-01" &&
          col("o_orderdate") < "1997-04-01")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " DIV 86400000000").as("od"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " DIV 86400000000").as("sd"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("sd") > col("od") + 60, "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders
    FROM orders
    WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND epoch_ms(l_shipdate) // 86400000
            > epoch_ms(o_orderdate) // 86400000 + 60)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q57
  /** Product-line profit by supplier nation and year — the TPC-H Q9
    * shape (profit = revenue − cost across a part-name-filtered slice
    * of the whole fact history): cost is derived deterministically
    * (half the part's retail price per unit, in integer micro units —
    * no partsupp/supplycost in this schema) so profit stays an exact
    * integer in both engines: `rev_micro − (retail_micro·qty) DIV 2`.
    *
    * Scale: the part-name filter thins the BROADCAST part dim before
    * the fact scan touches it; supplier→nation broadcast; the one
    * orderkey shuffle joins the year in from orders; the aggregate
    * runs on ≤|nations|·|years| map-side-combined keys.
    */
  private val q57 = Q(
    "q57_product_profit",
    (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_name").like("%gear"))
        .select(col("p_partkey"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * lit(1000000))
            .cast(DecimalType(38, 0)).as("retail_micro"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity")).as("qty"),
          ((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(26, 6)) * lit(1000000))
            .cast(DecimalType(38, 0)).as("rev_micro"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name"), col("o_year"),
          (col("rev_micro") - expr("retail_micro * qty DIV 2"))
            .as("profit"))
        .groupBy("n_name", "o_year")
        .agg(sum("profit").cast(DecimalType(38, 0)).cast("long")
          .as("profit_micro"))
        .orderBy("n_name", "o_year")
    },
    Some("""SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
      SUM(((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
            * 1000000)::HUGEINT
        - ((p_retailprice::DECIMAL(18,2) * 1000000)::HUGEINT
            * FLOOR(l_quantity)::BIGINT) // 2)::BIGINT AS profit_micro
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear'
    GROUP BY n_name, o_year ORDER BY n_name, o_year"""))

  // ---------------------------------------------------------------- q58
  /** Important-stock report — the TPC-H Q11 shape (per-group total vs
    * a FRACTION of the global total, where q42's threshold is a global
    * average and q44's is per-group): the shipped value per part
    * through ASIA's suppliers, keeping parts worth more than TWICE the
    * mean part value — the integer cross-multiplication
    * `value·n_parts > 2·total` (no float fraction anywhere; a
    * mean-multiple threshold is scale-invariant where TPC-H's fixed
    * 1/2000 fraction empties as the part count grows past 2000).
    *
    * Scale: the region's suppliers collapse to a broadcast key set at
    * the scan; one partkey exchange aggregates values map-side-
    * combined; the frame is CHECKPOINTED because it feeds two
    * consumers (the 1-row total and the probe — the q53 barrier), and
    * the total broadcasts back as a single-row scalar.
    */
  private val q58 = Q(
    "q58_important_stock",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      val value = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(1000000))
            .cast(DecimalType(38, 0)).as("price_micro"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum("price_micro").cast(DecimalType(38, 0)).as("value"))
        .transform(graft.Checkpoint.of)
      val total = value.agg(sum("value").cast(DecimalType(38, 0))
        .as("total"), count(lit(1)).as("n_parts"))
      value.join(broadcast(total),
          col("value") * col("n_parts") > col("total") * 2)
        .select(col("l_partkey"),
          col("value").cast("long").as("value_micro"))
        .orderBy(col("value_micro").desc, col("l_partkey"))
    },
    Some("""WITH value AS (
      SELECT l_partkey,
        SUM((l_extendedprice::DECIMAL(18,2) * 1000000)::HUGEINT) AS value
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
      GROUP BY l_partkey),
    total AS (SELECT SUM(value) AS total, COUNT(*)::BIGINT AS n_parts
      FROM value)
    SELECT l_partkey, value::BIGINT AS value_micro
    FROM value, total WHERE value * n_parts > total * 2
    ORDER BY value_micro DESC, l_partkey"""))

  // ---------------------------------------------------------------- q59
  /** Promotion revenue share per month — the TPC-H Q14 shape (a
    * CONDITIONAL-numerator ratio over the same aggregate pass): what
    * fraction of each month's revenue came from PROMO-type parts,
    * as exact integer millionths `promo·10⁶ DIV total` — both sums
    * ride ONE aggregate (a `sum(CASE)` numerator next to the plain
    * denominator), never two scans.
    *
    * Scale: part broadcasts as a 2-column (key, type) dim; one
    * month-key exchange of map-side-combined partials; months are an
    * integer `year·100+month` (no date-truncation semantics to
    * disagree on).
    */
  private val q59 = Q(
    "q59_promo_share",
    (s, dir) => {
      val p = t(s, dir, "part").select("p_partkey", "p_type")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1998-01-01" &&
          col("l_shipdate") < "1999-01-01")
        .select(col("l_partkey"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("ym"),
          ((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(26, 6)) * lit(1000000))
            .cast(DecimalType(38, 0)).as("rev_micro"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("ym")
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_micro"))
            .otherwise(lit(0))).cast(DecimalType(38, 0)).as("promo"),
          sum("rev_micro").cast(DecimalType(38, 0)).as("total"))
        .select(col("ym"),
          col("promo").cast("long").as("promo_micro"),
          col("total").cast("long").as("total_micro"),
          expr("promo * 1000000 DIV total").cast("long")
            .as("promo_share_m6"))
        .orderBy("ym")
    },
    Some("""SELECT (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT
        AS ym,
      SUM(CASE WHEN p_type = 'PROMO'
        THEN ((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
          * 1000000)::HUGEINT ELSE 0 END)::BIGINT AS promo_micro,
      SUM(((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
        * 1000000)::HUGEINT)::BIGINT AS total_micro,
      (SUM(CASE WHEN p_type = 'PROMO'
          THEN ((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
            * 1000000)::HUGEINT ELSE 0 END) * 1000000
        // SUM(((l_extendedprice * (1 - l_discount))::DECIMAL(26,6)
          * 1000000)::HUGEINT))::BIGINT AS promo_share_m6
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
    GROUP BY 1 ORDER BY ym"""))

  // ---------------------------------------------------------------- q60
  /** Large-volume orders — the TPC-H Q18 shape (HAVING on a fact-table
    * aggregate, joined BACK to the dimensions): orders whose total
    * quantity exceeds 250 units, with their customer, top-100 by
    * volume. The classic mistake is joining customer⋈orders⋈lineitem
    * first and aggregating the wide rows; the Spark-first order
    * aggregates the 2-column fact projection per orderkey (map-side
    * combine), filters to the rare qualifying keys, and only THEN
    * joins the dims — the join input is the thin winners, not 100 TB.
    */
  private val q60 = Q(
    "q60_large_orders",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .select(col("l_orderkey"), floor(col("l_quantity")).as("qty"))
        .groupBy("l_orderkey")
        .agg(sum("qty").as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = t(s, dir, "customer").select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (
      SELECT l_orderkey, SUM(FLOOR(l_quantity)::BIGINT)::BIGINT
        AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 250)
    SELECT c_custkey, c_name, o_orderkey, total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 100"""))

  // ---------------------------------------------------------------- q61
  /** Dominant-share suppliers for a part family — the TPC-H Q20 shape
    * (a NESTED aggregate comparison gating a semi-join chain): EUROPE
    * suppliers who shipped MORE THAN HALF of some red part's 1998
    * volume — `2·pair_qty > part_qty`, all-integer. The per-(part,
    * supplier) aggregate and the per-part total share one exchange:
    * the total is a window sum over the already-aggregated thin pair
    * rows (no second fact scan, no join back).
    *
    * Scale: the part-name filter thins the broadcast dim before the
    * fact scan; the dominance test runs on pair-aggregated thin rows;
    * the winning supplier keys dedupe and the supplier⋈nation⋈region
    * chain is a broadcast-dim join of a tiny key set.
    */
  private val q61 = Q(
    "q61_dominant_suppliers",
    (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_name").like("red %")).select("p_partkey")
      val pair = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1998-01-01" &&
          col("l_shipdate") < "1999-01-01")
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity")).as("qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("qty").as("pair_qty"))
      val wp = Window.partitionBy("l_partkey")
      val winners = pair
        .withColumn("part_qty", sum("pair_qty").over(wp))
        .filter(col("pair_qty") * 2 > col("part_qty"))
        .select("l_suppkey").distinct()
      winners
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },
    Some("""WITH pair AS (
      SELECT l_partkey, l_suppkey,
        SUM(FLOOR(l_quantity)::BIGINT) AS pair_qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red %'
        AND l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
      GROUP BY 1, 2),
    win AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, pair_qty,
          SUM(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM pair)
      WHERE pair_qty * 2 > part_qty)
    SELECT s_suppkey, s_name, n_name
    FROM win JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q62
  /** Late-shipment priority split per line class — the TPC-H Q12 shape
    * (the one classic this suite lacked: a fact-fact join whose output
    * is TWO complementary `sum(CASE)` columns over the joined stream),
    * adapted to this schema's columns: per (l_returnflag, l_linestatus)
    * — the 6-value line class standing in for l_shipmode — over lines
    * SHIPPED in 1997 that arrived late (shipped >30 epoch-days after
    * the order date, the q38/q56 SLA rule), how many came from
    * high-priority orders (1-URGENT/2-HIGH) vs the rest. The classic
    * "are critical orders riding the slow lanes" report.
    *
    * Exactness: lateness is integer epoch-day floors both engines (the
    * q56 recipe); the split counts are integer `sum(CASE)` over ≥1-row
    * groups (never the empty-group NULL trap). Scale: the shipdate
    * window is PUSHED to the lineitem scan (1/~5 of the fact rows
    * before any join); the lateness predicate rides the join as a
    * residual; ONE orderkey shuffle against a 3-column orders
    * projection (bucketed twins → zero-exchange, the q38 recipe); the
    * final aggregate map-side-combines onto 6 keys.
    */
  private val q62 = Q(
    "q62_late_priority_split",
    (s, dir) => {
      val hi = Seq("1-URGENT", "2-HIGH")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " DIV 86400000000").as("od"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1998-01-01")
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_linestatus"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " DIV 86400000000").as("sd"))
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("sd") > col("od") + 30)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("high_lines"),
          sum(when(col("o_orderpriority").isin(hi: _*), 0L).otherwise(1L))
            .as("low_lines"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END)::BIGINT AS high_lines,
      SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 0 ELSE 1 END)::BIGINT AS low_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      AND epoch_ms(l_shipdate) // 86400000
        > epoch_ms(o_orderdate) // 86400000 + 30
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q63
  /** DAU / WAU stickiness — the engagement ratio every product dashboard
    * tracks (daily actives ÷ trailing-7-day actives, in exact integer
    * millionths). The naive WAU — `COUNT(DISTINCT user) OVER (ORDER BY
    * day RANGE 6 PRECEDING)` — doesn't exist in Spark and re-scans the
    * window per day in engines that allow it (quadratic, unshardable:
    * the q49 cumulative-distinct problem, sliding edition). The
    * scalable restatement is COVERAGE-EXPLODE: each distinct (user,
    * active-day) pair COVERS the 7 report days it contributes to, so
    * WAU(d) = |distinct (user, cover_day = d)| — one bounded ×7
    * map-side explode of the thin distinct pair frame, one distinct,
    * one count. The report is driven from the WAU frame with DAU
    * left-joined (zero-coalesced), so a TOTAL-OUTAGE day — zero
    * same-day actives but a live trailing window — reports DAU 0,
    * stickiness 0 instead of vanishing (the dq_volume_anomaly spine
    * argument); days with no trailing activity at all don't appear,
    * and days whose 7-day window starts before the corpus report
    * honestly over the truncated window (both engines identically).
    *
    * Scale: ONE distinct over (user, day) epoch-day pairs (map-side
    * combined), the ×7 explode and second distinct run on that thin
    * frame (never raw events), DAU rides the same pair frame; the
    * stickiness join is date-grain × date-grain. The pair frame is
    * CHECKPOINTED — two consumers (DAU + coverage).
    */
  private val q63 = Q(
    "q63_dau_wau",
    (s, dir) => {
      val pairs = graft.Checkpoint.of(
        Tables.events(s, dir)
          .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
          .distinct())
      val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = pairs
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("cover_day"))
        .distinct()
        .groupBy(col("cover_day").as("day"))
        .agg(count(lit(1)).as("wau"))
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("wau"),
          expr("coalesce(dau, 0) * 1000000 DIV wau").as("stickiness_m6"))
        .orderBy("day")
    },
    Some("""WITH pairs AS MATERIALIZED (
      SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
      FROM events),
    dau AS (SELECT day, COUNT(*)::BIGINT AS dau FROM pairs GROUP BY day),
    cover AS (
      SELECT DISTINCT user_id, day + g.d AS cover_day
      FROM pairs, (SELECT UNNEST(range(7)) AS d) g),
    wau AS (SELECT cover_day AS day, COUNT(*)::BIGINT AS wau
      FROM cover GROUP BY cover_day)
    SELECT day::BIGINT AS day, COALESCE(dau, 0)::BIGINT AS dau, wau,
      (COALESCE(dau, 0) * 1000000 // wau)::BIGINT AS stickiness_m6
    FROM wau LEFT JOIN dau USING (day)
    ORDER BY day"""))

  // ---------------------------------------------------------------- q64
  /** MARKET-BASKET pair mining — the association-rule staple (Agrawal &
    * Srikant's support/confidence, at the pair tier every "frequently
    * bought together" widget runs): the top-50 part pairs co-occurring
    * in the same order, with each pair's support and BOTH directional
    * confidences `conf(a→b) = support·10⁶ DIV n_a` in exact integer
    * millionths. The co-occurrence shape is new to the suite (the
    * dedup postings joins pair DOCUMENTS by shared tokens; this pairs
    * ITEMS by shared baskets — the transposed join).
    *
    * Scale: the (order, part) incidence list dedupes FIRST (one
    * map-side-combined distinct — never pair raw lines), the pair
    * self-join keys on the ORDER so its volume is Σ basket_size² —
    * bounded by max-basket × |lines| on real order data (baskets are
    * small; a viral-basket dfCap would bolt on exactly like the dedup
    * postings guard if they weren't), pair counts map-side-combine,
    * part supports ride the same incidence frame (checkpointed — three
    * consumers), and the top-50 plans as TakeOrderedAndProject with a
    * (p1, p2) tie-break.
    */
  private val q64 = Q(
    "q64_basket_pairs",
    (s, dir) => {
      val op = graft.Checkpoint.of(
        t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct())
      val cnt = op.groupBy("pk").agg(count(lit(1)).as("n"))
      val pairs = op.as("a")
        .join(op.as("b"), col("a.ok") === col("b.ok") &&
          col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("support"))
      pairs
        .join(cnt.select(col("pk").as("p1"), col("n").as("n_a")), "p1")
        .join(cnt.select(col("pk").as("p2"), col("n").as("n_b")), "p2")
        .select(col("p1"), col("p2"), col("support"), col("n_a"),
          col("n_b"),
          expr("support * 1000000 DIV n_a").as("conf_ab_m6"),
          expr("support * 1000000 DIV n_b").as("conf_ba_m6"))
        .orderBy(col("support").desc, col("p1"), col("p2"))
        .limit(50)
    },
    Some("""WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    cnt AS (SELECT pk, COUNT(*)::BIGINT AS n FROM op GROUP BY pk),
    pairs AS (
      SELECT a.pk AS p1, b.pk AS p2, COUNT(*)::BIGINT AS support
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk)
    SELECT p1, p2, support, ca.n AS n_a, cb.n AS n_b,
      (support * 1000000 // ca.n)::BIGINT AS conf_ab_m6,
      (support * 1000000 // cb.n)::BIGINT AS conf_ba_m6
    FROM pairs
    JOIN cnt ca ON ca.pk = p1
    JOIN cnt cb ON cb.pk = p2
    ORDER BY support DESC, p1, p2 LIMIT 50"""))

  val all: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13,
      q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27,
      q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39, q40,
      q41, q42, q43, q44, q45, q46, q47, q48, q49, q50, q51, q52, q53,
      q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64)
}
