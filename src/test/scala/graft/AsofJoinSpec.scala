package graft

import org.apache.spark.sql.functions._

import graft.operators.CustomJoins
import graft.plans.{AsofDirection, AsofJoin}

/** Native as-of join operator (LogicalPlan + Strategy + Exec). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("native asof join equals the composed union+window form") {
    val native = SparkEntry.queries("asof_join_native")(spark, sfDir)
      .collect().toSeq
    val composed = SparkEntry.queries("asof_join")(spark, sfDir)
      .collect().toSeq
    assert(native == composed)
  }

  test("plans through AsofJoinExec with co-partitioned sorted children") {
    val df = SparkEntry.queries("asof_join_native")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin")) // nodeName strips the Exec suffix
    assert(plan.contains("Sort ["), "children must be sorted (key, time)")
    assert(plan.contains("hashpartitioning"),
      "children must be hash-clustered on the key")
  }

  test("unmatched left rows carry null payload; equal timestamps match") {
    val left = Seq((1L, 10L, 100L), (2L, 20L, 50L), (3L, 99L, 100L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 100L, 7L), (10L, 90L, 6L), (20L, 60L, 8L))
      .toDF("k", "t", "pay")
    val out = AsofJoin.asofJoinNative(left, right, "k", "t", Seq("pay"))
      .orderBy("id").collect()
    assert(out(0).getLong(3) == 7L,  "t=100 matches right t=100 (equal ok)")
    assert(out(1).isNullAt(3),       "right t=60 > left t=50 → no match")
    assert(out(2).isNullAt(3),       "key 99 absent on right → null")
  }

  test("PruneAsofJoinRight prunes unused right columns to the scan") {
    val e = Tables.events(spark, sfDir) // 7 columns incl. props/value
    val left = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ms")
    val out = AsofJoin.asofJoinNative(left, e, "user_id", "ts_ms",
      payload = Seq("event_id"))
    val scans = out.queryExecution.executedPlan.toString
    // the wide right side must reach its scan pruned: props never read
    assert(!scans.contains("props"),
      s"right-side scan should not read `props`:\n$scans")
  }

  test("nullable key/time: null right rows never match, null left rows " +
      "carry null payload") {
    val left = Seq(
      (1L, Some(10L), Some(100L)),
      (2L, None: Option[Long], Some(50L)),  // null key
      (3L, Some(10L), None: Option[Long]))  // null time
      .toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), Some(90L), 6L),
      (None: Option[Long], Some(95L), 9L),  // null key: unmatchable
      (Some(10L), None: Option[Long], 8L))  // null time: unmatchable
      .toDF("k", "t", "pay")
    val out = AsofJoin.asofJoinNative(left, right, "k", "t", Seq("pay"))
      .orderBy("id").collect()
    assert(out(0).getLong(3) == 6L, "only the non-null right row matches")
    assert(out(1).isNullAt(3), "null left key → null payload")
    assert(out(2).isNullAt(3), "null left time → null payload")
  }

  test("native asof is correct under AQE with partition coalescing") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // force aggressive coalescing so the tiny test shuffles actually
      // trigger the re-plan EnsureRequirements ran before
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val native = SparkEntry.queries("asof_join_native")(spark, sfDir)
        .collect().toSeq
      val composed = SparkEntry.queries("asof_join")(spark, sfDir)
        .collect().toSeq
      assert(native == composed)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("direction and tolerance variants on a hand-checked fixture") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 10L, 200L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 90L, 6L), (10L, 100L, 7L), (10L, 160L, 9L))
      .toDF("k", "t", "pay")
    def run(dir: AsofDirection, tol: Option[Long] = None): Seq[Option[Long]] =
      AsofJoin.asofJoinNative(left, right, "k", "t", Seq("pay"), dir, tol)
        .orderBy("id").collect().toSeq
        .map(r => if (r.isNullAt(3)) None else Some(r.getLong(3)))
    assert(run(AsofDirection.Backward) == Seq(Some(7L), None, Some(9L)),
      "backward: equal time matches; t=50 has no earlier right")
    assert(run(AsofDirection.Forward) == Seq(Some(7L), Some(6L), None),
      "forward: equal time matches; t=200 has no later right")
    assert(run(AsofDirection.Nearest) == Seq(Some(7L), Some(6L), Some(9L)),
      "nearest: distance 0 / 40-forward / 40-backward")
    assert(run(AsofDirection.Backward, Some(30L)) ==
      Seq(Some(7L), None, None),
      "tolerance 30: t=100→100 is 0ms ok, t=200→160 is 40ms out")
  }

  test("nearest ties resolve backward; tolerance bounds both directions") {
    val left = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val right = Seq((10L, 60L, 1L), (10L, 140L, 2L)).toDF("k", "t", "pay")
    val tie = AsofJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
      AsofDirection.Nearest).collect()(0)
    assert(tie.getLong(3) == 1L, "equal 40ms distance → backward wins")
    val outOfTol = AsofJoin.asofJoinNative(left, right, "k", "t",
      Seq("pay"), AsofDirection.Nearest, Some(30L)).collect()(0)
    assert(outOfTol.isNullAt(3), "both candidates beyond tolerance → null")
  }

  test("composed direction/tolerance forms equal the native operator") {
    def strip(rows: Array[org.apache.spark.sql.Row]) = rows.toSeq
    val (s, dir) = (spark, sfDir)
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ms")
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ms").as("purchase_ms"))
      .agg(max("event_id").as("purchase_id"))
      .select(col("user_id"), col("purchase_ms").as("ts_ms"),
        col("purchase_id"), col("purchase_ms"))
    for {
      d <- Seq(AsofDirection.Backward, AsofDirection.Forward,
        AsofDirection.Nearest)
      tol <- Seq(None, Some(1800000L))
    } {
      val composed = CustomJoins.asofJoin(clicks, purchases, "user_id",
        "ts_ms", Seq("purchase_id", "purchase_ms"), d, tol)
        .orderBy("event_id").collect()
      val native = AsofJoin.asofJoinNative(clicks, purchases, "user_id",
        "ts_ms", Seq("purchase_id", "purchase_ms"), d, tol)
        .orderBy("event_id").collect()
      assert(strip(composed) == strip(native), s"direction=$d tol=$tol")
    }
  }

  test("tolerance with nullable payloads: no leak-through to older rows") {
    val left = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val right = Seq((10L, 80L, Some(6L)), (10L, 90L, None: Option[Long]))
      .toDF("k", "t", "pay")
    // tol 15: the match is t=90 (pay=null, in tolerance); t=80's pay=6
    // is OUT of tolerance and must not fall through the null payload
    for (form <- Seq("composed", "native")) {
      val row = (if (form == "composed")
        CustomJoins.asofJoin(left, right, "k", "t", Seq("pay"),
          AsofDirection.Backward, Some(15L))
      else
        AsofJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
          AsofDirection.Backward, Some(15L))).collect()(0)
      assert(row.isNullAt(3), s"$form leaked an out-of-tolerance payload")
    }
  }

  test("bucketed+sorted tables drive the native asof with ZERO exchange") {
    import graft.sources.Sources
    // the repeated-point-in-time-join shape at 100 TB: both sides stored
    // bucketed on the key and sorted (key, time) satisfy AsofJoinExec's
    // requiredChildDistribution/Ordering straight off the scan — no
    // exchange, no sort, just the merge pass
    val e = Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ms")
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(max("event_id").as("purchase_id"))
      .select(col("user_id"), col("ts_ms"), col("purchase_id"),
        col("ts_ms").as("purchase_ms"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      // sorted-bucket scans stopped reporting outputOrdering in Spark 3
      // (SPARK-28595: multi-file buckets would need a merge); with ONE
      // file per bucket (writeBucketed pre-shuffles) the legacy flag
      // soundly restores it — that's what elides the Sort
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      Seq("b_clicks", "b_purchases").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        // the catalog is per-JVM but the warehouse dir persists: a stale
        // location from an earlier run fails CREATE TABLE validation
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir")
            .stripPrefix("file:"), t)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(loc)
        }
      }
      Sources.writeBucketed(clicks, "b_clicks", "user_id", 4,
        sortCols = Seq("user_id", "ts_ms"))
      Sources.writeBucketed(purchases, "b_purchases", "user_id", 4,
        sortCols = Seq("user_id", "ts_ms"))
      val joined = AsofJoin.asofJoinNative(
        spark.table("b_clicks"), spark.table("b_purchases"),
        "user_id", "ts_ms", Seq("purchase_id", "purchase_ms"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed asof must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"single-file sorted buckets must satisfy the ordering:\n$plan")
      val got = joined.orderBy("event_id").collect().toSeq
      val expected = AsofJoin.asofJoinNative(clicks, purchases,
          "user_id", "ts_ms", Seq("purchase_id", "purchase_ms"))
        .orderBy("event_id").collect().toSeq
      assert(got == expected)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rejects non-Long key/time and missing columns") {
    val l = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinNative(l, l, "nope", "k", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinNative(l, l, "k", "k", Seq("v")) // k is Int
    }
  }
}
