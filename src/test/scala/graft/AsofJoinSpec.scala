package graft

import org.apache.spark.sql.functions._

import graft.plans.AsofJoin

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
