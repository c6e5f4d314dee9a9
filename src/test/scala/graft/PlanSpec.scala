package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions — SURVEY.md §6: pushdown, pruning, broadcast
  * choices, and no accidental cross products. These are the properties
  * that decide whether a query survives a 100× scale-up.
  */
class PlanSpec extends SparkSpec {

  private def df(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)
  private def physical(name: String): String =
    df(name).queryExecution.executedPlan.toString

  test("q02 pushes predicates and prunes columns at the parquet scan") {
    val plan = physical("q02_filter_project")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate filter should reach the scan")
    assert(!plan.contains("l_tax"), "unprojected column must be pruned")
  }

  test("q06 selective scan keeps whole-stage codegen") {
    val d = df("q06_selective_agg")
    d.collect() // finalize the AQE plan so codegen stages are visible
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "codegen'd stages print as *(n)")
    assert(plan.contains("PushedFilters:"))
  }

  test("q04 small-dim joins broadcast (no shuffle join)") {
    val plan = physical("q04_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q03 broadcasts the filtered customer dim") {
    assert(physical("q03_join_agg").contains("BroadcastHashJoin"))
  }

  test("asof join is shuffle+window, never a pair join") {
    val plan = physical("asof_join")
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("range join runs as an equi hash/merge join, not a cross product") {
    val plan = physical("range_join")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("cosine_sim stays inside whole-stage codegen") {
    val d = df("knn_bruteforce")
    d.collect() // finalize the AQE plan so codegen stages are visible
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "expected codegen'd stages in the plan")
    assert(plan.contains("cosine_sim"))
  }

  /** Queries where a nested-loop join is the DESIGN (broadcast of a tiny
    * side against an un-equi-joinable predicate), not an accident.
    */
  private val intendedNestedLoop = Set(
    "knn_bruteforce",   // broadcast query set vs corpus (no equi key exists)
    "knn_ivf",          // broadcast 16-centroid codebook
    "q18_corr_scalar")  // broadcast 1-row aggregate threshold

  test("embedding dedup is a blocked equi-join, not a pair scan") {
    for (name <- Seq("dedup_embedding", "dedup_embedding_lsh")) {
      val plan = physical(name)
      assert(!plan.contains("CartesianProduct"), name)
      assert(!plan.contains("BroadcastNestedLoopJoin"), name)
    }
  }

  test("no query plans an accidental cross product") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val plan = physical(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!intendedNestedLoop(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unintended BroadcastNestedLoopJoin")
    }
  }

  test("dedup_minhash signature aggregation is partially aggregated") {
    // partial_min on the map side means the exchange carries one row per
    // doc, not the exploded shingle stream
    val plan = df("dedup_minhash_lsh")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial min")
      || plan.contains("HashAggregate"))
  }
}
