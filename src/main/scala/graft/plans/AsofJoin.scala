package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.LongType

/** Custom logical operator: backward as-of join (SURVEY.md §2.3).
  *
  * `left` rows pick up the `payload` columns of the latest `right` row of
  * the same key with `right.time <= left.time` (equal times match).
  * Long-typed, non-null key and time columns (the common epoch-millis
  * case); payload columns come from `right` and turn nullable.
  *
  * This is ladder step (c) from the design notes: a whole-operator
  * semantic Spark can't express as one node — `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` ([[AsofJoinExec]]), registered through
  * `spark.experimental.extraStrategies` (see `SparkEntry.tune`) and
  * `GraftExtensions`. The composed union+window form
  * (`operators.CustomJoins.asofJoin`) remains as the pure-DataFrame
  * expression of the same semantics; both are gated by the same DuckDB
  * `ASOF JOIN` oracle.
  */
/** Match direction for the as-of join (time is Long, typically epoch ms).
  *  - [[AsofDirection.Backward]]: latest right with `rt <= lt` (default).
  *  - [[AsofDirection.Forward]]:  earliest right with `rt >= lt`.
  *  - [[AsofDirection.Nearest]]:  whichever of the two is closer in time;
  *    ties (equal distance) resolve backward.
  * An optional tolerance bounds `|rt - lt|`; out-of-tolerance candidates
  * leave the payload null, same as no match.
  */
sealed trait AsofDirection
object AsofDirection {
  case object Backward extends AsofDirection
  case object Forward extends AsofDirection
  case object Nearest extends AsofDirection
}

final case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    direction: AsofDirection = AsofDirection.Backward,
    toleranceMs: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: column-prune the right child of [[AsofJoinPlan]].
  *
  * Catalyst's ColumnPruning cannot see inside custom nodes, so without
  * this a wide right side would be scanned, shuffled, and sorted in full
  * even though the operator only reads (key, time, payload) — exactly the
  * "filter pushed, columns pruned" property §6 demands at 100 TB. The
  * inserted Project collapses into the child and reaches the scan's
  * ReadSchema (asserted in AsofJoinSpec).
  */
object PruneAsofJoinRight extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case aj: AsofJoinPlan
        if aj.right.output.size >
          (Seq(aj.rightKey, aj.rightTime) ++ aj.payload).distinct.size =>
      aj.copy(right = Project(
        (Seq(aj.rightKey, aj.rightTime) ++ aj.payload).distinct, aj.right))
  }
}

/** Planner strategy: one physical candidate, children planned lazily. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, payload, dir, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt,
        payload, dir, tol) :: Nil
    case _ => Nil
  }
}

object AsofJoin {

  /** Dataset-level API over the native operator.
    *
    * @param payload right-side columns carried onto left rows
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String],
      direction: AsofDirection = AsofDirection.Backward,
      toleranceMs: Option[Long] = None): DataFrame = {
    toleranceMs.foreach(t => require(t >= 0,
      s"asofJoinNative: tolerance must be non-negative, got $t"))
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    // Re-alias every right column: when both sides derive from the same
    // scan they share exprIds, and the analyzer's DeduplicateRelations
    // rewrites the child's output without visiting this custom node's
    // attribute references. Fresh aliases make the sides disjoint up front.
    val rFresh = right.select(
      right.columns.map(c => right.col(c).as(c)).toIndexedSeq: _*)
    val rPlan = rFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoinNative: no column `$name` on the $side side " +
            s"(have: ${plan.output.map(_.name).mkString(", ")})"))
    val (lk, lt) = (attr(lPlan, key, "left"), attr(lPlan, time, "left"))
    val (rk, rt) = (attr(rPlan, key, "right"), attr(rPlan, time, "right"))
    require(lk.dataType == LongType && lt.dataType == LongType &&
      rk.dataType == LongType && rt.dataType == LongType,
      "asofJoinNative requires Long key/time columns")
    val pay = payload.map(attr(rPlan, _, "right"))
    Shim.ofRows(spark, AsofJoinPlan(lPlan, rPlan, lk, lt, rk, rt, pay,
      direction, toleranceMs))
  }

  /** Idempotent strategy + optimizer-rule registration on a live session.
    *
    * Caveat: `extraOptimizations` runs in the LAST optimizer batch — after
    * V2 scan pushdown — so [[PruneAsofJoinRight]] reaches the scan's
    * ReadSchema only on the V1 file-source path (parquet/csv/json default).
    * For DSv2 tables, register through
    * `spark.sql.extensions=graft.functions.GraftExtensions`
    * (injectOptimizerRule → operator-optimization batch, before pushdown).
    */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsofJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PruneAsofJoinRight))
      spark.experimental.extraOptimizations = opts :+ PruneAsofJoinRight
  }
}
