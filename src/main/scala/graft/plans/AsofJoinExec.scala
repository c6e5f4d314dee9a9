package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical backward as-of join: a single co-partitioned, co-sorted merge
  * pass — the plan shape that survives 100 TB.
  *
  * Requirements declared to EnsureRequirements:
  *  - both children hash-clustered on their key (ONE shuffle each at most,
  *    reused if the child is already partitioned compatibly);
  *  - both children sorted inside partitions by (key, time).
  *
  * Execution is `zipPartitions` with one forward pointer into the right
  * iterator per partition — O(|L| + |R|) time, O(1) state (the last
  * payload row), zero candidate-pair materialization. Compare with the
  * union+window composition (two window passes over the union) or an
  * inequality join (per-key cross product): this node does strictly less
  * work per row and holds no window buffer.
  */
final case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    direction: AsofDirection = AsofDirection.Backward,
    toleranceMs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val payloadAttrs = payload
    // bind as nullable: unmatched left rows feed an all-null payload row,
    // and a nullable=false binding would skip the null check entirely
    val nullablePayload = payload.map(_.withNullability(true))
    val rightOutput = right.output
    val leftOutput = left.output
    val outAttrs = output
    // SQL comparison semantics for nullable key/time: a null on the right
    // can never satisfy `rk = k && rt <= t`, a null on the left matches
    // nothing (payload stays null). Checked only when the schema says nulls
    // are possible, so the common non-null path stays branch-free.
    val lMayBeNull = leftKey.nullable || leftTime.nullable
    val rMayBeNull = rightKey.nullable || rightTime.nullable

    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements co-partitions the children, but AQE coalescing or
    // a user-injected exchange around this custom node could desync them;
    // zipPartitions' own failure message doesn't name the operator.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsofJoinExec: children must be co-partitioned, got " +
        s"${lRdd.getNumPartitions} left vs ${rRdd.getNumPartitions} right " +
        "partitions (AQE coalesced the sides differently?)")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOutput ++ nullablePayload)
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var lastPayload: UnsafeRow = null
      var lastKey = 0L
      var lastTime = 0L
      val tol = toleranceMs.getOrElse(Long.MaxValue)
      // Forward leaves equal-time rows on `head` (rt >= lt is a forward
      // match); backward/nearest consume them (rt <= lt matches backward,
      // and at distance 0 backward always wins nearest's tie-break).
      val consumeEqual = direction != AsofDirection.Forward
      val useBackward = direction != AsofDirection.Forward
      val useForward = direction != AsofDirection.Backward

      def headUsable(k: Long): Boolean = rBuf.hasNext && {
        val head = rBuf.head
        !(rMayBeNull &&
          (head.isNullAt(rKeyOrd) || head.isNullAt(rTimeOrd))) &&
          head.getLong(rKeyOrd) == k
      }

      lIter.map { lRow =>
        if (lMayBeNull &&
            (lRow.isNullAt(lKeyOrd) || lRow.isNullAt(lTimeOrd))) {
          resultProj(joined(lRow, nullPayload))
        } else {
          val k = lRow.getLong(lKeyOrd)
          val t = lRow.getLong(lTimeOrd)
          var advance = rBuf.hasNext
          while (advance) {
            val head = rBuf.head
            if (rMayBeNull &&
                (head.isNullAt(rKeyOrd) || head.isNullAt(rTimeOrd))) {
              rBuf.next() // unmatchable; nulls sort first, skip past them
              advance = rBuf.hasNext
            } else {
              val rk = head.getLong(rKeyOrd)
              val rt = head.getLong(rTimeOrd)
              if (rk < k ||
                  (rk == k && (rt < t || (consumeEqual && rt == t)))) {
                val r = rBuf.next()
                lastKey = rk
                lastTime = rt
                // copy: the projection buffer is reused by the next call
                lastPayload = payloadProj(r).copy()
                advance = rBuf.hasNext
              } else advance = false
            }
          }
          val backOk = useBackward && lastPayload != null &&
            lastKey == k && t - lastTime <= tol
          val fwdOk = useForward && headUsable(k) &&
            rBuf.head.getLong(rTimeOrd) - t <= tol
          val p: InternalRow =
            if (backOk && fwdOk) {
              // nearest: both candidates in tolerance; ties go backward
              if (t - lastTime <= rBuf.head.getLong(rTimeOrd) - t)
                lastPayload
              else payloadProj(rBuf.head)
            } else if (backOk) lastPayload
            else if (fwdOk) payloadProj(rBuf.head)
            else nullPayload
          resultProj(joined(lRow, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
