package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving-style top-k frequent-items sketch as a typed Aggregator —
  * ladder step (b): a custom TypedColumn aggregation.
  *
  * Per-partition state is a capped counter map (`capacity` entries): when
  * full, inserting a new item evicts the current minimum and inherits its
  * count (the SpaceSaving overestimate bound: error ≤ N/capacity). Merge
  * sums counters and re-caps. The exchange carries one map per group —
  * never the raw items — so a hot group costs O(capacity), not O(rows).
  *
  * Exact when a group's distinct-item count stays ≤ capacity (asserted
  * against the exact window top-k in TopKSketchSpec at test scale).
  */
/** `evicted` distinguishes "full because it saw exactly `capacity`
  * distinct items" (counts exact, merge floor 0) from "full and evicting"
  * (counts are overestimates, absent items may hold up to the minimum).
  */
final case class TopKState(counters: Map[String, Long], evicted: Boolean)

class TopKSketch[I](k: Int, capacity: Int, item: I => String)
    extends Aggregator[I, TopKState, Seq[(String, Long)]] {

  require(capacity >= k, "capacity must be >= k")

  override def zero: TopKState = TopKState(Map.empty, evicted = false)

  override def reduce(state: TopKState, row: I): TopKState = {
    val it = item(row)
    val m = state.counters
    // persistent `updated` is O(log n) — no full-map copy per input row
    m.get(it) match {
      case Some(c) => state.copy(counters = m.updated(it, c + 1))
      case None if m.size < capacity =>
        state.copy(counters = m.updated(it, 1L))
      case None =>
        // evict the minimum, inherit its count (SpaceSaving)
        val (minItem, minCount) = m.minBy { case (i, c) => (c, i) }
        TopKState((m - minItem).updated(it, minCount + 1), evicted = true)
    }
  }

  override def merge(a: TopKState, b: TopKState): TopKState = {
    // SpaceSaving merge (Agarwal et al.): an item absent from a summary
    // that has EVICTED may have held up to that summary's minimum count —
    // add that floor so every count stays an overestimate and the
    // error <= N/capacity bound survives merges. A merely-full summary
    // that never evicted contributes floor 0 (its counts are exact).
    def floor(s: TopKState): Long =
      if (s.evicted) s.counters.valuesIterator.min else 0L
    val (fa, fb) = (floor(a), floor(b))
    val m = mutable.Map.empty[String, Long]
    a.counters.foreach { case (i, c) =>
      m.update(i, c + b.counters.getOrElse(i, fb))
    }
    b.counters.foreach { case (i, c) =>
      if (!m.contains(i)) m.update(i, c + fa)
    }
    val overflow = m.size > capacity
    val capped =
      if (!overflow) m.toMap
      else m.toSeq.sortBy { case (i, c) => (-c, i) }.take(capacity).toMap
    TopKState(capped, a.evicted || b.evicted || overflow)
  }

  override def finish(state: TopKState): Seq[(String, Long)] =
    state.counters.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)

  override def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKSketch {
  /** `ds.groupByKey(...).agg(TopKSketch.topK(5)(_.item))` */
  def topK[I](k: Int, capacity: Int = 1024)(
      f: I => String): TypedColumn[I, Seq[(String, Long)]] =
    new TopKSketch[I](k, capacity, f).toColumn
}
