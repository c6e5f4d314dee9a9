package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k selection — the partial-aggregatable
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY score
  * DESC, id ASC) <= k` on corpus×corpus candidate sets.
  *
  * The window form (even with WindowGroupLimit's partial rank limit)
  * SORTS every candidate row map-side: at knn_join scale that is
  * n·nprobe/nlist·n rows — ~900M at the sf3 sweep, whose sort spill
  * filled 79 GB of disk before this aggregate existed. The aggregate
  * keeps a ≤k sorted buffer per group inside ObjectHashAggregate, so
  * the map side reduces the candidate mass to groups·k rows before the
  * exchange and NOTHING ever sorts the candidates. On a 1000-executor
  * cluster this is the difference between a top-k that spills the n²
  * candidate stream to disk and one that never materializes it.
  *
  * Pure SELECTION — no arithmetic — under the same (score desc, id
  * asc) total order as the window form, so output rows are
  * bit-identical (TopEdgesSpec pins the equivalence on tie-heavy
  * data; the knn_join oracle row re-pins it against DuckDB).
  */
class TopEdges(k: Int)
    extends Aggregator[(Double, Long), Vector[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  /** (score desc, id asc), matching Spark's window sort order exactly:
    * NaN orders LARGEST (unreachable for cosines of non-zero vectors,
    * but this aggregate is the shared top-k for every graph path), and
    * -0.0 == 0.0 under primitive `==`/`>` just as the window's
    * normalized sort keys treat them — do NOT switch to Double.compare,
    * which splits ±0.0 and would break window parity on zero scores.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val an = a._1.isNaN; val bn = b._1.isNaN
    if (an || bn) (an && !bn) || (an == bn && a._2 < b._2)
    else a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  }

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(s: Vector[(Double, Long)],
      r: (Double, Long)): Vector[(Double, Long)] =
    if (s.length >= k && !better(r, s.last)) s // O(1) reject fast path
    else {
      val i = s.indexWhere(e => better(r, e)) match {
        case -1 => s.length
        case x => x
      }
      (s.take(i) :+ r) ++ s.drop(i) take k
    }

  override def merge(a: Vector[(Double, Long)],
      b: Vector[(Double, Long)]): Vector[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  override def finish(s: Vector[(Double, Long)]): Seq[(Double, Long)] = s

  override def bufferEncoder
      : org.apache.spark.sql.Encoder[Vector[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Vector[(Double, Long)]]()

  override def outputEncoder
      : org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopEdges {
  /** Column form: `topK(k)(scoreCol, idCol)` → array<struct<_1,_2>>
    * ordered best→worst.
    */
  def topK(k: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopEdges(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long)]())
}
