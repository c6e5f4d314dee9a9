package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `first_fit_bins(items, ctx)` → array<struct<doc_id, n, bin, off>>:
  * sequential first-fit bin packing of one shard's items into
  * ctx-capacity bins, in ONE codegen'd call per shard.
  *
  * `items` is array<struct<negn: long, doc_id: long>> PRE-SORTED
  * ascending (negn = −n_tokens, so the walk is first-fit-DECREASING
  * with doc_id tie-break — the deterministic order both engines state).
  * Each item goes into the lowest-numbered bin with remaining capacity
  * ≥ n, else opens a new bin; an oversized item (n > ctx) therefore
  * always opens a DEDICATED bin (no later item fits behind it), kept
  * whole — truncation is the consumer's choice, not the packer's.
  * Output per item: (doc_id, n, 1-based bin index within the shard,
  * token offset within the bin).
  *
  * O(items × bins) per shard with bins ≤ items — bounded by the shard
  * size, which is the scale contract: shards pack independently and in
  * parallel, exactly the per-shard best-fit packing production
  * pipelines run (Ding et al. 2024, "Fewer Truncations Improve
  * Language Modeling"), because a training sequence must be assembled
  * on one node anyway and cross-shard packing buys only O(1/shard)
  * occupancy.
  */
case class FirstFitBins(child: Expression, ctx: Int)
    extends UnaryExpression {
  require(ctx >= 1, s"bin capacity must be >= 1, got $ctx")
  override def prettyName: String = "first_fit_bins"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("bin", LongType, nullable = false),
    StructField("off", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 &&
        fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<long, long>>, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PackKernels.firstFit(input.asInstanceOf[ArrayData], ctx)

  override def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, a =>
      s"${ev.value} = graft.functions.PackKernels.firstFit($a, $ctx);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PackKernels {

  /** See [[FirstFitBins]]. Bin state = (remaining, fill) long arrays;
    * a new bin is sized `max(ctx, n)` — the oracle's `greatest(ctx, n)`
    * virtual bin VERBATIM, so an oversized item's dedicated bin ends at
    * remaining exactly 0, not negative. The distinction is observable:
    * a zero-token doc fits a remaining-0 bin (0 ≥ 0) in both engines,
    * where a negative-remaining bin would reject it in the kernel only
    * and break the hash gate (the reviewed n=0-behind-oversized case;
    * PackingSpec pins it).
    */
  def firstFit(items: ArrayData, ctx: Int): ArrayData = {
    val m = items.numElements()
    var cap = 16
    var rem = new Array[Long](cap)
    var fill = new Array[Long](cap)
    var nb = 0
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val row = items.getStruct(i, 2)
      val n = -row.getLong(0)
      val id = row.getLong(1)
      var j = 0
      while (j < nb && rem(j) < n) j += 1
      if (j == nb) {
        if (nb == cap) {
          cap *= 2
          rem = java.util.Arrays.copyOf(rem, cap)
          fill = java.util.Arrays.copyOf(fill, cap)
        }
        rem(j) = math.max(ctx.toLong, n)
        fill(j) = 0L
        nb += 1
      }
      out(i) = new GenericInternalRow(Array[Any](id, n, (j + 1).toLong,
        fill(j)))
      fill(j) += n
      rem(j) -= n
      i += 1
    }
    new GenericArrayData(out)
  }
}
