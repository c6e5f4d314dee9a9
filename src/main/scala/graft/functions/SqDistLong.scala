package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sq_dist_long(a, b)` → long: exact integer squared L2 distance
  * between two `array<long>` micro-unit vectors — Σ(aᵢ−bᵢ)² as one
  * codegen'd pass. Integer addition is order-independent and exact, so
  * the value is bit-identical to any restatement of the same sum (the
  * DuckDB mirror is a list-comprehension `list_sum`); no rounding
  * contract is involved at all. Headroom: micro components |m| ≤ ~2·10⁶
  * ⇒ per-term ≤ 1.6·10¹³, ×64 dims ≤ 10¹⁵ — far inside BIGINT (overflow
  * needs |m| ≥ ~3.8·10⁸, i.e. raw values ≥ ~380 — re-scale units before
  * that, as the emb_stats headroom notes prescribe).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sq_dist_long"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def isLongVec(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongVec(left.dataType) && isLongVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.sqDistLong($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Static-forwarder host for the long-vector kernels: the case class has
  * a companion-free name so generated Java can call a true static.
  */
object VecKernels {
  def sqDistLong(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"sq_dist_long: vector lengths differ ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}
