package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `sign_bits(v)` — pack the component signs of a ≤64-dim vector into one
  * BIGINT: bit i set iff `v[i] > 0` (float widened to double first, so the
  * comparison is the same IEEE decision the DuckDB mirror
  * `CASE WHEN v[i+1] > 0 THEN 1::BIGINT << i` makes). The classic 1-bit
  * scalar quantization behind binary-sketch ANN: 64 dims collapse to 8
  * bytes, and hamming distance (`bit_count(a ^ b)`) becomes a 1-cycle
  * popcount proxy for angular distance.
  *
  * Codegen kernel (not a higher-order `transform`/`aggregate` chain —
  * those are CodegenFallback and re-evaluate the array child per call);
  * single sequential pass, stays inside WholeStageCodegen.
  */
case class SignBits(child: Expression) extends UnaryExpression {

  override def prettyName: String = "sign_bits"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> input, got ${other.simpleString}")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), 64)
    var bits = 0L
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (x > 0d) bits |= 1L << i
      i += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      val get =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), 64);
        long $bits = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($get > 0d) $bits |= 1L << $i;
        }
        ${ev.value} = $bits;
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
