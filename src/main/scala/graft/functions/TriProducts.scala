package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `tri_products(m)` — all upper-triangle pairwise products of an integer
  * component vector in ONE codegen'd kernel: for a d-long input, a
  * d(d+1)/2-long output holding `m[i]·m[j]` for i ≤ j in row-major order
  * (i ascending, then j from i). Output index k maps back to (i, j) via
  * the row_number-ordered pair table the scatter plan broadcasts.
  *
  * Exists for the emb_covariance / emb_pca_power scatter build: the
  * composed form (nested `transform(sequence...)` + 2·d(d+1)/2
  * `element_at` calls building a struct per cell) is interpreted
  * (CodegenFallback) and allocates ~2080 GenericInternalRows per input
  * row — it was the slowest plan in BENCH_r06. Here the whole triangle
  * is a two-level long loop into one primitive array.
  *
  * Determinism contract (oracle-critical): long multiplication is exact —
  * the emitted integers are identical to the composed form's in the same
  * order (KernelSpec pins the equivalence). Inputs are micro-unit
  * components (|m| ≤ ~10⁷), so products stay far inside Long; the SUM
  * over vectors accumulates as DECIMAL(38,0) downstream.
  */
case class TriProducts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "tri_products"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val mi = v.getLong(i)
      var j = i
      while (j < n) {
        out(k) = mi * v.getLong(j)
        k += 1
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val mi = ctx.freshName("mi")
      s"""
        int $n = $a.numElements();
        long[] $out = new long[$n * ($n + 1) / 2];
        int $k = 0;
        for (int $i = 0; $i < $n; $i++) {
          long $mi = $a.getLong($i);
          for (int $j = $i; $j < $n; $j++) {
            $out[$k++] = $mi * $a.getLong($j);
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
