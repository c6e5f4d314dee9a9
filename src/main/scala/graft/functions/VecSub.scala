package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_sub(a, b)` — codegen'd elementwise vector difference over
  * float/double arrays, returning `array<double>`. The residual step of
  * IVFPQ encoding (x − centroid) runs once per corpus row — an
  * interpreted `zip_with` there would be the CodegenFallback
  * re-evaluation trap SURVEY.md §6 documents, so it gets the kernel
  * treatment like the other hot-path array ops. Pure elementwise IEEE
  * subtraction: no fold, so no ordering subtlety — bit-identical to
  * DuckDB's indexed `list_transform(v, (x,i) -> x - c[i])` mirror by
  * construction. KernelSpec pins equality with the `zip_with` form.
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vec_sub"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector lengths differ ($n vs ${y.numElements()})")
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      out(i) = xv - yv
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      def get(e: Expression, v: String): String =
        if (elemIsFloat(e)) s"(double) $v.getFloat($i)"
        else s"$v.getDouble($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw new IllegalArgumentException(
            "$prettyName: vector lengths differ (" + $n + " vs " +
              $b.numElements() + ")");
        }
        double[] $arr = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          $arr[$i] = ${get(left, a)} - ${get(right, b)};
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
