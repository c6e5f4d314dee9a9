package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass z-score summarization shared by eval and codegen. */
object ZScore {

  /** One pass over `v` against the dim-ordered moment array `ms`
    * (struct<dim_idx, mean, variance>, array position i = dimension
    * i+1): z_i = 0 when variance is 0, else (x_i − mean_i)/√variance_i
    * — the identical IEEE chain both the replaced HOF form and the
    * DuckDB mirror compute — folded left-to-right into (z_min, z_max,
    * |z|>zThresh count). No NaN handling: inputs are finite and
    * sqrt(var>0) > 0, so z is always finite.
    */
  def summary(v: ArrayData, ms: ArrayData, zThresh: Double): InternalRow = {
    val dim = v.numElements()
    if (ms.numElements() != dim) throw new IllegalArgumentException(
      s"zscore_summary: ${ms.numElements()} moments for $dim dims")
    if (dim == 0) throw new IllegalArgumentException(
      "zscore_summary: empty vector")
    var zMin = Double.PositiveInfinity
    var zMax = Double.NegativeInfinity
    var n = 0L
    var i = 0
    while (i < dim) {
      val st = ms.getStruct(i, 3)
      val variance = st.getDouble(2)
      val z =
        if (variance == 0.0) 0.0
        else (v.getDouble(i) - st.getDouble(1)) / math.sqrt(variance)
      if (z < zMin) zMin = z
      if (z > zMax) zMax = z
      if (math.abs(z) > zThresh) n += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](zMin, zMax, n))
  }
}

/** `zscore_summary(v, ms)` → struct<z_min:double, z_max:double,
  * n_outliers:long>: per-vector standardization summary in ONE codegen'd
  * pass. Replaces the composed form (a `transform` building the z array,
  * consumed by array_min + array_max + filter): higher-order functions
  * are CodegenFallback and CollapseProject inlines the z expression into
  * each consumer, so every row paid THREE interpreted O(d) transforms —
  * the re-evaluation trap SURVEY.md §6 documents. The fold order and each
  * z's IEEE op chain are identical to that form, so the summary is
  * bit-identical (KernelSpec pins it).
  */
case class ZScoreSummary(left: Expression, right: Expression,
    zThresh: Double) extends BinaryExpression {

  override def prettyName: String = "zscore_summary"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("z_min", DoubleType, nullable = false),
    StructField("z_max", DoubleType, nullable = false),
    StructField("n_outliers", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(DoubleType, _),
        ArrayType(StructType(Array(idF, meanF, varF)), _))
        if idF.dataType == LongType && meanF.dataType == DoubleType &&
          varF.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<struct<long,double," +
        s"double>>), got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZScore.summary(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      zThresh)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZScore.summary($a, $b, $zThresh);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
