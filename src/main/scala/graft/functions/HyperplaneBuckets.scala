package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `hyperplane_buckets(v)` — all sign-LSH bucket ids of a vector against a
  * whole plane bank in ONE codegen'd kernel: `tables` ints, bit `b` of
  * table `t` set iff `v · planes[t][b] > 0`.
  *
  * Exists for plan-size sanity: the composed form (`tables × bits`
  * separate `dot_product(v, typedLit(plane))` columns) embeds
  * tables·bits·dim literal doubles in the expression tree — at 64×4×64
  * that is 16k literals Catalyst must analyze, optimize, and Janino must
  * compile per query, which dominated knn_lsh/dedup_embedding_lsh wall
  * time. Here the bank rides along as ONE flat reference object and the
  * generated code is a 20-line triple loop.
  *
  * Determinism contract (oracle-critical): each dot is the same ascending
  * sequential double fold as [[DotProduct]] / DuckDB `list_dot_product`,
  * so buckets are bit-identical to the mirrored SQL.
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
    tables: Int, bits: Int, dim: Int) extends UnaryExpression {

  require(planes.length == tables * bits * dim,
    s"plane bank must be tables*bits*dim = ${tables * bits * dim} doubles")

  override def prettyName: String = "hyperplane_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
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

  private def checkDim(n: Int): Unit =
    if (n != dim) throw new IllegalArgumentException(
      s"$prettyName: expected $dim-dim vector, got $n")

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    checkDim(v.numElements())
    val fl = elemIsFloat
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          val x = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          dot += x * planes(off + i)
          i += 1
        }
        if (dot > 0) bucket |= 1 << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val getter =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        if ($a.numElements() != $dim) {
          throw new IllegalArgumentException(
            "$prettyName: expected $dim-dim vector, got " + $a.numElements());
        }
        int[] $out = new int[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          int $bucket = 0;
          for (int $b = 0; $b < $bits; $b++) {
            int $off = ($t * $bits + $b) * $dim;
            double $dot = 0.0;
            for (int $i = 0; $i < $dim; $i++) {
              $dot += $getter * $p[$off + $i];
            }
            if ($dot > 0) $bucket |= 1 << $b;
          }
          $out[$t] = $bucket;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
