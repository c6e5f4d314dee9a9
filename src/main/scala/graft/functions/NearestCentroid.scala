package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `nearest_centroid(v, cents)` — argmax-cosine centroid id in one
  * codegen'd pass. `cents` is an `array<struct<cent_id:long,
  * cv:array<double>>>` column (the broadcast 1-row codebook), scanned in
  * array order with strict `>`, so a cent_id-ASCENDING (array_sort'ed)
  * input reproduces ordering by (cosine DESC, cent_id ASC) — the same
  * tie-break as the DuckDB row_number mirror.
  *
  * Replaces the `aggregate()` HOF fold ([[graft.sim.Knn.assign]]'s
  * previous body): HOFs are CodegenFallback, so every row paid an
  * interpreted 2·nlist-step fold with per-step struct allocation. This
  * kernel also hoists the query norm out of the centroid loop — the same
  * sequential fold value [[CosineSim]] computes per pair, so every cosine
  * (and the chosen id) is bit-identical to the composed form.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (v, ArrayType(StructType(Array(idF, cvF)), _))
        if isVec(v) && idF.dataType == LongType && isVec(cvF.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<struct<long," +
        s"array<double>>>), got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val vv = new Array[Double](dim)
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getDouble(i)
      vv(i) = x
      na += x * x
      i += 1
    }
    var best = -2.0
    var bestId = Long.MaxValue
    var nanChosen = false
    var j = 0
    val k = cents.numElements()
    if (k == 0) throw new IllegalArgumentException(
      s"$prettyName: empty codebook")
    while (j < k) {
      val st = cents.getStruct(j, 2)
      val cv = st.getArray(1)
      if (cv.numElements() != dim) throw new IllegalArgumentException(
        s"$prettyName: vector lengths differ ($dim vs ${cv.numElements()})")
      var dot = 0.0
      var nb = 0.0
      i = 0
      while (i < dim) {
        val c = cv.getDouble(i)
        dot += vv(i) * c
        nb += c * c
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // a zero-norm side makes cos NaN; both engines' DESC orderings
      // rank NaN first, so the lowest-cent_id NaN entry must win —
      // plain `cos > best` would silently skip it
      if (cos.isNaN) {
        if (!nanChosen) { bestId = st.getLong(0); nanChosen = true }
      } else if (!nanChosen && cos > best) {
        best = cos
        bestId = st.getLong(0)
      }
      j += 1
    }
    bestId
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val vv = ctx.freshName("vv")
      val na = ctx.freshName("na")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val st = ctx.freshName("st")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val cos = ctx.freshName("cos")
      val nanChosen = ctx.freshName("nanChosen")
      s"""
        int $dim = $a.numElements();
        double[] $vv = new double[$dim];
        double $na = 0.0;
        for (int $i = 0; $i < $dim; $i++) {
          $vv[$i] = $a.getDouble($i);
          $na += $vv[$i] * $vv[$i];
        }
        double $best = -2.0;
        long $bestId = Long.MAX_VALUE;
        boolean $nanChosen = false;
        int $k = $b.numElements();
        if ($k == 0) {
          throw new IllegalArgumentException("$prettyName: empty codebook");
        }
        for (int $j = 0; $j < $k; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $st =
            $b.getStruct($j, 2);
          org.apache.spark.sql.catalyst.util.ArrayData $cv =
            $st.getArray(1);
          if ($cv.numElements() != $dim) {
            throw new IllegalArgumentException(
              "$prettyName: vector lengths differ (" + $dim + " vs " +
                $cv.numElements() + ")");
          }
          double $dot = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $dim; $i++) {
            double $c = $cv.getDouble($i);
            $dot += $vv[$i] * $c;
            $nb += $c * $c;
          }
          double $cos = $dot /
            (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          // NaN (zero-norm side) ranks FIRST in both engines' DESC
          // orderings: first NaN entry wins, mirroring the window form
          if (Double.isNaN($cos)) {
            if (!$nanChosen) { $bestId = $st.getLong(0); $nanChosen = true; }
          } else if (!$nanChosen && $cos > $best) {
            $best = $cos;
            $bestId = $st.getLong(0);
          }
        }
        ${ev.value} = $bestId;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
