package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `phash_subset_keys(phash)` — every g-subset-of-bands blocking key of
  * a banded hamming hash in ONE codegen'd kernel.
  *
  * Generalized pigeonhole: at hamming ≤ h over `bands` equal-width
  * bands, ≥ bands−h bands are untouched, so any pair within the radius
  * shares an IDENTICAL g-subset of band values whenever
  * g ≤ bands−h — candidate recall stays EXACT while each extra subset
  * order multiplies the blocking-key space by 2^width (the r16 phash
  * triage: single 5-bit bands saturate at corpus scale — 599M raw
  * candidates at sf1 for 2,022 true pairs; g=4 quads measured 4.4M,
  * 137× less, same verified output).
  *
  * Key packing (one long): `sid·2^(g·width) + Σᵢ bvᵢ·2^(i·width)` where
  * sid indexes the lexicographic g-combination and bvᵢ its i-th band's
  * value. bands ≤ 16, g ≤ 4, width ≤ 15 keep the key far below 2⁶³.
  *
  * Exists for plan-size sanity (the hyperplane-literal rule): the
  * composed form embeds C(bands,g)·g shift/mask/add literal trees —
  * 495 structs at g=4 ICE'd Janino ("Code grows beyond 64 KB") on the
  * triage probe. Here the subset table rides as ONE flat reference
  * array and the generated code is a 10-line double loop.
  */
case class PhashSubsetKeys(child: Expression, bands: Int, width: Int,
    g: Int) extends UnaryExpression {

  require(bands > 0 && g > 0 && g <= bands,
    s"need 0 < g <= bands, got g=$g bands=$bands")
  require(bands * width <= 63, s"bands*width must fit a long")
  // key = sid << (g*width) | values; sid < C(bands,g) < 2^22 for any
  // bands <= 16 — keep the value slots small enough that the packed
  // key can never overflow (the packed-long slot-sizing rule)
  require(g * width <= 40,
    s"g*width must leave sid headroom in the packed key, got ${g * width}")

  /** Lexicographic g-combinations of band indices, flattened row-major
    * (g entries per subset) — shipped to codegen as ONE reference array.
    */
  private lazy val subsets: Array[Int] =
    (0 until bands).combinations(g).flatten.toArray

  private def nSubsets: Int = subsets.length / g

  override def prettyName: String = "phash_subset_keys"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint hash, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val phash = input.asInstanceOf[Long]
    UnsafeArrayData.fromPrimitiveArray(
      PhashKernels.subsetKeys(phash, subsets, g, width))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ss = ctx.addReferenceObj("subsets", subsets, "int[]")
      s"""
        ${ev.value} = org.apache.spark.sql.catalyst.expressions
          .UnsafeArrayData.fromPrimitiveArray(
            graft.functions.PhashKernels.subsetKeys($a, $ss, $g, $width));
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Static kernel host — separate from any case class so codegen'd Java
  * can call it (case-class companions emit no static forwarders).
  */
object PhashKernels {
  def subsetKeys(phash: Long, subsets: Array[Int], g: Int,
      width: Int): Array[Long] = {
    val mask = (1L << width) - 1
    val n = subsets.length / g
    val out = new Array[Long](n)
    var sid = 0
    while (sid < n) {
      var key = sid.toLong << (g * width)
      var i = 0
      while (i < g) {
        val b = subsets(sid * g + i)
        key |= ((phash >> (b * width)) & mask) << (i * width)
        i += 1
      }
      out(sid) = key
      sid += 1
    }
    out
  }
}
