package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_bands(sh)` — the full banded MinHash signature of a shingle
  * set in ONE map-side kernel: for each of `perms` seeded xxhash64
  * permutations take the min over the shingles, then fold each band's
  * `perms/bands` minhashes into one band hash →
  * `array<struct<band:int, bh:long>>`.
  *
  * Replaces explode(shingles) → groupBy(doc) with `perms` min-aggregates:
  * that shape shuffles the exploded shingle stream's partial rows and
  * runs `perms` aggregate updates per shingle through agg machinery; this
  * kernel is a tight double loop per document with NO exchange at all —
  * the signature stage becomes map-only, which is the 100 TB shape (the
  * only remaining shuffle in minhash dedup is the thin band-bucket
  * self-join).
  *
  * Hash choice: XXH64 over the shingle bytes with the permutation index
  * as seed (and an XXH64 long-chain per band). Signatures never cross
  * engines — the oracle gates the VERIFIED PAIR OUTPUT against exact
  * ground truth, so any deterministic hash family is valid; a green
  * oracle row proves this one keeps full recall at τ.
  */
case class MinhashBands(child: Expression, perms: Int, bands: Int)
    extends UnaryExpression {
  require(perms % bands == 0, s"perms=$perms must divide into bands=$bands")

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bh", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashBands.compute(input.asInstanceOf[ArrayData], perms, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashBands.compute($a, $perms, " +
        s"$bands);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MinhashBands {
  /** Static entry shared by eval and generated code. */
  def compute(sh: ArrayData, perms: Int, bands: Int): ArrayData = {
    val n = sh.numElements()
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = sh.getUTF8String(i)
      var p = 0
      while (p < perms) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, p)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    val rows = bands
    val width = perms / bands
    val out = new Array[Any](rows)
    var b = 0
    while (b < rows) {
      var bh = b.toLong
      var r = 0
      while (r < width) {
        bh = XXH64.hashLong(mins(b * width + r), bh)
        r += 1
      }
      out(b) = new GenericInternalRow(
        Array[Any](b, bh)): InternalRow
      b += 1
    }
    new GenericArrayData(out)
  }
}
