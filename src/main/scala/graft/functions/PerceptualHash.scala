package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `perceptual_hash(payload, bins)` → long: average-hash (aHash) over an
  * opaque BINARY payload, the 1-D analog of the classic image aHash
  * (resize to a fixed grid, one bit per cell: cell mean above the global
  * mean).
  *
  * The payload is floor-partitioned into `bins` contiguous segments
  * (byte `i` lands in segment `i * bins DIV n` — the exact "resize to a
  * fixed grid" index map), and bit `b` is set iff segment `b`'s mean byte
  * value is STRICTLY above the whole-payload mean:
  * `sum_b * n > total * len_b` — cross-multiplied pure integer compare,
  * no division, so the DuckDB mirror is bit-identical. Near-identical
  * payloads (re-encodes, small edits) perturb few segment means → small
  * hamming distance; structurally different payloads disagree widely.
  * A byte-CLASS histogram would NOT discriminate here (all natural-language
  * payloads share letter frequencies); the positional profile is what
  * separates template families from strangers.
  *
  * Empty payload → 0 (callers drop empty payloads before the banded join,
  * the dedup_simhash empty-doc rule). `bins ≤ 60` keeps the hash positive
  * in a signed 64-bit lane (the dedup_simhash convention — no
  * sign-extension edge cases in the mirrored band-extraction SQL).
  * Overflow: `total * len_b ≤ 255·n²` — safe in a long through
  * multi-hundred-MB payloads.
  *
  * Whole-stage-codegen: one generated static call, single pass over the
  * payload, no per-row allocation beyond two small count arrays. All
  * accumulation is order-independent integer addition, so there is no
  * fold-order parity risk; KernelSpec pins the kernel against a composed
  * Scala reference.
  */
object PerceptualHash {
  def hash(bytes: Array[Byte], bins: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](bins)
    val lens = new Array[Long](bins)
    var total = 0L
    var i = 0
    while (i < n) {
      val b = (i.toLong * bins / n).toInt
      val v = (bytes(i) & 0xFF).toLong
      sums(b) += v
      lens(b) += 1L
      total += v
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < bins) {
      if (sums(b) * n > total * lens(b)) h |= 1L << b
      b += 1
    }
    h
  }
}

/** Static host for [[ByteSum]] — separately named from the case class
  * (a companion of the same name emits no static forwarders, so
  * codegen'd Java couldn't call it — the TextKernels/PackKernels rule).
  */
object BinKernels {
  /** Sum of unsigned byte values — the stub "frame energy" feature. */
  def byteSum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xFF); i += 1 }
    s
  }
}

/** `byte_sum(payload)` → long: unsigned byte-value sum of a BINARY
  * payload — the 1-D "energy" of a frame under the stub decoder (a real
  * audio pipeline sums |sample|²; the Spark shape — map-only codegen
  * kernel per frame, windows on the media key — is identical). Integer
  * accumulation, order-independent, bit-identical to the DuckDB
  * per-char `ord` sum on this ASCII corpus.
  */
case class ByteSum(child: Expression) extends UnaryExpression {
  override def prettyName: String = "byte_sum"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary column, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    BinKernels.byteSum(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BinKernels.byteSum($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

case class PerceptualHash(child: Expression, bins: Int)
    extends UnaryExpression {
  require(bins >= 1 && bins <= 60, s"bins must be in [1,60], got $bins")
  override def prettyName: String = "perceptual_hash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary column, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PerceptualHash.hash(input.asInstanceOf[Array[Byte]], bins)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PerceptualHash.hash($a, $bins);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
