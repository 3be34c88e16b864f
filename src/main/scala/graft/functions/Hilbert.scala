package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.graftshim.ExprShim
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Static host for the Hilbert-curve kernel (plain object so generated
  * code calls a static-ish method — same rationale as ZOrderOps). */
object HilbertOps {

  /** 64-bit Hilbert index of two signed ints (32 bits per dimension,
    * the full 2³²×2³² grid). Coordinates are sign-biased the same way
    * as [[ZOrderOps.interleave]], and the final XOR makes Spark's
    * SIGNED long order equal the curve's unsigned order.
    *
    * Classic quadrant-descent (Wikipedia xy2d), with the low bits
    * explicitly masked before each sub-square reflection so every
    * intermediate stays in [0, s) — no two's-complement subtleties.
    * Unsigned-overflow note: d accumulates to 2⁶⁴−1; Java long adds
    * wrap mod 2⁶⁴, which IS unsigned arithmetic, and the final sign
    * flip converts unsigned order back to signed sort order. */
  def xy2d(a: Int, b: Int): Long = {
    var x = (a ^ Int.MinValue).toLong & 0xffffffffL
    var y = (b ^ Int.MinValue).toLong & 0xffffffffL
    var d = 0L
    var s = 1L << 31
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // descend into the quadrant: keep only the low bits, then
      // rotate/reflect the sub-square per the quadrant entered
      x &= s - 1
      y &= s - 1
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d ^ Long.MinValue
  }

  /** Inverse (biased-domain): Hilbert index → (x, y) on the unsigned
    * 2³² grid. Test/diagnostic use — the round-trip property in
    * HilbertSpec is what proves xy2d correct. */
  def d2xy(dIn: Long): (Long, Long) = {
    var t = dIn ^ Long.MinValue
    var x = 0L; var y = 0L
    var s = 1L
    while (s != 0 && s < (1L << 32)) {
      val rx = 1L & (t >>> 1)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t = t >>> 2
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert_key(a, b)` — Hilbert space-filling-curve clustering key.
  *
  * Same role as [[ZOrderKey]] (sort before write → each file's
  * min/max stats cover a small rectangle → box predicates skip
  * files), but the Hilbert curve never takes the long diagonal jumps
  * Morton order does, so consecutive key ranges map to tighter
  * rectangles — measurably fewer files touched per box at the same
  * file count. The layout layer the reference lacks entirely; pick
  * Hilbert for read-heavy box workloads, Z-order when the cheaper
  * 6-shift kernel matters for write throughput.
  */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertOps.xy2d(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertOps.xy2d($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  def apply(a: Column, b: Column): Column =
    ExprShim.column(HilbertKey(ExprShim.expression(a), ExprShim.expression(b)))
}
