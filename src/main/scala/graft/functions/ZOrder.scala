package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.graftshim.ExprShim
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Static host for the Morton-code kernel (plain object so generated
  * code calls a static-ish method, same rationale as [[ShingleOps]]). */
object ZOrderOps {
  /** Spread the 32 bits of `x` into the even bit positions of a long
    * (classic magic-number bit dilation, O(log w) shifts). */
  def spread(x: Int): Long = {
    var v = x.toLong & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 64-bit Morton code of two signed ints. Each coordinate is biased
    * by `^ Int.MinValue` (flips the sign bit) so the unsigned bit
    * order used by the interleave agrees with signed numeric order —
    * without it all negatives would sort ABOVE all positives and the
    * curve's locality promise breaks at zero. `a` takes the odd
    * (higher) bit positions, which puts a's biased sign bit at long
    * bit 63 — the LONG's sign bit — so the whole code is biased once
    * more (`^ Long.MinValue`) to make Spark's SIGNED long sort order
    * equal the curve's unsigned order. */
  def interleave(a: Int, b: Int): Long =
    ((spread(a ^ Int.MinValue) << 1) | spread(b ^ Int.MinValue)) ^ Long.MinValue
}

/** `zorder_key(a, b)` — space-filling-curve clustering key.
  *
  * Sorting a table by this key before writing groups rows that are
  * close in BOTH dimensions into the same output files, so each file's
  * per-column min/max footer stats cover a small rectangle of the
  * (a, b) plane instead of a full-width stripe. A 2-D box predicate
  * then skips the files whose rectangles miss the box — the multi-
  * dimensional generalization of sort-by-one-column data skipping
  * (same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER, built
  * here from a 30-line codegen expression + orderBy).
  *
  * The reference has no layout layer at all (it re-scans full in-
  * memory arrays per query — reference: app/(contents)/compare/
  * page.tsx:545-584); this is the at-scale replacement for "just
  * filter the array".
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderOps.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Column-API entry: `ZOrderKey(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    ExprShim.column(ZOrderKey(ExprShim.expression(a), ExprShim.expression(b)))
}
