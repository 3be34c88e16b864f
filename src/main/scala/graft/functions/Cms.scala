package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{QuaternaryLike, TernaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min-Sketch kernel (d=3 rows × w counters) shared by the
  * build aggregate, the estimate expression, and tests. Serialized
  * layout: `[d:int][w:int][counters: d·w longs]`, big-endian.
  *
  * Unlike the classic formulation, the d hash functions live OUTSIDE
  * the sketch: the caller supplies one pre-computed bucket column per
  * row (keyed md5 → long → mod w, all codegen'd built-ins). That keeps
  * the kernel a pure counting matrix — deterministic across
  * partitionings (integer adds commute) and reproducible bit-for-bit
  * by a SQL oracle computing the same md5 buckets, the same
  * portability contract as [[KmvDistinct]]. */
object CmsOps {
  val D = 3

  def empty(w: Int): Array[Long] = new Array[Long](D * w)

  def serialize(counters: Array[Long], w: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(D); bb.putInt(w)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(ser: Array[Byte]): (Array[Long], Int) = {
    val bb = java.nio.ByteBuffer.wrap(ser)
    val d = bb.getInt; val w = bb.getInt
    require(d == D, s"cms: serialized depth $d != $D")
    val counters = new Array[Long](d * w)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong; i += 1 }
    (counters, w)
  }

  /** Point estimate from a SERIALIZED sketch: min over the d rows.
    * Count-Min never under-estimates; collisions only inflate. */
  def estimate(ser: Array[Byte], b0: Long, b1: Long, b2: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(ser)
    val d = bb.getInt; val w = bb.getInt
    require(d == D, s"cms: serialized depth $d != $D")
    val n0 = bb.getLong(8 + (b0.toInt << 3))
    val n1 = bb.getLong(8 + ((w + b1.toInt) << 3))
    val n2 = bb.getLong(8 + ((2 * w + b2.toInt) << 3))
    math.min(n0, math.min(n1, n2))
  }
}

/** `cms_build(b0, b1, b2)` → binary: aggregate three per-row bucket
  * columns (each in [0, w)) into a serialized d=3 Count-Min sketch.
  *
  * The 100-TB use: frequency estimation over a token/key stream in
  * ONE pass with O(d·w) state per partial — the approximate path for
  * heavy-hitter queries whose exact form ([[graft.packs]]
  * `text_top_terms`) shuffles every distinct term. Partial merge is
  * element-wise sum, so the aggregate distributes like any count.
  * Rows with any null bucket are skipped (a null key has no
  * frequency). */
case class CmsBuild(first: Expression, second: Expression, third: Expression,
    w: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with TernaryLike[Expression]
  with ExpectsInputTypes {

  // Analysis-time gate (see BloomBuild rationale): buckets arrive as
  // longs from the md5/conv/pmod pipeline; anything else is a bug at
  // the call site, not a cast opportunity.
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)

  require(w >= 2 && w <= (1 << 24), s"cms_build: w=$w out of [2, 2^24]")

  override def createAggregationBuffer(): Array[Long] = CmsOps.empty(w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v0 = first.eval(input); val v1 = second.eval(input); val v2 = third.eval(input)
    if (v0 != null && v1 != null && v2 != null) {
      val b0 = v0.asInstanceOf[Long]; val b1 = v1.asInstanceOf[Long]; val b2 = v2.asInstanceOf[Long]
      require(b0 >= 0 && b0 < w && b1 >= 0 && b1 < w && b2 >= 0 && b2 < w,
        s"cms_build: bucket out of [0, $w)")
      buf(b0.toInt) += 1L
      buf(w + b1.toInt) += 1L
      buf(2 * w + b2.toInt) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsOps.serialize(buf, w)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsOps.serialize(buf, w)

  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsOps.deserialize(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CmsBuild =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `cms_estimate(sketch, b0, b1, b2)` → long: point-frequency
  * estimate (min over the d rows). Codegen'd — one static call per
  * probed key; null sketch or any null bucket → null, mirroring
  * built-in n-ary expressions. */
case class CmsEstimate(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression with QuaternaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType, LongType, LongType)

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(ser: Any, b0: Any, b1: Any, b2: Any): Any =
    CmsOps.estimate(ser.asInstanceOf[Array[Byte]],
      b0.asInstanceOf[Long], b1.asInstanceOf[Long], b2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, b0, b1, b2) =>
      s"graft.functions.CmsOps.estimate($s, $b0, $b1, $b2)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** `cms_merge(sketch)` → binary: union SERIALIZED sketches by
  * element-wise counter add — the mergeability that makes Count-Min a
  * streaming/state citizen, not just a one-shot aggregate. A batch
  * sketch merges into a persisted state sketch (or partial sketches
  * from N table shards merge into one) without revisiting any raw
  * row; the result is bit-identical to cms_build over the
  * concatenated inputs because integer adds commute and the d×w
  * geometry is fixed by the serialized header. Width mismatches fail
  * loud (merging different-w sketches would silently mis-count).
  * Null inputs are skipped; an all-null group yields the empty w=`w`
  * sketch so downstream estimates read 0, not NPE. */
case class CmsMerge(child: Expression, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression]
  with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  require(w >= 2 && w <= (1 << 24), s"cms_merge: w=$w out of [2, 2^24]")

  override def createAggregationBuffer(): Array[Long] = CmsOps.empty(w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (other, ow) = CmsOps.deserialize(v.asInstanceOf[Array[Byte]])
      require(ow == w, s"cms_merge: sketch width $ow != declared $w")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsOps.serialize(buf, w)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsOps.serialize(buf, w)

  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsOps.deserialize(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
}

/** User-facing CMS API: one-pass distributed build, in-plan estimate. */
object Cms {
  import org.apache.spark.sql.Column

  /** The d=3 keyed-md5 bucket columns for `key` (a string column),
    * each in [0, w). Codegen'd built-ins only; a SQL oracle computes
    * the identical buckets as
    * `CAST(CONCAT('0x', substr(md5(key || ':cms<i>'), 1, 15)) AS BIGINT) % w`. */
  def buckets(key: Column, w: Int): Seq[Column] = {
    import org.apache.spark.sql.functions._
    (0 until CmsOps.D).map { i =>
      pmod(conv(substring(md5(concat(key, lit(s":cms$i"))), 1, 15), 16, 10)
        .cast("long"), lit(w.toLong))
    }
  }

  /** Aggregate three bucket columns into a serialized sketch column. */
  def build(b0: Column, b1: Column, b2: Column, w: Int): Column =
    F.toColumn(CmsBuild(F.toExpr(b0), F.toExpr(b1), F.toExpr(b2), w)
      .toAggregateExpression())

  /** Point estimate of `key`'s frequency from a sketch column. */
  def estimate(sketch: Column, b0: Column, b1: Column, b2: Column): Column =
    F.toColumn(CmsEstimate(F.toExpr(sketch), F.toExpr(b0), F.toExpr(b1), F.toExpr(b2)))

  /** Union serialized sketch columns by counter add (state merge). */
  def merge(sketch: Column, w: Int): Column =
    F.toColumn(CmsMerge(F.toExpr(sketch), w).toAggregateExpression())
}
