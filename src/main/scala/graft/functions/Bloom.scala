package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Static Bloom-filter kernel shared by the aggregate (build), the
  * membership expression (probe, called from generated code), and
  * tests. Layout of a serialized filter:
  * `[numBits:int][numHashes:int][bit words:long…]`, big-endian via
  * ByteBuffer.
  *
  * Hashing is double hashing over two 64-bit mixes of the key
  * (Kirsch–Mitzenmacher: position_i = h1 + i·h2 mod m), with the
  * finalizer from SplitMix64 — deterministic across JVMs/partitions,
  * no library dependency. */
object BloomOps {
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def emptyWords(numBits: Int): Array[Long] = new Array[Long]((numBits + 63) >>> 6)

  def add(words: Array[Long], numBits: Int, numHashes: Int, key: Long): Unit = {
    val h1 = mix64(key ^ 0x9e3779b97f4a7c15L)
    val h2 = mix64(key + 0x6a09e667f3bcc909L) | 1L // odd → full cycle
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe a SERIALIZED filter (as emitted by [[BloomBuild]]). */
  def mightContain(ser: Array[Byte], key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(ser)
    val numBits = bb.getInt
    val numHashes = bb.getInt
    val h1 = mix64(key ^ 0x9e3779b97f4a7c15L)
    val h2 = mix64(key + 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      if ((bb.getLong(8 + ((pos >>> 6) << 3)) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(numBits); bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserializeWords(ser: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(ser)
    val numBits = bb.getInt; val numHashes = bb.getInt
    val words = new Array[Long]((ser.length - 8) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (words, numBits, numHashes)
  }
}

/** `bloom_build(longCol, numBits, numHashes)` → binary: aggregate a
  * column of longs into a serialized Bloom filter (SURVEY §2.13
  * sketch surface, next to [[KmvDistinct]]).
  *
  * The 100-TB use: build the filter over the SMALL side's join keys
  * (a distributed aggregate — partial merge is bitwise OR), land the
  * few-KB binary on the driver, and pre-filter the BIG side with
  * [[BloomMightContain]] over the LITERAL filter BEFORE its shuffle —
  * rows that can't join never leave their scan partition. The literal
  * embedding (see [[Bloom.buildFilter]]/[[Bloom.mightContain]]) is
  * deliberate: a crossJoin-with-one-row formulation leaves Catalyst
  * free to reorder the probe ABOVE the exact join (observed — the
  * prefilter became decorative); a scan-side Filter cannot float.
  * This mirrors Spark's own InjectRuntimeFilter design. False
  * positives only let extra rows through to the exact join; results
  * are unchanged, which is why the oracle for the composed query is
  * the plain semi-join. */
case class BloomBuild(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  // Analysis-time type gate: the hash kernel consumes a 64-bit key, so
  // a non-Long column (e.g. Int) must fail resolution, not throw
  // ClassCastException from `asInstanceOf[Long]` mid-job. Deliberately
  // NOT ImplicitCastInputTypes: a silent Int→Long widen would let two
  // call sites hash "the same" key from differently-typed columns and
  // still be a trap — the caller should cast explicitly.
  override def inputTypes: Seq[DataType] = Seq(LongType)

  require(numBits >= 64, s"bloom_build: numBits=$numBits must be >= 64")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_build: numHashes=$numHashes out of [1,16]")

  override def createAggregationBuffer(): Array[Long] = BloomOps.emptyWords(numBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.add(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomOps.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomOps.serialize(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomOps.deserializeWords(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** `bloom_might_contain(filter, longCol)` → boolean. Codegen'd (one
  * static call per row — the probe sits on the 100-TB side of the
  * join, so it must stay inside whole-stage codegen). Null filter or
  * null key → null, mirroring built-in binary expressions. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] with ExpectsInputTypes {

  // Same analysis-time gate as BloomBuild (see rationale there).
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    BloomOps.mightContain(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, k) => s"graft.functions.BloomOps.mightContain($f, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** User-facing bloom join-pruning API: distributed build → driver
  * literal → scan-side probe. */
object Bloom {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Aggregate `keys(keyCol)` into a serialized filter. Executors do
    * the hashing and partial ORs; only the final `numBits/8`-byte
    * blob crosses to the driver — the same bounded index-build
    * boundary as the ANN centroid collect. */
  def buildFilter(keys: DataFrame, keyCol: String,
      numBits: Int, numHashes: Int): Array[Byte] =
    keys.agg(F.toColumn(
        BloomBuild(F.toExpr(org.apache.spark.sql.functions.col(keyCol)),
          numBits, numHashes).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Probe column over a driver-built filter, embedded as a literal so
    * the optimizer treats it as a plain deterministic scan filter. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    F.toColumn(BloomMightContain(Literal.create(filter, BinaryType),
      F.toExpr(key)))
}
