package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `hll_distinct(hash60, p)` — HyperLogLog distinct-count estimation as
  * a TypedImperativeAggregate (Flajolet et al., "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm",
  * AofA'07). Completes the sketch family next to [[KmvDistinct]] /
  * [[BloomBuild]] / Count-Min: m = 2^p one-byte registers per group —
  * fixed state however large the group, mergeable by elementwise max,
  * so a 100 TB distinct-count is one map-side-combined shuffle of
  * m-byte buffers instead of a shuffle of every key.
  *
  * Input is the engine's standard 60-bit keyed-md5 hash column (15 hex
  * chars — same recipe as [[KmvDistinct]]): bucket = top p bits,
  * rho = leading zeros of the remaining 51 bits + 1 (all-zero suffix
  * → q+1). Two estimator modes:
  *
  *  - `corrected = false`: the RAW HLL estimator α·m²/Σ2^(−M[j]) in
  *    EXACT integer arithmetic — α_m = 0.7213/(1 + 1.079/m) is the
  *    rational 7213·m / (10·(1000·m + 1079)), the harmonic sum is
  *    scaled by 2^(q+1) so every term is integral, and the division is
  *    one BigInt floor. Bit-for-bit reproducible by a SQL oracle
  *    (DuckDB mirrors with bin()/strpos and HUGEINT division).
  *  - `corrected = true` (default): adds the standard small-range
  *    linear-counting branch (E ≤ 5m/2 with empty registers →
  *    m·ln(m/V)), which needs a transcendental ln — right for
  *    production use, spec-gated for accuracy rather than oracled.
  */
case class HllDistinct(child: Expression, p: Int, corrected: Boolean = true,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(p >= 4 && p <= 16, s"hll_distinct: p=$p must be in [4, 16]")

  private val m: Int = 1 << p
  /** suffix width: the hash is 60 bits, p consumed by the bucket. */
  private val q: Int = 60 - p
  private val suffixMask: Long = (1L << q) - 1

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> q).toInt & (m - 1)
      val suffix = h & suffixMask
      val rho =
        if (suffix == 0L) q + 1
        else java.lang.Long.numberOfLeadingZeros(suffix) - (64 - q) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // Σ 2^(-M[j]) scaled by 2^(q+1): every term 2^(q+1-M[j]) is a
    // non-negative integer power; Σ ≤ m·2^(q+1) ≤ 2^68 → BigInt.
    var num = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(i).toInt
      if (r == 0) zeros += 1
      num += BigInt(1) << (q + 1 - r)
      i += 1
    }
    val mB = BigInt(m)
    // E = α_m · m² · 2^(q+1) / num, α_m = 7213·m / (10·(1000·m + 1079))
    val raw = (BigInt(7213) * mB * mB * mB * (BigInt(1) << (q + 1))) /
      (BigInt(10) * (BigInt(1000) * mB + BigInt(1079)) * num)
    val rawL = raw.toLong
    if (corrected && zeros > 0 && rawL <= (5L * m) / 2)
      math.round(m * math.log(m.toDouble / zeros))
    else rawL
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}
