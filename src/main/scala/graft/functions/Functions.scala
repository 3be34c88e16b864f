package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ExprShim
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar-function registry (SURVEY.md §2.8).
  *
  * Two design departures from the reference, both deliberate and
  * scale-motivated:
  *
  *  1. The reference's "random" masking values (`Math.random()`,
  *     reference: app/(contents)/random/page.tsx:56-133) are replaced by
  *     **keyed deterministic pseudo-randomness**: every masked value is a
  *     pure function of (row key, seed, tag) via md5. At 100 TB this is
  *     the only sane choice — masking becomes idempotent (re-running a
  *     failed partition produces identical output, so speculative
  *     execution and task retries are safe), needs no driver-coordinated
  *     RNG state, and is testable/oracle-checkable. Set a fresh seed per
  *     run to get fresh masks.
  *  2. All functions are Column expressions built from codegen'd
  *     built-ins (`md5`, `conv`, `translate`, …) — no Scala UDFs in the
  *     hot path, so whole-stage codegen stays intact.
  */
object F {

  /** Column from a raw Catalyst expression (Spark 4.x classic API).
    * `ExpressionUtils` is `private[sql]`, so access goes through the
    * graftshim bridge that lives inside the sql package tree. */
  def toColumn(e: Expression): Column = ExprShim.column(e)
  def toExpr(c: Column): Expression = ExprShim.expression(c)

  // ---------------------------------------------------------------------
  // Keyed pseudo-random core: hash32(key, seed, tag) ∈ [0, 2^32)
  // ---------------------------------------------------------------------

  /** 32-bit uniform value derived from md5(key ":" seed ":" tag).
    * Portable: DuckDB equivalent is
    * `CAST(CONCAT('0x', substr(md5(k || ':' || seed || ':' || tag), 1, 8)) AS BIGINT)`.
    */
  def hash32(key: Column, seed: String, tag: String): Column =
    conv(substring(md5(concat_ws(":", key.cast("string"), lit(seed), lit(tag))), 1, 8), 16, 10)
      .cast("long")

  /** Uniform integer in [min, max] inclusive (reference `randInt`,
    * random/page.tsx:56-57, keyed-deterministic variant). */
  def maskInt(key: Column, seed: String, tag: String, min: Long, max: Long): Column =
    hash32(key, seed, tag) % (max - min + 1) + min

  /** Hex stream of arbitrary length n (≤ 96): md5 blocks concatenated.
    * Public so the mask-rule compiler can take dynamic-length substrings
    * (reference randomString fills to the source value's length). */
  def hexStream(key: Column, seed: String, tag: String, n: Int): Column = {
    val blocks = (0 to (n - 1) / 32).map(i =>
      md5(concat_ws(":", key.cast("string"), lit(seed), lit(tag), lit(i.toString))))
    substring(concat(blocks: _*), 1, n)
  }

  /** n pseudo-random decimal digits (reference `randDigits`/fillKind=digits,
    * random/page.tsx:59-87). Hex → digit via translate (a-f → 0-5).
    *
    * Accepted divergence: digits 0-5 are twice as likely as 6-9 (the
    * reference is uniform). Kept because `translate` is exactly
    * DuckDB-portable, so the oracle reproduces it bit-for-bit; the bias
    * is documented here and in the oracle SQL. */
  def maskDigits(key: Column, seed: String, tag: String, n: Int): Column =
    translate(hexStream(key, seed, tag, n), "abcdef", "012345")

  /** n pseudo-random lowercase letters (fillKind=letters). Hex digit →
    * one of 16 letters. */
  def maskLetters(key: Column, seed: String, tag: String, n: Int): Column =
    translate(hexStream(key, seed, tag, n), "0123456789abcdef", "abcdefghijklmnop")

  /** n pseudo-random alphanumerics (fillKind=alnum): raw hex stream. */
  def maskAlnum(key: Column, seed: String, tag: String, n: Int): Column =
    hexStream(key, seed, tag, n)

  /** Deterministic UUID-shaped id from (key, seed) — the engine's
    * `ANON_ROW_ID` (reference uses crypto uuidv4, random/page.tsx:128-133;
    * keyed determinism keeps task retries idempotent at scale). */
  def maskUuid(key: Column, seed: String): Column = {
    val h = md5(concat_ws(":", key.cast("string"), lit(seed), lit("uuid")))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  // ---------------------------------------------------------------------
  // Fake-data generators (reference random/page.tsx:89-110)
  // ---------------------------------------------------------------------

  val surnames: Seq[String] = Seq("Kim", "Lee", "Park", "Choi", "Jung", "Kang", "Cho", "Yoon")
  val givenNames: Seq[String] = Seq("Minsoo", "Seojin", "Jiwon", "Haneul", "Dohyun", "Yuna", "Jimin", "Sua")
  val emailDomains: Seq[String] = Seq("example.com", "mail.test", "sample.org", "demo.net")

  /** surname + space + given name, each picked by keyed hash
    * (reference `fakeName`, random/page.tsx:89-93). */
  def fakeName(key: Column, seed: String): Column = {
    val s = element_at(array(surnames.map(lit): _*), (hash32(key, seed, "fn_s") % 8 + 1).cast("int"))
    val g = element_at(array(givenNames.map(lit): _*), (hash32(key, seed, "fn_g") % 8 + 1).cast("int"))
    concat(s, lit(" "), g)
  }

  /** fixed prefix + random letters, lowercased, @ random domain
    * (reference `fakeEmail`, random/page.tsx:95-102). */
  def fakeEmail(key: Column, seed: String, fixedPart: String, fillLen: Int): Column = {
    // Fixed prefix stays verbatim (reference lowercases only the random
    // fill — fillByKind(..., lower=true)); maskLetters is already a-p.
    val local = concat(lit(fixedPart), maskLetters(key, seed, "em", fillLen))
    val dom = element_at(array(emailDomains.map(lit): _*), (hash32(key, seed, "em_d") % 4 + 1).cast("int"))
    concat(local, lit("@"), dom)
  }

  /** `010-XXXX-XXXX`; digits of fixedPart prefix the 8-digit tail
    * (reference `fakePhone`, random/page.tsx:104-110). */
  def fakePhone(key: Column, seed: String, fixedPart: String): Column = {
    val fixedDigits = fixedPart.filter(_.isDigit).take(8)
    val tail = concat(lit(fixedDigits), maskDigits(key, seed, "ph", 8 - fixedDigits.length))
    concat(lit("010-"), substring(tail, 1, 4), lit("-"), substring(tail, 5, 4))
  }

  /** Uniform date in [start, end] inclusive, formatted yyyy-MM-dd
    * (reference `randDate`, random/page.tsx:112-119). */
  def maskDate(key: Column, seed: String, tag: String, start: String, end: String): Column = {
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)) + 1
    require(span >= 1, s"maskDate: end '$end' before start '$start'")
    date_format(date_add(lit(start).cast("date"),
      (hash32(key, seed, tag) % span).cast("int")), "yyyy-MM-dd")
  }

  /** Portable 4-decimal fixed-point image of a double: floor(x·1e4+0.5)
    * as a long. Unlike round(x, 4), identical input doubles give
    * identical results in every engine — no HALF_UP vs HALF_EVEN
    * boundary behavior. Use for any float that crosses the oracle
    * boundary. */
  def scale4(c: Column): Column =
    floor(c * lit(10000d) + lit(0.5d)).cast("long")

  /** SHA-256 lowercase hex (reference `sha256Hex`, random/page.tsx:121-126). */
  def sha256Hex(c: Column): Column = sha2(c.cast("string"), 256)

  /** `CV` + yyyyMMdd(KST) + `_` + 6-char A-Z0-9 token
    * (reference `uniqueId`, lib/firebase/saveUser.ts:10-31).
    * Each token char is drawn from the full 36-char space (36^6 ≈ 2.2e9
    * ids/day — matching the reference's randomToken6 entropy; a hex-only
    * token would collide at ~4.8k ids/day). */
  val tokenAlphabet: String = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
  def uniqueId(key: Column, seed: String, atUtc: Column): Column = {
    // One digest per row: char i draws 16 bits from hex slice [4i, 4i+4)
    // of a single md5 (the earlier design burned 6 digests/row). The
    // 65536 % 36 ≠ 0 bias (~0.05%) matches the old % 36 construction's
    // own bias and is irrelevant at 36^6 id space.
    val h = md5(concat_ws(":", key.cast("string"), lit(seed), lit("uid")))
    val chars = (0 until 6).map { i =>
      val idx = (conv(substring(h, i * 4 + 1, 4), 16, 10).cast("long") % 36 + 1).cast("int")
      element_at(array(tokenAlphabet.map(c => lit(c.toString)): _*), idx)
    }
    concat(lit("CV") +:
      date_format(from_utc_timestamp(atUtc, "Asia/Seoul"), "yyyyMMdd") +:
      lit("_") +: chars: _*)
  }

  // ---------------------------------------------------------------------
  // Regex (reference pattern-editor/page.tsx:59-91,242-278)
  // ---------------------------------------------------------------------

  /** Replace only the FIRST regex match (reference `onReplaceOne`,
    * pattern-editor/page.tsx:242-259). No Spark built-in → custom
    * Catalyst expression below. */
  def regexpReplaceFirst(src: Column, pattern: Column, repl: Column): Column =
    toColumn(RegexpReplaceFirst(toExpr(src), toExpr(pattern), toExpr(repl)))

  /** Escape a literal string so it can be used as a regex
    * (reference `escapeRegExp`, pattern-editor/page.tsx:59-61).
    * Char-by-char escaping rather than Pattern.quote's \Q…\E so the
    * result is also valid in RE2-based engines (the DuckDB oracle). */
  def escapeRegex(s: String): String =
    s.replaceAll("""[.*+?^$(){}|\[\]\\]""", "\\\\$0")

  /** Fold i/m flags into inline groups (reference `buildRegExp`,
    * pattern-editor/page.tsx:64-74). */
  def withFlags(pattern: String, ignoreCase: Boolean, multiline: Boolean): String = {
    val flags = (if (ignoreCase) "i" else "") + (if (multiline) "m" else "")
    if (flags.isEmpty) pattern else s"(?$flags)$pattern"
  }
}

/** `array_dot(a, b)` — sum of element-wise products of two numeric
  * arrays (float or double elements), accumulated left-to-right in
  * double precision: the exact IEEE fold `aggregate(zip_with(a, b,
  * (x, y) -> double(x)*double(y)), 0d, +)` computes, so the DuckDB
  * oracle's `list_sum(list_transform(list_zip(...)))` reproduces it
  * bit-for-bit.
  *
  * Exists because Spark's higher-order functions are CodegenFallback —
  * every lambda step is interpreted with boxing. At Σ bucket² candidate
  * pairs (embedding dedup) or |q|·|corpus| scoring (ANN) the dot
  * product IS the workload; this expression compiles to a primitive
  * loop over ArrayData (~10× the HOF throughput). Assumes non-null
  * elements (embedding vectors). */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $sum += $getA * $getB; }
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `array_dot_int8(a, b)` → long: integer dot product of two
  * `array<tinyint>` int8-quantized vectors. Same reason to exist as
  * [[ArrayDot]] (primitive codegen loop, no HOF boxing), but the
  * accumulation is EXACT — 64 dims × 127² fits a long with ~2^40 to
  * spare — so quantized similarity scores are bit-reproducible by any
  * integer-arithmetic oracle, with no IEEE summation-order caveat.
  * Assumes non-null elements (quantized vectors). */
case class ArrayDotInt8(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  // Analysis-time gate (BloomBuild rationale): a float/double array
  // here means the caller skipped quantization — fail resolution.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_int8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The IVF assignment loop shared by [[ArgmaxBucket]]'s interpreted
  * eval and its generated code (same single-method delegation shape as
  * FingerprintOps). IEEE op order is EXACTLY the packed-long formation
  * it replaces — dot and self-dots accumulate left-to-right in double,
  * the scaled cosine is `floor(dot / sqrt(ce2·norm) · 1e4 + 0.5)` cast
  * to long (NaN casts to 0, matching non-ANSI Cast) — and centroids
  * iterate in ascending-cid order with a strict `>`, so the highest
  * cosine wins with ties to the smallest cid, bit-identical to
  * `min((20000 − cos4)·65536 + cid)`. */
object ArgmaxOps {
  def compute(a: ArrayData, isFloat: Boolean, m: Array[Array[Double]],
      norms: Array[Double], cids: Array[Int]): Int = {
    val n = a.numElements()
    var ce2 = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      ce2 += v * v
      i += 1
    }
    var best = Long.MinValue
    var bucket = cids(0)
    var c = 0
    while (c < m.length) {
      val cemb = m(c)
      val lim = math.min(n, cemb.length)
      var dot = 0.0
      var j = 0
      while (j < lim) {
        val v = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        dot += v * cemb(j)
        j += 1
      }
      val cos4 = math.floor(dot / math.sqrt(ce2 * norms(c)) * 10000d + 0.5d).toLong
      if (cos4 > best) { best = cos4; bucket = cids(c) }
      c += 1
    }
    bucket
  }
}

/** The random-hyperplane signature loop shared by [[SignBits]]'s
  * interpreted eval and its generated code. Plane j's dot accumulates
  * left-to-right in double (the ArrayDot order); bit j sets on a
  * STRICT `> 0` — a boundary-exact zero dot leaves the bit clear on
  * both engines. */
object SignBitsOps {
  def compute(a: ArrayData, isFloat: Boolean, planes: Array[Array[Long]]): Long = {
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val lim = math.min(n, p.length)
      var dot = 0.0
      var i = 0
      while (i < lim) {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += v * p(i)
        i += 1
      }
      if (dot > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `sign_bits(vec)` → long: the 64-bit random-hyperplane signature
  * (Charikar 2002 §3) against a plan-literal INTEGER plane matrix —
  * cosine-similar vectors agree on most sign bits, so the signature
  * slots into the same banded-Hamming machinery as text SimHash and
  * image pHash. Integer plane components keep the only floats in the
  * per-element widening multiply, the established cross-engine-exact
  * op. Same narrow-projection rationale as [[ArgmaxBucket]]. */
case class SignBits(child: Expression, planes: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "sign_bits: 1..64 planes")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sign_bits"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any =
    SignBitsOps.compute(a.asInstanceOf[ArrayData], isFloat, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("signPlanes", planes, "long[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SignBitsOps.compute($a, $isFloat, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The PQ assignment loop shared by [[ArgminL2Bucket]]'s interpreted
  * eval and its generated code (the ArgmaxOps delegation shape).
  * IEEE op order is frozen for the oracle: each term is
  * (v − c_j)·(v − c_j) in double, accumulated left-to-right; the
  * comparable is `floor(sum · 1e6 + 0.5)` cast to long; centroids
  * iterate in ascending-cid order with a strict `<`, so the smallest
  * distance wins with ties to the smallest cid — the exact mirror of
  * `ROW_NUMBER() OVER (ORDER BY d2s, cid) = 1`. */
object ArgminL2Ops {
  def compute(a: ArrayData, isFloat: Boolean, m: Array[Array[Double]],
      cids: Array[Int]): Int = {
    val n = a.numElements()
    var best = Long.MaxValue
    var bucket = cids(0)
    var c = 0
    while (c < m.length) {
      val cemb = m(c)
      val lim = math.min(n, cemb.length)
      var s = 0.0
      var j = 0
      while (j < lim) {
        val v = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        val d = v - cemb(j)
        s += d * d
        j += 1
      }
      val d2s = math.floor(s * 1000000d + 0.5d).toLong
      if (d2s < best) { best = d2s; bucket = cids(c) }
      c += 1
    }
    bucket
  }
}

/** `argmin_l2_bucket(vec)` → int: nearest-centroid assignment under
  * SQUARED L2 against a plan-literal centroid matrix — the product-
  * quantization codebook assignment (PQ reconstructs dot products, so
  * subvector GEOMETRY matters and the metric is L2, where IVF's
  * bucket routing is cosine). Same narrow-projection rationale as
  * [[ArgmaxBucket]]: no Exchange at any corpus size; numeric
  * semantics frozen in [[ArgminL2Ops]]. */
case class ArgminL2Bucket(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty && cents.length == cids.length,
    "argmin_l2_bucket: empty or misaligned centroid set")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "argmin_l2_bucket"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any =
    ArgminL2Ops.compute(a.asInstanceOf[ArrayData], isFloat, cents, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pqCentMatrix", cents, "double[][]")
    val ci = ctx.addReferenceObj("pqCentIds", cids, "int[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ArgminL2Ops.compute($a, $isFloat, $m, $ci)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `argmax_bucket(vec)` → int: IVF bucket assignment as ONE narrow
  * codegen'd expression against a plan-literal centroid matrix — the
  * nearest-centroid argmax that every IVF pass runs over the WHOLE
  * corpus (once per Lloyd step, once per search).
  *
  * The expression form exists for plan shape, not per-row math: the
  * previous formulation (crossJoin against broadcast centroids →
  * packed-long min HashAggregate → join the bucket back by vec_id)
  * produced bit-identical buckets but shuffled the corpus TWICE per
  * assignment pass and materialized |corpus|·|centroids| intermediate
  * rows. With the centroid set collected to the driver — small by
  * construction, it IS the index — assignment is a pure per-row
  * projection: no Exchange anywhere, which at 100 TB turns each Lloyd
  * step into scan → argmax → one partial+final aggregate, and the
  * search's corpus side into scan → argmax → bucket-keyed join.
  * Numeric semantics are frozen in [[ArgmaxOps]]; `cids`/`cents` are
  * parallel arrays sorted ascending by cid (sparse ids survive Lloyd
  * steps that empty a bucket). */
case class ArgmaxBucket(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty && cents.length == cids.length,
    "argmax_bucket: empty or misaligned centroid set")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "argmax_bucket"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override protected def nullSafeEval(a: Any): Any =
    ArgmaxOps.compute(a.asInstanceOf[ArrayData], isFloat, cents, norms, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centMatrix", cents, "double[][]")
    val nr = ctx.addReferenceObj("centNorms", norms, "double[]")
    val ci = ctx.addReferenceObj("centIds", cids, "int[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ArgmaxOps.compute($a, $isFloat, $m, $nr, $ci)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `regexp_replace_first(src, pattern, repl)` — Java `Matcher.replaceFirst`
  * semantics (`$1` backrefs work, mirroring JS `String.replace` with a
  * non-global regex — reference pattern-editor/page.tsx:242-259).
  *
  * Interpreted eval with a compiled-pattern cache for the common
  * constant-pattern case; CodegenFallback keeps it usable inside
  * whole-stage codegen pipelines.
  */
case class RegexpReplaceFirst(src: Expression, regexp: Expression, rep: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def first: Expression = src
  override def second: Expression = regexp
  override def third: Expression = rep
  override def nullable: Boolean = src.nullable || regexp.nullable || rep.nullable

  @transient private var cachedPatternStr: String = _
  @transient private var cachedPattern: java.util.regex.Pattern = _

  override protected def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val ps = p.asInstanceOf[UTF8String].toString
    if (cachedPattern == null || cachedPatternStr != ps) {
      cachedPatternStr = ps
      cachedPattern = java.util.regex.Pattern.compile(ps)
    }
    UTF8String.fromString(
      cachedPattern.matcher(s.asInstanceOf[UTF8String].toString)
        .replaceFirst(r.asInstanceOf[UTF8String].toString))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(src = newFirst, regexp = newSecond, rep = newThird)

  override def prettyName: String = "regexp_replace_first"
}

/** Static host for the shingle kernel — a plain object (no companion
  * class) so Scala emits a static forwarder that Janino-generated code
  * can call directly. */
object ShingleOps {
  private val SPACE = UTF8String.fromString(" ")

  /** Word n-gram shingles of `text`, split on single spaces with
    * trailing empties kept (`split(text, ' ')` limit -1 semantics) and
    * joined by single spaces; shorter-than-n texts collapse to one
    * shingle of all words — byte-identical to the former
    * `transform(sequence(...), concat_ws(...))` HOF chain and its
    * DuckDB mirror. */
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val w = text.split(SPACE, -1)
    if (w.length >= n) {
      val m = w.length - n + 1
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val grams = new Array[UTF8String](n)
        var j = 0
        while (j < n) { grams(j) = w(i + j); j += 1 }
        out(i) = UTF8String.concatWs(SPACE, grams: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.concatWs(SPACE, w: _*)))
    }
  }
}

/** `word_shingles(text, n)` — the MinHash shingle kernel as a codegen'd
  * expression. Exists for the same reason as [[ArrayDot]]: the
  * equivalent `transform(sequence(...), i -> concat_ws(...))` chain is
  * CodegenFallback — every shingle pays an interpreted lambda with n
  * array extracts — and shingling is the first stage of every dedup
  * scan over the corpus. Codegen emits one static call per row into
  * the JIT-compiled kernel. */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(t: Any): Any =
    ShingleOps.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static host for the fingerprint kernel (see [[ShingleOps]] for why
  * a plain object). */
object FingerprintOps {
  /** Min base-257 polynomial hash (mod 2^31−1) over codepoint 5-grams,
    * right-padding with spaces below one window — exactly the
    * split('')/ascii/transform Column construction it replaces:
    * Pattern-based split('') breaks at codepoint boundaries and
    * `ascii` yields the full codepoint, so the kernel iterates
    * codepoints, matching DuckDB's string_split('') mirror. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var cps = s.codePoints().toArray
    if (cps.length < 5) {
      val padded = java.util.Arrays.copyOf(cps, 5)
      java.util.Arrays.fill(padded, cps.length, 5, ' '.toInt)
      cps = padded
    }
    var min = Long.MaxValue
    var i = 0
    val last = cps.length - 5
    while (i <= last) {
      var acc = 0L
      var j = 0
      while (j < 5) { acc = acc * 257L + cps(i + j); j += 1 }
      val h = acc % 2147483647L
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** `min_fingerprint(text)` — the document-fingerprint kernel as a
  * codegen'd expression. The Column construction it replaces ran two
  * nested CodegenFallback transforms — an interpreted lambda per
  * CHARACTER and per window position — on every document; this is one
  * static call per row into a compiled loop. */
/** Static kernel for [[NfcNormalize]] — a plain JDK call, factored so
  * codegen and interpreted eval share one body. */
object NfcOps {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-normalized ASCII/NFC text skips the rebuild
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(s)` — Unicode NFC canonical normalization, the
  * dedup-key normalizer: composed (U+00E9) and decomposed (e +
  * U+0301) spellings of identical text must hash identically before
  * any exact/near dedup, or visually-equal documents survive as
  * "distinct". The JDK and DuckDB (`nfc_normalize`) both implement
  * the Unicode canonical-composition algorithm, so oracles run the
  * same normalization verbatim. Codegen'd via the shared static
  * kernel — stays inside whole-stage codegen like the other text
  * kernels. */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcOps.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinFingerprint(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "min_fingerprint"

  override protected def nullSafeEval(t: Any): Any =
    FingerprintOps.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `kmv_distinct(hash60, k)` — distinct-count estimation as a real
  * Catalyst TypedImperativeAggregate (SURVEY §2.13's stated north-star
  * sketch surface): keep the `k` smallest DISTINCT 60-bit hashes per
  * group; estimate = (k−1)·2⁶⁰ / h₍ₖ₎ (the classic KMV estimator),
  * exact count below k. Partial aggregation works the natural sketch
  * way — per-partition buffers hold ≤ k longs, merge is a capped set
  * union — so a 100 TB group costs O(k) state per task instead of a
  * count-distinct shuffle of every key.
  *
  * ORACLE-REPRODUCIBLE, unlike HLL++: the input is a keyed-md5 hash
  * column (take 15 hex chars → 60 bits) and the estimate is exact
  * integer arithmetic (BigInt intermediate ÷ floor), so DuckDB mirrors
  * it bit-for-bit with a row_number window + HUGEINT division —
  * determinism over task retries/partitionings comes free with the
  * order-independent buffer. */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  // Analysis-time type gate: the sketch buffers 60-bit hashes as
  // longs; a non-Long column must fail resolution, not throw
  // ClassCastException from `asInstanceOf[Long]` mid-job (same
  // no-implicit-cast rationale as BloomBuild).
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.LongType)

  require(k >= 2, s"kmv_distinct: k=$k must be >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      buf.add(h)
      if (buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(h => insert(buf, h))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (BigInt(k - 1) * BigInt(1L << 60) / BigInt(buf.last)).toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** `kmv_sketch(hash, k)` — the MERGEABLE form of [[KmvDistinct]]: the
  * same k-smallest-distinct-hashes buffer, but eval emits the kept
  * hashes as a sorted array instead of collapsing to the estimate.
  * Two sketches support the full KMV set algebra downstream with
  * plain array functions — union = k smallest of the concatenation,
  * intersection estimate = (matching fraction of the union sketch) ×
  * union estimate — so segment-overlap questions cost O(k) state per
  * segment instead of a distinct-join of the raw key sets. Same
  * oracle-reproducibility story as KmvDistinct: the buffer is a
  * deterministic function of the input SET, any partitioning. */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.LongType)

  require(k >= 2, s"kmv_sketch: k=$k must be >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      buf.add(h)
      if (buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(h => insert(buf, h))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    buf.forEach(h => { arr(i) = h.longValue(); i += 1 }) // TreeSet iterates ascending
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** `kmv_quantiles(hash60, value, k, qs…)` — quantile sketch as a
  * TypedImperativeAggregate over a DETERMINISTIC hash-min-k row
  * sample: keep the k lexicographically smallest DISTINCT
  * (hash, value) pairs per group — the hash is a keyed md5 of the row
  * key, so the kept set is a uniform sample that no partitioning,
  * task retry, or merge order can change — then answer each requested
  * quantile by nearest rank over the sample's values sorted
  * ascending: `values[floor(q·(m−1))]`, m = |sample| (exact over all
  * rows while a group is smaller than k). O(k) state per group at any
  * scale, merge is a capped set union — the quantile sibling of
  * [[KmvDistinct]], same oracle-reproducibility story: integer values
  * in, integer values out, the only double op is the q·(m−1) index
  * product, identical IEEE in DuckDB's mirror. */
case class KmvQuantiles(left: Expression, right: Expression, k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[Array[Long]]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  require(k >= 2, s"kmv_quantiles: k=$k must be >= 2")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"kmv_quantiles: quantiles $qs must lie in [0, 1]")

  private def cmp: java.util.Comparator[Array[Long]] =
    new java.util.Comparator[Array[Long]] with Serializable {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](cmp)

  private def insert(buf: java.util.TreeSet[Array[Long]], p: Array[Long]): Unit =
    if (buf.size < k) { buf.add(p); () }
    else if (buf.comparator.compare(p, buf.last) < 0) {
      buf.add(p)
      if (buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[Array[Long]],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[Array[Long]] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      insert(buf, Array(h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[Array[Long]],
      other: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    other.forEach(p => insert(buf, p))
    buf
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val m = buf.size
    if (m == 0) null
    else {
      val vals = new Array[Long](m)
      var i = 0
      buf.forEach(p => { vals(i) = p(1); i += 1 })
      java.util.Arrays.sort(vals)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        qs.map(q => vals(math.floor(q * (m - 1)).toInt)).toArray)
    }
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(p => { bb.putLong(p(0)); bb.putLong(p(1)); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(Array(bb.getLong, bb.getLong)))
    buf
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_quantiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvQuantiles =
    copy(left = newLeft, right = newRight)
}
