package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDot, MinFingerprint, RegexpReplaceFirst, WordShingles}

/** SQL surface for the engine's custom Catalyst expressions (SURVEY
  * §2.13): `regexp_replace_first(src, pattern, repl)` and
  * `array_dot(a, b)`.
  *
  * Two registration paths:
  *  - new sessions: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the idiomatic SparkSessionExtensions hook);
  *  - existing sessions (tests, notebooks): `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("regexp_replace_first",
      info("regexp_replace_first", "replaces the first regex match (Java Matcher.replaceFirst semantics)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "regexp_replace_first(src, pattern, repl) takes 3 arguments")
        RegexpReplaceFirst(args(0), args(1), args(2))
      }),
    ("array_dot",
      info("array_dot", "sum of element-wise products of two float/double arrays, in double precision"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot(a, b) takes 2 arguments")
        ArrayDot(args(0), args(1))
      }),
    ("word_shingles",
      info("word_shingles", "word n-gram shingles of a text column (MinHash kernel); second argument must be a literal int"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n) takes 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be a literal int, got $other")
        }
        WordShingles(args(0), n)
      }),
    ("min_fingerprint",
      info("min_fingerprint", "min base-257 polynomial hash over codepoint 5-grams (document fingerprint)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "min_fingerprint(text) takes 1 argument")
        MinFingerprint(args(0))
      }),
    ("nfc_normalize",
      info("nfc_normalize", "Unicode NFC canonical normalization (dedup-key normalizer)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text) takes 1 argument")
        graft.functions.NfcNormalize(args(0))
      }),
    ("kmv_distinct",
      info("kmv_distinct", "KMV distinct-count sketch over a 60-bit hash column; second argument (k) must be a literal int"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_distinct(hash60, k) takes 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_distinct k must be a literal int, got $other")
        }
        graft.functions.KmvDistinct(args(0), k).toAggregateExpression()
      }),
    ("kmv_sketch",
      info("kmv_sketch", "mergeable KMV sketch: the k smallest distinct hashes as a sorted array; second argument (k) must be a literal int"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(hash, k) takes 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_sketch k must be a literal int, got $other")
        }
        graft.functions.KmvSketch(args(0), k).toAggregateExpression()
      }),
    ("kmv_quantiles",
      info("kmv_quantiles", "hash-min-k quantile sketch: kmv_quantiles(hash60, value, k, q1, q2, ...) with literal k and quantile fractions"),
      (args: Seq[Expression]) => {
        require(args.length >= 4,
          "kmv_quantiles(hash60, value, k, q...) takes at least 4 arguments")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_quantiles k must be a literal int, got $other")
        }
        val qs = args.drop(3).map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal, _) =>
            v.toDouble
          case other => throw new IllegalArgumentException(
            s"kmv_quantiles fractions must be literal doubles, got $other")
        }
        graft.functions.KmvQuantiles(args(0), args(1), k, qs.toSeq)
          .toAggregateExpression()
      }),
    ("bloom_build",
      info("bloom_build", "aggregate a long key column into a serialized Bloom filter; numBits/numHashes must be literal ints"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bloom_build(key, numBits, numHashes) takes 3 arguments")
        (litInt(args(1), "bloom_build numBits"), litInt(args(2), "bloom_build numHashes")) match {
          case (bits, hashes) =>
            graft.functions.BloomBuild(args(0), bits, hashes).toAggregateExpression()
        }
      }),
    ("bloom_might_contain",
      info("bloom_might_contain", "probe a serialized Bloom filter with a long key"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_might_contain(filter, key) takes 2 arguments")
        graft.functions.BloomMightContain(args(0), args(1))
      }),
    ("cms_build",
      info("cms_build", "aggregate three bucket columns (each in [0,w)) into a d=3 Count-Min sketch; w must be a literal int"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "cms_build(b0, b1, b2, w) takes 4 arguments")
        graft.functions.CmsBuild(args(0), args(1), args(2), litInt(args(3), "cms_build w"))
          .toAggregateExpression()
      }),
    ("cms_estimate",
      info("cms_estimate", "point-frequency estimate from a serialized Count-Min sketch and three bucket columns"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "cms_estimate(sketch, b0, b1, b2) takes 4 arguments")
        graft.functions.CmsEstimate(args(0), args(1), args(2), args(3))
      }),
    ("cms_merge",
      info("cms_merge", "union serialized Count-Min sketches by element-wise counter add; w must be a literal int matching the inputs"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cms_merge(sketch, w) takes 2 arguments")
        graft.functions.CmsMerge(args(0), litInt(args(1), "cms_merge w"))
          .toAggregateExpression()
      }),
    ("array_dot_int8",
      info("array_dot_int8", "exact integer dot product of two array<tinyint> quantized vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot_int8(a, b) takes 2 arguments")
        graft.functions.ArrayDotInt8(args(0), args(1))
      }),
    ("zorder_key",
      info("zorder_key", "64-bit Morton code of two int columns (space-filling-curve clustering key for 2-D data skipping)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "zorder_key(a, b) takes 2 arguments")
        graft.functions.ZOrderKey(args(0), args(1))
      }),
    ("hilbert_key",
      info("hilbert_key", "64-bit Hilbert-curve index of two int columns (tighter box locality than zorder_key, no diagonal jumps)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hilbert_key(a, b) takes 2 arguments")
        graft.functions.HilbertKey(args(0), args(1))
      }),
  )

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a literal int, got $other")
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftshim.ExprShim.registerFunction(spark, name, builder)
    }
}
