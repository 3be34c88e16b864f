package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def keys = Seq(1L, 2L, 3L, 100L).toDF("k")

  test("maskInt stays within [min, max] and is deterministic") {
    val vs = keys.select(F.maskInt($"k", "s", "t", 10, 20)).as[Long].collect()
    assert(vs.forall(v => v >= 10 && v <= 20))
    val again = keys.select(F.maskInt($"k", "s", "t", 10, 20)).as[Long].collect()
    assert(vs.toSeq == again.toSeq)
  }

  test("mask streams have the right alphabet and length") {
    val d = keys.select(F.maskDigits($"k", "s", "t", 10)).as[String].collect()
    assert(d.forall(v => v.length == 10 && v.forall(_.isDigit)))
    val l = keys.select(F.maskLetters($"k", "s", "t", 40)).as[String].collect()
    assert(l.forall(v => v.length == 40 && v.forall(c => c >= 'a' && c <= 'p')))
  }

  test("maskUuid shape and uniqueness across keys") {
    val u = keys.select(F.maskUuid($"k", "s")).as[String].collect()
    assert(u.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(u.distinct.length == u.length)
  }

  test("uniqueId: CV + KST date + 6-char A-Z0-9 token (F19)") {
    val ids = keys.select(F.uniqueId($"k", "s", lit("2026-08-12 20:00:00").cast("timestamp")))
      .as[String].collect()
    // 20:00 UTC = next day KST
    assert(ids.forall(_.matches("CV20260813_[A-Z0-9]{6}")))
  }

  test("maskDate within range; guard on inverted range") {
    val ds = keys.select(F.maskDate($"k", "s", "t", "2024-01-01", "2024-01-31")).as[String].collect()
    assert(ds.forall(d => d >= "2024-01-01" && d <= "2024-01-31"))
    intercept[IllegalArgumentException](F.maskDate($"k", "s", "t", "2024-02-01", "2024-01-01"))
  }

  test("scale4 fixed-point is exact on representable quarters") {
    val vs = Seq(0.25, -0.5, 1.0, 0.0).toDF("x").select(F.scale4($"x")).as[Long].collect()
    assert(vs.toSeq == Seq(2500L, -5000L, 10000L, 0L))
  }

  test("escapeRegex: escaped literal matches itself (scalacheck property)") {
    val prop = Prop.forAll(Gen.asciiPrintableStr.suchThat(_.nonEmpty)) { s =>
      java.util.regex.Pattern.compile(F.escapeRegex(s)).matcher(s).matches()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("withFlags folds inline groups") {
    assert(F.withFlags("abc", ignoreCase = true, multiline = false) == "(?i)abc")
    assert(F.withFlags("abc", ignoreCase = true, multiline = true) == "(?im)abc")
    assert(F.withFlags("abc", ignoreCase = false, multiline = false) == "abc")
  }

  test("ArrayDot: bit-identical to the HOF fold, mixed float/double elements") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(7.0, 8.0, 9.0))).toDF("f", "d")
    val viaHof = df.select(expr(
      "aggregate(zip_with(f, d, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      .collect().map(_.getDouble(0))
    val viaExpr = df.select(F.toColumn(
      ArrayDot(F.toExpr(col("f")), F.toExpr(col("d")))))
      .collect().map(_.getDouble(0))
    assert(viaHof.toSeq == viaExpr.toSeq) // exact ==, not approx: same IEEE fold
    // float×float and double×double paths
    val ff = df.select(F.toColumn(ArrayDot(F.toExpr(col("f")), F.toExpr(col("f")))))
      .head().getDouble(0)
    assert(ff == (1.5 * 1.5 + 2.25 * 2.25 + 3.125 * 3.125))
  }

  test("KmvDistinct: exact below k, ~accurate above, identical across partitionings, SQL-callable") {
    import spark.implicits._
    def kmvCol(k: Int) = F.toColumn(
      KmvDistinct(F.toExpr(col("h")), k).toAggregateExpression()).as("est")
    def hashed(n: Int, dup: Int) = spark.range(n)
      .selectExpr(s"id % ${n / dup} AS v")
      .select(conv(substring(md5(concat(col("v").cast("string"), lit(":kmv"))), 1, 15), 16, 10)
        .cast("long").as("h"))
    // below k: exact distinct count
    assert(hashed(100, 4).select(kmvCol(64)).head.getLong(0) == 25L)
    // above k: within 25% of the true 10k distinct (k=256)
    val est = hashed(20000, 2).select(kmvCol(256)).head.getLong(0)
    assert(math.abs(est - 10000L) < 2500, s"estimate $est too far from 10000")
    // partial-aggregation path: 1 vs 16 partitions must agree exactly
    // (serialize/merge round-trips the buffer; the sketch is a pure
    // function of the value SET)
    val one = hashed(20000, 2).coalesce(1).select(kmvCol(256)).head.getLong(0)
    val many = hashed(20000, 2).repartition(16).select(kmvCol(256)).head.getLong(0)
    assert(one == est && many == est)
    // SQL surface via GraftExtensions
    graft.GraftExtensions.register(spark)
    hashed(100, 4).createOrReplaceTempView("kmv_t")
    assert(spark.sql("SELECT kmv_distinct(h, 64) FROM kmv_t").head.getLong(0) == 25L)
  }

  test("KmvSketch: sorted min-k array, partition-invariant, estimator-consistent with KmvDistinct, SQL-callable") {
    def hashed(n: Int, dup: Int) = spark.range(n)
      .selectExpr(s"id % ${n / dup} AS v")
      .select(conv(substring(md5(concat(col("v").cast("string"), lit(":kmv"))), 1, 15), 16, 10)
        .cast("long").as("h"))
    def skCol(k: Int) = F.toColumn(
      KmvSketch(F.toExpr(col("h")), k).toAggregateExpression()).as("sk")
    // below k: the sketch IS the distinct hash set, sorted ascending
    val small = hashed(100, 4).select(skCol(64)).head.getSeq[Long](0)
    assert(small.length == 25 && small == small.sorted)
    // partition invariance: identical array under 1 vs 16 partitions
    val one = hashed(20000, 2).coalesce(1).select(skCol(256)).head.getSeq[Long](0)
    val many = hashed(20000, 2).repartition(16).select(skCol(256)).head.getSeq[Long](0)
    assert(one == many && one.length == 256)
    // estimator consistency: (k-1)*2^60 / sketch.last == kmv_distinct
    val viaSketch = (BigInt(255) * BigInt(1L << 60) / BigInt(one.last)).toLong
    val viaAgg = hashed(20000, 2).select(F.toColumn(
      KmvDistinct(F.toExpr(col("h")), 256).toAggregateExpression())).head.getLong(0)
    assert(viaSketch == viaAgg)
    // SQL surface
    graft.GraftExtensions.register(spark)
    hashed(100, 4).createOrReplaceTempView("kmvsk_t")
    assert(spark.sql("SELECT kmv_sketch(h, 64) FROM kmvsk_t").head.getSeq[Long](0).length == 25)
  }

  test("KmvQuantiles: exact below k, near-true above, partition-invariant, SQL-callable") {
    import spark.implicits._
    import graft.functions.KmvQuantiles
    def qCol(k: Int) = F.toColumn(KmvQuantiles(F.toExpr(col("h")),
      F.toExpr(col("v")), k, Seq(0.25, 0.5, 0.75)).toAggregateExpression()).as("ps")
    def rows(n: Int) = spark.range(n)
      .select(col("id").as("v"),
        conv(substring(md5(concat(col("id").cast("string"), lit(":kq"))), 1, 15), 16, 10)
          .cast("long").as("h"))
    // below k the sample IS the group: nearest-rank over 0..99 —
    // floor(q*99) = 24, 49, 74
    val exact = rows(100).select(qCol(256)).head.getSeq[Long](0)
    assert(exact == Seq(24L, 49L, 74L), exact.toString)
    // above k (uniform 0..19999, k=512): each quantile within 10% of truth
    val est = rows(20000).select(qCol(512)).head.getSeq[Long](0)
    Seq(5000L, 10000L, 15000L).zip(est).foreach { case (truth, e) =>
      assert(math.abs(e - truth) < 2000, s"$e vs $truth") }
    // the sample is a pure function of the (hash, value) SET: any
    // partitioning/merge order yields the identical array
    val one = rows(20000).coalesce(1).select(qCol(512)).head.getSeq[Long](0)
    val many = rows(20000).repartition(16).select(qCol(512)).head.getSeq[Long](0)
    assert(one == est && many == est)
    // SQL surface via GraftExtensions (literal k + fraction varargs)
    graft.GraftExtensions.register(spark)
    rows(100).createOrReplaceTempView("kq_t")
    val viaSql = spark.sql(
      "SELECT kmv_quantiles(h, v, 256, 0.25D, 0.5D, 0.75D) FROM kq_t")
      .head.getSeq[Long](0)
    assert(viaSql == Seq(24L, 49L, 74L), viaSql.toString)
  }

  test("KmvDistinct: non-Long input is an analysis-time error, not ClassCastException") {
    // ExpectsInputTypes(LongType): the sketch buffers 60-bit hashes as
    // longs; an Int column must fail resolution, not mid-job.
    val ints = spark.range(10).select(col("id").cast("int").as("h"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      ints.agg(F.toColumn(
        KmvDistinct(F.toExpr(col("h")), 16).toAggregateExpression()).as("est"))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }
}
