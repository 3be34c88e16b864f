package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def est(n: Int, p: Int, corrected: Boolean, parts: Int): Long = {
    val h = conv(substring(md5(concat(col("id").cast("string"), lit(":hs"))), 1, 15), 16, 10)
      .cast("long")
    (1 to n).toDF("id").repartition(parts)
      .select(h.as("h"))
      .agg(F.toColumn(HllDistinct(F.toExpr(col("h")), p, corrected)
        .toAggregateExpression()).as("e"))
      .head().getLong(0)
  }

  test("corrected estimate within 5% at 20k distinct (p=11)") {
    val e = est(20000, p = 11, corrected = true, parts = 8)
    assert(math.abs(e - 20000) <= 1000, s"estimate $e")
  }

  test("small range: linear counting keeps tiny sets near-exact") {
    val e = est(100, p = 11, corrected = true, parts = 4)
    assert(math.abs(e - 100) <= 5, s"estimate $e")
  }

  test("merge is partitioning-invariant: 1 vs 32 partitions agree exactly") {
    assert(est(5000, 9, corrected = true, parts = 1) ===
      est(5000, 9, corrected = true, parts = 32))
    assert(est(5000, 9, corrected = false, parts = 1) ===
      est(5000, 9, corrected = false, parts = 32))
  }

  test("duplicates don't move the sketch") {
    val h = conv(substring(md5(concat(col("id").cast("string"), lit(":hs"))), 1, 15), 16, 10)
      .cast("long")
    val once = (1 to 3000).toDF("id")
    val tripled = once.unionAll(once).unionAll(once)
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.select(h.as("h"))
        .agg(F.toColumn(HllDistinct(F.toExpr(col("h")), 10, corrected = true)
          .toAggregateExpression()).as("e")).head().getLong(0)
    assert(run(once) === run(tripled))
  }

  test("raw-mode estimator matches an independent scalar mirror") {
    // recompute registers + the integer formula in plain Scala from the
    // same md5 recipe and require bit-identical output
    val n = 4000; val p = 9; val q = 60 - p; val m = 1 << p
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Int](m)
    (1 to n).foreach { i =>
      val hex = md.digest(s"$i:hs".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val b = (h >>> q).toInt
      val suffix = h & ((1L << q) - 1)
      val rho = if (suffix == 0L) q + 1
        else java.lang.Long.numberOfLeadingZeros(suffix) - (64 - q) + 1
      if (rho > regs(b)) regs(b) = rho
    }
    var num = BigInt(0)
    regs.foreach(r => num += BigInt(1) << (q + 1 - r))
    val mB = BigInt(m)
    val want = ((BigInt(7213) * mB * mB * mB * (BigInt(1) << (q + 1))) /
      (BigInt(10) * (BigInt(1000) * mB + 1079) * num)).toLong
    assert(est(n, p, corrected = false, parts = 8) === want)
  }
}
