package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PolicySpec extends SparkSpec {
  import spark.implicits._

  private def tiers = Seq("free", "basic", "premium", "admin", "junk").toDF("t")

  test("tier lattice ranks and canUse (§2.12)") {
    val ranks = tiers.select($"t", Policy.tierRank($"t")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ranks == Map("free" -> 0, "basic" -> 1, "premium" -> 2, "admin" -> 3, "junk" -> 0))
    val can = tiers.select($"t", Policy.canUse($"t", lit("basic"))).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(can("free") == false && can("basic") && can("premium") && can("admin"))
  }

  test("legacy fallback: tier map > paid list > free") {
    val df = Seq((Some("premium"), true), (None, true), (None, false)).toDF("mapped", "paid")
    val out = df.select(Policy.requiredTier($"mapped", $"paid")).as[String].collect().toSeq
    assert(out == Seq("premium", "basic", "free"))
  }

  test("KST day boundary: 16:00 UTC is next KST day (F17)") {
    val asOf = lit("2024-02-15 16:00:00").cast("timestamp")
    val day = Seq(1).toDF("x").select(Policy.kstDay(asOf).cast("string")).head().getString(0)
    assert(day == "2024-02-16")
  }

  test("remaining days inclusive: same-day expiry = 1 (F17)") {
    val asOf = lit("2024-02-15 00:00:00").cast("timestamp") // KST 2024-02-15
    val df = Seq("2024-02-15", "2024-02-16", "2024-02-14").toDF("d")
      .select($"d", Policy.remainingDays($"d".cast("date"), asOf), Policy.isExpired($"d".cast("date"), asOf))
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.toSeq == Seq(("2024-02-15", 1, false), ("2024-02-16", 2, false), ("2024-02-14", 0, true)))
  }

  test("derived subscription window and clamping") {
    val df = Seq(("basic", "2024-01-01"), ("free", "2024-01-01")).toDF("role", "s")
    val out = df.select($"role", Policy.derivedEnd($"role", $"s".cast("date")).cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("basic", "2024-01-31"), ("free", null)))
    val clamped = Seq(("2024-01-10", "2024-01-20")).toDF("e", "s")
      .select(Policy.clampEndAfterStart($"e".cast("date"), $"s".cast("date")).cast("string"))
      .head().getString(0)
    assert(clamped == "2024-01-20")
  }

  test("upload quotas per role") {
    val q = Seq("free", "basic", "premium", "admin").toDF("r")
      .select($"r", Policy.uploadQuota($"r")).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(q == Map("free" -> 1, "basic" -> 10, "premium" -> 10, "admin" -> 100))
  }
}
