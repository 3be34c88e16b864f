package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Mask._

class MaskSpec extends SparkSpec {
  import spark.implicits._

  private def sheet = Seq((1L, "Alice Example", "HR"), (2L, "Bob Sample", "ENG"))
    .toDF("id", "name", "dept")

  private val rules = Seq[(String, MaskRule)](
    "name" -> RandomString("U_", Some(10)),
    "dept" -> Sha256)

  test("masked sheet replaces ruled fields and appends ANON_ROW_ID (§2.10)") {
    val out = Mask(sheet, "id", "s1", rules)
    val m = out.masked.orderBy("id").collect()
    assert(out.masked.columns.toSeq == Seq("id", "name", "dept", AnonRowId))
    assert(m.forall(_.getAs[String]("name").startsWith("U_")))
    assert(m.forall(_.getAs[String]("name").length == 10))
    assert(m.forall(_.getAs[String]("dept").matches("[0-9a-f]{64}")))
  }

  test("recovery sidecar joins back to originals by ANON_ROW_ID") {
    val out = Mask(sheet, "id", "s1", rules)
    val joined = out.masked.as("m").join(out.keys.as("k"), AnonRowId)
      .select(col("m.id"), col("k.name"), col("k.dept")).orderBy("id").collect()
    assert(joined.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "Alice Example", "HR"), (2L, "Bob Sample", "ENG")))
  }

  test("masking is deterministic per (key, seed) and varies by seed") {
    val m1 = Mask(sheet, "id", "s1", rules).masked.orderBy("id").collect().toSeq
    val m2 = Mask(sheet, "id", "s1", rules).masked.orderBy("id").collect().toSeq
    val m3 = Mask(sheet, "id", "OTHER", rules).masked.orderBy("id").collect().toSeq
    assert(m1 == m2)
    assert(m1.map(_.getAs[String]("name")) != m3.map(_.getAs[String]("name")))
  }

  test("RandomDigits fills to source width after fixed digits (F15/F16)") {
    val out = Mask(sheet, "id", "s1", Seq("name" -> RandomDigits("99", None))).masked.collect()
    out.foreach { r =>
      val v = r.getAs[String]("name")
      assert(v.startsWith("99") && v.matches("\\d+"))
    }
    // width == source width
    val widths = Mask(sheet, "id", "s1", Seq("name" -> RandomDigits("99", None))).masked
      .select(length(col("name"))).as[Int].collect().toSeq
    assert(widths == Seq("Alice Example".length, "Bob Sample".length))
  }

  test("RandomDate fixedPart narrows to year / month (F13)") {
    assert(Mask.dateRange(RandomDate("2000-01-01", "2030-12-31", "2024")) ==
      ("2024-01-01", "2024-12-31"))
    assert(Mask.dateRange(RandomDate("2000-01-01", "2030-12-31", "2024-02")) ==
      ("2024-02-01", "2024-02-29")) // leap year
  }

  test("Blank rule and empty rule map") {
    val blank = Mask(sheet, "id", "s1", Seq("dept" -> Blank)).masked
    assert(blank.select("dept").as[String].collect().forall(_ == ""))
    val none = Mask(sheet, "id", "s1", Nil)
    assert(none.masked.columns.toSeq == sheet.columns.toSeq) // no ANON_ROW_ID
  }

  test("tCloseness: hand-traced ordered EMD, exact integers") {
    // Global over 2 bins: bin0=6, bin1=10, N=16.
    // g1 = {0,0,0,1}: cum diff |3/4 - 6/16| = 0.375 -> 375000.
    // g2 = {0*3, 1*9}: cum diff |3/12 - 6/16| = 0.125 -> 125000.
    val df = (Seq.fill(3)(("g1", 0L)) ++ Seq(("g1", 1L)) ++
      Seq.fill(3)(("g2", 0L)) ++ Seq.fill(9)(("g2", 1L))).toDF("grp", "sens")
    val out = Mask.tCloseness(df, Seq("grp"), "sens", tX1e6 = 200000L)
      .orderBy("grp").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n"),
      r.getAs[Long]("t_x1e6"), r.getAs[Boolean]("violates"))).toSeq ==
      Seq(("g1", 4L, 375000L, true), ("g2", 12L, 125000L, false)))
  }

  test("dpNoisyCounts: exact geometric CDF, bounded noise, deterministic, clamped") {
    // bound=2: weights 1,2,4,2,1 -> cumulative 1,3,7,9,10; M = 3*4-2.
    val (steps, m) = Mask.geometricCdf(2)
    assert(m == 10L)
    assert(steps == Seq(-2 -> 1L, -1 -> 3L, 0 -> 7L, 1 -> 9L, 2 -> 10L))
    val df = (1 to 50).map(i => (s"g${i % 10}", i)).toDF("grp", "v")
    val out = Mask.dpNoisyCounts(df, Seq("grp"), "s1").orderBy("grp").collect()
    assert(out.length == 10)
    assert(out.forall(r => math.abs(r.getAs[Long]("noise")) <= 16L))
    assert(out.forall(r =>
      r.getAs[Long]("n_noisy") ==
        math.max(r.getAs[Long]("n") + r.getAs[Long]("noise"), 0L)))
    // Keyed-deterministic: same seed = same release; new seed = new noise.
    val again = Mask.dpNoisyCounts(df, Seq("grp"), "s1").orderBy("grp").collect()
    assert(out.map(_.getAs[Long]("noise")).toSeq ==
      again.map(_.getAs[Long]("noise")).toSeq)
    val other = Mask.dpNoisyCounts(df, Seq("grp"), "s2").orderBy("grp").collect()
    assert(out.map(_.getAs[Long]("noise")).toSeq !=
      other.map(_.getAs[Long]("noise")).toSeq)
    // Overflow guard: bound=30 would wrap u*m and cum*2^32 past 2^63,
    // silently corrupting the CDF's upper arms — it must be rejected.
    intercept[IllegalArgumentException] { Mask.geometricCdf(30) }
    // At the new max every product stays exact: u < 2^32, m = 3*2^29-2.
    val (_, m29) = Mask.geometricCdf(29)
    assert(m29 == 3L * (1L << 29) - 2)
    assert(BigInt((1L << 32) - 1) * BigInt(m29) < BigInt(Long.MaxValue))
    assert(BigInt(m29) * BigInt(1L << 32) < BigInt(Long.MaxValue))
    val wide = Mask.dpNoisyCounts(df, Seq("grp"), "s1", bound = 29)
      .orderBy("grp").collect()
    assert(wide.forall(r => math.abs(r.getAs[Long]("noise")) <= 29L))
  }

  test("tCloseness: group mirroring the global scores 0; single bin is safe") {
    val same = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L)).toDF("grp", "sens")
    assert(Mask.tCloseness(same, Seq("grp"), "sens", 1L)
      .select("t_x1e6").as[Long].collect().forall(_ == 0L))
    val one = Seq(("a", 5L), ("b", 5L)).toDF("grp", "sens") // m_bins = 1
    assert(Mask.tCloseness(one, Seq("grp"), "sens", 1L)
      .select("t_x1e6").as[Long].collect().forall(_ == 0L))
  }
}
