package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SweepSpec extends SparkSpec {
  import spark.implicits._

  private def peaks(rows: Seq[(String, Long)], dur: Long) =
    Sweep.peakConcurrency(rows.toDF("k", "t"), "k", col("t"), dur)
      .as[(String, Long, Long)].collect().toSet

  test("overlapping intervals stack; peak reported at earliest attainment") {
    // a: [0,10) [5,15) [8,18) → 3 live at t=8; b: disjoint
    val got = peaks(Seq("a" -> 0L, "a" -> 5L, "a" -> 8L, "b" -> 0L, "b" -> 100L), 10L)
    assert(got == Set(("a", 3L, 8L), ("b", 1L, 0L)))
  }

  test("half-open semantics: end at t does not overlap start at t") {
    // [0,10) and [10,20) never coexist — peak 1, first reached at 0
    assert(peaks(Seq("k" -> 0L, "k" -> 10L), 10L) == Set(("k", 1L, 0L)))
  }

  test("identical timestamps net into one delta row") {
    val got = peaks(Seq.fill(5)("k" -> 42L), 10L)
    assert(got == Set(("k", 5L, 42L)))
  }

  test("zero or negative duration is rejected") {
    intercept[IllegalArgumentException](peaks(Seq("k" -> 0L), 0L))
  }
}
