package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes nulls/distincts/min/max per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (None, Some("b")), (Some(2), Some("b"))
    ).toDF("k", "v")
    val p = Profile.profile(df, Seq("k", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .sortBy(_._1)
    assert(p(0) == ("k", 1L, 2L, "1", "2"))
    assert(p(1) == ("v", 1L, 2L, "a", "b"))
  }

  test("profile survives hostile column names (quotes, backticks, dots)") {
    val df = Seq((1, "x", 2.0), (2, "y", 3.0))
      .toDF("it's", "back`tick", "dot.ted")
    val p = Profile.profile(df, df.columns.toSeq).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(p.map(_._1).toSeq == Seq("back`tick", "dot.ted", "it's"))
    assert(p.forall { case (_, nulls, distinct) => nulls == 0L && distinct == 2L })
  }

  test("profile is ONE pass: a single scan feeds every column's stats") {
    val df = Profile.profile(Tables.load(spark, sf, "customer"),
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    // rows come back, one per column
    assert(df.count() == 4)
  }

  test("histogram: closed-top last bin, out-of-range counted under -1, nulls dropped") {
    import spark.implicits._
    val vals = Seq[java.lang.Double](0.0, 4.9, 5.0, 9.9, 10.0, // bins 0,0,1,1,last
      -0.1, 10.1, null)                                        // out, out, dropped
      .toDF("v")
    val got = Profile.histogram(vals, "v", 0.0, 10.0, 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // [0,5) -> 2 values; [5,10) -> 2; v=10.0 snaps into the last bin
    assert(got == Map(0 -> 2L, 1 -> 3L, -1 -> 2L), got.toString)
    // zero-width or non-positive bins rejected
    intercept[IllegalArgumentException](Profile.histogram(vals, "v", 5.0, 5.0, 2))
    intercept[IllegalArgumentException](Profile.histogram(vals, "v", 0.0, 1.0, 0))
  }
}
