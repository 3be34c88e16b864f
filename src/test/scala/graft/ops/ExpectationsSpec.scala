package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val tbl = Seq(
    (1L, Some("a"), 10L),
    (2L, Some("b"), -5L),
    (2L, None, 200L),
    (3L, Some("zz"), 50L),
  ).toDF("id", "name", "amt")

  private def report(rules: Seq[Expectations.Rule]) =
    Expectations.audit(tbl, rules).as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("row rules share one scan and count violations exactly") {
    val got = report(Seq(
      Expectations.notNull("name"),
      Expectations.inRange("amt", lit(0L), lit(100L)),
      Expectations.matches("name", "^[a-y]+$")))
    assert(got("not_null:name") == ((1L, 4L)))
    assert(got("in_range:amt") == ((2L, 4L)))
    // null name counts as a regex violation too; "zz" fails the class
    assert(got("matches:name") == ((2L, 4L)))
  }

  test("unique rule reports duplicate surplus") {
    assert(report(Seq(Expectations.Unique("unique:id", Seq("id"))))("unique:id")
      == ((1L, 4L)))
  }

  test("referential integrity counts orphans, ignoring nulls") {
    val dim = Seq(1L, 3L).toDF("k")
    val got = report(Seq(
      Expectations.RefIntegrity("ref:id", "id", dim, "k")))
    assert(got("ref:id") == ((2L, 4L))) // the two id=2 rows
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException](
      report(Seq(Expectations.notNull("name"), Expectations.notNull("name"))))
  }

  test("violation counts are zero, not null, on a clean table") {
    val got = report(Seq(Expectations.notNull("id")))
    assert(got("not_null:id") == ((0L, 4L)))
  }
}
